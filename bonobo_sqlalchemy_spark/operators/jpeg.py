"""Library-free baseline JPEG codec (stdlib + numpy only).

Round 12 continuation of the round-11 PNG play: the container has no
PIL/cv2, so the DCT half of the image-decode matrix was a documented
environment block. This module removes it for baseline JPEGs — the
decoder implements the real pipeline (marker parse → DQT/DHT tables →
entropy-coded segment with byte unstuffing and restart markers → Huffman
decode → dequantize → inverse zigzag → 8×8 IDCT → chroma upsample →
YCbCr→RGB), and the encoder produces genuine baseline files (FDCT →
quantize → zigzag → DC-diff + AC run-length → Huffman) so the path is
exercisable end-to-end in-container with payloads any external JPEG
decoder can also read.

Scope (mirrors the PNG branch's honesty contract): baseline DCT (SOF0),
8-bit precision, grayscale or YCbCr with sampling factors 1–2 (covers
4:4:4, 4:2:2, 4:2:0). Progressive (SOF2), arithmetic coding, 12-bit, and
hierarchical modes raise ``NotImplementedError`` — PIL/cv2 (probed first
in ``multimodal.decode_image``) remain the production path on a full
cluster image.

Format facts from the public JPEG spec (ITU-T T.81) and the JFIF spec;
no reference-engine code involved (the reference has no media handling
at all — its rows are arbitrary Python objects,
/root/reference/bonobo_sqlalchemy/writers.py:33).

Determinism note: the encoder writes its own canonical Huffman tables
(fixed-length code sets derived from the symbols it may emit) into DHT
segments — every bit of the output is a pure function of the input
array and quant table, which is what lets registered queries build
oracle-predictable payloads (a constant 8×8 block is DC-only; with a
DC quant step that divides ``8 * (v - 128)`` the round trip is EXACT).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Shared tables
# ---------------------------------------------------------------------------

#: zigzag order: ZIGZAG[i] = (row-major) index of the i-th coefficient in
#: scan order
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: flat quant table (every step 8): DC-exact for constant blocks
#: (8*(v-128) is always a multiple of 8) — the table registered queries
#: use to keep the lossy codec oracle-predictable on piecewise-constant
#: fixtures. Not a good table for real photos; that's not its job.
QUANT_FLAT8 = np.full(64, 8, dtype=np.int64)

#: orthonormal 8-point DCT-II matrix: fdct B = C @ X @ C.T, idct X = C.T @ B @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = (np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)) * np.cos(
            (2 * _n + 1) * _k * np.pi / 16
        )


def _category(v: int) -> int:
    """JPEG magnitude category: number of bits to represent |v|."""
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# Canonical Huffman tables the encoder emits (and any decoder reads back
# from the DHT segments it writes)
# ---------------------------------------------------------------------------

#: DC: 12 category symbols, all 4-bit codes (codes 0000..1011; the
#: all-ones code is never assigned, per T.81's padding rule)
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))

#: AC: EOB + ZRL + every (run 0-15, size 1-10) pair = 162 symbols, all
#: 8-bit codes (codes 0x00..0xA1 — all-ones never assigned)
_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical JPEG Huffman assignment: symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _build_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _build_codes(_AC_BITS, _AC_VALS)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing inside the entropy stream
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _encode_block(bw: _BitWriter, block: np.ndarray, q: np.ndarray, dc_pred: int) -> int:
    """FDCT + quantize + zigzag + entropy-code one 8x8 sample block;
    returns the new DC predictor."""
    coeffs = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    quant = np.round(coeffs.reshape(-1) / q.reshape(8, 8).reshape(-1)).astype(
        np.int64
    )
    zz = quant[ZIGZAG]
    # DC
    diff = int(zz[0]) - dc_pred
    s = _category(diff)
    code, ln = _DC_CODES[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    # AC
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if i > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l = _AC_CODES[0xF0]  # ZRL: 16 zeros
            bw.write(c, l)
            run -= 16
        s = _category(v)
        if s > 10:
            raise ValueError("AC coefficient category > 10 (quant table too fine)")
        c, l = _AC_CODES[(run << 4) | s]
        bw.write(c, l)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        c, l = _AC_CODES[0x00]  # EOB
        bw.write(c, l)
    return int(zz[0])


def _dht_segment(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([tc_th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg_baseline(
    img, quant: np.ndarray | None = None, subsample: str = "4:4:4"
) -> bytes:
    """Encode an ``(h, w)`` grayscale or ``(h, w, 3)`` RGB uint8 array as
    a baseline JFIF JPEG (one quant table, canonical Huffman tables
    written into the file). ``subsample`` is ``"4:4:4"`` (every component
    1×1) or ``"4:2:0"`` (Y at 2×2, chroma 2×2-mean-downsampled — the
    common camera layout, which also exercises the decoder's MCU
    interleave + upsample path). Deterministic: output bytes are a pure
    function of (img, quant, subsample). Default quant table is
    :data:`QUANT_FLAT8` (see its note); pass any 64-length table to trade
    size for fidelity."""
    arr = np.asarray(img, dtype=np.uint8)
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError(f"expected (h,w) gray or (h,w,3) RGB, got {arr.shape}")
    if subsample not in ("4:4:4", "4:2:0"):
        raise ValueError(f"subsample must be 4:4:4 or 4:2:0, got {subsample}")
    h, w = arr.shape[:2]
    q = np.asarray(quant if quant is not None else QUANT_FLAT8, dtype=np.int64)
    if q.size != 64 or np.any(q < 1) or np.any(q > 255):
        raise ValueError("quant table must be 64 entries in 1..255")

    def pad_to(p: np.ndarray, mh: int, mw: int) -> np.ndarray:
        """edge-replicate pad up to multiples of (mh, mw)"""
        ph = (p.shape[0] + mh - 1) // mh * mh
        pw = (p.shape[1] + mw - 1) // mw * mw
        pp = np.empty((ph, pw))
        pp[: p.shape[0], : p.shape[1]] = p
        pp[p.shape[0] :, : p.shape[1]] = p[-1:, :]
        pp[:, p.shape[1] :] = pp[:, p.shape[1] - 1 : p.shape[1]]
        return pp

    if gray:
        comps = [(1, arr.astype(np.float64), 1, 1)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample == "4:4:4":
            comps = [(1, y, 1, 1), (2, cb, 1, 1), (3, cr, 1, 1)]
        else:  # 4:2:0 — chroma 2x2-mean over the even-padded full planes
            cb2 = pad_to(cb, 2, 2)
            cr2 = pad_to(cr, 2, 2)
            dn = lambda p: p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
            comps = [(1, y, 2, 2), (2, dn(cb2), 1, 1), (3, dn(cr2), 1, 1)]

    # headers
    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )  # APP0
    zz_q = q.reshape(-1)[ZIGZAG]  # DQT stores the table in zigzag order
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(x) for x in zz_q
    )  # DQT id 0
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, _, ch, cv in comps:
        sof += struct.pack(">BBB", cid, (ch << 4) | cv, 0)
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof  # SOF0
    out += _dht_segment(0x00, _DC_BITS, _DC_VALS)  # DC table 0
    out += _dht_segment(0x10, _AC_BITS, _AC_VALS)  # AC table 0
    sos = bytes([len(comps)])
    for cid, _, _, _ in comps:
        sos += bytes([cid, 0x00])  # DC table 0 / AC table 0
    sos += b"\x00\x3f\x00"  # spectral selection (baseline fixed)
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    # entropy-coded segment: interleaved MCU order — per MCU position,
    # each component contributes its v x h grid of 8x8 blocks
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = [
        pad_to(p, cv * 8 * mcuy, ch * 8 * mcux) for _, p, ch, cv in comps
    ]
    writer = _BitWriter()
    preds = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (_, _, ch, cv) in enumerate(comps):
                p = padded[ci]
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        block = p[y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(writer, block, q, preds[ci])
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    real marker (leaves it for the caller)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("JPEG entropy stream truncated")
        byte = d[self.pos]
        if byte == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt - 0xD0)
            else:
                # real marker (EOI etc.): pad with 1s per spec
                byte = 0xFF
                self._acc = (self._acc << 8) | byte
                self._n += 8
                return
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | byte
        self._n += 8

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

class _RestartMarker(Exception):
    def __init__(self, n: int) -> None:
        self.n = n


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code (corrupt stream or wrong table)")


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map an s-bit magnitude to its signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg_baseline(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) JPEG into an (h, w, 3) uint8 RGB array.
    Grayscale replicates to 3 channels. Sampling factors 1–2 supported
    (4:4:4 / 4:2:2 / 4:2:0, chroma upsampled by replication). Progressive
    / arithmetic / 12-bit inputs raise ``NotImplementedError``."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        while payload[pos + 1] == 0xFF:  # legal fill bytes before a marker
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                      0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"library-free JPEG branch handles baseline (SOF0) only "
                f"(got SOF marker 0x{marker:02x} — progressive/extended/"
                f"arithmetic); PIL/cv2 cover these on a full cluster image"
            )
        if marker == 0xDB:  # DQT
            at = 0
            while at < len(seg):
                pq, tq = seg[at] >> 4, seg[at] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.frombuffer(seg, np.uint8, 64, at + 1).astype(np.int64)
                dezz = np.zeros(64, dtype=np.int64)
                dezz[ZIGZAG] = tbl  # stored zigzag; back to row-major
                qt[tq] = dezz
                at += 65
        elif marker == 0xC4:  # DHT
            at = 0
            while at < len(seg):
                tc, th = seg[at] >> 4, seg[at] & 0xF
                bits = list(seg[at + 1 : at + 17])
                n = sum(bits)
                vals = list(seg[at + 17 : at + 17 + n])
                codes = _build_codes(bits, vals)
                huff[(tc, th)] = {(l, c): s for s, (c, l) in codes.items()}
                at += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                ch, cv = hv >> 4, hv & 0xF
                if not (1 <= ch <= 2 and 1 <= cv <= 2):
                    raise NotImplementedError(
                        f"sampling factors {ch}x{cv} unsupported (1-2 only)"
                    )
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            scan = {}
            for i in range(ns):
                cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan[cid] = (tt >> 4, tt & 0xF)
            return _decode_scan(
                payload, pos, frame, scan, qt, huff, restart_interval
            )
        # APPn / COM / others: skipped
    raise ValueError("JPEG payload has no SOS segment")


def _decode_scan(payload, pos, frame, scan, qt, huff, restart_interval):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    br = _BitReader(payload, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # RSTn sits on a byte boundary between MCU groups: drop
                # the pad bits, consume the marker, reset DC predictors
                br._acc = 0
                br._n = 0
                d = br.data
                if not (
                    br.pos + 1 < len(d)
                    and d[br.pos] == 0xFF
                    and 0xD0 <= d[br.pos + 1] <= 0xD7
                ):
                    raise ValueError("expected restart marker")
                br.pos += 2
                preds = [0] * len(comps)
            try:
                for ci, c in enumerate(comps):
                    dct, act = scan[c["id"]]
                    dc_tbl = huff[(0, dct)]
                    ac_tbl = huff[(1, act)]
                    q = qt[c["tq"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            zz = np.zeros(64, dtype=np.int64)
                            s = _huff_decode(br, dc_tbl)
                            diff = _extend(br.receive(s), s) if s else 0
                            preds[ci] += diff
                            zz[0] = preds[ci]
                            k = 1
                            while k < 64:
                                rs = _huff_decode(br, ac_tbl)
                                if rs == 0x00:  # EOB
                                    break
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                k += rs >> 4
                                size = rs & 0xF
                                if k > 63:
                                    raise ValueError("AC index overrun")
                                zz[k] = _extend(br.receive(size), size)
                                k += 1
                            # zz is in zigzag order; q is row-major —
                            # bring q into zigzag order before dequant
                            coeffs = np.zeros(64, dtype=np.float64)
                            coeffs[ZIGZAG] = (zz * q[ZIGZAG]).astype(
                                np.float64
                            )
                            block = _C.T @ coeffs.reshape(8, 8) @ _C + 128.0
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            except _RestartMarker:
                raise ValueError("unexpected restart marker mid-MCU")
            mcu_count += 1
    # upsample each plane to full MCU-grid resolution, then crop
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] < hmax:
            p = np.repeat(p, hmax // c["h"], axis=1)
        if c["v"] < vmax:
            p = np.repeat(p, vmax // c["v"], axis=0)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
