"""Datapipe operator tests: sketch-based ops (no SQL oracle) are checked
against their exact counterparts — recall of LSH candidates vs brute force —
plus multimodal plumbing contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bonobo_sqlalchemy_spark.operators import dedup as D
from bonobo_sqlalchemy_spark.operators import multimodal as M
from bonobo_sqlalchemy_spark.operators import similarity as S
from bonobo_sqlalchemy_spark.sources.files import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    return load_table(spark, sf_small, "documents").cache()


@pytest.fixture(scope="module")
def embs(spark, sf_small):
    return load_table(spark, sf_small, "embeddings").cache()


def test_minhash_recall_of_high_similarity_pairs(spark, docs):
    """Every exact-Jaccard pair >= 0.6 must be found by MinHash+LSH at
    threshold 0.5 (banding S-curve: recall ~1 well above the midpoint)."""
    exact = {
        (r.id1, r.id2)
        for r in D.ngram_jaccard_pairs(docs, block_col=None, threshold=0.6).collect()
    }
    approx = {
        (r.id1, r.id2) for r in D.minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert exact, "fixture should contain near-duplicate documents"
    missed = exact - approx
    assert len(missed) <= max(1, len(exact) // 10), f"LSH missed {missed}"


def test_minhash_pairs_verified_no_false_positives(docs):
    """Verification step bounds reported jaccard: everything returned must
    really have jaccard >= threshold (candidates are exact-verified)."""
    for r in D.minhash_lsh_pairs(docs, threshold=0.5).collect():
        assert r.jaccard >= 0.5


def test_stop_shingle_cap_bounds_pairs(spark):
    """An ultra-hot shingle shared by every doc floods posting lists with a
    quadratic pair blowup; `max_shingle_df` must bound it. Docs here share
    one hot 3-gram but are otherwise unique, so with the cap no pair
    survives; without it, every pair collides on the hot shingle."""
    hot = "the quick fox"
    rows = [(i, f"{hot} unique tail number {i} alpha beta{i} gamma{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = D.ngram_jaccard_pairs(
        df, block_col=None, threshold=0.0, max_shingle_df=None
    )
    capped = D.ngram_jaccard_pairs(df, block_col=None, threshold=0.0, max_shingle_df=5)
    n_uncapped, n_capped = uncapped.count(), capped.count()
    assert n_uncapped == 40 * 39 // 2, "every pair collides via the hot shingle"
    assert n_capped == 0, f"cap should drop hot-shingle-only pairs, got {n_capped}"
    # minhash path honors the same cap: candidates can only arise from
    # surviving shingles, so the hot-shingle corpus yields no pairs either
    assert D.minhash_lsh_pairs(df, threshold=0.0, max_shingle_df=5).count() == 0


def test_embedding_lsh_blocking_finds_true_dups_no_allpairs(spark):
    """The LSH-bucketed embedding near-dup must (a) find genuinely
    near-identical same-label vectors with certainty-like recall and (b)
    never plan an all-pairs join: candidates meet on an equi-join over the
    bucket key, so the plan has no cartesian/nested-loop product."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(60):
        v = [rng.uniform(-1, 1) for _ in range(64)]
        rows.append((2 * i, "lab%d" % (i % 3), v))
        # near-identical twin (tiny perturbation, same label) -> cosine ~1
        rows.append((2 * i + 1, "lab%d" % (i % 3), [x + 1e-4 for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<float>")
    pairs = D.embedding_near_dup_pairs(df, threshold=0.9)
    found = {(r.id1, r.id2) for r in pairs.collect()}
    expected = {(2 * i, 2 * i + 1) for i in range(60)}
    missed = expected - found
    assert len(missed) <= 1, f"LSH blocking missed true twins: {missed}"
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_connected_components_transitive_chain(spark):
    """a-b and b-c pairs must merge into ONE component even though a and c
    never pair directly (the fixture corpus only has size-2 clusters, so
    transitivity needs its own graph). Also checks convergence beyond one
    propagation round: a 5-node chain has diameter 4."""
    nodes = spark.createDataFrame([(i,) for i in range(1, 9)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (6, 7)], "id1 long, id2 long"
    )
    got = {
        (r.doc_id, r.component, r.component_size)
        for r in D.connected_components(nodes, pairs).collect()
    }
    assert got == {
        (1, 1, 5), (2, 1, 5), (3, 1, 5), (4, 1, 5), (5, 1, 5),
        (6, 6, 2), (7, 6, 2),
        (8, 8, 1),
    }


def test_simhash_close_pairs_have_similar_text(docs):
    pairs = D.simhash_pairs(docs, max_hamming=4).limit(5).collect()
    # hamming<=4 of 64 bits implies strong token overlap; sanity only
    for r in pairs:
        assert r.id1 < r.id2


def test_simhash_banding_choice_never_changes_pairs(docs):
    """The block-combination knob (r14, Manku-style) moves COST only: the
    pigeonhole guarantee is exact at every n_blocks and the hamming verify
    is exact, so classic banding (k = d+1), wider keys, and the auto
    default all emit the identical pair set — which is also why the static
    DuckDB oracle needs no banding mirror."""
    def pairs(**kw):
        return {
            (r.id1, r.id2, r.hamming)
            for r in D.simhash_pairs(docs, max_hamming=8, **kw).collect()
        }

    classic = pairs(n_blocks=9)
    assert classic  # non-degenerate fixture
    assert pairs(n_blocks=11) == classic
    assert pairs() == classic  # auto default


def test_lsh_topk_recall_vs_bruteforce(spark, embs):
    queries = embs.where(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(embs, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.lsh_topk(embs, queries, k=5, bits_per_table=4, n_tables=16).collect()
    }
    # (4, 16)-LSH measured ~80% top-5 recall on this corpus; assert a
    # comfortable floor (deterministic planes -> stable across runs).
    assert len(exact & approx) >= len(exact) * 0.6


def test_ivf_topk_recall_vs_bruteforce(spark, embs):
    queries = embs.where(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(embs, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.ivf_topk(embs, queries, k=5, n_cells=16, n_probe=4).collect()
    }
    # probing 4/16 cells scans ~25% of the corpus; near-uniform directions
    # cap recall — require a sane floor and full result shape
    assert len(approx) == len(exact) == 40
    assert len(exact & approx) >= len(exact) * 0.3


def test_ann_index_save_load_probe_identical(spark, embs, tmp_path):
    """Train-once/probe-often: a saved+reloaded codebook round-trips
    exactly and the probe against it reproduces the in-line IVF result
    row for row (including sims and ranks)."""
    queries = embs.where(F.col("vec_id") < 8)
    cb = S.ivf_train_or_init(embs, "embedding", "vec_id", 16, 0)
    path = str(tmp_path / "ivf_idx")
    S.ann_index_save(spark, path, cb)
    loaded = S.ann_index_load(spark, path)
    assert loaded == cb  # exact float round-trip through parquet
    inline = sorted(
        map(tuple, S.ivf_topk(embs, queries, k=5, n_cells=16, n_probe=4).collect())
    )
    saved = sorted(
        map(tuple, S.ivf_topk(embs, queries, k=5, n_probe=4, codebook=loaded).collect())
    )
    assert inline == saved


def test_survivors_drops_higher_ids(spark, docs):
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.5)
    kept = D.survivors(docs, pairs)
    losers = {r.id2 for r in pairs.collect()}
    kept_ids = {r.doc_id for r in kept.collect()}
    assert kept_ids.isdisjoint(losers)
    assert kept_ids | losers == {r.doc_id for r in docs.collect()}


def test_multimodal_schema_and_determinism(spark, docs):
    out = M.extract_features(M.attach_binary_payload(docs.limit(20)))
    rows = {r.doc_id: r for r in out.collect()}
    assert set(out.columns) == {
        "doc_id", "mime", "n_bytes", "content_md5", "sig", "bytes_per_char", "feat_mod"
    }
    again = {r.doc_id: r for r in M.extract_features(M.attach_binary_payload(docs.limit(20))).collect()}
    assert rows.keys() == again.keys()
    for k in rows:
        assert rows[k] == again[k]  # deterministic featurizer


def test_multimodal_decode_probes_then_stubs():
    # decode_image import-tries PIL then cv2; in this build neither exists
    # (probed round 4), so formats outside the library-free branches
    # (BMP, 8-bit PNG, baseline JPEG) must raise the documented
    # NotImplementedError. On an image with either library, the same call
    # decodes for real.
    try:
        import PIL  # type: ignore  # noqa: F401

        has_media = True
    except ImportError:
        try:
            import cv2  # type: ignore  # noqa: F401

            has_media = True
        except ImportError:
            has_media = False
    if has_media:
        pytest.skip("media library present: decode_image is live, not a stub")
    # a JPEG the library-free branch explicitly does NOT cover
    # (arithmetic-coded SOF9; baseline SOF0 AND progressive SOF2 decode
    # for real since round 12, as does every legal PNG layout)
    import struct as _struct

    arithmetic = (
        b"\xff\xd8"
        + b"\xff\xc9"
        + _struct.pack(">H", 11)
        + _struct.pack(">BHHB", 8, 8, 8, 1)
        + b"\x01\x11\x00"
        + b"\xff\xd9"
    )
    with pytest.raises(NotImplementedError):
        M.decode_image(arithmetic)


def test_exact_dedup_group_sizes_sum_to_corpus(docs):
    out = D.exact_dedup(docs)
    total = out.agg(F.sum("group_size")).collect()[0][0]
    assert total == docs.count()


def test_pack_sequences_invariants(spark, docs):
    """Packing invariants: bins fill contiguously (a bin's docs span a
    contiguous token range), no bin starts beyond its budget boundary, and
    the assignment is invariant under input repartitioning."""
    from bonobo_sqlalchemy_spark.functions import text as T
    from bonobo_sqlalchemy_spark.operators.packing import pack_sequences

    d = docs.select("doc_id", T.n_tokens("text").alias("n_tokens"))
    packed = pack_sequences(d, budget=256, n_shards=4)
    rows = packed.collect()
    assert len(rows) == d.count()
    for r in rows:
        # the doc STARTS inside its bin's budget window
        assert r.bin * 256 <= r.bin_offset < (r.bin + 1) * 256

    again = {
        (r.doc_id, r.shard, r.bin, r.bin_offset)
        for r in pack_sequences(d.repartition(13), budget=256, n_shards=4).collect()
    }
    assert again == {(r.doc_id, r.shard, r.bin, r.bin_offset) for r in rows}


def test_kmeans_codebook_improves_objective_and_stays_small(spark, embs):
    """Spherical k-means trainer: Lloyd rounds must not worsen the
    objective (mean best-centroid dot), the codebook stays k x dim on the
    driver, and training is deterministic (fixed init, no RNG)."""
    import bonobo_sqlalchemy_spark.functions.vectors as V
    from pyspark.sql import functions as F

    def objective(cb):
        dots = V.matrix_dots(embs, "embedding", "vec_id", cb, out_id="cid")
        return dots.select(F.expr("array_max(dots)").alias("m")).agg(
            F.avg("m")
        ).collect()[0][0]

    init = S.kmeans_codebook(embs, k=8, iters=0)  # normalized init, untrained
    trained = S.kmeans_codebook(embs, k=8, iters=3)
    assert len(trained) == 8 and all(len(c) == 64 for c in trained)
    assert objective(trained) >= objective(init) - 1e-9
    # deterministic retrain
    again = S.kmeans_codebook(embs, k=8, iters=3)
    assert trained == again
    # trained codebook plugs into the ANN path end-to-end
    queries = embs.where(F.col("vec_id") < 4)
    out = S.ivf_topk(embs, queries, k=3, n_cells=8, n_probe=3, train_iters=2)
    assert out.groupBy("query_id").count().agg(F.min("count")).collect()[0][0] == 3


def test_winnow_includes_final_window(spark, tmp_path):
    """MOSS winnowing guarantee: EVERY 4-gram window contributes a
    fingerprint, including the tail one. A 6-word doc has exactly four
    3-grams, i.e. exactly one 4-gram window — the off-by-one this pins
    dropped that window and the whole doc."""
    import pandas as pd

    from bonobo_sqlalchemy_spark.oracle import compare_query

    sf = str(tmp_path)
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "one two three four five six",               # exactly 1 window
                "alpha beta gamma delta epsilon zeta eta",   # 2 windows
                "too short",                                 # < 3 words: dropped
            ],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": [27, 39, 9],
        }
    ).to_parquet(f"{sf}/documents.parquet", index=False)

    res = compare_query(spark, "z_text_winnow", sf)
    assert res.ok, str(res)

    from bonobo_sqlalchemy_spark.queries import REGISTRY

    rows = {r.doc_id: r for r in REGISTRY["z_text_winnow"].spark(spark, sf).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].n_fingerprints == 1
    assert 1 <= rows[2].n_fingerprints <= 2


def _make_bmp24(pixels, top_down=False):
    """Hand-construct an uncompressed 24-bit BMP from an (h, w, 3) RGB
    array — pure bytes, no image library (VERDICT r4 item 7)."""
    import struct

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    px = bytearray()
    rows = arr if top_down else arr[::-1]  # file stores bottom-up unless -h
    for row in rows:
        px += bytes(row[:, ::-1].reshape(-1))  # RGB -> BGR
        px += b"\x00" * (stride - w * 3)
    header_h = -h if top_down else h
    file_sz = 54 + len(px)
    return (
        b"BM"
        + struct.pack("<IHHI", file_sz, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, header_h, 1, 24, 0, len(px), 2835, 2835, 0, 0)
        + bytes(px)
    )


def test_multimodal_bmp_decodes_library_free():
    """The decode path is NOT fully stubbed even without PIL/cv2: a
    hand-built uncompressed BMP round-trips bit-exactly through
    decode_image, padding and bottom-up row order included."""
    import numpy as np

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)  # w=3 -> row padding
    for top_down in (False, True):
        got = M.decode_image(_make_bmp24(img, top_down=top_down))
        assert isinstance(got, np.ndarray) and got.shape == (2, 3, 3)
        assert (got == img).all(), f"pixel mismatch (top_down={top_down})"


def test_multimodal_bmp_rejects_malformed():
    import struct

    with pytest.raises(ValueError, match="truncated"):
        M.decode_image(b"BM" + b"\x00" * 20)  # shorter than the headers
    # valid headers claiming 8bpp -> explicit unsupported-format signal
    hdr = (
        b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 8, 0, 4, 0, 0, 0, 0)
    )
    with pytest.raises(NotImplementedError, match="24bpp"):
        M.decode_image(hdr + b"\x00" * 4)


def test_containment_catches_doc_inside_doc_jaccard_misses(spark):
    """The defining case for containment dedup: a short doc fully embedded
    in a much longer one scores 1.0 on containment but far below any usable
    Jaccard threshold."""
    short = "alpha beta gamma delta epsilon zeta"
    long_ = short + " " + " ".join(f"filler{i} pad{i} extra{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, short, "en"), (2, long_, "en"), (3, "totally different words here now", "en")],
        "doc_id bigint, text string, lang string",
    )
    cont = D.containment_pairs(df, threshold=0.9).collect()
    assert [(r.id1, r.id2) for r in cont] == [(1, 2)]
    assert cont[0].containment == 1.0
    jac = D.ngram_jaccard_pairs(df, threshold=0.3).collect()
    assert jac == []  # union dominated by the long doc


def test_containment_symmetric_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "one two three four", "en"), (2, "one two three four", "en")],
        "doc_id bigint, text string, lang string",
    )
    [r] = D.containment_pairs(df, threshold=0.5).collect()
    assert (r.id1, r.id2, r.containment) == (1, 2, 1.0)


def test_profile_columns_exact_and_approx(spark):
    from bonobo_sqlalchemy_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "b")], "id bigint, s string"
    )
    rows = {r.col_name: r for r in profile_columns(df, ["id", "s"]).collect()}
    assert rows["id"].n_rows == 4 and rows["id"].n_null == 0
    assert rows["id"].n_distinct == 4
    assert (rows["id"].min_value, rows["id"].max_value) == ("1", "4")
    assert rows["s"].n_null == 1 and rows["s"].n_distinct == 2
    assert (rows["s"].min_value, rows["s"].max_value) == ("a", "b")
    # HLL path: same shape, distincts within rsd ballpark on tiny input
    approx = {r.col_name: r for r in profile_columns(df, ["id", "s"], exact=False).collect()}
    assert approx["id"].n_distinct == 4 and approx["s"].n_distinct == 2


def test_pq_topk_recall_vs_bruteforce(spark, embs):
    """PQ-ADC + exact re-rank must recover most true neighbors (approximate
    by design; the refine-factor re-rank recovers ADC misrankings)."""
    queries = embs.where(F.col("vec_id") < 8)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(embs, queries, k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in S.pq_topk(embs, queries, k=5, m=8, ksub=16, train_iters=1).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.6, f"PQ recall {recall:.2f} below floor"
    # output contract: exactly 5 ranked neighbors per query, no self-matches
    out = S.pq_topk(embs, queries, k=5, m=8, ksub=16, train_iters=1)
    per_q = {r[0]: r[1] for r in out.groupBy("query_id").count().collect()}
    assert all(v == 5 for v in per_q.values()) and len(per_q) == 8
    assert out.where(F.col("query_id") == F.col("neighbor_id")).count() == 0


def test_pq_encode_compresses_and_reconstructs(spark, embs):
    """Codes are m small ints; codebook reconstruction error must be well
    below the vector norm (the codes genuinely carry the vector's shape),
    and training must not increase quantization error."""
    import numpy as np

    sub = embs.limit(64)
    vecs = {r.vec_id: np.asarray(r.embedding, float) for r in sub.collect()}

    def recon_err(iters):
        books = S.pq_codebooks(sub, m=8, ksub=16, iters=iters)
        B = np.asarray(books)
        codes = {
            r.vec_id: r.codes for r in S.pq_encode(sub, books).collect()
        }
        errs, norms = [], []
        for vid, v in vecs.items():
            rec = np.concatenate([B[s, codes[vid][s]] for s in range(8)])
            errs.append(np.linalg.norm(v - rec))
            norms.append(np.linalg.norm(v))
        return sum(errs) / sum(norms)

    e0, e2 = recon_err(0), recon_err(2)
    assert e0 < 1.0  # better than the zero-vector quantizer
    assert e2 <= e0 + 1e-9, f"Lloyd iterations worsened PQ error: {e0} -> {e2}"


def test_image_pipeline_real_end_to_end(spark):
    """The multimodal path runs for REAL in-container: synthesize BMP
    payloads (encode_bmp24), distribute them as binary columns, decode +
    resize + featurize through mapInPandas, and check the features against
    the known pixel content."""
    import numpy as np

    rng = np.random.default_rng(11)
    payloads = []
    want = {}
    for i in range(12):
        h, w = int(rng.integers(4, 24)), int(rng.integers(4, 24))
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        payloads.append((i, bytearray(M.encode_bmp24(img))))
        t = M.resize_nearest(img.astype(np.float64), 8, 8)
        want[i] = (h, w, t[:, :, 0].mean(), t[:, :, 1].mean(), t[:, :, 2].mean())
    df = spark.createDataFrame(payloads, "doc_id bigint, payload binary").repartition(4)
    got = {r.doc_id: r for r in M.extract_image_features(df).collect()}
    assert set(got) == set(want)
    for i, (h, w, mr, mg, mb) in want.items():
        r = got[i]
        assert (r.height, r.width) == (h, w)
        assert abs(r.mean_r - mr) < 1e-9 and abs(r.mean_g - mg) < 1e-9 and abs(r.mean_b - mb) < 1e-9


def test_bmp_encode_decode_roundtrip():
    import numpy as np

    rng = np.random.default_rng(3)
    for h, w in ((1, 1), (5, 3), (16, 16)):
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        back = M.decode_image(M.encode_bmp24(img))
        assert (np.asarray(back) == img).all()


def test_png_encode_decode_roundtrip():
    """A genuinely COMPRESSED format decodes library-free in-container:
    zlib IDAT inflate + scanline unfiltering, exact pixel round-trip."""
    import numpy as np

    rng = np.random.default_rng(7)
    for h, w in ((1, 1), (5, 3), (16, 16), (24, 7)):
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        payload = M.encode_png(img)
        assert payload[:8] == b"\x89PNG\r\n\x1a\n"
        assert len(payload) != 8 + 25 + 12 + h * (1 + w * 3)  # actually deflated
        back = M.decode_image(payload)
        assert (np.asarray(back) == img).all()


def _png_with_filters(img, filters):
    """Hand-build a PNG whose scanlines use the GIVEN filter types (our
    encoder always writes filter 0, so decode of filters 1-4 needs
    payloads filtered here, per RFC 2083 §6)."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(img, dtype=np.int32)
    h, w, c = arr.shape
    flat = arr.reshape(h, w * c)
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        f = filters[y % len(filters)]
        line = np.zeros(w * c, dtype=np.int32)
        for x in range(w * c):
            a = int(cur[x - c]) if x >= c else 0
            b = int(prev[x])
            cc = int(prev[x - c]) if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            line[x] = (int(cur[x]) - pred) & 0xFF
        raw += bytes([f]) + bytes(line.astype(np.uint8))
        prev = cur

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    color = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decodes_every_scanline_filter():
    import numpy as np

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(10, 6, 3), dtype=np.uint8)
    # each filter alone, then all five cycling through the scanlines
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        got = M.decode_image(_png_with_filters(img, filters))
        assert (np.asarray(got) == img).all(), f"filters={filters}"


def test_png_gray_and_rgba_normalize_to_rgb():
    import numpy as np

    rng = np.random.default_rng(17)
    gray = rng.integers(0, 256, size=(6, 4, 1), dtype=np.uint8)
    got = np.asarray(M.decode_image(_png_with_filters(gray, [0, 2])))
    assert got.shape == (6, 4, 3)
    assert (got == np.repeat(gray, 3, axis=2)).all()
    rgba = rng.integers(0, 256, size=(5, 5, 4), dtype=np.uint8)
    got = np.asarray(M.decode_image(_png_with_filters(rgba, [1, 4])))
    assert got.shape == (5, 5, 3)
    assert (got == rgba[:, :, :3]).all()


def test_image_pipeline_mixed_bmp_png_end_to_end(spark):
    """decode -> resize -> featurize over a MIXED batch of BMP and PNG
    payloads of the same pixel content: identical features, format-blind."""
    import numpy as np

    rng = np.random.default_rng(19)
    payloads = []
    for i in range(6):
        img = rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
        payloads.append((2 * i, bytearray(M.encode_bmp24(img))))
        payloads.append((2 * i + 1, bytearray(M.encode_png(img))))
    df = spark.createDataFrame(
        payloads, "doc_id bigint, payload binary"
    ).repartition(3)
    got = {r.doc_id: r for r in M.extract_image_features(df).collect()}
    assert len(got) == 12
    for i in range(6):
        bmp, png = got[2 * i], got[2 * i + 1]
        assert (bmp.height, bmp.width) == (png.height, png.width) == (9, 11)
        assert bmp.mean_r == png.mean_r
        assert bmp.mean_g == png.mean_g
        assert bmp.mean_b == png.mean_b


def test_profile_handles_quoted_column_names(spark):
    from bonobo_sqlalchemy_spark.operators.profile import profile_columns

    df = spark.range(3).selectExpr("id AS `it's`")
    rows = profile_columns(df, ["it's"]).collect()
    assert rows[0].col_name == "it's" and rows[0].n_rows == 3
    import pytest

    with pytest.raises(ValueError, match="backtick"):
        profile_columns(spark.range(1).selectExpr("id AS a"), ["a`b"])


def test_pq_codebooks_rejects_tiny_corpus_and_bad_dim(spark, embs):
    """Explicit ValueErrors (not a downstream np.asarray shape error, not a
    bare assert that vanishes under -O) for corpus < ksub and dim % m != 0."""
    import pytest

    with pytest.raises(ValueError, match="ksub"):
        S.pq_codebooks(embs.limit(5), m=8, ksub=16, iters=0)
    with pytest.raises(ValueError, match="divide evenly"):
        S.pq_codebooks(embs.limit(64), m=7, ksub=16, iters=0, dim=64)


def test_ivfpq_topk_recall_and_contract(spark, embs):
    """IVF-PQ must recover most true neighbors despite scanning only the
    probed cells' codes, and keep the top-k output contract."""
    queries = embs.where(F.col("vec_id") < 8)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(embs, queries, k=5).collect()
    }
    out = S.ivfpq_topk(
        embs, queries, k=5, n_cells=16, n_probe=6, m=8, ksub=16,
        coarse_iters=1, pq_iters=1,
    )
    rows = out.collect()
    got = {(r.query_id, r.neighbor_id) for r in rows}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.5, f"IVF-PQ recall {recall:.2f} below floor"
    per_q = {}
    for r in rows:
        per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
    assert all(v == 5 for v in per_q.values()) and len(per_q) == 8
    assert all(r.query_id != r.neighbor_id for r in rows)


def test_ivfpq_scans_fraction_of_pq_candidates(spark, embs):
    """The point of IVF-PQ vs PQ: the ADC scan touches ~n_probe/n_cells of
    the corpus codes per query. Measured on the same cell assignments the
    operator uses (corpus cell x query probe join), vs pq_topk's full scan
    (N codes per query)."""
    queries = embs.where(F.col("vec_id") < 8)
    n_corpus, n_q, n_cells, n_probe = embs.count(), 8, 16, 4
    codebook = S.ivf_train_or_init(embs, "embedding", "vec_id", n_cells, 1)
    corpus_cells, query_cells = S.ivf_cell_assignments(
        embs, queries, codebook, n_probe=n_probe
    )
    scanned = corpus_cells.join(query_cells, "cell").count()
    pq_scanned = n_corpus * n_q  # pq_topk ADC-scores every code per query
    frac = scanned / pq_scanned
    ideal = n_probe / n_cells
    # k-means cells are imbalanced on near-random data; allow 2x slack but
    # require a real reduction vs the full PQ scan.
    assert frac <= 2 * ideal, f"scanned fraction {frac:.3f} >> {ideal}"


def test_semantic_dedup_finds_planted_duplicates(spark, embs):
    """Planted near-identical vectors must surface as SemDeDup pairs with
    cosine ~1 (recall parity with the LSH near-dup path on true dups), and
    every emitted pair must genuinely clear the threshold."""
    base = embs.limit(100)
    planted = base.where(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.col("label"),
        # tiny deterministic perturbation: cosine stays ~0.9999
        F.expr("transform(embedding, x -> CAST(x * 1.001 AS FLOAT))").alias("embedding"),
    )
    corpus = base.select("vec_id", "label", "embedding").unionByName(planted)
    pairs = D.semantic_dedup_pairs(
        corpus, threshold=0.9, n_clusters=8, train_iters=1
    ).collect()
    got = {(r.id1, r.id2) for r in pairs}
    want = {(i, i + 10000) for i in range(5)}
    assert want <= got, f"missing planted dups: {want - got}"
    assert all(r.cosine >= 0.9 for r in pairs)
    # LSH near-dup parity on the same planted set
    lsh = {
        (r.id1, r.id2)
        for r in D.embedding_near_dup_pairs(
            corpus, block_col=None, threshold=0.9
        ).collect()
    }
    assert want <= lsh  # both paths agree on true duplicates


def test_boilerplate_strip_removes_shared_chunks(spark):
    """A 16-token chunk planted in several docs must be stripped from all of
    them; unique content survives verbatim (md5 of the normalized text)."""
    import hashlib

    boiler = " ".join(f"b{i}" for i in range(16))  # one exact chunk
    uniq = [" ".join(f"u{d}w{i}" for i in range(16)) for d in range(3)]
    rows = [(d, f"{boiler} {uniq[d]}") for d in range(3)] + [(99, uniq[0])]
    # doc 99 shares its chunk with doc 0's unique part -> both drop it
    # plus degenerate docs: null text and whitespace-only text must emit a
    # (0 kept, 0 dropped, '') row each — NOT phantom chunks from a -1 size,
    # and NOT a shared empty-string chunk counted as boilerplate.
    rows += [(100, None), (101, "   ")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in _boilerplate_on(docs).collect()}
    assert out[1].n_dropped == 1 and out[1].n_kept == 1
    assert out[1].clean_md5 == hashlib.md5(uniq[1].encode()).hexdigest()
    assert out[0].n_kept == 0 and out[0].n_dropped == 2  # boiler + shared-with-99
    assert out[0].clean_md5 == hashlib.md5(b"").hexdigest()
    assert out[99].n_kept == 0  # its only chunk is shared with doc 0
    for degenerate in (100, 101):
        assert out[degenerate].n_kept == 0 and out[degenerate].n_dropped == 0
        assert out[degenerate].clean_md5 == hashlib.md5(b"").hexdigest()


def _boilerplate_on(docs):
    """Apply z_text_boilerplate_strip's plan to an in-memory documents df."""
    import tempfile

    tmp = tempfile.mkdtemp()
    docs.select(
        "doc_id", "text",
        F.lit("en").alias("lang"), F.lit("src").alias("source"),
        F.length("text").alias("n_chars"),
    ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    from bonobo_sqlalchemy_spark.queries import REGISTRY

    return REGISTRY["z_text_boilerplate_strip"].spark(docs.sparkSession, tmp)


def test_semantic_survivors_keep_best_member(spark, embs):
    """Planted duplicate pairs: the survivor must be the higher-norm member
    of each component (quality-aware survivorship on the semantic path)."""
    from bonobo_sqlalchemy_spark.functions import vectors as V

    base = embs.limit(50)
    planted = base.where(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.col("label"),
        # scaled up: same direction (cosine ~1), LARGER norm -> must win
        F.expr("transform(embedding, x -> CAST(x * 2.0 AS FLOAT))").alias("embedding"),
    )
    corpus = base.select("vec_id", "label", "embedding").unionByName(planted)
    scored = corpus.select(
        "vec_id", "embedding", F.round(F.sqrt(V.norm_sq("embedding")), 9).alias("nrm")
    )
    from bonobo_sqlalchemy_spark.operators.dedup import best_survivors, semantic_dedup_pairs

    pairs = semantic_dedup_pairs(scored, threshold=0.9, n_clusters=4, train_iters=1)
    surv = best_survivors(
        scored.select("vec_id", "nrm"), pairs, score_col="nrm", id_col="vec_id"
    )
    by_comp = {r.component: r for r in surv.collect()}
    for i in range(3):
        comp = by_comp.get(i)  # component label = min member id = original id
        assert comp is not None and comp.survivor_id == i + 10000, (i, comp)


def test_wav_encode_decode_roundtrip():
    """The library-free RIFF codec must round-trip PCM bit-exactly, walk
    past unknown chunks, and reject non-PCM payloads."""
    import struct

    import numpy as np
    import pytest

    from bonobo_sqlalchemy_spark.operators import multimodal as M

    samples = (np.sin(np.linspace(0, 20 * np.pi, 800)) * 20000).astype(np.int16)
    wav = M.encode_wav_pcm16(samples, sample_rate=8000)
    x, sr, nch = M.decode_wav(wav)
    assert sr == 8000 and nch == 1 and x.shape == (800, 1)
    assert np.array_equal((x[:, 0] * 32768).astype(np.int16), samples)

    # an extra LIST chunk between fmt and data must be skipped (incl. the
    # odd-size word-alignment pad)
    body = b"INFOxyz"  # 7 bytes -> odd, exercises the alignment skip
    extra = wav[:36] + b"LIST" + struct.pack("<I", len(body)) + body + b"\x00" + wav[36:]
    x2, sr2, _ = M.decode_wav(extra)
    assert sr2 == 8000 and np.array_equal(x2, x)

    # stereo interleave: (n, 2) with channels separated
    st = np.empty(200, dtype=np.int16)
    st[0::2] = 1000   # L
    st[1::2] = -2000  # R
    xs, _, nchs = M.decode_wav(M.encode_wav_pcm16(st, n_channels=2))
    assert nchs == 2 and xs.shape == (100, 2)
    assert np.allclose(xs[:, 0], 1000 / 32768) and np.allclose(xs[:, 1], -2000 / 32768)

    with pytest.raises(ValueError):
        M.decode_wav(b"RIFX" + wav[4:])
    # float-format WAV (format tag 3) refuses with NotImplementedError
    bad = bytearray(wav)
    struct.pack_into("<H", bad, 20, 3)
    with pytest.raises(NotImplementedError):
        M.decode_wav(bytes(bad))


def test_audio_features_zcr_on_sine(spark):
    """extract_audio_features on a synthesized sine: zcr ~ 2*f/sr (two sign
    changes per period), rms ~ A/sqrt(2) — the semantics the all-positive
    oracle waveform can't exercise."""
    import numpy as np

    from bonobo_sqlalchemy_spark.operators import multimodal as M

    sr, f, amp = 8000, 100, 16000
    t = np.arange(sr)  # 1 second
    samples = (np.sin(2 * np.pi * f * t / sr) * amp).astype(np.int16)
    wav = M.encode_wav_pcm16(samples, sample_rate=sr)
    df = spark.createDataFrame([(1, bytearray(wav))], "doc_id bigint, payload binary")
    r = M.extract_audio_features(df).collect()[0]
    assert r.sample_rate == sr and r.n_samples == sr and r.duration_ms == 1000
    assert abs(r.zcr - 2 * f / sr) < 0.005, r.zcr
    assert abs(r.rms - amp / 32768 / 2**0.5) < 0.01, r.rms
    assert abs(r.peak - amp / 32768) < 0.01, r.peak


def test_corpus_diff_all_four_statuses(spark):
    from bonobo_sqlalchemy_spark.operators.profile import corpus_diff

    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id bigint, text string"
    )
    new = spark.createDataFrame(
        [(1, "alpha"), (2, "beta EDITED"), (4, "delta")], "doc_id bigint, text string"
    )
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_corpus_diff_null_text_is_presence_not_status(spark):
    """A present document with NULL text must classify by PRESENCE (its
    fingerprint is NULL but the row exists): NULL->NULL is unchanged,
    NULL->text and text->NULL are changed — never added/removed."""
    from bonobo_sqlalchemy_spark.operators.profile import corpus_diff

    schema = "doc_id bigint, text string"
    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "x"), (4, "gone-null")], schema
    )
    new = spark.createDataFrame(
        [(1, None), (2, "now-text"), (3, "x"), (5, None)], schema
    )
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert got == {
        1: "unchanged",   # NULL -> NULL
        2: "changed",     # NULL -> text
        3: "unchanged",
        4: "removed",     # truly absent from new
        5: "added",       # truly new, even with NULL text
    }


def test_audio_features_zero_sample_wav_no_nan(spark):
    """A zero-sample WAV (empty doc) must yield rms/zcr/peak of 0.0, not
    NaN."""
    import math

    from bonobo_sqlalchemy_spark.operators.multimodal import (
        attach_wav_payload,
        extract_audio_features,
    )

    docs = spark.createDataFrame([(1, "")], "doc_id bigint, text string")
    feats = extract_audio_features(attach_wav_payload(docs)).collect()
    assert len(feats) == 1
    r = feats[0]
    assert r.n_samples == 0
    for v in (r.rms, r.zcr, r.peak):
        assert v == 0.0 and not math.isnan(v)


# ---------------------------------------------------------------------------
# Exact substring-duplication spans (round 8)
# ---------------------------------------------------------------------------

def _span_docs(spark):
    shared = " ".join(f"dup{i}" for i in range(10))  # 10-token shared run
    rows = [
        (1, f"alpha beta {shared} gamma delta epsilon zeta eta theta"),
        (2, f"one two three {shared} four five six seven eight nine"),
        (3, "unique tokens only nothing repeated here at all today friend"),
        # doc 4 repeats an 8-gram WITHIN itself (self-repetition counts)
        (4, "r0 r1 r2 r3 r4 r5 r6 r7 mid r0 r1 r2 r3 r4 r5 r6 r7 tail"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_duplicate_spans_planted_cross_doc(spark):
    out = {
        r["doc_id"]: r
        for r in D.duplicate_span_stats(_span_docs(spark), gram=8).collect()
    }
    # docs 1 and 2 share a 10-token run -> exactly one merged span of 10
    for d in (1, 2):
        assert out[d]["n_dup_spans"] == 1
        assert out[d]["dup_tokens"] == 10
    # doc 3 has no duplicated 8-gram anywhere
    assert out[3]["n_dup_spans"] == 0 and out[3]["dup_tokens"] == 0
    assert out[3]["dup_ratio"] == 0.0


def test_duplicate_spans_self_repetition_counts(spark):
    out = {
        r["doc_id"]: r
        for r in D.duplicate_span_stats(_span_docs(spark), gram=8).collect()
    }
    # doc 4: the 8-gram r0..r7 occurs twice within one document ->
    # two merged spans (positions 0-7 and 9-16), 16 duplicated tokens
    assert out[4]["n_dup_spans"] == 2
    assert out[4]["dup_tokens"] == 16


def test_duplicate_spans_adjacent_windows_merge(spark):
    # 12 consecutive duplicated tokens -> 5 overlapping 8-gram windows
    # must merge into ONE span covering all 12 tokens, not 5 spans
    run = " ".join(f"m{i}" for i in range(12))
    df = spark.createDataFrame(
        [(1, f"{run} x1 x2 x3"), (2, f"y1 y2 {run} y3")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in D.duplicate_span_stats(df, gram=8).collect()}
    assert out[1]["n_dup_spans"] == 1 and out[1]["dup_tokens"] == 12
    assert out[2]["n_dup_spans"] == 1 and out[2]["dup_tokens"] == 12


def test_duplicate_spans_short_docs_never_pair(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], ["doc_id", "text"]
    )
    out = D.duplicate_span_stats(df, gram=8).collect()
    assert all(r["n_dup_spans"] == 0 for r in out)
    assert all(r["n_tokens"] == 3 for r in out)


def test_duplicate_spans_null_and_empty_docs(spark):
    """Round-9 null/empty contract: NULL / empty / whitespace-only text
    must yield a fully-defined row (n_tokens=0, zero spans, ratio 0.0) —
    previously NULL text left n_tokens NULL next to coalesced-zero span
    counts, breaking downstream dup_ratio thresholds for such docs."""
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "  "), (4, "a b c")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in D.duplicate_span_stats(df, gram=8).collect()}
    assert set(out) == {1, 2, 3, 4}
    for i in (1, 2, 3):
        r = out[i]
        assert r["n_tokens"] == 0 and r["n_dup_spans"] == 0
        assert r["dup_tokens"] == 0 and r["dup_ratio"] == 0.0
    assert out[4]["n_tokens"] == 3


def test_duplicate_spans_partitioning_invariant(spark, docs):
    a = D.duplicate_span_stats(docs, gram=8)
    b = D.duplicate_span_stats(docs.repartition(13), gram=8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pq_index_save_load_probe_identical(spark, embs, tmp_path):
    """Full IVF-PQ index persistence: coarse + subspace codebooks
    round-trip exactly and the saved-index probe reproduces the inline
    ivfpq_topk result row for row."""
    queries = embs.where(F.col("vec_id") < 8)
    cb = S.ivf_train_or_init(embs, "embedding", "vec_id", 16, 1)
    books = S.pq_codebooks(embs, "embedding", "vec_id", m=8, ksub=16, iters=1)
    path = str(tmp_path / "pq_idx")
    S.pq_index_save(spark, path, cb, books)
    cb2, books2 = S.pq_index_load(spark, path)
    assert cb2 == cb and books2 == books
    inline = sorted(
        map(
            tuple,
            S.ivfpq_topk(
                embs, queries, k=5, n_cells=16, n_probe=6, m=8, ksub=16,
                coarse_iters=1, pq_iters=1,
            ).collect(),
        )
    )
    saved = sorted(
        map(
            tuple,
            S.ivfpq_topk(
                embs, queries, k=5, n_probe=6, m=8, ksub=16,
                codebook=cb2, books=books2,
            ).collect(),
        )
    )
    assert inline == saved


def _png_chunks(*chunks):
    import struct
    import zlib

    out = b"\x89PNG\r\n\x1a\n"
    for ctype, data in chunks:
        out += (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )
    return out


def test_png_16bit_decodes_high_byte():
    """16-bit gray + RGB PNGs decode library-free, scaling samples to 8
    bits by the high byte (PIL's convention); filters run at the raw-byte
    bpp (6 bytes for 16-bit RGB)."""
    import struct
    import zlib

    import numpy as np

    # 2x2 16-bit grayscale: values chosen so high bytes are distinct
    vals = np.array([[0x1234, 0xFF00], [0x0080, 0xABCD]], dtype=">u2")
    raw = b"".join(b"\x00" + row.tobytes() for row in vals)
    payload = _png_chunks(
        (b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)),
        (b"IDAT", zlib.compress(raw)),
        (b"IEND", b""),
    )
    img = np.asarray(M.decode_image(payload))
    assert img.shape == (2, 2, 3)
    assert img[:, :, 0].tolist() == [[0x12, 0xFF], [0x00, 0xAB]]

    # 1x2 16-bit RGB with a Sub-filtered scanline (bpp = 6 bytes)
    row = np.array([[0x0100, 0x8000, 0x4142], [0x0200, 0x9000, 0x5152]], dtype=">u2")
    plain = row.tobytes()
    sub = bytearray(plain)
    for i in range(6, len(sub)):
        sub[i] = (sub[i] - sub[i - 6]) & 0xFF
    payload = _png_chunks(
        (b"IHDR", struct.pack(">IIBBBBB", 2, 1, 16, 2, 0, 0, 0)),
        (b"IDAT", zlib.compress(b"\x01" + bytes(sub))),
        (b"IEND", b""),
    )
    img = np.asarray(M.decode_image(payload))
    assert img[0].tolist() == [[0x01, 0x80, 0x41], [0x02, 0x90, 0x51]]


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_png_paletted_decodes_all_index_depths(depth):
    """Color-type-3 PNGs decode via PLTE at every legal index depth;
    sub-byte indices unpack MSB-first within each scanline byte."""
    import struct
    import zlib

    import numpy as np

    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0]], dtype=np.uint8
    )
    w = 4 if depth > 1 else 2
    idx = np.arange(w) % min(4, 1 << depth)
    # pack one scanline of indices at the given depth, MSB-first
    bits = np.concatenate(
        [((v >> np.arange(depth - 1, -1, -1)) & 1) for v in idx]
    ).astype(np.uint8)
    pad = (-len(bits)) % 8
    bits = np.concatenate([bits, np.zeros(pad, dtype=np.uint8)])
    scan = np.packbits(bits).tobytes()
    payload = _png_chunks(
        (b"IHDR", struct.pack(">IIBBBBB", w, 1, depth, 3, 0, 0, 0)),
        (b"PLTE", palette.tobytes()),
        (b"IDAT", zlib.compress(b"\x00" + scan)),
        (b"IEND", b""),
    )
    img = np.asarray(M.decode_image(payload))
    assert img.shape == (1, w, 3)
    assert (img[0] == palette[idx]).all()


def test_png_paletted_bad_index_raises():
    import struct
    import zlib

    payload = _png_chunks(
        (b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)),
        (b"PLTE", bytes([1, 2, 3])),  # one entry; index 5 is out of range
        (b"IDAT", zlib.compress(b"\x00\x05")),
        (b"IEND", b""),
    )
    with pytest.raises(ValueError, match="palette index"):
        M.decode_image(payload)


def _adam7_idat(img):
    """Pack an (h, w, c) uint8 array as Adam7-interlaced filter-0 scanline
    data (the reference construction the decoder must invert)."""
    import numpy as np

    h, w = img.shape[:2]
    passes = [
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ]
    out = bytearray()
    for x0, y0, dx, dy in passes:
        sub = img[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for row in sub:
            out += b"\x00" + np.ascontiguousarray(row).tobytes()
    return bytes(out)


def test_png_adam7_interlaced_decodes():
    """Adam7-interlaced PNGs decode library-free and agree exactly with
    the non-interlaced decode of the same pixels — odd dimensions included
    (passes with empty sub-images must be skipped, not read)."""
    import struct
    import zlib

    import numpy as np

    rng = np.random.default_rng(5)
    for h, w in [(8, 8), (7, 5), (1, 9), (3, 1)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        laced = _png_chunks(
            (b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)),
            (b"IDAT", zlib.compress(_adam7_idat(img))),
            (b"IEND", b""),
        )
        got = np.asarray(M.decode_image(laced))
        assert got.shape == (h, w, 3), (h, w)
        assert (got == img).all(), (h, w)


def test_png_adam7_interlaced_gray_and_paletted():
    import struct
    import zlib

    import numpy as np

    # grayscale 6x6 gradient
    g = (np.arange(36, dtype=np.uint8) * 7).reshape(6, 6)
    laced = _png_chunks(
        (b"IHDR", struct.pack(">IIBBBBB", 6, 6, 8, 0, 0, 0, 1)),
        (b"IDAT", zlib.compress(_adam7_idat(g[:, :, None]))),
        (b"IEND", b""),
    )
    got = np.asarray(M.decode_image(laced))
    assert (got[:, :, 0] == g).all() and (got[:, :, 2] == g).all()

    # paletted 5x5 (8-bit indices)
    palette = np.array([[9, 8, 7], [1, 2, 3], [200, 100, 50]], dtype=np.uint8)
    idx = (np.arange(25, dtype=np.uint8) % 3).reshape(5, 5)
    laced = _png_chunks(
        (b"IHDR", struct.pack(">IIBBBBB", 5, 5, 8, 3, 0, 0, 1)),
        (b"PLTE", palette.tobytes()),
        (b"IDAT", zlib.compress(_adam7_idat(idx[:, :, None]))),
        (b"IEND", b""),
    )
    got = np.asarray(M.decode_image(laced))
    assert (got == palette[idx]).all()


def test_png_sub8bit_grayscale_scales_to_full_range():
    """1/2/4-bit grayscale PNGs decode with indices scaled so the max
    level maps to 255 exactly (PIL's convention) — with this, every legal
    PNG layout decodes library-free."""
    import struct
    import zlib

    import numpy as np

    # 1-bit checkerboard
    bits = np.array([[1, 0, 1, 0], [0, 1, 0, 1]], dtype=np.uint8)
    raw = b""
    for row in bits:
        raw += b"\x00" + np.packbits(
            np.concatenate([row, np.zeros(4, np.uint8)])
        ).tobytes()
    p = _png_chunks(
        (b"IHDR", struct.pack(">IIBBBBB", 4, 2, 1, 0, 0, 0, 0)),
        (b"IDAT", zlib.compress(raw)),
        (b"IEND", b""),
    )
    img = np.asarray(M.decode_image(p))
    assert img[:, :, 0].tolist() == [[255, 0, 255, 0], [0, 255, 0, 255]]

    # 4-bit gradient: 0, 5, 10, 15 -> 0, 85, 170, 255
    p = _png_chunks(
        (b"IHDR", struct.pack(">IIBBBBB", 4, 1, 4, 0, 0, 0, 0)),
        (b"IDAT", zlib.compress(b"\x00" + bytes([0x05, 0xAF]))),
        (b"IEND", b""),
    )
    img = np.asarray(M.decode_image(p))
    assert img[0, :, 0].tolist() == [0, 85, 170, 255]


# ---------------------------------------------------------------------------
# Round 15: clustered-regime guard on the simhash auto-banding default
# ---------------------------------------------------------------------------


def _sig_frame(spark, sigs):
    to_signed = lambda v: v - (1 << 64) if v >= (1 << 63) else v
    return spark.createDataFrame(
        [(i, 1, to_signed(s)) for i, s in enumerate(sigs)],
        "id long, blk int, sig long",
    )


def test_simhash_probe_uniform_signatures_ratio_near_one(spark):
    """Uniformly-random 64-bit signatures must measure ~the uniform model's
    predicted collision mass (ratio well under the guard threshold), so the
    occupancy rule keeps its wide-key pick on diverse corpora."""
    import random

    rnd = random.Random(11)
    sigs = [rnd.getrandbits(64) for _ in range(2000)]
    measured, predicted = D.simhash_clustered_probe(
        _sig_frame(spark, sigs), max_hamming=8, n_blocks=10
    )
    assert predicted > 100  # the model expects real chance mass at k=10
    assert measured < 2.0 * predicted  # nowhere near the 4x guard


def test_simhash_probe_clustered_signatures_ratio_blows_past_guard(spark):
    """Near-dup-dense signatures (50 copies of each base, <=2 bits flipped)
    collide in every band regardless of key width — measured mass must
    exceed the uniform prediction by far more than the 4x guard ratio."""
    import random

    rnd = random.Random(13)
    sigs = []
    for _ in range(40):
        base = rnd.getrandbits(64)
        for _ in range(50):
            s = base
            for _ in range(rnd.randrange(3)):
                s ^= 1 << rnd.randrange(64)
            sigs.append(s)
    measured, predicted = D.simhash_clustered_probe(
        _sig_frame(spark, sigs), max_hamming=8, n_blocks=10
    )
    assert measured > 10 * max(predicted, 32.0)


def test_simhash_guard_falls_back_to_classic_banding_on_dense_corpus(
    docs, caplog
):
    """End-to-end wiring: on the near-dup-dense driver fixture, forcing the
    occupancy rule past classic banding (target_occupancy=1) must trip the
    sampled probe, log the decision, and fall back to k = d+1 — with the
    pair set untouched (banding moves cost, never values)."""
    import logging

    with caplog.at_level(
        logging.INFO, logger="bonobo_sqlalchemy_spark.operators.dedup"
    ):
        guarded = {
            (r.id1, r.id2, r.hamming)
            for r in D.simhash_pairs(
                docs, max_hamming=8, target_occupancy=1
            ).collect()
        }
    assert any("clustered regime detected" in m for m in caplog.messages)
    classic = {
        (r.id1, r.id2, r.hamming)
        for r in D.simhash_pairs(docs, max_hamming=8, n_blocks=9).collect()
    }
    assert guarded == classic and guarded
