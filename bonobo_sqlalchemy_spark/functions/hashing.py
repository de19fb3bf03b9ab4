"""Hash-sketch functions: MinHash signatures, LSH bands, SimHash.

xxhash64 (Spark built-in, JVM-side) supplies the base 64-bit hashes; the
signature arithmetic is all higher-order array functions — no UDFs. These
sketches are engine-internal (no DuckDB equivalent), so queries built on
them are rows-only checked by design.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MERSENNE_P = (1 << 61) - 1


def _perm_params(k: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for k universal-hash permutations."""
    state = seed
    out = []
    for _ in range(k):
        state = (6364136223846793005 * state + 1442695040888963407) % (1 << 63)
        # keep a, b < 2^31 so a*h + b < 2^62 stays inside int64 (ANSI-safe)
        a = ((state | 1) % ((1 << 31) - 1)) or 1
        state = (6364136223846793005 * state + 1442695040888963407) % (1 << 63)
        b = state % (1 << 31)
        out.append((a, b))
    return out


def minhash_signature(shingles: str | Column, k: int = 32, seed: int = 7) -> Column:
    """k-permutation MinHash signature over a (distinct) shingle array.

    h_i(s) = (a_i * xxhash64(s) + b_i) mod (2^61-1); signature element i is
    the min over the document's shingles. Arithmetic stays in longs — the
    modulus keeps products in range (hash folded to 31 bits first).
    """
    c = F.col(shingles) if isinstance(shingles, str) else shingles
    base = F.transform(c, lambda s: F.abs(F.xxhash64(s)) % F.lit(1 << 31))
    elems = []
    for a, b in _perm_params(k, seed):
        elems.append(
            F.array_min(
                F.transform(base, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(_MERSENNE_P))
            )
        )
    return F.array(*elems)


def lsh_band_keys(signature: Column, bands: int, rows: int) -> Column:
    """Split a MinHash signature into band-bucket keys: array of
    'band_idx:hash(slice)' strings. Docs sharing any band key are
    candidate pairs (the standard banding technique)."""
    keys = []
    for b in range(bands):
        band_slice = F.slice(signature, b * rows + 1, rows)
        keys.append(
            F.concat_ws(
                ":", F.lit(str(b)), F.xxhash64(F.concat_ws(",", *[
                    F.element_at(band_slice, i + 1).cast("string") for i in range(rows)
                ])).cast("string")
            )
        )
    return F.array(*keys)


def simhash64(tokens: str | Column) -> Column:
    """64-bit SimHash over a token array: per-bit majority vote of token
    hashes, expressed as bit-extraction + aggregate sums (all JVM-side)."""
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    hashes = F.transform(c, lambda t: F.xxhash64(t))
    acc = F.lit(0).cast("bigint")
    result = acc
    for bit in range(64):
        # sum of +1/-1 votes for this bit across tokens
        votes = F.aggregate(
            hashes,
            F.lit(0).cast("bigint"),
            lambda a, h: a
            + F.when(F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                F.lit(-1)
            ),
        )
        # shiftleft wraps at bit 63 (sign bit) instead of overflowing a literal
        result = result + F.when(
            votes > 0, F.shiftleft(F.lit(1).cast("bigint"), bit)
        ).otherwise(F.lit(0))
    return result


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))
