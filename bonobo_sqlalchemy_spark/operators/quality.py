"""Learned document-quality scoring: hashed n-gram features + logistic
regression, trained with distributed gradient aggregation.

The heuristic `functions.text.quality_score` (length/punct/stopword ratios)
is what earlier rounds shipped; real pipelines train a fastText-style
linear classifier (CCNet, LLaMA/GPT-3 quality filters) because learned
n-gram weights generalize where hand ratios don't. This module is that
classifier, Spark-first:

- **Features**: hashed bag of word unigrams + bigrams (`xxhash64 % D`,
  binary presence, plus a constant bias bucket). Extraction is pure
  codegen — `split`/`transform`/`explode`/`distinct`, no Python in the
  per-token path — and materializes once as a slim ``(id, bucket)`` frame
  reused by every iteration (cached by the trainer).
- **Training**: full-batch gradient descent on L2-regularized logistic
  loss. Per iteration: margins = features ⋈ broadcast(weights) → per-doc
  hash-agg; residuals join labels; gradient = per-bucket hash-agg
  (D-sized result). ONLY the D-vector of gradients reaches the driver —
  the same driver-holds-the-model shape as `similarity.kmeans_codebook`.
  Deterministic: zero init, fixed iteration count and learning rate, and
  feature hashing is content-derived (partitioning-invariant). Gradient
  sums are IEEE doubles so the last bits can vary with aggregation order;
  scores are rounded well above that noise floor.
- **Weak labels**: the standard bootstrap — the heuristic's confident tails
  (``quality_score >= hi`` → 1, ``<= lo`` → 0, middle band excluded) label
  the training set; the model then scores EVERY document, including the
  band the heuristic can't call. Callers with curated labels pass their
  own label column instead.

Scale: one corpus-sized feature extraction (reused), then per-iteration
shuffles keyed on doc id and bucket id (D buckets — never skewed beyond
hash balance). Nothing corpus-sized ever reaches the driver.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..functions import text as T

#: bias term rides as a dedicated bucket so the whole model is one vector
BIAS = 0


def hashed_ngram_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 1024,
) -> DataFrame:
    """``(id, bucket)`` binary feature rows: hashed word unigrams + bigrams.

    Buckets are ``1..n_features`` (0 is the bias, added here so every doc
    — even an empty one — has at least the bias row).

    Bucket hash is the repo's md5 convention (first 8 hex chars as an
    int) rather than ``xxhash64`` — migrated in round 12, the same move
    round 9 made for SemDeDup's sub-bucket hash, so any SQL engine
    computes the identical feature rows and the trained model becomes
    oracle-reproducible (``z_text_quality_model``'s unrolled-GD oracle).
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    # zip_with pads the shorter side with null; concat propagates the null
    # and the filter drops it — so bigrams are exactly the n-1 adjacent pairs.
    grams = F.concat(
        toks,
        F.filter(
            F.zip_with(
                toks,
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
            lambda g: g.isNotNull(),
        ),
    )
    buckets = F.array_union(
        F.array(F.lit(BIAS)),
        F.transform(
            grams,
            lambda g: (
                F.conv(F.substring(F.md5(g.cast("binary")), 1, 8), 16, 10)
                .cast("bigint")
                % n_features
                + 1
            ).cast("int"),
        ),
    )
    return docs.select(
        F.col(id_col).alias("id"), F.explode(buckets).alias("bucket")
    )


def train_quality_model(
    labeled: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "label",
    n_features: int = 1024,
    iters: int = 8,
    lr: float = 2.0,
    reg: float = 1e-4,
) -> list[float]:
    """Train the LR weight vector; returns ``n_features + 1`` floats
    (index 0 = bias). ``labeled`` needs ``label_col`` in {0, 1}.

    Full-batch GD: with binary features and L2 loss the objective is
    convex; fixed ``iters``/``lr`` keep training deterministic (no RNG
    anywhere — init is zeros, hashing is content-derived).
    """
    spark = labeled.sparkSession
    feats = hashed_ngram_features(labeled, text_col, id_col, n_features)
    feats = feats.localCheckpoint()  # extract once; every iteration reuses
    lbl = labeled.select(
        F.col(id_col).alias("id"), F.col(label_col).cast("double").alias("y")
    )
    n = lbl.count()
    w = [0.0] * (n_features + 1)
    for _ in range(max(1, iters)):
        wdf = spark.createDataFrame(
            [(i, wi) for i, wi in enumerate(w) if wi != 0.0] or [(BIAS, 0.0)],
            "bucket int, w double",
        )
        margins = (
            feats.join(F.broadcast(wdf), "bucket", "left")
            .groupBy("id")
            .agg(F.sum(F.coalesce("w", F.lit(0.0))).alias("margin"))
        )
        resid = margins.join(lbl, "id").select(
            "id",
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin"))) - F.col("y")).alias("r"),
        )
        grad_rows = (
            feats.join(resid, "id")
            .groupBy("bucket")
            .agg(F.sum("r").alias("g"))
            .collect()  # D-sized: the model gradient, never the data
        )
        grad = [0.0] * (n_features + 1)
        for row in grad_rows:
            grad[row.bucket] = row.g / n
        w = [
            wi - lr * (gi + (reg * wi if i != BIAS else 0.0))
            for i, (wi, gi) in enumerate(zip(w, grad))
        ]
    return w


def score_quality(
    docs: DataFrame,
    weights: list[float],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "q_prob",
    digits: int = 6,
) -> DataFrame:
    """``(id, q_prob)``: sigmoid of the hashed-feature margin under
    ``weights``. The weight vector compiles into a broadcast join — scoring
    is the same two hash-aggs as one training margin pass, all codegen."""
    spark = docs.sparkSession
    n_features = len(weights) - 1
    feats = hashed_ngram_features(docs, text_col, id_col, n_features)
    wdf = spark.createDataFrame(
        [(i, wi) for i, wi in enumerate(weights) if wi != 0.0] or [(BIAS, 0.0)],
        "bucket int, w double",
    )
    return (
        feats.join(F.broadcast(wdf), "bucket", "left")
        .groupBy("id")
        .agg(F.sum(F.coalesce("w", F.lit(0.0))).alias("margin"))
        .select(
            F.col("id").alias(id_col),
            F.round(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin"))), digits
            ).alias(out_col),
        )
    )


def quality_model_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hi: float = 0.75,
    lo: float = 0.45,
    n_features: int = 1024,
    iters: int = 8,
) -> DataFrame:
    """End-to-end weak-label bootstrap: heuristic tails label the training
    set, the learned model scores every document. Returns
    ``(id, heuristic, label, q_prob)`` (label NULL for the excluded band).
    """
    base = docs.select(
        F.col(id_col), F.col(text_col), T.quality_score(F.col(text_col)).alias("heuristic")
    )
    labeled = base.withColumn(
        "label",
        F.when(F.col("heuristic") >= hi, 1.0)
        .when(F.col("heuristic") <= lo, 0.0),
    )
    train = labeled.where(F.col("label").isNotNull())
    w = train_quality_model(
        train, text_col, id_col, "label", n_features=n_features, iters=iters
    )
    scores = score_quality(docs, w, text_col, id_col)
    return labeled.select(id_col, "heuristic", "label").join(scores, id_col)


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_stopwords: int = 2,
    min_alpha_ratio: float = 0.8,
    max_dup_bigram_ratio: float = 0.2,
) -> DataFrame:
    """Gopher-style heuristic quality rule bundle (Rae et al. 2021,
    *Scaling Language Models: ... Gopher*, Appendix A): the standard
    pre-filter a curation run applies BEFORE expensive dedup/selection.
    One row per document with each rule's verdict and the combined
    ``keep`` (all rules pass):

    - ``ok_n_words``: word count in [min_words, max_words];
    - ``ok_mean_word_len``: mean word length in [min, max];
    - ``ok_stopwords``: >= min_stopwords hits on Gopher's 8-stopword list
      (the / be / to / of / and / that / have / with);
    - ``ok_alpha``: >= min_alpha_ratio of words contain a letter;
    - ``ok_dup_bigram``: repeated-bigram fraction (1 - distinct/total)
      <= max_dup_bigram_ratio — the cheap repetition screen.

    Scale shape (round 9, was posexplode + repartition + lead window):
    every metric is DOCUMENT-LOCAL, so the whole bundle is per-row array
    expressions — ``size`` / ``aggregate`` / ``filter`` /
    ``array_distinct`` over the split token array — evaluated inside
    whole-stage codegen in a single scan with ZERO exchanges (plan-gated
    in tests/test_plans.py::test_gopher_rules_zero_shuffle). The previous
    shape shuffled every token of the corpus to compute per-document
    facts; this one never leaves the scan's partitioning. Every metric is
    integer counts or a single IEEE division compared to a threshold, so
    the bundle stays value-exact against the DuckDB oracle — boundary
    docs land on the same side in both engines because both compare the
    identical double.

    Null/empty contract (round 9 — previously such docs silently vanished
    from the output): NULL or whitespace-only text yields a fully-defined
    row with ``n_words = 0``, ``n_stopwords = 0``, NULL
    ``mean_word_len``/``alpha_ratio`` (0/0 has no honest value),
    ``dup_bigram_ratio = 0.0``, ``ok_mean_word_len``/``ok_alpha`` false
    (an undefined ratio never passes a floor), and ``keep = false`` —
    every document in, exactly one verdict row out.
    """
    stop = ("the", "be", "to", "of", "and", "that", "have", "with")
    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    # '' splits to [''] (one empty token) — map to the empty array so
    # null/empty docs read n_words = 0, the strip_shared_chunks pattern
    w = F.when(F.length(t) == F.lit(0), F.array().cast("array<string>")).otherwise(
        F.split(t, " +")
    )
    base = df.select(F.col(id_col).alias("id"), w.alias("__w"))
    n = F.size("__w").cast("bigint")
    sumlen = F.aggregate(
        "__w", F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
    )
    n_stop = F.size(F.filter("__w", lambda x: x.isin(*stop))).cast("bigint")
    n_alpha = F.size(F.filter("__w", lambda x: x.rlike("[A-Za-z]"))).cast(
        "bigint"
    )
    # bigrams: pair token i with token i+1 over the first n-1 positions —
    # transform's 0-based index + 1-based element_at, no shuffle, no window
    heads = F.slice("__w", F.lit(1), F.greatest(n - 1, F.lit(0)).cast("int"))
    bigrams = F.transform(
        heads,
        lambda x, i: F.concat_ws(" ", x, F.element_at("__w", (i + 2).cast("int"))),
    )
    nb = F.greatest(n - 1, F.lit(0).cast("bigint"))
    db = F.size(F.array_distinct(bigrams)).cast("bigint")
    m = base.select(
        "id",
        n.alias("n_words"),
        sumlen.alias("__sumlen"),
        n_stop.alias("n_stopwords"),
        n_alpha.alias("__alpha"),
        nb.alias("__nb"),
        db.alias("__db"),
    )
    mean_wl = F.when(F.col("n_words") > 0, F.col("__sumlen") / F.col("n_words"))
    alpha_ratio = F.when(
        F.col("n_words") > 0, F.col("__alpha") / F.col("n_words")
    )
    dup_bg = F.when(
        F.col("__nb") > 0, F.lit(1.0) - F.col("__db") / F.col("__nb")
    ).otherwise(F.lit(0.0))
    out = m.select(
        F.col("id").alias(id_col),
        "n_words",
        F.round(mean_wl, 6).alias("mean_word_len"),
        "n_stopwords",
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(dup_bg, 6).alias("dup_bigram_ratio"),
        (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words),
        F.coalesce(
            (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len),
            F.lit(False),
        ),
        F.col("n_stopwords") >= min_stopwords,
        F.coalesce(alpha_ratio >= min_alpha_ratio, F.lit(False)),
        dup_bg <= max_dup_bigram_ratio,
    ).toDF(
        id_col,
        "n_words",
        "mean_word_len",
        "n_stopwords",
        "alpha_ratio",
        "dup_bigram_ratio",
        "ok_n_words",
        "ok_mean_word_len",
        "ok_stopwords",
        "ok_alpha",
        "ok_dup_bigram",
    )
    return out.withColumn(
        "keep",
        F.col("ok_n_words")
        & F.col("ok_mean_word_len")
        & F.col("ok_stopwords")
        & F.col("ok_alpha")
        & F.col("ok_dup_bigram"),
    )


def bigram_interpolated_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
) -> DataFrame:
    """CCNet-style LM fluency score, one order up from the unigram scorer:
    mean log2 probability of each document's tokens under an interpolated
    bigram model trained on the corpus itself,

        p(w_i | w_{i-1}) = lam * c(w_{i-1} w_i) / c(w_{i-1})
                         + (1 - lam) * c(w_i) / N.

    CCNet (Wenzek et al. 2019) filters crawl text by KenLM perplexity;
    this is the same signal class computed engine-side: a document full of
    token sequences the corpus has never seen scores low even when every
    individual token is common — exactly what the unigram score cannot
    see. Returns ``(id, n_scored, avg_log2p)`` where ``n_scored`` counts
    the positions with a predecessor (documents shorter than 2 tokens drop
    out: the bigram model has nothing to score).

    Interpolation (not backoff) keeps every term defined without
    discounting state, and because the model is trained on the scoring
    corpus itself, no bigram probability is ever zero: the bigram term's
    count table contains every pair the scorer will look up.

    Scale: count tables are vocabulary-sized hash aggregates (map-side
    partial — a pair seen 10^9 times is one row); the token stream
    shuffles on the gram keys to pick up its three counts (pair, context,
    target — AQE skew handling bounds hot tokens) and once more on doc id
    for the final mean. N rides as a 1-row broadcast (scalar-subquery
    shape, see tests/test_plans.py NO_CARTESIAN_EXEMPT). Per the
    determinism policy the mean is rounded to 1e-6, far above the ~1e-12
    float-reorder noise of summed log2 terms.
    """
    from pyspark.sql import Window as W

    # Exchange by id BEFORE the posexplode (r15): the lead window below
    # needs hashpartitioning(id) at any scale, so the exchange is not
    # optional — but placed ahead of the explode it ships raw text (one
    # row per doc) instead of the exploded token stream (one row per
    # token, measured 3.1 MB vs 0.9 MB at sf0.1), and the CPU-dense
    # explode then runs core-parallel after it instead of inside the
    # single scan task. Generate/Project preserve the partitioning, so
    # the window adds no second exchange.
    toks = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))
        .repartition("id")
        .select(
            "id",
            F.posexplode(F.split(F.trim(F.col("__t")), " +")).alias("pos", "tk"),
        )
    )
    paired = toks.withColumn(
        "nxt", F.lead("tk").over(W.partitionBy("id").orderBy("pos"))
    )
    uni = toks.groupBy("tk").agg(F.count(F.lit(1)).alias("c1"))
    total = uni.agg(F.sum("c1").alias("n_total"))
    bi = (
        paired.where(F.col("nxt").isNotNull())
        .groupBy("tk", "nxt")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    scored = (
        paired.where(F.col("nxt").isNotNull())
        .join(bi, ["tk", "nxt"])
        .join(uni.withColumnRenamed("c1", "c_ctx"), "tk")
        .join(
            uni.select(F.col("tk").alias("nxt"), F.col("c1").alias("c_tgt")),
            "nxt",
        )
        .join(F.broadcast(total))
    )
    p = F.lit(lam) * F.col("c2") / F.col("c_ctx") + F.lit(1.0 - lam) * F.col(
        "c_tgt"
    ) / F.col("n_total")
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_scored"),
        F.round(F.sum(F.log2(p)) / F.count(F.lit(1)), 6).alias("avg_log2p"),
    ).withColumnRenamed("id", id_col)


#: Output schema of the compression-ratio screen at the fixture default
#: (``id_col="doc_id"`` bigint); the real schema is built per-call from
#: the caller's actual id column so arbitrary id names/dtypes pass through.
COMPRESSION_RATIO_SCHEMA = (
    "doc_id bigint, n_bytes bigint, n_compressed bigint, compression_ratio double"
)


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """zlib compression ratio per document — the classic redundancy
    heuristic (highly compressible text is templated/repetitive
    boilerplate; near-incompressible "text" is often binary junk or
    encrypted spam). Crawl-curation pipelines band-pass on exactly this
    signal; it complements `gopher_rules`' duplicate-bigram gate by
    catching long-range repetition no fixed n-gram window sees.

    ``(id_col, n_bytes, n_compressed, compression_ratio)`` where ratio =
    ``n_bytes / n_compressed`` rounded 1e-6 (NULL text → 0-byte document,
    ratio 0.0 — screened, not dropped). The id column passes through
    UNTOUCHED under its own name and dtype (round 9 — previously the
    schema hardcoded ``doc_id bigint``, silently renaming the caller's
    column and int()-coercing string ids). zlib at a FIXED level is
    deterministic for a given library version, so results are stable
    across reruns and partitionings (asserted in tests) but NOT
    SQL-portable — no oracle engine ships zlib, hence the rows-only
    census entry with a pytest value check against the same library.

    Scale: this is the documented Python slow path done right — one
    Arrow-batched `mapInPandas` pass inheriting the scan's partitioning;
    no shuffle, no per-row UDF, payload text never leaves its partition.
    """
    from typing import Iterator

    id_field = df.select(id_col).schema.fields[0]
    out_schema = (
        StructType([id_field])
        .add("n_bytes", "long")
        .add("n_compressed", "long")
        .add("compression_ratio", "double")
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import zlib

        import pandas as pd

        for pdf in batches:
            n_bytes, n_comp, ratios = [], [], []
            for t in pdf[text_col]:
                raw = (t or "").encode("utf-8")
                nb = len(raw)
                nc = len(zlib.compress(raw, level)) if nb else 0
                n_bytes.append(nb)
                n_comp.append(nc)
                ratios.append(round(nb / nc, 6) if nc else 0.0)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],  # passthrough: name AND dtype kept
                    "n_bytes": n_bytes,
                    "n_compressed": n_comp,
                    "compression_ratio": ratios,
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)


def hot_cold_count_join(
    occurrences: DataFrame,
    counts: DataFrame,
    key: str,
    count_col: str,
    hot_df: int | None,
) -> DataFrame:
    """The canonical zipf-key lookup-join guard, shared by every
    occurrence→vocab-count join (`segment_quality_outliers`, the unigram
    LM scorer): vocab rows with ``count_col > hot_df`` join via BROADCAST
    (one row per DISTINCT hot key — by pigeonhole at most
    ``total_occurrences / hot_df`` of them), the tail takes the ordinary
    shuffle join whose per-key row volume is ≤ ``hot_df`` — no reducer
    ever receives every "the". Row-for-row equal to the plain inner join
    (the predicate partitions the vocab; proven in
    ``tests/test_scale.py``). ``hot_df=None`` disables the split."""
    if hot_df is None:
        return occurrences.join(counts, key)
    hot = counts.where(F.col(count_col) > hot_df)
    cold = counts.where(F.col(count_col) <= hot_df)
    return occurrences.join(F.broadcast(hot), key).unionByName(
        occurrences.join(cold, key)
    )


def segment_quality_outliers(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk: int = 16,
    hot_token_df: int | None = 100_000,
) -> DataFrame:
    """Segment-level fluency floor: score every ``chunk``-token window of
    a document under the corpus unigram LM and report, per document, the
    mean chunk score, the WORST chunk score, and the gap between them.

    Whole-document scorers (`bigram_interpolated_logprob`, the unigram LM
    in `queries/datapipe5.py::z_text_unigram_logprob`) average an embedded
    garbage block away: a 2 000-token page with 60 tokens of base64 noise
    still scores near-fluent overall. Chunking first and taking the MIN
    restores the signal — a large ``doc_lp - worst_lp`` gap flags exactly
    the "mostly fine, one bad segment" documents that substring-level
    curation (strip the block, keep the page) wants to see. The reference
    engine has no LM scoring at all (its transform surface is arbitrary
    Python rows, `/root/reference/bonobo_sqlalchemy/writers.py:33`); this
    is part of the mandated training-data extension surface.

    Output: ``(id_col, n_chunks bigint, doc_lp, worst_lp, gap)`` with the
    three doubles rounded at 1e-6 per the determinism policy (float-sum
    reorder noise is ~1e-12). ``gap`` is computed from the UNROUNDED
    aggregates, then rounded once — not as a difference of rounded values.

    Scale shape: identical to the whole-doc unigram scorer plus one extra
    keyed aggregation — (1) corpus vocab count (map-side-combined, so the
    token shuffle carries one partial row per (partition, token), not one
    per occurrence), (2) token→count lookup join, (3) per-(doc, chunk)
    hash-agg, (4) per-doc hash-agg over the tiny chunk table. The 1-row
    corpus total rides a broadcast. No Python in the per-token path —
    split/posexplode/log2 are all codegen.

    **Skew guard (``hot_token_df``).** The lookup join's key is the raw
    token, and natural text is zipfian: at 100 TB every occurrence of
    "the" would hash to ONE shuffle partition of the join. Unlike the
    dedup self-joins there is no quadratic candidate blowup to cap (each
    occurrence matches exactly one vocab row, so join output is linear),
    and dropping hot tokens would change the LM — the right guard is the
    canonical hot-key bypass: vocab rows with ``c > hot_token_df`` split
    off and join via BROADCAST (one row per DISTINCT hot token; by
    pigeonhole at most ``total_occurrences / hot_token_df`` tokens can be
    that hot, so choosing ``hot_token_df >= corpus_tokens / 10**6`` caps
    the hot slice at a million rows regardless of corpus; in practice the
    zipf head is thousands of tokens), while the tail takes the ordinary
    shuffle join whose per-key row volume is now ≤ ``hot_token_df`` — no
    single reducer ever receives every "the". The hot/cold union is
    row-for-row the plain join (proven exactly in ``tests/test_scale.py::
    test_segment_outliers_hot_token_bypass_exact``); per-chunk float sums
    may reassociate (~1e-12), absorbed by the 6dp rounding policy.
    ``None`` disables the split.
    """
    toks = df.select(
        id_col,
        F.posexplode(F.split(F.trim(F.col(text_col)), " +")).alias("pos", "tok"),
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("total"))
    chunked = toks.withColumn("chunk_id", F.floor(F.col("pos") / F.lit(chunk)))
    joined = hot_cold_count_join(chunked, counts, "tok", "c", hot_token_df)
    chunk_scores = (
        joined.join(F.broadcast(total))
        .groupBy(id_col, "chunk_id")
        .agg(
            (
                F.sum(F.log2(F.col("c") / F.col("total"))) / F.count(F.lit(1))
            ).alias("clp")
        )
    )
    return chunk_scores.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.round(F.avg("clp"), 6).alias("doc_lp"),
        F.round(F.min("clp"), 6).alias("worst_lp"),
        F.round(F.avg("clp") - F.min("clp"), 6).alias("gap"),
    )
