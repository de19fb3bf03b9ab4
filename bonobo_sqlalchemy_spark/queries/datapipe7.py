"""Round-7 data-selection queries: DSIR importance weighting, BM25
retrieval, and filter-threshold sweeps (`operators/selection.py`), plus
the streaming HLL distinct sketch (`streaming/sketches.py`).

Reference scope note: none of these exist in the reference engine
(bonobo-sqlalchemy, 571 LoC of SQLAlchemy plumbing); they belong to the
driver-mandated training-data extension surface (SURVEY §2.4): choosing
WHAT to keep (DSIR), finding what a query needs (BM25), and picking every
filter's operating point (threshold sweep) are the selection steps a
100 TB curation run executes after cleaning and dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.selection import bm25_topk, dsir_log_weights, threshold_sweep
from ..sources.files import load_table
from .base import query, run_to_completion

_DSIR_CTES = """
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), ' +')) AS t
      FROM documents
    ), tb AS (
      SELECT doc_id,
             CAST(CAST(('0x' || substr(md5(t), 1, 4)) AS INT) % 1024 AS BIGINT) AS b
      FROM tok WHERE t <> ''
    ), flag AS (
      SELECT doc_id, (lang = 'en') AS is_t FROM documents
    ), cnt AS (
      SELECT b, COUNT(*) AS c_raw,
             SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS c_tgt
      FROM tb JOIN flag USING (doc_id) GROUP BY b
    ), tot AS (
      SELECT SUM(c_raw) AS n_raw, SUM(c_tgt) AS n_tgt FROM cnt
    ), ratio AS (
      SELECT b,
             ln((c_tgt + 0.5) / ((SELECT n_tgt FROM tot) + 0.5 * 1024))
           - ln((c_raw + 0.5) / ((SELECT n_raw FROM tot) + 0.5 * 1024)) AS lr
      FROM cnt
    ), weights AS (
      SELECT doc_id, round(SUM(lr), 6) AS dsir_logw
      FROM tb JOIN ratio USING (b) GROUP BY doc_id
    )
"""


@query(
    "z_text_dsir_weights",
    oracle=_DSIR_CTES + "SELECT doc_id, dsir_logw FROM weights",
    tags=("text", "selection", "ml"),
    bench=True,
)
def z_text_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023) importance log-weights: score every document
    by how much its hashed-unigram bucket distribution looks like the
    TARGET corpus (here: the English subset) relative to the raw pool —
    the data-selection signal used to build domain-matched pretraining
    mixes. One token shuffle, a 1024-row broadcast ratio table, one
    per-doc sum; value-exact vs the oracle because bucket hashing is the
    engine-portable md5 split and the final sum rounds to 6dp."""
    docs = load_table(spark, sf_dir, "documents")
    return dsir_log_weights(
        docs, F.col("lang") == "en", n_buckets=1024, smoothing=0.5
    )


@query(
    "z_text_dsir_select",
    oracle=_DSIR_CTES
    + """
    SELECT doc_id, dsir_logw FROM weights
    ORDER BY dsir_logw DESC, doc_id LIMIT 100
    """,
    tags=("text", "selection", "ml"),
)
def z_text_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection: the top-100 documents by importance weight
    (deterministic rank variant; ties break on doc_id). The global sort is
    a TakeOrderedAndProject over the doc-id-sized weight table — never a
    full sort of the corpus."""
    from ..operators.selection import dsir_select

    docs = load_table(spark, sf_dir, "documents")
    return dsir_select(docs, F.col("lang") == "en", k=100)


@query(
    "z_text_bm25_topk",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), ' +')) AS t
      FROM documents
    ), tok2 AS (
      SELECT doc_id, t FROM tok WHERE t <> ''
    ), dl AS (
      SELECT doc_id, COUNT(*) AS dl FROM tok2 GROUP BY doc_id
    ), stats AS (
      SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl
    ), tf AS (
      SELECT doc_id, t, COUNT(*) AS tf
      FROM tok2 WHERE t IN ('spark', 'sort', 'window')
      GROUP BY doc_id, t
    ), dft AS (
      SELECT t, COUNT(*) AS df FROM tf GROUP BY t
    )
    SELECT tf.doc_id,
           round(SUM(
             ln(1.0 + ((SELECT n_docs FROM stats) - df + 0.5) / (df + 0.5))
             * tf * (1.2 + 1)
             / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / (SELECT avgdl FROM stats)))
           ), 6) AS bm25
    FROM tf JOIN dft USING (t) JOIN dl USING (doc_id)
    GROUP BY tf.doc_id
    ORDER BY bm25 DESC, doc_id LIMIT 10
    """,
    tags=("text", "retrieval"),
)
def z_text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for the bag-of-terms query {spark, sort, window}: the
    classic retrieval scorer a curation pipeline uses for targeted corpus
    search (find documents about X) and contamination triage. Tokens are
    filtered to the broadcast term list BEFORE any shuffle, so the tf
    aggregation carries query-term hits only; df/avgdl are term- and
    scalar-sized."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, ["spark", "sort", "window"], k=10)


@query(
    "z_pipeline_curate",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), ' +')) AS t
      FROM documents
    ), vocab AS (
      SELECT t, COUNT(*) AS c FROM tok GROUP BY t
    ), vtot AS (
      SELECT SUM(c) AS n FROM vocab
    ), fluency AS (
      SELECT doc_id,
             round(SUM(ln(c / (SELECT n FROM vtot))) / COUNT(*), 6) AS s
      FROM tok JOIN vocab USING (t)
      GROUP BY doc_id
    ), tb AS (
      SELECT doc_id,
             CAST(CAST(('0x' || substr(md5(t), 1, 4)) AS INT) % 1024 AS BIGINT) AS b
      FROM tok WHERE t <> ''
    ), cnt AS (
      SELECT b, COUNT(*) AS c_raw,
             SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_tgt
      FROM tb JOIN documents USING (doc_id) GROUP BY b
    ), ctot AS (
      SELECT SUM(c_raw) AS n_raw, SUM(c_tgt) AS n_tgt FROM cnt
    ), ratio AS (
      SELECT b,
             ln((c_tgt + 0.5) / ((SELECT n_tgt FROM ctot) + 0.5 * 1024))
           - ln((c_raw + 0.5) / ((SELECT n_raw FROM ctot) + 0.5 * 1024)) AS lr
      FROM cnt
    ), dsir AS (
      SELECT doc_id, round(SUM(lr), 6) AS w
      FROM tb JOIN ratio USING (b) GROUP BY doc_id
    ), dedup AS (
      SELECT doc_id,
             doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS dedup_keep
      FROM documents
    ), fb AS (
      SELECT d.lang,
             quantile_cont(f.s, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs
      FROM fluency f JOIN documents d USING (doc_id) GROUP BY d.lang
    ), wb AS (
      SELECT d.lang,
             quantile_cont(w.w, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs
      FROM dsir w JOIN documents d USING (doc_id) GROUP BY d.lang
    ), deciled AS (
      SELECT d.doc_id, d.lang, dd.dedup_keep,
             1 + len(list_filter(fb.qs, q -> f.s < q)) AS quality_decile,
             1 + len(list_filter(wb.qs, q -> w.w < q)) AS dsir_decile
      FROM documents d
      JOIN dedup dd USING (doc_id)
      JOIN fluency f USING (doc_id)
      JOIN dsir w USING (doc_id)
      JOIN fb ON fb.lang = d.lang
      JOIN wb ON wb.lang = d.lang
    )
    SELECT doc_id, lang, dedup_keep, quality_decile, dsir_decile,
           dedup_keep AND quality_decile <= 8 AND dsir_decile <= 6 AS keep
    FROM deciled
    """,
    tags=("text", "selection", "dedup", "quality", "pipeline"),
    bench=True,
)
def z_pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation decision table — the composition a 100 TB
    run actually executes, with every stage value-exact against the
    oracle: exact-dedup survivorship (min-id per content fingerprint),
    per-language fluency deciles (unigram LM), per-language DSIR deciles
    (target = English subset), and the final keep verdict
    ``dedup AND fluency_decile <= 8 AND dsir_decile <= 6``.

    Plan shape: ONE token shuffle feeds both the fluency score and the
    DSIR buckets; dedup is one fingerprint window (partitioned by the
    content hash — data-sized KEY CARDINALITY, so no straggler); deciles
    come from `operators.selection.grouped_decile` — per-language exact
    percentile boundaries broadcast back as range comparisons, so no task
    ever sorts a whole language (the former per-language ntile window was
    the repo's one real 100x scale-killer: one language is routinely >50%
    of a crawl). Ties share a decile. Per-doc signals join on doc_id —
    already the clustering key of every stage's output."""
    from pyspark.sql import Window as W

    from ..operators.scale import scalar_attach
    from ..operators.selection import grouped_deciles

    docs = load_table(spark, sf_dir, "documents")
    # materialize the token stream ONCE (r15): it feeds the vocabulary
    # aggregation AND the per-document fluency join, and without the
    # checkpoint each consumer re-scanned + re-exploded the corpus (the
    # final executed plan carried 8 documents scans; OPTIMIZATION_r15.md).
    # Cluster-scale analog: persist the tokenized frame for the multi-pass
    # scoring stage, the same discipline as the minhash shingle frame.
    from ..partitioning import rebalance_narrow_input

    # rebalance before the explode so the checkpoint materialization runs
    # core-parallel instead of inside the single scan task (no-op at scale)
    toks = (
        rebalance_narrow_input(docs.select("doc_id", "text"), "doc_id")
        .select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim("text")), " +")).alias("tok"),
        )
        .localCheckpoint()
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    fluency = (
        scalar_attach(toks.join(vocab, "tok"), vocab.agg(F.sum("c").alias("n")))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.log(F.col("c") / F.col("n"))) / F.count(F.lit(1)), 6
            ).alias("s")
        )
    )
    dsir = dsir_log_weights(docs, F.col("lang") == "en", n_buckets=1024)
    dedup = docs.select(
        "doc_id",
        "lang",
        (
            F.col("doc_id")
            == F.min("doc_id").over(W.partitionBy(F.md5(F.col("text"))))
        ).alias("dedup_keep"),
    )
    # doc-cardinality signal table, TWO readers inside grouped_deciles
    # (the boundary aggregation + the decile attach join): checkpoint so
    # the dedup-window/fluency/DSIR subtrees execute once, not twice (r15)
    base = dedup.join(fluency, "doc_id").join(dsir, "doc_id").localCheckpoint()
    out = grouped_deciles(
        base,
        [("s", "quality_decile"), ("dsir_logw", "dsir_decile")],
        "lang",
    ).select("doc_id", "lang", "dedup_keep", "quality_decile", "dsir_decile")
    return out.withColumn(
        "keep",
        F.col("dedup_keep")
        & (F.col("quality_decile") <= 8)
        & (F.col("dsir_decile") <= 6),
    )


@query(
    "z_multimodal_audio",
    oracle="""
    WITH ch AS (
      SELECT doc_id, unnest(string_split_regex(text, '')) AS c FROM documents
    )
    SELECT doc_id,
           16000 AS sample_rate,
           1 AS n_channels,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(floor(COUNT(*) * 1000.0 / 16000) AS BIGINT) AS duration_ms,
           round(sqrt(AVG(pow(ascii(c) * 128.0 / 32768.0, 2))), 6) AS rms,
           0.0 AS zcr,
           round(MAX(ascii(c)) * 128.0 / 32768.0, 6) AS peak
    FROM ch GROUP BY doc_id
    """,
    tags=("multimodal", "audio"),
)
def z_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode -> featurize: every document synthesizes a genuine
    RIFF/WAVE payload (PCM samples = ascii(char)*128 over the text — a
    deterministic, engine-portable waveform), the WAV is parsed back by the
    library-free chunk-walking decoder (operators/multimodal.py::decode_wav),
    and RMS / zero-crossing rate / peak are computed from the decoded
    samples. The oracle recomputes the same statistics straight from the
    characters, so the whole decode path is value-exact — audio now has a
    genuinely-executed decode branch in this container, like BMP does for
    images (zcr is identically 0 here because the synthesized samples are
    all positive; sign-change semantics are covered by unit tests with
    synthesized sine waves)."""
    from ..operators.multimodal import attach_wav_payload, extract_audio_features

    docs = load_table(spark, sf_dir, "documents")
    return extract_audio_features(attach_wav_payload(docs))


@query(
    "z_corpus_diff",
    oracle="""
    WITH old AS (
      SELECT doc_id, md5(text) AS fp, TRUE AS pres FROM documents
    ), new AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 10 = 0 THEN text || ' v2' ELSE text END) AS fp,
             TRUE AS pres
      FROM documents WHERE doc_id % 17 <> 0
    )
    SELECT CASE WHEN o.pres IS NULL THEN 'added'
                WHEN n.pres IS NULL THEN 'removed'
                WHEN o.fp IS DISTINCT FROM n.fp THEN 'changed'
                ELSE 'unchanged' END AS status,
           COUNT(*) AS n_docs
    FROM old o FULL OUTER JOIN new n USING (doc_id)
    GROUP BY 1
    """,
    tags=("profile", "incremental"),
)
def z_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (operators/profile.py::corpus_diff): the first step of
    a recurring crawl refresh — classify every document added / removed /
    changed / unchanged by content fingerprint so downstream stages touch
    only the delta. The 'new' snapshot here is a deterministic transform
    of the same corpus (every 17th doc dropped, every 10th edited), so
    the status counts are value-exact against the oracle's full-outer
    fingerprint join."""
    from ..operators.profile import corpus_diff

    docs = load_table(spark, sf_dir, "documents")
    new = docs.where(F.col("doc_id") % 17 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    return (
        corpus_diff(docs, new)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "z_profile_outliers",
    oracle="""
    WITH med AS (
      SELECT source, quantile_cont(n_chars, 0.5) AS med
      FROM documents GROUP BY source
    ), dev AS (
      SELECT d.doc_id, d.source, d.n_chars, m.med,
             abs(d.n_chars - m.med) AS adev
      FROM documents d JOIN med m USING (source)
    ), mad AS (
      SELECT source, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY source
    )
    SELECT doc_id, source,
           CAST(n_chars AS BIGINT) AS n_chars,
           round((dev.n_chars - dev.med) / (1.4826 * mad.mad), 6) AS robust_z
    FROM dev JOIN mad USING (source)
    WHERE mad.mad > 0
      AND abs((dev.n_chars - dev.med) / (1.4826 * mad.mad)) > 2.5
    """,
    tags=("profile", "quality"),
)
def z_profile_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-source outlier detection: median/MAD z-scores over
    document lengths, flagging |z| > 2.5 — the distribution-free screen a
    curation pipeline runs per source before trusting its length stats
    (mean/stddev are themselves corrupted by the outliers being hunted).

    Exact percentiles here (`F.percentile` = DuckDB `quantile_cont`, the
    parity proven in relational2); at 100 TB the same query swaps in
    `percentile_approx` per source — exact group percentiles buffer the
    group in memory, the approx sketch is bounded. Guarded against
    MAD = 0 (degenerate constant-length sources drop out rather than
    dividing by zero)."""
    docs = load_table(spark, sf_dir, "documents")
    med = docs.groupBy("source").agg(
        F.percentile("n_chars", F.lit(0.5)).alias("med")
    )
    dev = docs.select("doc_id", "source", "n_chars").join(med, "source").withColumn(
        "adev", F.abs(F.col("n_chars") - F.col("med"))
    )
    mad = dev.groupBy("source").agg(F.percentile("adev", F.lit(0.5)).alias("mad"))
    z = (F.col("n_chars") - F.col("med")) / (1.4826 * F.col("mad"))
    return (
        dev.join(mad, "source")
        .where((F.col("mad") > 0) & (F.abs(z) > 2.5))
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.round(z, 6).alias("robust_z"),
        )
    )


@query(
    "z_export_curriculum",
    oracle="""
    WITH b AS (
      SELECT quantile_cont(n_chars, 0.25) AS q1,
             quantile_cont(n_chars, 0.50) AS q2,
             quantile_cont(n_chars, 0.75) AS q3
      FROM documents
    )
    SELECT CAST(CASE WHEN n_chars >= q3 THEN 3
                     WHEN n_chars >= q2 THEN 2
                     WHEN n_chars >= q1 THEN 1
                     ELSE 0 END AS BIGINT) AS shard,
           COUNT(*) AS n_rows,
           CAST(SUM(n_chars) AS BIGINT) AS n_tokens
    FROM documents, b
    GROUP BY 1
    """,
    tags=("export", "sink", "ml"),
)
def z_export_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-shard manifest aggregates: RANGE sharding over a score
    column (here document length as the difficulty proxy) via exact
    quantile boundaries — shard 0 holds the shortest docs, shard 3 the
    longest, so a loader replaying shards in order trains easy-to-hard.
    The boundary math (`operators/export.py::curriculum_shard_expr`) is
    value-exact against the oracle's quantile_cont CASE ladder; the full
    write + persisted-shard verification path is covered in
    tests/test_export.py."""
    from ..operators.export import curriculum_shard_expr, shard_manifest

    docs = load_table(spark, sf_dir, "documents")
    shard, _ = curriculum_shard_expr(docs, "n_chars", 4)
    return shard_manifest(
        docs.withColumn("shard", shard),
        order_col="doc_id",
        token_col="n_chars",
        n_shards=4,
        shard_col="shard",
    ).select("shard", "n_rows", "n_tokens")


@query(
    "z_export_incremental",
    oracle="""
    WITH updated AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN n_chars + 3 ELSE n_chars END
               AS n_chars
      FROM documents WHERE doc_id % 17 <> 0
    )
    SELECT CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                AS INT) % 8 AS BIGINT) AS shard,
           COUNT(*) AS n_rows,
           CAST(SUM(n_chars) AS BIGINT) AS n_tokens
    FROM updated
    GROUP BY 1
    """,
    tags=("export", "incremental", "sink"),
)
def z_export_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental shard maintenance END-TO-END, oracle-checked: export
    the corpus, apply the corpus-diff convention's delta (every 17th doc
    deleted, every 10th edited — ' v2' appended, so n_chars grows by 3)
    through update_training_shards (only affected shards rewrite), read
    the maintained layout back, and emit per-shard row/token aggregates.
    The oracle computes the same aggregates directly from the updated
    corpus definition — so the value-exact match proves the incremental
    path converges to the from-scratch state (the per-file
    not-rewritten property is pinned in tests/test_export.py).

    The scratch export is deleted before returning: the 8-row aggregate
    is materialized driver-side (localCheckpoint-sized, not data-sized)
    so repeated benchmark invocations leak no disk."""
    import shutil
    import tempfile

    from ..operators.export import (
        shard_manifest,
        update_training_shards,
        write_training_shards,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = tempfile.mkdtemp()
    path = base + "/shards"
    try:
        write_training_shards(
            docs, path, order_col="doc_id", token_col="n_chars", n_shards=8
        )
        edits = (
            docs.where((F.col("doc_id") % 10 == 0) & (F.col("doc_id") % 17 != 0))
            .withColumn("text", F.concat(F.col("text"), F.lit(" v2")))
            .withColumn("n_chars", F.col("n_chars") + 3)
        )
        # delete set stays a DataFrame end-to-end (round 9): the operator's
        # DataFrame overload anti-joins it distributively — nothing
        # corpus-proportional ever materializes on the driver
        deletes = docs.where(F.col("doc_id") % 17 == 0).select("doc_id")
        update_training_shards(spark, path, upserts=edits, delete_ids=deletes)
        data = spark.read.parquet(path)
        out = shard_manifest(
            data, order_col="doc_id", token_col="n_chars", n_shards=8,
            shard_col="shard",
        ).select("shard", "n_rows", "n_tokens")
        # bounded-collect: n_shards (=8) aggregate rows, freed with the tmpdir
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@query(
    "z_stream_bottomk_sample",
    oracle="""
    SELECT CAST(event_id AS VARCHAR) AS key,
           md5(CAST(event_id AS VARCHAR)) AS h,
           CAST(value AS DOUBLE) AS val
    FROM events
    ORDER BY h, key LIMIT 32
    """,
    tags=("streaming", "sketch", "sampling"),
)
def z_stream_bottomk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming uniform sample with bounded state: the bottom-k
    (hash-smallest) sketch keeps k=32 keys per shard ever, survives any
    stream length, and — unlike an RNG reservoir — equals the batch
    ``ORDER BY md5(key) LIMIT k`` bit-for-bit, which is why this
    streaming query has a VALUE-EXACT oracle (the only sketch here that
    does). Mergeable: the global sample is the k smallest of the shard
    samples' union."""
    from ..streaming.sketches import bottomk_sample_stream, final_bottomk
    from ..streaming.windows import read_events_stream

    ev = read_events_stream(spark, f"{sf_dir}/events.parquet")
    sk = bottomk_sample_stream(
        ev, key_col="event_id", k=32, n_shards=4, value_col="value"
    )
    name = "z_stream_bottomk_tbl"
    q = (
        sk.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    return final_bottomk(spark.table(name), k=32)


@query(
    "z_split_decontaminated",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), ' +'), x -> x <> '') AS w
      FROM documents
    ), base AS (
      SELECT doc_id,
             CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                       AS INT) % 100 < 90
                  THEN 'train' ELSE 'val' END AS split_base
      FROM documents
    ), g AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w) - 6),
                                   i -> array_to_string(w[i:i+7], ' '))) AS gram
      FROM d WHERE len(w) >= 8
    ), train_grams AS (
      SELECT DISTINCT gram FROM g JOIN base USING (doc_id)
      WHERE split_base = 'train'
    ), leaky AS (
      SELECT DISTINCT g.doc_id
      FROM g JOIN base USING (doc_id)
      WHERE split_base = 'val'
        AND gram IN (SELECT gram FROM train_grams)
    )
    SELECT b.doc_id, b.split_base,
           CASE WHEN l.doc_id IS NOT NULL THEN 'train' ELSE b.split_base END
             AS split_final,
           (l.doc_id IS NOT NULL) AS reassigned
    FROM base b LEFT JOIN leaky l USING (doc_id)
    """,
    tags=("text", "split", "ml"),
)
def z_split_decontaminated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontaminated held-out split — the step that makes a val set
    trustworthy: start from the deterministic 90/10 hash split, then
    REASSIGN to train every val document sharing any 8-gram with any
    train document (a leaked val doc measures memorization, not
    generalization; moving it to train is the conservative fix that
    never shrinks training data).

    Plan shape: one codegen 8-gram explode feeding both sides, a
    distinct on train grams, one semi join for the leak test (semi —
    never a fan-out join on hot grams), one id-partitioned left join for
    the verdict. Every step is value-exact vs the oracle."""
    from ..functions import text as T

    docs = load_table(spark, sf_dir, "documents")
    w = F.filter(F.split(F.trim("text"), " +"), lambda x: x != "")
    base = docs.select(
        "doc_id", T.train_val_split(F.col("doc_id")).alias("split_base")
    )
    grams = (
        docs.select("doc_id", w.alias("w"))
        .where(F.size("w") >= 8)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - 7),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("w"), i.cast("int"), 8)
                    ),
                )
            ).alias("gram"),
        )
    )
    gb = grams.join(base, "doc_id")
    train_grams = gb.where(F.col("split_base") == "train").select("gram").distinct()
    leaky = (
        gb.where(F.col("split_base") == "val")
        .join(train_grams, "gram", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("__leak", F.lit(True))
    )
    return base.join(leaky, "doc_id", "left").select(
        "doc_id",
        "split_base",
        F.when(F.col("__leak").isNotNull(), F.lit("train"))
        .otherwise(F.col("split_base"))
        .alias("split_final"),
        F.col("__leak").isNotNull().alias("reassigned"),
    )


@query(
    "z_text_pack_bfd",
    oracle="""
    WITH RECURSIVE d AS (
      SELECT doc_id, n_chars,
             CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                       AS INT) % 8 AS BIGINT) AS shard,
             ROW_NUMBER() OVER (
               PARTITION BY CAST(CAST(('0x' || substr(md5(CAST(doc_id
                            AS VARCHAR)), 1, 4)) AS INT) % 8 AS BIGINT)
               ORDER BY n_chars DESC, doc_id
             ) AS rn
      FROM documents
    ),
    shards AS (SELECT shard, MAX(rn) AS n FROM d GROUP BY shard),
    -- one greedy placement per recursion step; state = per-bin lists
    -- (remaining room, fill, doc count) in bin-opening order. 'best' is
    -- the tightest fitting open bin, ties to the lowest index — encoded
    -- as room*1e6 + index so one list_min applies both rules at once.
    st(shard, rn, rooms, fills, ndocs) AS (
      SELECT shard, CAST(0 AS BIGINT), CAST([] AS BIGINT[]),
             CAST([] AS BIGINT[]), CAST([] AS BIGINT[])
      FROM shards
      UNION ALL
      SELECT st.shard, st.rn + 1,
             CASE WHEN best IS NULL
                  THEN list_append(st.rooms, greatest(4096 - t, 0))
                  ELSE list_transform(st.rooms, (x, i) ->
                         CASE WHEN i = best THEN x - t ELSE x END) END,
             CASE WHEN best IS NULL
                  THEN list_append(st.fills, t)
                  ELSE list_transform(st.fills, (x, i) ->
                         CASE WHEN i = best THEN x + t ELSE x END) END,
             CASE WHEN best IS NULL
                  THEN list_append(st.ndocs, CAST(1 AS BIGINT))
                  ELSE list_transform(st.ndocs, (x, i) ->
                         CASE WHEN i = best THEN x + 1 ELSE x END) END
      FROM (
        SELECT st.*, d.n_chars AS t,
               CASE WHEN len(cand) = 0 THEN NULL
                    ELSE CAST(list_min(cand) % 1000000 AS BIGINT) END AS best
        FROM st
        JOIN d ON d.shard = st.shard AND d.rn = st.rn + 1,
        LATERAL (SELECT list_filter(
                   list_transform(st.rooms, (x, i) ->
                     CASE WHEN x >= d.n_chars
                          THEN x * 1000000 + i ELSE NULL END),
                   v -> v IS NOT NULL) AS cand) c
      ) st
    ),
    fin AS (
      SELECT st.shard, rooms, fills, ndocs
      FROM st JOIN shards USING (shard) WHERE st.rn = shards.n
    )
    SELECT shard, CAST(u.i - 1 AS BIGINT) AS bin,
           ndocs[u.i] AS n_docs, fills[u.i] AS bin_fill
    FROM fin, LATERAL (SELECT unnest(range(1, len(fills) + 1)) AS i) u
    """,
    tags=("text", "packing"),
)
def z_text_pack_bfd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-fit-decreasing sequence packing (operators/packing.py): the
    higher-fill alternative to start-offset binning — BFD places
    largest-first into the tightest open bin, so fewer training sequences
    carry padding. Shards pack in parallel (the greedy loop runs inside
    each shard's Arrow batch), with budget-compliance,
    fewer-bins-than-start-offset, and partitioning-invariance asserted in
    tests/test_packing_bfd.py. VALUE-EXACT as of round 12 (was rows-only):
    the greedy is deterministic integer arithmetic over a total order
    (tokens desc, doc_id asc), so a DuckDB recursive CTE unrolls it one
    placement per step, carrying the open-bin state as lists — same
    tightest-bin/lowest-index tie rule, same per-(shard, bin) fill stats.
    Output: per-(shard, bin) fill statistics."""
    from ..operators.packing import pack_sequences_bfd

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    packed = pack_sequences_bfd(docs, token_col="n_chars", budget=4096, n_shards=8)
    return (
        packed.groupBy("shard", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("bin_fill").alias("bin_fill"),
        )
        .orderBy("shard", "bin")
    )


def _pca_power_oracle(q: int = 1 << 20, d: int = 64, k: int = 16, iters: int = 12) -> str:
    """DuckDB twin of ``pca_power_train`` + ``pca_project_fold``: the SAME
    finite recurrence as the driver's power iteration, as one recursive CTE.

    Why this is bit-exact cross-engine (validated on the real corpus at
    sf0.001 and sf0.01):

    - ``floor(x*2^20)`` quantization is tie-free and exact in doubles;
    - the covariance is built from EXACT integer sums (HUGEINT here,
      Python ints on the driver) — no float accumulation order anywhere;
    - every float sum afterwards folds left-to-right in index order
      (``list_reduce`` ≡ the trainer's Python loop ≡ ``aggregate`` in the
      projection), and scalar IEEE ops (＊ / sqrt) are correctly rounded in
      both engines, so the 16-component basis and all projections come out
      bit-identical — the *approximate spectral decomposition* itself is the
      checked value, not just downstream ranks.

    The recursion runs ``k`` components × (``iters`` matvec steps + 1
    finalize step): sign-fix, Rayleigh eigenvalue, rank-one deflation, and
    a reset to the all-ones start vector. Reduced-space cosine then follows
    the registry's standard rounded-cosine determinism policy."""
    step = iters + 1
    one = "CAST(1.0 AS DOUBLE)"
    return f"""
    WITH RECURSIVE
    qz AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {q}) AS BIGINT)) AS xq
      FROM embeddings
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM qz),
    sums AS (
      SELECT list(si ORDER BY i) AS s FROM (
        SELECT u.i AS i, CAST(SUM(xq[u.i+1]) AS HUGEINT) AS si
        FROM qz, (SELECT unnest(range(0,{d})) AS i) u GROUP BY u.i)
    ),
    prs AS (
      SELECT u.i AS i, v.j AS j, CAST(SUM(xq[u.i+1] * xq[v.j+1]) AS HUGEINT) AS sij
      FROM qz, (SELECT unnest(range(0,{d})) AS i) u,
                (SELECT unnest(range(0,{d})) AS j) v
      GROUP BY u.i, v.j
    ),
    cmat AS (
      SELECT list(CAST(nn.n * p.sij
                       - s.s[CAST(p.i AS BIGINT)+1] * s.s[CAST(p.j AS BIGINT)+1]
                       AS DOUBLE) ORDER BY p.i, p.j) AS c
      FROM prs p CROSS JOIN nn CROSS JOIN sums s
      GROUP BY nn.n
    ),
    it AS (
      SELECT 0 AS t, c, list_transform(range(0,{d}), x -> {one}) AS v,
             CAST([] AS DOUBLE[]) AS comps
      FROM cmat
      UNION ALL
      SELECT t + 1,
        CASE WHEN fin THEN
          list_transform(range(0,{d}*{d}), ij ->
            c[ij+1] - (lam * sv[CAST(ij // {d} AS BIGINT)+1])
                      * sv[CAST(ij % {d} AS BIGINT)+1])
        ELSE c END,
        CASE WHEN fin THEN list_transform(range(0,{d}), x -> {one})
             ELSE list_transform(w, x -> x / nrm) END,
        CASE WHEN fin THEN comps || sv ELSE comps END
      FROM (
        SELECT t, c, v, comps, fin, w, sv,
          CASE WHEN fin THEN {one} ELSE
            sqrt(list_reduce(list_transform(w, x -> x * x), (a,b) -> a + b))
          END AS nrm,
          CASE WHEN NOT fin THEN CAST(0.0 AS DOUBLE) ELSE
            list_reduce(list_transform(range(0,{d}), i ->
              sv[CAST(i AS BIGINT)+1] * list_reduce(
                list_transform(range(0,{d}), j -> c[i*{d}+j+1] * sv[CAST(j AS BIGINT)+1]),
                (a,b) -> a + b)), (a,b) -> a + b)
          END AS lam
        FROM (
          SELECT t, c, v, comps, fin,
            CASE WHEN fin THEN v ELSE
              list_transform(range(0,{d}), i ->
                list_reduce(
                  list_transform(range(0,{d}), j -> c[i*{d}+j+1] * v[CAST(j AS BIGINT)+1]),
                  (a,b) -> a + b))
            END AS w,
            CASE WHEN NOT fin THEN v ELSE
              CASE WHEN COALESCE(list_filter(v, x -> abs(x) > 1e-12)[1], {one}) < 0
                   THEN list_transform(v, x -> -x) ELSE v END
            END AS sv
          FROM (SELECT t, c, v, comps, (t % {step}) = {iters} AS fin
                FROM it WHERE t < {k * step}) s0
        ) s1
      ) s2
    ),
    basis AS (SELECT comps FROM it WHERE t = {k * step}),
    proj AS (
      SELECT qz.vec_id,
             list_transform(range(0,{k}), r ->
               list_reduce(list_transform(range(0,{d}), j ->
                 (CAST(qz.xq[CAST(j AS BIGINT)+1] AS DOUBLE)
                  - CAST(s.s[CAST(j AS BIGINT)+1] AS DOUBLE) / nn.n)
                 * b.comps[r*{d}+j+1]), (a,b) -> a + b)) AS p
      FROM qz CROSS JOIN basis b CROSS JOIN sums s CROSS JOIN nn
    ),
    pj AS (
      SELECT pq.vec_id AS query_id, pc.vec_id AS neighbor_id, pq.p AS qv, pc.p AS cv
      FROM proj pq JOIN proj pc ON pc.vec_id <> pq.vec_id
      WHERE pq.vec_id < 8
    ),
    u2 AS (SELECT query_id, neighbor_id, unnest(qv) AS x, unnest(cv) AS y FROM pj),
    p2 AS (
      SELECT query_id, neighbor_id,
             SUM(x * y) AS dot, SUM(x * x) AS na, SUM(y * y) AS nb
      FROM u2 GROUP BY 1, 2
    ),
    r2 AS (
      SELECT query_id, neighbor_id, round(dot / sqrt(na * nb), 6) AS sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY round(dot / sqrt(na * nb), 6) DESC,
                                         neighbor_id) AS rn
      FROM p2
    )
    SELECT query_id, neighbor_id, sim, CAST(rn AS BIGINT) AS rank
    FROM r2 WHERE rn <= 5
    """


@query("z_emb_pca_ann", oracle=_pca_power_oracle(), tags=("similarity", "ml"))
def z_emb_pca_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA-compressed ANN — the standard pre-step for large-scale vector
    search: learn a 16-component basis from integer-exact sufficient
    statistics (driver sees d² ints, never data), project the 64-d
    embeddings down 4x ENTIRELY JVM-side (higher-order-function fold, no
    Python worker), and run cosine top-5 in the REDUCED space.

    VALUE-EXACT as of round 13 (was rows-only): ``pca_power_train``
    replaces driver-side ``eigh`` over an order-sensitive float covariance
    with a fixed-iteration deflated power method over an INTEGER-EXACT
    covariance (floor-quantized inputs, associative integer sums), every
    float reduction folding in index order — so a DuckDB recursive CTE
    replays the identical recurrence and the eigenbasis, projections, and
    ranks all reproduce bit-for-bit (``_pca_power_oracle``). Recall vs
    full-space exact search is asserted in tests/test_embedding.py on
    planted low-rank data (this corpus's vectors are deliberately
    isotropic, where no linear compression can preserve neighborhoods —
    real encoder outputs are low-rank)."""
    from ..operators.embedding import pca_power_train, pca_project_fold
    from ..operators.similarity import cosine_topk

    e = load_table(spark, sf_dir, "embeddings")
    _, _, mean, comps, _ = pca_power_train(e, k=16, iters=12)
    proj = pca_project_fold(e, mean, comps).withColumnRenamed("proj", "embedding")
    queries = proj.where(F.col("vec_id") < 8)
    return cosine_topk(proj, queries, k=5).orderBy("query_id", "rank")


@query(
    "z_stream_rate_anomaly",
    oracle="""
    WITH ev AS (
      SELECT CAST(event_type AS VARCHAR) AS key, event_id % 6 AS sl
      FROM events
    ),
    t AS (
      SELECT key, sl,
             CAST(ROW_NUMBER() OVER (PARTITION BY key ORDER BY sl)
                  AS BIGINT) AS i,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM ev GROUP BY key, sl
    ),
    m AS (
      SELECT a.key, a.i, a.c,
             SUM(b.c * CASE WHEN b.i = 1 THEN power(0.7, a.i - 1)
                            ELSE 0.3 * power(0.7, a.i - b.i) END) AS mean_i
      FROM t a JOIN t b ON a.key = b.key AND b.i <= a.i
      GROUP BY a.key, a.i, a.c
    ),
    d AS (
      SELECT key, i, c, mean_i,
             c - COALESCE(
                   LAG(mean_i) OVER (PARTITION BY key ORDER BY i),
                   FIRST_VALUE(c) OVER (PARTITION BY key ORDER BY i)
                 ) AS delta_i
      FROM m
    ),
    v AS (
      SELECT a.key, a.i, a.c, a.mean_i,
             SUM(0.3 * power(0.7, a.i - b.i + 1)
                 * b.delta_i * b.delta_i) AS var_i
      FROM d a JOIN d b ON a.key = b.key AND b.i <= a.i
      GROUP BY a.key, a.i, a.c, a.mean_i
    ),
    f AS (
      SELECT key, i, c, mean_i, var_i,
             LAG(mean_i) OVER (PARTITION BY key ORDER BY i) AS pm,
             LAG(var_i)  OVER (PARTITION BY key ORDER BY i) AS pv
      FROM v
    )
    SELECT key, i AS batch_seq, c AS n_events,
           round(mean_i, 6) AS ewma_mean,
           round(sqrt(var_i), 6) AS ewma_std,
           (i - 1 >= 3 AND abs(c - pm) > 3.0 * sqrt(pv)) AS is_anomaly
    FROM f
    """,
    tags=("streaming", "monitor"),
)
def z_stream_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming EWMA control chart: per-event-type micro-batch
    counts checked against an exponentially-weighted mean/variance with
    O(1) state per key — the rate-monitoring op that runs beside the
    sketches on an ingest stream. The replay is a genuine SIX-batch run:
    events slice deterministically by ``event_id % 6`` into mtime-ordered
    files consumed one per trigger, so the chart's warm-up, fold, and
    post-warm-up verdict paths all execute across micro-batch boundaries.

    VALUE-EXACT as of round 11 (previously rows-only): the EWMA
    recurrence at fixed alpha unrolls to a closed form — ``m_i =
    (1-a)^(i-1) c_1 + sum_j a (1-a)^(i-j) c_j`` and ``v_i = sum_j a
    (1-a)^(i-j+1) delta_j^2`` with pre-fold deltas from a LAG — which the
    oracle evaluates as exponent-weight joins over the per-(key, batch)
    integer counts. The two evaluation orders (iterative fold vs
    closed-form sum) drift only at ~1e-12 relative, absorbed by the 6dp
    rounding policy; the warm-up gate and the strict-inequality verdict
    compare integer counts against the same closed-form state. Planted-
    spike detection is additionally asserted in tests/test_streaming.py.
    """
    import os
    import shutil

    from ..cache import artifact_path, ensure_artifact
    from ..streaming.anomaly import rate_anomaly_stream

    src = f"{sf_dir}/events.parquet"
    st = os.stat(src)

    def _stage(stage_dir: str) -> None:
        os.makedirs(stage_dir, exist_ok=True)
        ev = load_table(spark, sf_dir, "events").select(
            F.col("event_type").cast("string").alias("event_type"),
            (F.col("event_id") % 6).alias("sl"),
        )
        for i in range(6):
            tmp = os.path.join(stage_dir, f"_tmp{i}")
            (
                ev.where(F.col("sl") == i)
                .select("event_type")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(tmp)
            )
            part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
            dst = os.path.join(stage_dir, f"b{i:02d}.parquet")
            shutil.copy(os.path.join(tmp, part), dst)
            # strictly increasing mod-times pin the micro-batch order
            t_ns = st.st_mtime_ns + i * 10**9
            os.utime(dst, ns=(t_ns, t_ns))
            shutil.rmtree(tmp)

    watch = ensure_artifact(
        artifact_path("anom", f"{src}:{st.st_size}:{st.st_mtime_ns}:slices6"),
        _stage,
    )
    stream = (
        spark.readStream.schema("event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(watch)
    )
    out = rate_anomaly_stream(stream, key_col="event_type")
    name = "z_stream_anomaly_tbl"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    return spark.table(name).orderBy("key", "batch_seq")


@query(
    "z_stream_quantiles",
    oracle="""
    WITH sample AS (
      SELECT CAST(value AS DOUBLE) AS val
      FROM events
      ORDER BY md5(CAST(event_id AS VARCHAR)), CAST(event_id AS VARCHAR)
      LIMIT 128
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sample,
           round(quantile_cont(val, 0.25), 6) AS q_25,
           round(quantile_cont(val, 0.50), 6) AS q_5,
           round(quantile_cont(val, 0.75), 6) AS q_75,
           round(quantile_cont(val, 0.90), 6) AS q_9
    FROM sample
    """,
    tags=("streaming", "sketch", "stats"),
)
def z_stream_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming quantile estimates with bounded state: the bottom-k
    value sample (k doubles of state per shard, ever) yields the stream's
    percentiles at ~O(1/sqrt(k)) sampling error — and because the sample
    is the deterministic hash-ordered prefix rather than an RNG
    reservoir, the whole estimate is VALUE-EXACT against the batch
    oracle (sample membership = ORDER BY md5(key) LIMIT k; percentiles =
    exact quantile_cont over the sample)."""
    from ..streaming.sketches import bottomk_sample_stream, quantiles_from_bottomk
    from ..streaming.windows import read_events_stream

    ev = read_events_stream(spark, f"{sf_dir}/events.parquet")
    sk = bottomk_sample_stream(
        ev, key_col="event_id", k=128, n_shards=4, value_col="value"
    )
    name = "z_stream_quantiles_tbl"
    q = (
        sk.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    return quantiles_from_bottomk(spark.table(name), k=128)


# NOTE (round 8): the raw windowed-sketch query (`z_stream_hh_windowed`)
# was consolidated into `z_stream_hh_windowed_verified` below — the verified
# composition runs the identical `windowed_heavy_hitters_stream` operator
# (event-time state eviction, bounded state) and then exactly rechecks its
# candidates, so it strictly subsumes the raw registry row while being
# value-checkable. The eviction/exactly-once-final/late-data semantics
# remain asserted in tests/test_streaming.py over a multi-batch replay.
@query(
    "z_stream_hh_windowed_verified",
    oracle="""
    WITH w AS (
      SELECT to_timestamp(CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT))
               AS ws,
             event_type AS key
      FROM events
    ), tot AS (
      SELECT ws, COUNT(*) AS n FROM w GROUP BY ws
    )
    SELECT strftime(w.ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           w.key,
           CAST(COUNT(*) AS BIGINT) AS exact_count
    FROM w JOIN tot USING (ws)
    GROUP BY w.ws, w.key, tot.n
    HAVING COUNT(*) > tot.n / 8.0
    """,
    tags=("streaming", "sketch"),
)
def z_stream_hh_windowed_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-WINDOW sketch-then-verify heavy hitters — the windowed twin of
    `z_stream_hh_verified`, and like it VALUE-EXACT against SQL: the
    streaming windowed Misra-Gries sketch (event-time state eviction,
    bounded state) nominates candidates per (window, key); one batch
    aggregation restricted to candidate pairs recomputes exact counts and
    keeps keys above 1/8 of their window's traffic.

    Exactness argument: keys are hash-sharded, so a key's (window, shard)
    stream IS its window stream; MG with capacity 16 never evicts a key
    whose count exceeds its stream length / 16, and the 1/8 threshold is
    2x that guarantee — every true heavy hitter is among the candidates
    (interim rows included — a superset is safe, the exact recheck
    discards impostors), so the verified output equals the plain SQL
    answer. At 100 TB the recheck is a broadcast semi-join on a
    candidate-sized list, never a full-cardinality per-window groupBy."""
    from ..streaming.sketches import windowed_heavy_hitters_stream
    from ..streaming.windows import read_events_stream

    ev = read_events_stream(spark, f"{sf_dir}/events.parquet")
    sk = windowed_heavy_hitters_stream(
        ev,
        key_col="event_type",
        window="6 hours",
        watermark="1 hour",
        capacity=16,
        n_shards=2,
    )
    name = "z_stream_hh_winv_tbl"
    q = (
        sk.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    candidates = (
        spark.table(name).select("window_start", "key").distinct()
    )
    events = load_table(spark, sf_dir, "events")
    win = F.window(F.col("ts"), "6 hours")["start"]
    pairs = events.select(
        win.alias("window_start"),
        F.col("event_type").cast("string").alias("key"),
    )
    totals = pairs.groupBy("window_start").agg(
        F.count(F.lit(1)).alias("__n")
    )
    return (
        pairs.join(F.broadcast(candidates), ["window_start", "key"], "left_semi")
        .groupBy("window_start", "key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_count"))
        .join(F.broadcast(totals), "window_start")
        .where(F.col("exact_count") > F.col("__n") / 8.0)
        .select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "key",
            "exact_count",
        )
    )


@query(
    "z_stream_distinct_hll",
    oracle="""
    WITH h AS (
      SELECT DISTINCT
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))
                  AS UBIGINT) AS h
      FROM events
    ), r AS (
      SELECT CAST(h % 1024 AS INT) AS idx,
             MAX(CASE WHEN h // 1024 = 0 THEN 55
                 ELSE 55 - length(bin(h // 1024)) END) AS rho
      FROM h GROUP BY 1
    ), agg AS (
      SELECT COUNT(*) AS n_present, SUM(power(2.0, -rho)) AS s FROM r
    ), est AS (
      SELECT n_present,
             (0.7213 / (1 + 1.079 / 1024)) * 1024 * 1024
               / (s + (1024 - n_present)) AS raw
      FROM agg
    )
    SELECT CAST(1024 AS BIGINT) AS n_registers,
           CAST(1024 - n_present AS BIGINT) AS n_zero_registers,
           CAST(round(CASE WHEN raw <= 2560 AND n_present < 1024
                           THEN 1024 * ln(1024.0 / (1024 - n_present))
                           ELSE raw END) AS BIGINT) AS estimate
    FROM est
    """,
    tags=("streaming", "sketch"),
)
def z_stream_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming HyperLogLog distinct-user count: 2^10 registers per
    shard TOTAL — the bounded-state answer to COUNT(DISTINCT) over an
    unbounded stream, companion to the Misra-Gries frequency sketch.

    VALUE-EXACT oracle (r8): register contents are a deterministic
    function of the key SET — ``register[i] = max rho over keys hashing
    to i`` — independent of batch order or shard assignment (max-merge is
    associative/commutative/idempotent), and the md5-based register hash
    is engine-portable, so DuckDB recomputes the identical registers and
    estimator from the raw events: the streaming sketch's
    (n_registers, n_zero_registers, estimate) row must match it exactly.
    The ~3.2% (1.04/sqrt(1024)) error bound vs the TRUE count and
    max-mergeability are additionally asserted in tests/test_streaming.py."""
    from ..streaming.sketches import hll_distinct_stream, hll_estimate
    from ..streaming.windows import read_events_stream

    ev = read_events_stream(spark, f"{sf_dir}/events.parquet")
    sk = hll_distinct_stream(ev, key_col="user_id", p=10, n_shards=4)
    name = "z_stream_hll_tbl"
    q = (
        sk.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    return hll_estimate(spark.table(name), p=10)


from .datapipe import QUALITY_SQL as _Q


@query(
    "z_quality_auto_threshold",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), ' +')) AS tok
      FROM documents
    ), vocab AS (
      SELECT tok, COUNT(*) AS c FROM t GROUP BY tok
    ), tot AS (
      SELECT SUM(c) AS n FROM vocab
    ), scored AS (
      SELECT doc_id,
             round(SUM(ln(c / (SELECT n FROM tot))) / COUNT(*), 6) AS s
      FROM t JOIN vocab USING (tok)
      GROUP BY doc_id
    ), lab AS (
      SELECT d.lang, s.s,
             ({_Q} >= 0.55) AS pos
      FROM scored s JOIN documents d USING (doc_id)
    ), per AS (
      SELECT lang, s AS threshold, COUNT(*) AS n_at,
             SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS tp_at
      FROM lab GROUP BY lang, s
    ), curve AS (
      SELECT lang, threshold,
             CAST(SUM(n_at) OVER w AS BIGINT) AS n_kept,
             CAST(SUM(tp_at) OVER w AS BIGINT) AS tp,
             round(SUM(tp_at) OVER w * 1.0 / SUM(n_at) OVER w, 6) AS precision,
             round(SUM(tp_at) OVER w * 1.0 / SUM(tp_at) OVER wall, 6) AS recall
      FROM per
      WINDOW w AS (PARTITION BY lang ORDER BY threshold DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wall AS (PARTITION BY lang ORDER BY threshold DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING)
    )
    SELECT lang, threshold, n_kept, tp, precision, recall
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                   ORDER BY recall DESC, threshold ASC) AS rn
      FROM curve WHERE precision >= 0.7
    ) WHERE rn = 1
    """,
    tags=("text", "quality", "ml"),
)
def z_quality_auto_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language automatic operating-point selection — the composition
    the sweep exists for: sweep the unigram-LM fluency score against the
    heuristic quality gate (quality_score >= 0.55) PER LANGUAGE, then
    keep each language's most permissive threshold whose precision still
    clears 0.7. Threshold selection is a query over the curve (one
    row_number window), not a driver loop; languages that can't reach
    the floor honestly emit no row."""
    from ..functions import text as T
    from ..operators.scale import scalar_attach
    from ..operators.selection import auto_threshold, threshold_sweep

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), " +")).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    scored = (
        scalar_attach(toks.join(vocab, "tok"), vocab.agg(F.sum("c").alias("n")))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.log(F.col("c") / F.col("n"))) / F.count(F.lit(1)), 6
            ).alias("s")
        )
        .join(
            docs.select(
                "doc_id", "lang", (T.quality_score("text") >= 0.55).alias("pos")
            ),
            "doc_id",
        )
    )
    sweep = threshold_sweep(scored, "s", "pos", group_col="lang")
    return auto_threshold(sweep, min_precision=0.7, group_col="lang")


@query(
    "z_quality_threshold_sweep",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), ' +')) AS tok
      FROM documents
    ), vocab AS (
      SELECT tok, COUNT(*) AS c FROM t GROUP BY tok
    ), tot AS (
      SELECT SUM(c) AS n FROM vocab
    ), scored AS (
      SELECT doc_id,
             round(SUM(ln(c / (SELECT n FROM tot))) / COUNT(*), 6) AS s
      FROM t JOIN vocab USING (tok)
      GROUP BY doc_id
    ), lab AS (
      SELECT s.s, (d.lang = 'en') AS pos
      FROM scored s JOIN documents d USING (doc_id)
    ), per AS (
      SELECT s AS threshold, COUNT(*) AS n_at,
             SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS tp_at
      FROM lab GROUP BY s
    )
    SELECT threshold,
           CAST(SUM(n_at) OVER w AS BIGINT) AS n_kept,
           CAST(SUM(tp_at) OVER w AS BIGINT) AS tp,
           round(SUM(tp_at) OVER w * 1.0 / SUM(n_at) OVER w, 6) AS precision,
           round(SUM(tp_at) OVER w * 1.0 / (SELECT SUM(tp_at) FROM per), 6)
             AS recall
    FROM per
    WINDOW w AS (ORDER BY threshold DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("text", "quality", "ml"),
)
def z_quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-calibration sweep: the full precision/recall operating table
    for 'keep documents with unigram-LM fluency >= threshold' against the
    weak label 'document is English' — every curation filter needs its
    operating point chosen from exactly this curve. One aggregation to
    the distinct-score table + one window pass; never a per-threshold
    rescan of the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), " +")).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    from ..operators.scale import scalar_attach

    total = vocab.agg(F.sum("c").alias("n"))
    scored = (
        scalar_attach(toks.join(vocab, "tok"), total)
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.log(F.col("c") / F.col("n"))) / F.count(F.lit(1)), 6
            ).alias("s")
        )
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "s", (F.col("lang") == "en").alias("pos"))
    )
    return threshold_sweep(scored, score_col="s", label_col="pos")
