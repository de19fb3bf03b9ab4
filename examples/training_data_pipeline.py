"""End-to-end training-data curation pipeline — the engine's north-star
composition: profile -> exact dedup -> near-dup removal (Jaccard +
containment) -> boilerplate strip -> exact substring-span screen ->
Gopher rule bundle -> quality filter (heuristics + unigram-LM fluency)
-> segment-outlier screen (per-chunk fluency floor) -> DSIR
target-matching selection (broadcast-boundary deciles, no
per-language window) -> plan-driven source re-mix (token-budget
mixture planner -> exact per-source quotas) -> text metrics ->
leakage-free cluster-level train/val split -> partitioned corpus write
-> verified training-shard export.

Every stage is one of the engine's operators; nothing collects to the
driver until the final summary. At 100 TB the same program runs with the
paths pointed at object storage and the partition count raised — the plan
shapes (hash-agg dedup, inverted-index Jaccard, partitioned write) are the
scale-out shapes already.

Run: python examples/training_data_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

import bonobo_sqlalchemy_spark as bss
from bonobo_sqlalchemy_spark.functions import text as T
from bonobo_sqlalchemy_spark.operators import dedup as D
from bonobo_sqlalchemy_spark.sources.files import load_table
from bonobo_sqlalchemy_spark.sources.sinks import read_partitioned, write_partitioned


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp() + "/corpus"
    spark = bss.get_spark(app_name="training-data-pipeline")

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 0. profile the incoming corpus: one aggregation pass, one row per
    #    column — the look-before-you-leap step of every engagement
    from bonobo_sqlalchemy_spark.operators.profile import profile_columns

    profile_columns(docs, ["doc_id", "lang", "source", "n_chars"]).show(truncate=False)

    # 1. exact dedup: keep one doc per identical content fingerprint
    survivors_exact = D.exact_dedup(docs).select("doc_id")
    docs = docs.join(survivors_exact, "doc_id", "left_semi")
    n1 = docs.count()

    # 2. fuzzy dedup: cluster transitive near-duplicates (connected
    #    components over the pair graph) and keep each cluster's
    #    HIGHEST-quality doc — not the first-crawled one
    docs = docs.withColumn("quality", T.quality_score("text"))
    #    Pair graph = symmetric Jaccard near-dups UNION asymmetric
    #    containment (short-doc-inside-long-doc — invisible to Jaccard);
    #    both ride the same inverted-index plan.
    pairs = D.ngram_jaccard_pairs(
        docs, block_col="lang", n=3, threshold=0.5, max_shingle_df=1000
    ).select("id1", "id2").unionByName(
        D.containment_pairs(
            docs, block_col="lang", n=3, threshold=0.9, max_shingle_df=1000
        ).select("id1", "id2")
    ).dropDuplicates(["id1", "id2"])
    keep = D.best_survivors(docs, pairs, "quality").select(
        F.col("survivor_id").alias("doc_id")
    )
    docs = docs.join(keep, "doc_id", "left_semi")
    n2 = docs.count()

    # 2b. boilerplate strip: drop 16-token chunks shared across documents
    #     (templated headers/footers) and rewrite the surviving text —
    #     sub-document dedup AFTER whole-document dedup removed exact and
    #     near copies
    from bonobo_sqlalchemy_spark.functions.cleaning import strip_shared_chunks

    cleaned = strip_shared_chunks(docs, chunk_tokens=16, max_df=1).select(
        "doc_id", F.col("clean_text")
    )
    docs = (
        docs.join(cleaned, "doc_id")
        .where(F.length("clean_text") > 0)
        .drop("text")
        .withColumnRenamed("clean_text", "text")
    )

    # 2c. exact substring-span screen (Lee et al. 2022): after doc-level
    #     and chunk-level dedup, flag exact 8-token runs still duplicated
    #     anywhere in the corpus and drop documents that are mostly
    #     duplicated text. One gram-hash aggregation + one semi join —
    #     no pair join, no quadratic regime.
    span_ok = (
        D.duplicate_span_stats(docs, gram=8)
        .where(F.col("dup_ratio") < 0.5)
        .select("doc_id")
    )
    docs = docs.join(span_ok, "doc_id", "left_semi")

    # 2d. Gopher heuristic rule bundle (Rae et al. 2021): the cheap
    #     structural pre-filter — word-count bounds, mean-word-length band,
    #     stopword floor, alpha ratio, repeated-bigram ceiling. Thresholds
    #     here are lenient screens; the learned/statistical gates below do
    #     the fine selection.
    from bonobo_sqlalchemy_spark.operators.quality import gopher_rules

    gr_ok = gopher_rules(
        docs,
        min_words=8,
        max_words=100_000,
        min_stopwords=1,
        min_alpha_ratio=0.5,
        max_dup_bigram_ratio=0.6,
    ).where("keep").select("doc_id")
    docs = docs.join(gr_ok, "doc_id", "left_semi")
    #     Truncate lineage here: everything above (pair graphs, span
    #     screens, rule bundles) is decided; without this, every downstream
    #     action (counts, write, export) re-executes the whole dedup DAG —
    #     at cluster scale you'd persist/write the curated snapshot instead.
    docs = docs.localCheckpoint()

    # 3. quality gate + text metrics (all JVM-side column functions;
    #    quality was already attached for the survivor selection)
    scored = docs.select(
        "*",
        T.n_tokens("text").alias("n_tokens"),
        T.fingerprint_md5("text").alias("fingerprint"),
    )
    #    ... plus the unigram-LM fluency signal (mean log2 token probability
    #    under the corpus distribution): drops rare-token/garbage docs the
    #    surface heuristics miss. Threshold = corpus 5th percentile.
    from bonobo_sqlalchemy_spark.operators.quality import hot_cold_count_join

    toks = docs.select("doc_id", F.explode(F.split(F.trim("text"), " +")).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("total"))
    # token->count lookup rides the shared zipf-key guard (hot vocab rows
    # broadcast; no reducer receives every "the")
    fluency = (
        hot_cold_count_join(toks, counts, "tok", "c", 100_000)
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg((F.sum(F.log2(F.col("c") / F.col("total"))) / F.count(F.lit(1))).alias("avg_log2p"))
    )
    floor = fluency.agg(F.expr("percentile_approx(avg_log2p, 0.05)")).collect()[0][0]
    scored = scored.join(fluency, "doc_id")
    curated = scored.where(
        (F.col("quality") >= 0.55)
        & (F.col("n_tokens") >= 10)
        & (F.col("avg_log2p") >= F.lit(floor))
    ).drop("avg_log2p")
    n3 = curated.count()

    # 3a. segment-outlier screen: whole-doc scorers average an embedded
    #     garbage block away; the per-16-token-chunk fluency FLOOR flags
    #     "mostly fine, one bad segment" documents. Drop the worst-gap
    #     percentile (the substring-strip stage already removed SHARED
    #     junk; this catches doc-unique junk blocks).
    from bonobo_sqlalchemy_spark.operators.quality import (
        segment_quality_outliers,
    )

    seg = segment_quality_outliers(curated, chunk=16)
    gap_cap = seg.agg(F.expr("percentile_approx(gap, 0.99)")).collect()[0][0]
    seg_keep = seg.where(F.col("gap") <= F.lit(gap_cap)).select("doc_id")
    curated = curated.join(seg_keep, "doc_id", "left_semi")
    n3a = curated.count()

    # 3b. DSIR selection: keep documents whose hashed-unigram distribution
    #     matches the target (English) subset — drop the bottom per-language
    #     DSIR decile. Bucket tables are broadcast-sized at any corpus
    #     scale, and deciles come from broadcast percentile BOUNDARIES
    #     (`grouped_decile`), never a per-language ntile window — a window
    #     partitioned by language sorts a whole language in one task, the
    #     round-7-flagged 100 TB straggler.
    from bonobo_sqlalchemy_spark.operators.selection import (
        dsir_log_weights,
        grouped_decile,
    )

    dsir = dsir_log_weights(curated, F.col("lang") == "en", n_buckets=1024)
    dsir_keep = (
        grouped_decile(
            curated.select("doc_id", "lang").join(dsir, "doc_id"),
            "dsir_logw",
            "lang",
            out_col="dsir_decile",
        )
        .where(F.col("dsir_decile") <= 9)
        .select("doc_id")
    )
    curated = curated.join(dsir_keep, "doc_id", "left_semi")
    n3b = curated.count()

    # 3c. plan-driven source re-mix: derive a temperature-flattened recipe
    #     (count^0.5 shares, so small curated sources are not drowned by
    #     the crawl), turn recipe + a 90% token budget + a 1-epoch cap
    #     into ACHIEVABLE per-source allocations with `mixture_token_plan`
    #     (the planner surfaces each source's deficit explicitly instead
    #     of silently under-filling), then realize the plan with exact
    #     per-source doc quotas via `mixture_sample` (rank pick keeps the
    #     WindowGroupLimit pushdown). Both collects here are
    #     source-cardinality by contract — bounded at any corpus scale.
    from bonobo_sqlalchemy_spark.operators.sampling import (
        mixture_deficit_respread,
        mixture_sample,
        mixture_token_plan,
    )

    src_stats = {
        r["source"]: (r["docs"], r["toks"])
        for r in curated.groupBy("source")
        .agg(F.count(F.lit(1)).alias("docs"), F.sum("n_tokens").alias("toks"))
        .collect()  # bounded-collect: one row per source
    }
    z = sum(d**0.5 for d, _ in src_stats.values())
    recipe = {s: (d**0.5) / z for s, (d, _) in src_stats.items()}
    budget = int(0.9 * sum(t for _, t in src_stats.values()))
    plan = mixture_token_plan(
        curated, recipe, budget, token_col="n_tokens", max_epochs=1.0
    )
    #     ... then one explicit deficit-respread round: mass the epoch cap
    #     left unplaced re-spreads weight-proportionally across sources
    #     with remaining headroom (the refill loop the planner's contract
    #     leaves to the caller, done once)
    plan = mixture_deficit_respread(plan, max_epochs=1.0)
    plan.orderBy("source").show(truncate=False)
    quotas = {
        r["source"]: max(
            1,
            int(
                r["allocated_tokens"]
                * src_stats[r["source"]][0]
                // max(1, src_stats[r["source"]][1])
            ),
        )
        for r in plan.collect()  # bounded-collect: the plan IS source-cardinality
    }
    curated = mixture_sample(
        curated, "source", quotas, "doc_id"
    ).localCheckpoint()  # selection settled; downstream actions reuse it
    n3c = curated.count()

    # 4. weighted upsample bias toward long documents (Efraimidis–Spirakis,
    #    hash-deterministic — same sample every rerun) for the train cut
    from bonobo_sqlalchemy_spark.operators.sampling import (
        deterministic_shuffle,
        weighted_sample_topk,
    )

    target_n = max(10, int(n3c * 0.8))
    curated = weighted_sample_topk(curated, "n_tokens", target_n, "doc_id").drop(
        "sample_score"
    )

    # 5. leakage-free 90/10 train/val tag: dedup (stage 2) removed
    #    near-dups ABOVE 0.5 Jaccard, so looser twins survive — split by
    #    near-dup CLUSTER on a relaxed 0.3 graph so none of them straddles
    #    the boundary (a val doc must never have a train twin), then a
    #    stable global shuffle order and the partitioned corpus write
    #    (lang dirs -> pruned reads)
    loose_pairs = D.ngram_jaccard_pairs(
        curated, block_col="lang", n=3, threshold=0.3, max_shingle_df=1000
    )
    split_tag = D.group_disjoint_split(curated, loose_pairs).select(
        "doc_id", "split"
    )
    curated = curated.join(split_tag, "doc_id")
    curated = deterministic_shuffle(curated, "doc_id")
    write_partitioned(curated, out, ["lang"])

    # 6. compact the landed corpus (streaming/append ingest leaves shards)
    from bonobo_sqlalchemy_spark.operators.compact import compact_parquet

    stats = {}
    for lang_dir in sorted(Path(out).glob("lang=*")):
        stats[lang_dir.name] = compact_parquet(spark, str(lang_dir))

    # 7. verified training-shard export of the train split: content-derived
    #    sharding, per-shard manifest (rows/tokens/content hash), then the
    #    loader-side integrity check — the last mile before a data loader
    from bonobo_sqlalchemy_spark.operators.export import (
        verify_training_shards,
        write_training_shards,
    )

    shards_out = str(Path(out).parent / "shards")
    train = read_partitioned(spark, out).where(F.col("split") == "train")
    manifest = write_training_shards(
        train, shards_out, order_col="doc_id", token_col="n_tokens", n_shards=4
    )
    verify = verify_training_shards(spark, shards_out)
    bad_shards = verify.where(~F.col("ok")).count()
    assert bad_shards == 0, "shard verification failed"

    back = read_partitioned(spark, out)
    print(
        f"ingested={n0} after_exact_dedup={n1} after_near_dedup={n2} "
        f"after_quality_gate={n3} after_segment_screen={n3a} "
        f"after_dsir={n3b} after_remix={n3c} "
        f"sampled={target_n} written={back.count()} -> {out}"
    )
    print("compaction:", {k: (v["files_before"], v["files_after"]) for k, v in stats.items()})
    print(
        f"shards: {len(manifest['shards'])} verified clean -> {shards_out} "
        f"({sum(s['n_rows'] for s in manifest['shards'].values())} rows, "
        f"{sum(s['n_tokens'] for s in manifest['shards'].values())} tokens)"
    )
    back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
    ).orderBy("lang").show()


if __name__ == "__main__":
    main()
