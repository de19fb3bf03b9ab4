"""Deterministic sampling & shuffling for training-data pipelines.

Every operator here is **hash-deterministic**: randomness comes from
``md5(seed || id)``, never from an RNG, so results are identical across
engines (the DuckDB oracles reproduce them bit-for-bit), across reruns, and
across any partitioning — the property a 100 TB pipeline actually needs
(resumable jobs, reproducible ablations, no per-executor RNG state).

- :func:`stratified_sample_exact` — exactly *n* rows per stratum (not a
  Bernoulli fraction): rank within stratum by the hash and keep the first
  *n*. One shuffle on the stratum key; at scale this is the standard
  per-group top-k plan (partial TakeOrdered map-side via window + filter).
- :func:`deterministic_shuffle` — a stable global permutation key. Writing
  ``repartitionByRange(shuffle_key).sortWithinPartitions(shuffle_key)``
  materializes a globally shuffled dataset with NO single-point pass: the
  range partitioner samples key quantiles, every partition sorts locally.
- :func:`weighted_sample_topk` — weighted sampling without replacement
  (Efraimidis–Spirakis A-Res): key = ln(u)/w with u hash-uniform in (0,1);
  the global top-k by key is a weighted sample. Expressed as a top-k sort —
  TakeOrderedAndProject, no full-sort shuffle. Scores are rounded (policy
  in ``queries/base.py``) so cross-engine libm last-ulp differences cannot
  flip a rank; ties break on id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def hash_key(id_col: str | Column, seed: int = 42) -> Column:
    """Deterministic per-row uniform key: md5 of ``seed|id`` (hex string).

    md5 is available and bit-identical in Spark and DuckDB, which makes
    sampling decisions oracle-checkable; at pure-Spark scale ``xxhash64``
    is the cheaper drop-in (same determinism, no cross-engine contract).
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(F.concat_ws("|", F.lit(str(seed)), c.cast("string")))


def hash_uniform(id_col: str | Column, seed: int = 42) -> Column:
    """Hash-deterministic uniform double in (0, 1): the first 8 md5 hex
    chars as a 32-bit integer, shifted into (0,1) with a +1 offset so
    ln(u) is finite. Exactly reproducible in SQL (see the oracle builders
    in ``queries/datapipe4.py``)."""
    h8 = F.substring(hash_key(id_col, seed), 1, 8)
    # conv() parses hex -> decimal string; integers < 2^32 are exact doubles
    return (F.conv(h8, 16, 10).cast("double") + F.lit(1.0)) / F.lit(
        float(1 << 32) + 2.0
    )


def stratified_sample_exact(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum, hash-deterministic."""
    w = W.partitionBy(strata_col).orderBy(hash_key(id_col, seed), F.col(id_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def deterministic_shuffle(
    df: DataFrame, id_col: str, seed: int = 42, num_partitions: int | None = None
) -> DataFrame:
    """Attach a stable permutation key and range-cluster by it.

    The returned frame is globally ordered by ``shuffle_key`` across
    partition boundaries (partition *i* holds smaller keys than *i*+1,
    sorted within) — writing it yields a reproducible full-corpus shuffle
    with no driver bottleneck and no zipWithIndex barrier."""
    out = df.withColumn("shuffle_key", hash_key(id_col, seed))
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return out.repartitionByRange(n, "shuffle_key").sortWithinPartitions(
        "shuffle_key"
    )


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str | Column,
    k: int,
    id_col: str,
    seed: int = 42,
    digits: int = 12,
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-Res).

    P(row in sample) increases with weight; the classic reservoir key is
    u^(1/w) — maximizing it is equivalent to maximizing ln(u)/w, which
    avoids pow() and keeps magnitudes sane. Weights must be > 0."""
    wcol = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    score = F.round(F.log(hash_uniform(id_col, seed)) / wcol.cast("double"), digits)
    return (
        df.withColumn("sample_score", score)
        .orderBy(F.col("sample_score").desc(), F.col(id_col))
        .limit(k)
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    targets: dict[str, int],
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Domain re-weighting: exactly ``targets[g]`` rows from each group
    ``g`` (hash-deterministic), groups absent from ``targets`` dropped.

    THE training-mixture primitive: corpora are rarely consumed at natural
    proportions — you upsample curated sources and cap the crawl. Same
    rank-within-stratum machinery as :func:`stratified_sample_exact` with a
    per-group quota riding in as a literal map (broadcast-free: it compiles
    into the plan). One shuffle on the group key; deterministic and
    partitioning-invariant like every sampler here.

    Quotas larger than a group's population yield the whole group (no
    replacement); callers wanting upsampling-with-replacement should union
    repeated epochs with distinct seeds instead.

    Scale note: the per-group quota is a COLUMN, which alone would defeat
    Spark's rank-limit pushdown (`InferWindowGroupLimit` only fires on a
    foldable bound) and leave a full per-group sort — a straggler when one
    group dominates. The redundant literal ``rk <= max(targets)`` conjunct
    restores the pushdown: the plan gets a Partial WindowGroupLimit before
    the shuffle, so each map task forwards at most ``max(targets)`` rows
    per group and no task ever sorts a whole group.
    """
    lookup = F.create_map(
        *[F.lit(x) for kv in targets.items() for x in kv]
    )
    max_quota = max(targets.values(), default=0)
    w = W.partitionBy(group_col).orderBy(hash_key(id_col, seed), F.col(id_col))
    return (
        df.withColumn("__quota", lookup[F.col(group_col)])
        .where(F.col("__quota").isNotNull())
        .withColumn("__rk", F.row_number().over(w))
        .where(
            (F.col("__rk") <= F.lit(max_quota))
            & (F.col("__rk") <= F.col("__quota"))
        )
        .drop("__rk", "__quota")
    )


def temperature_mixture_sample(
    df: DataFrame,
    group_col: str,
    total_n: int,
    id_col: str,
    tau: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Temperature-based domain re-weighting: per-group quotas proportional
    to ``count^tau`` (normalized to ``total_n``), then the same
    hash-deterministic rank-within-group pick as :func:`mixture_sample`.

    THE multilingual/multi-domain mixing recipe: ``tau = 1`` keeps natural
    proportions, ``tau -> 0`` approaches uniform-per-group — sub-linear
    temperatures upsample small domains without the manual per-source
    target table `mixture_sample` needs. Quotas cap at each group's
    population (no replacement).

    Scale shape: group counts are ONE map-side-combined aggregate
    (group-cardinality rows), the scalar normalizer is a 1-row broadcast,
    quotas ride back on a broadcast join, and the pick is one window
    shuffle on the group key with the ``rk <= total_n`` literal conjunct
    restoring Spark's rank-limit pushdown (Partial WindowGroupLimit before
    the shuffle — no task sorts a whole group).

    Determinism note: ``tau = 0.5`` (the default, and the common published
    choice) computes shares via ``sqrt``, which IEEE requires correctly
    rounded — bit-identical across engines, so quota boundaries are
    oracle-exact. Other ``tau`` values use ``pow``, which carries no such
    guarantee (last-ulp drift could flip a ``floor`` at an exact quota
    boundary); they remain deterministic WITHIN Spark.
    """
    from .scale import single_partition_key

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    share = (
        F.sqrt(F.col("__n"))
        if tau == 0.5
        else F.pow(F.col("__n"), F.lit(float(tau)))
    )
    weights = counts.withColumn("__w", share)
    # The normalizer attaches on the BOUNDED group-count table (one row per
    # group), so per scalar_attach's own guidance a single-partition window
    # over it replaces the scalar cross join entirely — no nested-loop node
    # anywhere in the plan.
    wz = W.partitionBy(single_partition_key())
    quotas = weights.withColumn("__z", F.sum("__w").over(wz)).select(
        group_col,
        F.least(
            F.col("__n"),
            F.floor(F.lit(int(total_n)) * F.col("__w") / F.col("__z")),
        )
        .cast("bigint")
        .alias("__quota"),
    )
    w = W.partitionBy(group_col).orderBy(hash_key(id_col, seed), F.col(id_col))
    return (
        df.join(F.broadcast(quotas), group_col)
        .withColumn("__rk", F.row_number().over(w))
        .where(
            (F.col("__rk") <= F.lit(int(total_n)))
            & (F.col("__rk") <= F.col("__quota"))
        )
        .drop("__rk", "__quota")
    )


def mixture_token_plan(
    df: DataFrame,
    weights: dict[str, float],
    total_budget: int,
    source_col: str = "source",
    token_col: str = "n_chars",
    max_epochs: float = 1.0,
) -> DataFrame:
    """Token-budget mixture PLANNER: given target mixture ``weights`` (the
    published recipe shape — e.g. LLaMA's 67% CommonCrawl / 15% C4 / ...),
    a ``total_budget`` in tokens, and an epoch cap, compute what each
    source actually contributes:

    ``(source, weight, available_tokens, target_tokens, allocated_tokens,
    epochs, deficit_tokens)`` where ``target = floor(budget * weight)``,
    ``allocated = min(target, floor(available * max_epochs))``, ``epochs =
    allocated / available`` and ``deficit = target - allocated``.

    This is the planning step every mixture-trained run does BEFORE
    sampling: targets come from the recipe, but a small source cannot fill
    its share without repeating — the epoch cap (Muennighoff et al. 2023
    find ~4 epochs is where repeated data stops helping) turns the naive
    share into an achievable allocation and surfaces the shortfall
    explicitly. Feed the ``allocated_tokens`` column to `mixture_sample` /
    `temperature_mixture_sample` quotas, and re-spread ``deficit_tokens``
    over surplus sources by re-invoking with adjusted weights (one
    re-invocation per refill round, caller-controlled — the one-shot plan
    is deliberately not a hidden fixpoint loop).

    Sources absent from ``weights`` plan at weight 0.0 (kept in the output
    so the exclusion is visible, never silent); weights need not sum to 1
    (the budget is apportioned per-weight as given).

    Scale: one map-side-combined token-sum aggregate (source-cardinality
    rows), the weight table rides in as a broadcast of len(weights) rows,
    and all arithmetic is integer or single IEEE double ops — value-exact
    cross-engine (floor on exactly-representable products).
    """
    spark = df.sparkSession
    avail = df.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(F.col(token_col)).cast("bigint").alias("available_tokens")
    )
    wtbl = spark.createDataFrame(
        [(s, float(w)) for s, w in sorted(weights.items())],
        "source string, weight double",
    )
    j = avail.join(F.broadcast(wtbl), "source", "left").withColumn(
        "weight", F.coalesce("weight", F.lit(0.0))
    )
    target = F.floor(F.lit(int(total_budget)) * F.col("weight")).cast("bigint")
    cap = F.floor(
        F.col("available_tokens") * F.lit(float(max_epochs))
    ).cast("bigint")
    return j.select(
        "source",
        "weight",
        "available_tokens",
        target.alias("target_tokens"),
        F.least(target, cap).alias("allocated_tokens"),
        F.round(
            F.least(target, cap) / F.col("available_tokens"), 6
        ).alias("epochs"),
        (target - F.least(target, cap)).alias("deficit_tokens"),
    )


def mixture_deficit_respread(
    plan: DataFrame,
    max_epochs: float = 1.0,
) -> DataFrame:
    """One refill round over a :func:`mixture_token_plan` output: re-spread
    the plan's total deficit (token mass that capped sources could not
    absorb) across the sources that still have epoch headroom,
    weight-proportionally.

    ``(source, weight, available_tokens, base_tokens, extra_tokens,
    allocated_tokens, epochs, deficit_tokens)`` where ``base`` is the
    first-round allocation, ``extra = min(floor(D * w / W), headroom)``
    with ``D`` the plan's total deficit, ``W`` the 6dp-rounded weight mass
    of eligible sources (headroom > 0 and weight > 0 — zero-weight sources
    are excluded by recipe, so they never absorb spillover), and
    ``headroom = floor(available * max_epochs) - base`` under the SAME
    epoch cap as the plan round. Deliberately ONE explicit round, matching
    `mixture_token_plan`'s documented contract ("one re-invocation per
    refill round, caller-controlled"): a hidden fixpoint loop would make
    the allocation unauditable.

    The output ``deficit_tokens`` column is a SIGNED residual ledger:
    ``input_deficit - extra`` per row, so ``sum(deficit_tokens) = D -
    sum(extra)`` — exactly the mass even this round could not place. A
    capped source (headroom 0) keeps its positive deficit; a source that
    absorbed spillover carries the negative of what it absorbed. Only the
    SUM is meaningful, and because this function reads the input's
    ``allocated_tokens`` as the new base and ``sum(deficit_tokens)`` as
    the new ``D``, the output chains: feeding it straight back through
    ``mixture_deficit_respread`` runs the next refill round with the
    correct remaining mass and shrunken headroom (see
    ``tests/test_profile_ops.py::test_respread_chains``).

    Value-exact cross-engine: ``D`` is an integer, ``W`` is rounded at 6dp
    before use (collapsing aggregation-order ulps), and ``floor(D*w/W)``
    is the identical IEEE expression in Spark and SQL. Note the 6dp
    rounding of ``W`` can round DOWN, in which case ``sum(floor(D*w/W))``
    may exceed the true deficit by up to ``~D * 1e-6 / W`` tokens —
    per-source headroom and the epoch cap still bound every allocation, so
    the over-spread is a bounded, documented bias toward filling the
    budget, never a cap violation.

    Scale shape: the input is source-cardinality by construction, so every
    step is bounded — one 1-row (D, W) aggregate attached via the scalar
    broadcast idiom (`operators/scale.scalar_attach`), then pure
    row-local arithmetic.
    """
    from .scale import scalar_attach

    cap = F.floor(
        F.col("available_tokens") * F.lit(float(max_epochs))
    ).cast("bigint")
    base = plan.select(
        "source",
        "weight",
        "available_tokens",
        F.col("allocated_tokens").alias("base_tokens"),
        "deficit_tokens",
        (cap - F.col("allocated_tokens")).cast("bigint").alias("__headroom"),
    )
    eligible = (F.col("__headroom") > 0) & (F.col("weight") > 0)
    tot = base.agg(
        F.sum("deficit_tokens").cast("bigint").alias("__D"),
        F.round(
            F.sum(F.when(eligible, F.col("weight")).otherwise(F.lit(0.0))), 6
        ).alias("__W"),
    )
    j = scalar_attach(base, tot)
    # greatest(0, ...) guards the chained case where rounding over-spread
    # leaves sum(deficit_tokens) <= 0: a refill round never claws back.
    extra_target = F.when(
        eligible & (F.col("__W") > 0),
        F.greatest(
            F.floor(F.col("__D") * F.col("weight") / F.col("__W")).cast(
                "bigint"
            ),
            F.lit(0).cast("bigint"),
        ),
    ).otherwise(F.lit(0).cast("bigint"))
    extra = F.least(extra_target, F.col("__headroom"))
    alloc = F.col("base_tokens") + extra
    return j.select(
        "source",
        "weight",
        "available_tokens",
        "base_tokens",
        extra.alias("extra_tokens"),
        alloc.alias("allocated_tokens"),
        F.round(alloc / F.col("available_tokens"), 6).alias("epochs"),
        (F.col("deficit_tokens") - extra).cast("bigint").alias(
            "deficit_tokens"
        ),
    )
