"""Distributed graph algorithms over edge-list DataFrames.

Web-scale corpus pipelines rank *sources* by link/trade centrality (domain
PageRank is a standard quality prior for Common Crawl-class corpora) and
need the computation to survive both 100 TB edge lists and cross-engine
verification. The operator here is the Pregel-style matvec done
Spark-first — each iteration is one `join` (ranks x edges on src) + one
map-side-combinable `groupBy(dst)` aggregation, with a FIXED iteration
count so the whole computation is one declarative plan (Catalyst reuses
the edge exchange across iterations; no driver-side collect, no RDDs).

Determinism contract (same family as ``embedding.pca_power_train``): all
arithmetic is SCALED-INTEGER — ranks live in micro-units of ``scale``,
out-contributions use floor division, damping is the exact rational
``17/20`` applied as ``(17 * x) div 20`` — so sums are associative,
partition-order free, and a DuckDB CTE chain reproduces every rank
bit-for-bit. Floor-division mass leakage (< outdeg per node per
iteration, i.e. ~1e-12 of total mass at the default scale) is part of the
defined algorithm, not an error term.

Reference scope note: the reference engine has no graph operators; this
module belongs to the driver-mandated training-data extension surface
(SURVEY §2.4 quality-prior signals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: damping factor 0.85 as the exact rational (17, 20)
_DAMP_NUM, _DAMP_DEN = 17, 20


def pagerank_integer(
    edges: DataFrame,
    iters: int = 6,
    scale: int = 10**12,
    src_col: str = "src",
    dst_col: str = "dst",
    broadcast_ranks: bool = True,
    checkpoint_interval: int = 2,
    weight_col: str | None = None,
) -> DataFrame:
    """Fixed-iteration integer PageRank: ``(node, rank)`` with ``rank`` the
    exact scaled-integer score after ``iters`` rounds.

    ``weight_col`` (integer weights) makes the edge list a PRE-AGGREGATED
    multigraph: an edge ``(s, d, w)`` is exactly ``w`` parallel ``(s, d)``
    edges — ``incoming = sum(w * (rank_src div W_src))`` with ``W_src``
    the weighted out-degree. Because the floor division happens per
    SOURCE before the multiplication, this is bit-identical to feeding
    the exploded multigraph (asserted in tests), while the edge cache
    holds E_distinct rows instead of E_total — the form a 100 TB
    transition graph should arrive in.

    ``edges`` is a directed edge list; nodes are everything that appears as
    a src or dst, and EVERY node appears in the output every round — a
    zero-in-degree node (a pure source) holds exactly the base term
    ``(3*scale) div (20*n)``, matching the textbook recurrence (each round
    re-anchors on the node frame, the same shape as the personalized
    variant). Dangling-node policy stays with the CALLER: a node with
    in-edges but no out-edges keeps its rank yet contributes nothing, so
    its damped mass leaks each round (feed symmetrized edges, or add
    self-loops, to conserve mass — there is no hidden redistribution
    step). Initial rank is ``scale div n``; each round is

        rank' = (3 * scale) div (20 * n)  +  (17 * incoming) div 20
        incoming = sum over in-edges of (rank_src div outdeg_src)

    — all BIGINT ops, so the result is identical under any partitioning
    and any aggregation order.

    ``checkpoint_interval`` bounds lazy-chain re-execution: a round whose
    rank frame is NOT checkpointed gets re-executed once when the next
    round's broadcast materializes, so interval ``k`` trades ``(k-1)``
    extra in-memory O(E) passes per block for ``k-1`` fewer checkpoint
    jobs. Shuffle volume is unchanged either way (the re-executed pass
    rides the dst-partitioned edge cache + broadcasts). The default (2)
    halves the per-round job overhead that dominates small inputs;
    interval 1 is the conservative choice when E is huge and an extra
    O(E) pass costs more than a job submission.
    """
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
        (F.col(weight_col) if weight_col else F.lit(1)).cast("long").alias("w"),
    )
    # the edge set is loop-invariant: materialize it ONCE so the k
    # join+agg rounds re-read a materialized edge list instead of
    # re-running the upstream build k times (without this, every round
    # re-joined the source tables — 0 reused exchanges, ~3x the wall time
    # on the trade graph). The cache is the BARE (src, dst, w) list:
    # attaching outdeg to the edges would force the upstream subtree to
    # execute twice (once aggregated for the degree table, once for the
    # cache itself — measured 1.7s of the 4.5s sf0.1 bench row), and
    # outdeg is a per-SOURCE property anyway, so it rides the
    # node-cardinality broadcast rank side below instead of E rows here.
    # Pre-partitioning the cache by dst makes every round's groupBy(dst)
    # aggregation partition-LOCAL: with ranks arriving by broadcast, a
    # round moves ZERO bytes over the network (measured 38 MB/round -> 0
    # at sf1.0). persist (not localCheckpoint) keeps the partitioning
    # visible to the planner; the cache is released before returning.
    if broadcast_ranks:
        ed = e.repartition("dst").persist()
    else:
        ed = e.localCheckpoint()  # (src, dst)
    # Fused node+degree anchor (r15): ONE exploded map-combined
    # aggregation replaces [union + distinct (2E-row shuffle)] + [degree
    # agg (E-row shuffle)] + [broadcast join] — the r14 shape's three
    # setup stages were ~1s of the 4.8s sf0.1 bench row (per-job
    # breakdown in OPTIMIZATION_r15.md). SUM over an all-null group is
    # NULL, so a node that never appears as a source (a sink) carries
    # outdeg NULL — exactly the semantics the old left join produced;
    # every output value is bit-identical (asserted by the unchanged
    # reference/oracle tests).
    nd = ed.select(
        F.explode(
            F.array(
                F.struct(F.col("src").alias("node"), F.col("w").alias("w_out")),
                F.struct(
                    F.col("dst").alias("node"),
                    F.lit(None).cast("long").alias("w_out"),
                ),
            )
        ).alias("x")
    ).select("x.node", "x.w_out")
    deg_nodes = nd.groupBy("node").agg(F.sum("w_out").alias("outdeg"))
    # The (node, outdeg) anchor frame is checkpointed ONCE and re-read
    # every round — it keeps zero-in-degree nodes in the output, and
    # carrying outdeg as an anchor COLUMN (null for sinks) means the
    # per-round contribution needs no extra node-side join (a per-round
    # ranks x deg join planned as sort-merge and measured +40% on the
    # sf0.1 bench row).
    # repartition("node"): the incoming aggregation below comes out of
    # groupBy(dst) hash-partitioned on the node key with the same
    # partition count, so the per-round re-anchor left join is exchange-
    # free BOTH sides (co-partitioned) — no per-round broadcast build job
    # and zero shuffled bytes, measured against both alternatives.
    anchor = deg_nodes.repartition("node").localCheckpoint()
    # n and the per-round base term are DRIVER scalars folded in as
    # literals (r15). The previous 1-row crossJoin broadcast cost a
    # separate broadcast-build job that re-ran the whole exploded degree
    # aggregation over the edge cache — exchange reuse does not span
    # jobs, so the anchor's heaviest pass executed TWICE (0.41s + 0.43s
    # of the sf0.1 row). The count below reads the CHECKPOINTED anchor
    # (node-cardinality, no recompute); Python // on non-negative ints
    # is exactly BIGINT div, so every rank is bit-identical.
    n = anchor.count()
    base_term = (3 * int(scale)) // (20 * n) if n else 0
    init_rank = int(scale) // n if n else 0
    ranks = anchor.select(
        "node",
        F.lit(init_rank).cast("long").alias("rank"),
        "outdeg",
    )
    for it in range(iters):
        # ranks is node-cardinality (orders of magnitude under the edge
        # list); pre-divide by the carried outdeg and broadcast, so each
        # round is a map-side edge join + a partition-local aggregation
        # and the materialized edge list never moves. For billion-node
        # graphs pass broadcast_ranks=False to fall back to a shuffle
        # join.
        rside = ranks.where(F.col("outdeg").isNotNull()).select(
            F.col("node").alias("src"), F.expr("rank div outdeg").alias("q")
        )
        if broadcast_ranks:
            rside = F.broadcast(rside)
        # w * (rank div W_src): the per-source division precedes the
        # weight multiplication, which is what makes the pre-aggregated
        # form bit-identical to the exploded multigraph
        contrib = ed.join(rside, "src").select("dst", F.expr("w * q").alias("c"))
        incoming = contrib.groupBy("dst").agg(F.sum("c").alias("inc"))
        # co-partitioned with anchor (both HashPartitioning(node, P)):
        # the left join plans with no exchange and no broadcast build
        inc_side = incoming.select(F.col("dst").alias("node"), "inc")
        ranks = anchor.join(inc_side, "node", "left").select(
            "node",
            (
                F.lit(base_term).cast("long")
                + F.expr(
                    f"CAST({_DAMP_NUM} AS BIGINT) * coalesce(inc, CAST(0 AS BIGINT))"
                    f" div {_DAMP_DEN}"
                )
            ).alias("rank"),
            "outdeg",
        )
        # materialize the (tiny) rank table every checkpoint_interval
        # rounds: chaining ALL k rounds lazily means every round's
        # broadcast re-executes the rounds before it — quadratic
        # re-execution that measured 3.9x the shuffle volume at the sf1.0
        # decade (SCALING.md). Checkpointing every round makes per-round
        # work O(E) exactly once but costs one job per round, which is
        # ~80% of the sf0.1 bench row; the interval bounds re-execution
        # at (interval-1) extra O(E) passes per block instead.
        # INTERMEDIATE checkpoints are LAZY (r15): the next round's
        # broadcast build computes every partition of the rank frame
        # anyway, so the checkpoint saves during that job instead of
        # paying its own materialization job — same re-execution bound,
        # one job fewer per checkpoint. The FINAL checkpoint stays eager:
        # it must materialize before the edge cache is unpersisted below
        # (a lazy final frame would re-derive the edges from source at
        # the caller's first action).
        if (it + 1) % max(1, checkpoint_interval) == 0 or it == iters - 1:
            ranks = ranks.localCheckpoint(eager=(it == iters - 1))
    out = ranks.select("node", "rank")
    if broadcast_ranks:
        # the final ranks are checkpoint-materialized; the edge cache is
        # no longer referenced
        ed.unpersist(blocking=False)
    return out


def pagerank_personalized_integer(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 6,
    scale: int = 10**12,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    broadcast_ranks: bool = True,
    checkpoint_interval: int = 2,
) -> DataFrame:
    """Personalized PageRank (random walk with restart to a SEED SET) under
    the same integer-exactness contract as :func:`pagerank_integer` —
    the data-selection variant: rank every node by proximity to a trusted
    seed set (quality-seeded source ranking, seed-anchored retrieval).

    The restart mass goes ONLY to seeds: per round,

        rank' = (seed ? (3 * scale) div (20 * |S|) : 0)
                + (17 * incoming) div 20

    with ``|S|`` the seed count and the initial rank ``scale div |S|`` on
    seeds, 0 elsewhere. Non-seed nodes therefore hold mass purely through
    graph proximity. Seeds ride a broadcast into the node frame; the
    round structure (and the scale story) is identical to the uniform
    operator."""
    e = edges.select(
        F.col(src_col).cast("long").alias("src"), F.col(dst_col).cast("long").alias("dst")
    )
    # bare dst-partitioned edge cache + degree table derived FROM the
    # cache, for the same reasons as pagerank_integer: the upstream edge
    # build executes exactly once, the edge list never shuffles after its
    # build, and every round's aggregation is partition-local
    if broadcast_ranks:
        ed = e.repartition("dst").persist()
    else:
        ed = e.localCheckpoint()
    # Fused node+degree frame (r15, same construction and rationale as
    # pagerank_integer's anchor): one exploded map-combined aggregation
    # instead of union+distinct+degree-agg+join; SUM over all-null = NULL
    # marks sinks exactly as the old left join did.
    nd = ed.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("src").alias("node"), F.lit(1).cast("long").alias("w_out")
                ),
                F.struct(
                    F.col("dst").alias("node"),
                    F.lit(None).cast("long").alias("w_out"),
                ),
            )
        ).alias("x")
    ).select("x.node", "x.w_out")
    deg_nodes = nd.groupBy("node").agg(F.sum("w_out").alias("outdeg"))
    sd = seeds.select(F.col(seed_col).cast("long").alias("node")).distinct()
    # the marked node frame carries outdeg (null for sinks), for the same
    # reason as pagerank_integer's anchor: the per-round restart term and
    # contribution divide node-side with no extra join.
    # repartition("node") co-partitions it with the per-round incoming
    # aggregation: the re-anchor join plans exchange-free.
    marked = (
        deg_nodes.join(
            F.broadcast(sd.withColumn("is_seed", F.lit(True))), "node", "left"
        )
        .select(
            "node",
            F.coalesce("is_seed", F.lit(False)).alias("is_seed"),
            "outdeg",
        )
        .repartition("node")
        .localCheckpoint()
    )
    # |S| as a DRIVER scalar folded in as literals (r15, mirrors
    # pagerank_integer): the 1-row crossJoin broadcast cost a separate
    # build job. NOTE the count is over sd, NOT over marked's seed rows —
    # a seed absent from the graph still belongs in the restart
    # denominator (the textbook contract, unchanged). Python // ==
    # BIGINT div on non-negative ints, so ranks are bit-identical.
    ns = sd.count()
    seed_base = (3 * int(scale)) // (20 * ns) if ns else 0
    seed_init = int(scale) // ns if ns else 0
    ranks = marked.select(
        "node",
        "is_seed",
        F.expr(
            f"CASE WHEN is_seed THEN CAST({seed_init} AS BIGINT) "
            "ELSE CAST(0 AS BIGINT) END"
        ).alias("rank"),
        "outdeg",
    )
    for it in range(iters):
        rside = ranks.where(F.col("outdeg").isNotNull()).select(
            F.col("node").alias("src"), F.expr("rank div outdeg").alias("c")
        )
        if broadcast_ranks:
            rside = F.broadcast(rside)
        contrib = ed.join(rside, "src").select("dst", "c")
        incoming = contrib.groupBy("dst").agg(F.sum("c").alias("inc"))
        # co-partitioned with marked on the node key: exchange-free join
        inc_side = incoming.select(F.col("dst").alias("node"), "inc")
        # a node with no in-edges this round simply drops out of `incoming`;
        # re-anchor on the marked node frame so seeds always restart. The
        # checkpoint cadence (same rationale + trade as pagerank_integer)
        # bounds lazy-chain re-execution at (interval-1) extra O(E) passes
        # per block.
        ranks = marked.join(inc_side, "node", "left").select(
            "node",
            "is_seed",
            (
                F.expr(
                    f"CASE WHEN is_seed THEN CAST({seed_base} AS BIGINT) "
                    "ELSE CAST(0 AS BIGINT) END"
                )
                + F.expr(
                    f"CAST({_DAMP_NUM} AS BIGINT) * coalesce(inc, CAST(0 AS BIGINT)) div {_DAMP_DEN}"
                )
            ).alias("rank"),
            "outdeg",
        )
        # lazy intermediate / eager final, as in pagerank_integer (r15)
        if (it + 1) % max(1, checkpoint_interval) == 0 or it == iters - 1:
            ranks = ranks.localCheckpoint(eager=(it == iters - 1))
    out = ranks.select("node", "rank")
    if broadcast_ranks:
        ed.unpersist(blocking=False)
    return out


def pagerank_personalized_integer_sql(
    edges_sql: str,
    seeds_sql: str,
    iters: int = 6,
    scale: int = 10**12,
) -> str:
    """DuckDB twin of :func:`pagerank_personalized_integer` — the same
    unrolled integer CTE chain with the restart mass confined to the seed
    set and every round re-anchored on the full node frame (so seeds
    restart even with zero inflow)."""
    base = f"""
    e AS (SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst FROM ({edges_sql})),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    sd AS (SELECT DISTINCT CAST(node AS BIGINT) AS node FROM ({seeds_sql})),
    ns AS (SELECT CAST(count(*) AS BIGINT) AS ns FROM sd),
    mk AS (SELECT n.node, sd.node IS NOT NULL AS is_seed
           FROM nodes n LEFT JOIN sd ON sd.node = n.node),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY src),
    ed AS (SELECT e.src, e.dst, deg.outdeg FROM e JOIN deg USING (src)),
    r0 AS (SELECT node, CASE WHEN is_seed THEN CAST({int(scale)} AS BIGINT) // ns
                             ELSE CAST(0 AS BIGINT) END AS rank
           FROM mk, ns)"""
    steps = []
    for t in range(iters):
        steps.append(f"""
    i{t + 1} AS (
      SELECT ed.dst AS node, SUM(r{t}.rank // ed.outdeg) AS inc
      FROM ed JOIN r{t} ON r{t}.node = ed.src
      GROUP BY ed.dst
    ),
    r{t + 1} AS (
      SELECT mk.node,
             (CASE WHEN mk.is_seed THEN CAST(3 * {int(scale)} AS BIGINT) // (20 * ns.ns)
                   ELSE CAST(0 AS BIGINT) END)
             + (CAST({_DAMP_NUM} AS BIGINT) * COALESCE(i{t + 1}.inc, 0)) // {_DAMP_DEN} AS rank
      FROM mk LEFT JOIN i{t + 1} USING (node) CROSS JOIN ns
    )""")
    return "WITH" + ",".join([base] + steps) + f"\n    SELECT node, rank FROM r{iters}"


def pagerank_integer_sql(
    edges_sql: str,
    iters: int = 6,
    scale: int = 10**12,
    weighted: bool = False,
) -> str:
    """DuckDB twin of :func:`pagerank_integer` as an unrolled CTE chain —
    ``edges_sql`` must yield ``(src, dst)`` (or ``(src, dst, w)`` with
    ``weighted=True`` — the pre-aggregated multigraph form, same
    recurrence: ``inc = SUM(w * (rank // W_src))``). Because every
    operation is integer, the GROUP BY sums need no ordering discipline;
    the chain is bit-exact against the Spark plan by construction. Every
    round re-anchors on the full node frame (LEFT JOIN + COALESCE),
    matching the operator: zero-in-degree nodes hold exactly the base
    term."""
    wexpr = "CAST(w AS BIGINT)" if weighted else "CAST(1 AS BIGINT)"
    base = f"""
    e AS (SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst, {wexpr} AS w
          FROM ({edges_sql})),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
    deg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outdeg FROM e GROUP BY src),
    ed AS (SELECT e.src, e.dst, e.w, deg.outdeg FROM e JOIN deg USING (src)),
    r0 AS (SELECT node, CAST({int(scale)} AS BIGINT) // n AS rank FROM nodes, nn)"""
    steps = []
    for t in range(iters):
        steps.append(f"""
    i{t + 1} AS (
      SELECT ed.dst AS node, SUM(ed.w * (r{t}.rank // ed.outdeg)) AS inc
      FROM ed JOIN r{t} ON r{t}.node = ed.src
      GROUP BY ed.dst
    ),
    r{t + 1} AS (
      SELECT nodes.node,
             (CAST(3 * {int(scale)} AS BIGINT) // (20 * nn.n))
             + (CAST({_DAMP_NUM} AS BIGINT) * COALESCE(i{t + 1}.inc, 0)) // {_DAMP_DEN} AS rank
      FROM nodes LEFT JOIN i{t + 1} USING (node) CROSS JOIN nn
    )""")
    return "WITH" + ",".join([base] + steps) + f"\n    SELECT node, rank FROM r{iters}"


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    lcc_scale: int = 10**6,
) -> DataFrame:
    """Per-node triangle counts + exact local clustering coefficient
    (scaled integer) over the UNDIRECTED graph induced by ``edges``
    (either/both directions accepted; self-loops dropped, parallel edges
    collapsed). Output: ``(node, tri, deg, lcc_micro)`` where ``tri`` is
    the number of triangles the node participates in, ``deg`` its
    undirected degree, and ``lcc_micro = (2*tri*lcc_scale) div
    (deg*(deg-1))`` for ``deg >= 2`` else 0 — all BIGINT, so the result
    is bit-identical under any partitioning and a DuckDB twin
    (:func:`triangle_counts_sql`) reproduces it exactly.

    The corpus-pipeline use is near-dup TRANSITIVITY auditing: if the
    near-dup relation were perfectly transitive, every connected
    component would be a clique (lcc 1.0 everywhere); low-lcc/high-degree
    nodes are hub documents gluing unrelated clusters — exactly the rows
    a threshold sweep should inspect before component-collapse dedup.

    Scale design (the standard degree-orientation bound, Chiba-Nishizeki
    / Cohen's MapReduce formulation): every undirected edge is oriented
    from its lower-(degree, id) endpoint to the higher one, so each
    node's ORIENTED out-degree is O(sqrt(E)) regardless of skew — a
    celebrity node with 1e6 followers contributes no wedge unless both
    endpoints rank above it. Wedge generation is a self-equi-join of the
    oriented list on its source (total wedge volume sum(outdeg^2) =
    O(E^1.5) worst-case instead of sum(deg^2), which is unbounded under
    skew); closing is one equi-join of wedges against oriented edges on
    the composite (lo, hi) key. Three shuffles total (degree agg, wedge
    join, closing join), all on equi-keys, AQE-eligible; no collect, no
    per-row Python. The orientation key packs (degree, node) into one
    BIGINT ``deg * 2**32 + node`` — valid while node ids stay in
    ``[0, 2**32)``, GUARDED in-plan: an out-of-range id raises from the
    node-cardinality degree frame before any wedge is built (a silent
    mis-order would corrupt Spark and the DuckDB twin identically, so
    oracle parity could never catch it).
    """
    e = edges.select(
        F.col(src_col).cast("long").alias("x"), F.col(dst_col).cast("long").alias("y")
    ).where(F.col("x") != F.col("y"))
    und = e.select(
        F.least("x", "y").alias("u"), F.greatest("x", "y").alias("v")
    ).distinct()
    # materialized once: the degree aggregate and both orientation joins
    # read it; without this the upstream pair generator (often an LSH
    # pipeline) would execute three times.
    und = und.localCheckpoint()
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # The packing is only an order-embedding of (d, node) while ids sit in
    # [0, 2^32); outside it the orientation silently corrupts AND the DuckDB
    # twin corrupts identically (shared packing), so oracle parity cannot
    # catch it — guard in-plan instead (ADVICE r14): one codegen CASE per
    # NODE row (not per edge), raising before any wedge is built.
    id_ok = (F.col("node") >= 0) & (F.col("node") < F.lit(1 << 32))
    k = deg.select(
        "node",
        F.when(id_ok, F.col("d") * F.lit(1 << 32) + F.col("node"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "triangle_counts: node id outside [0, 2^32) breaks the"
                        " (deg, id) packing; remap ids first: "
                    ),
                    F.col("node").cast("string"),
                )
            )
        )
        .alias("okey"),
    )
    # degree table is node-cardinality (<= 2E rows of 16 bytes) — ride it
    # in as a broadcast on both endpoint joins so the edge list never
    # re-shuffles for orientation.
    ek = und.join(
        F.broadcast(k.select(F.col("node").alias("u"), F.col("okey").alias("ku"))), "u"
    ).join(
        F.broadcast(k.select(F.col("node").alias("v"), F.col("okey").alias("kv"))), "v"
    )
    lower = F.col("ku") < F.col("kv")
    orient = ek.select(
        F.when(lower, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(lower, F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(lower, F.col("kv")).otherwise(F.col("ku")).alias("kt"),
    ).localCheckpoint()  # three readers: two wedge sides + the closing set
    a, b = orient.alias("a"), orient.alias("b")
    wedges = (
        a.join(b, "s")
        .where(F.col("a.kt") < F.col("b.kt"))
        .select(F.col("s"), F.col("a.t").alias("p"), F.col("b.t").alias("q"))
    )
    closing = orient.select(F.col("s").alias("p"), F.col("t").alias("q"))
    tri = wedges.join(closing, ["p", "q"])  # one row per triangle (s, p, q)
    per = (
        tri.select(F.explode(F.array("s", "p", "q")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("tri"))
    )
    return deg.join(per, "node", "left").select(
        "node",
        F.coalesce(F.col("tri"), F.lit(0)).cast("bigint").alias("tri"),
        F.col("d").cast("bigint").alias("deg"),
        F.when(
            F.col("d") >= 2,
            F.expr(
                f"CAST(2 * coalesce(tri, 0) * {int(lcc_scale)} AS BIGINT)"
                " div (d * (d - 1))"
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("lcc_micro"),
    )


def triangle_counts_sql(edges_sql: str, lcc_scale: int = 10**6) -> str:
    """DuckDB twin of :func:`triangle_counts` — same canonicalization,
    same (degree, id) orientation key, same wedge/close joins; integer
    arithmetic throughout, so the result is bit-identical."""
    # multiply-referenced CTEs are MATERIALIZED: DuckDB would otherwise
    # inline `und` (3 readers) and `ori` (3 readers) textually, re-running
    # the upstream edge generator (often a whole LSH pipeline) once per
    # reference — the same single-execution discipline as the Spark
    # side's localCheckpoints.
    return f"""
    WITH e0 AS (SELECT CAST(src AS BIGINT) AS x, CAST(dst AS BIGINT) AS y
                FROM ({edges_sql}) WHERE src <> dst),
    und AS MATERIALIZED (SELECT LEAST(x, y) AS u, GREATEST(x, y) AS v
                         FROM e0 GROUP BY 1, 2),
    dg AS MATERIALIZED (SELECT node, CAST(COUNT(*) AS BIGINT) AS d
           FROM (SELECT u AS node FROM und UNION ALL SELECT v FROM und)
           GROUP BY 1),
    kk AS (SELECT node, d * 4294967296 + node AS okey FROM dg),
    ori AS MATERIALIZED (
            SELECT CASE WHEN ku.okey < kv.okey THEN und.u ELSE und.v END AS s,
                   CASE WHEN ku.okey < kv.okey THEN und.v ELSE und.u END AS t,
                   CASE WHEN ku.okey < kv.okey THEN kv.okey ELSE ku.okey END AS kt
            FROM und JOIN kk ku ON ku.node = und.u JOIN kk kv ON kv.node = und.v),
    wdg AS (SELECT a.s AS s, a.t AS p, b.t AS q
            FROM ori a JOIN ori b ON a.s = b.s AND a.kt < b.kt),
    tri AS (SELECT wdg.s, wdg.p, wdg.q
            FROM wdg JOIN (SELECT s AS p, t AS q FROM ori) c USING (p, q)),
    per AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS tri
            FROM (SELECT s AS node FROM tri UNION ALL
                  SELECT p FROM tri UNION ALL
                  SELECT q FROM tri)
            GROUP BY 1)
    SELECT dg.node,
           CAST(COALESCE(per.tri, 0) AS BIGINT) AS tri,
           dg.d AS deg,
           CASE WHEN dg.d >= 2
                THEN (2 * COALESCE(per.tri, 0) * {int(lcc_scale)}) // (dg.d * (dg.d - 1))
                ELSE 0 END AS lcc_micro
    FROM dg LEFT JOIN per USING (node)
    """


def kcore_peel(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    broadcast_keep: bool = True,
    stats: dict | None = None,
) -> DataFrame:
    """Fixed-round k-core peeling over the undirected graph induced by
    ``edges``: repeat ``rounds`` times { drop every node of current
    degree < ``k``, drop its incident edges }, then return the survivors
    with their degree in the FINAL surviving subgraph —
    ``(node, deg_final)``, all BIGINT.

    A node can survive the last FILTER yet end below ``k`` when its
    neighbours died in the same round — that is the defined fixed-round
    semantics (same family as the fixed-iteration PageRank contract); at
    the fixpoint (``rounds`` >= peel depth, asserted on fixtures by
    comparing rounds R and R-1) the output IS the classical k-core.

    Corpus-pipeline use: dense cores of the near-dup graph are the
    mirrored/boilerplate clusters worth dropping at the SOURCE — the
    k-core is the standard "densely interlinked subset" extractor (web
    spam / boilerplate farms are high-core; organic near-dup pairs peel
    away immediately).

    Scale design: each round is one degree aggregation (map-side
    combinable) + two semi-joins of the edge list against the surviving
    node set. The node set rides a BROADCAST by default
    (node-cardinality, shrinks every round); past ~1e8 surviving nodes
    pass ``broadcast_keep=False`` to run the same two semi-joins as
    shuffle joins instead — bit-identical output (the semi-join is
    set-semantic either way), O(E_r) shuffled per round, the same
    escape hatch `pagerank_integer` exposes via ``broadcast_ranks``.
    The edge list is filtered in place and localCheckpoint'd per round,
    so round r+1 reads round r's O(E_r) result instead of re-executing
    the whole chain — the same bounded-re-execution discipline as
    `pagerank_integer`. No collect beyond one scalar count per round:
    a round that would drop ZERO nodes is the fixpoint — every later
    round is a no-op, so the loop exits early and ``rounds`` is a CAP
    on work, not a cost (the per-round count is the same cheap action
    the `connected_components` loop uses; it rides the degree
    aggregate that the round computes anyway). ``stats`` (optional
    dict) records ``rounds_run`` for tests/audits.
    """
    e = edges.select(
        F.col(src_col).cast("long").alias("x"), F.col(dst_col).cast("long").alias("y")
    ).where(F.col("x") != F.col("y"))
    cur = (
        e.select(F.least("x", "y").alias("u"), F.greatest("x", "y").alias("v"))
        .distinct()
        .localCheckpoint()
    )
    rounds_run = 0
    for _ in range(rounds):
        dg = (
            cur.select(F.col("u").alias("node"))
            .unionAll(cur.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        # fixpoint probe: one tiny 2-scalar agg over the node-cardinality
        # degree frame (computed this round regardless). All nodes already
        # >= k -> nothing peels now or ever after; stop.
        probe = dg.agg(
            F.count(F.lit(1)).alias("n_cur"),
            F.sum((F.col("d") >= k).cast("long")).alias("n_keep"),
        ).first()
        if probe.n_cur == 0 or probe.n_keep == probe.n_cur:
            break
        rounds_run += 1
        keep = dg.where(F.col("d") >= k).select("node")
        ku = keep.select(F.col("node").alias("u"))
        kv = keep.select(F.col("node").alias("v"))
        if broadcast_keep:
            ku, kv = F.broadcast(ku), F.broadcast(kv)
        cur = (
            cur.join(ku, "u", "semi")
            .join(kv, "v", "semi")
            .select("u", "v")
            .localCheckpoint()
        )
    if stats is not None:
        stats["rounds_run"] = rounds_run
    final_deg = (
        cur.select(F.col("u").alias("node"))
        .unionAll(cur.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg_final"))
    )
    return final_deg


def kcore_peel_sql(edges_sql: str, k: int = 3, rounds: int = 4) -> str:
    """DuckDB twin of :func:`kcore_peel` — the same peel rounds unrolled
    as a CTE chain (degree -> keep -> filtered edges per round)."""
    # every e{r} has three readers (the degree union's two legs + the next
    # round's filter); without MATERIALIZED DuckDB inlines the chain
    # textually, exploding the upstream edge generator 3^rounds times
    # (measured: the minhash-pair generator alone exhausts the fd limit
    # at rounds=4). Same single-execution discipline as the Spark side's
    # per-round localCheckpoints.
    base = f"""
    e0x AS (SELECT CAST(src AS BIGINT) AS x, CAST(dst AS BIGINT) AS y
            FROM ({edges_sql}) WHERE src <> dst),
    e0 AS MATERIALIZED (SELECT LEAST(x, y) AS u, GREATEST(x, y) AS v
                        FROM e0x GROUP BY 1, 2)"""
    steps = []
    for r in range(rounds):
        steps.append(f"""
    d{r} AS (SELECT node, COUNT(*) AS d
             FROM (SELECT u AS node FROM e{r} UNION ALL SELECT v FROM e{r})
             GROUP BY 1),
    k{r} AS (SELECT node FROM d{r} WHERE d >= {int(k)}),
    e{r + 1} AS MATERIALIZED (SELECT e{r}.u, e{r}.v
                 FROM e{r}
                 JOIN k{r} a ON e{r}.u = a.node
                 JOIN k{r} b ON e{r}.v = b.node)""")
    return (
        "WITH" + ",".join([base] + steps)
        + f"""
    SELECT node, CAST(COUNT(*) AS BIGINT) AS deg_final
    FROM (SELECT u AS node FROM e{rounds} UNION ALL SELECT v FROM e{rounds})
    GROUP BY 1
    """
    )


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
    checkpoint_interval: int = 2,
    broadcast_labels: bool = True,
) -> DataFrame:
    """Clamped semi-supervised label propagation: seed nodes keep their
    (integer) label forever; every round each node adopts the MODAL label
    of its labeled in-neighbors, ties broken to the smallest label —
    fully deterministic, so a DuckDB unrolled-CTE twin
    (:func:`label_propagation_sql`) reproduces it exactly. Output:
    ``(node, label)`` with ``label`` NULL for nodes no label reached
    within ``rounds``.

    This is the label-SPREADING selector ("extend my curated labels to
    everything similar") that complements the PPR seed-set expansion: PPR
    ranks proximity to one seed set; label propagation ASSIGNS among
    competing seed sets. Raghavan et al. 2007 shape, restricted to fixed
    rounds + clamped seeds for determinism (free-running LPA is
    order-dependent; the clamped modal rule is not).

    Scale design (same discipline as :func:`pagerank_integer`): the edge
    list is loop-invariant — materialized once, pre-partitioned on dst so
    every round's modal count is partition-local; the label frame is
    node-cardinality and rides a broadcast into the edge join (past ~1e8
    nodes pass ``broadcast_labels=False``: the per-round label join runs
    as a shuffle join against the checkpointed edge list instead —
    bit-identical output, O(E) shuffled per round, the same fallback
    contract as ``pagerank_integer(broadcast_ranks=False)``); the modal
    pick folds into a second hash aggregation (max(struct(count,
    -label)) — partial map-side, no rank window) — bounded by labels-per-node,
    not corpus size; seeds are clamped by re-anchoring on a checkpointed
    (node, seed_label) frame each round, which also keeps never-reached
    nodes in the output. ``checkpoint_interval`` bounds lazy-chain
    re-execution exactly as in the PageRank loops.
    """
    e = edges.select(
        F.col(src_col).cast("long").alias("src"), F.col(dst_col).cast("long").alias("dst")
    )
    # broadcast leg: dst-partitioned cache makes the per-round modal count
    # partition-local (rounds move ~0 bytes). Fallback leg: bare checkpoint
    # — the per-round join shuffles on src anyway, so pre-partitioning on
    # dst would only add an extra exchange (mirrors pagerank_integer).
    ed = e.repartition("dst").persist() if broadcast_labels else e.localCheckpoint()
    # node set in ONE pass over the edge cache (explode both endpoints,
    # map-side-partial distinct) instead of a two-leg union — r15, same
    # rationale as the fused pagerank anchor
    nodes = (
        ed.select(F.explode(F.array("src", "dst")).alias("node")).distinct()
    )
    # one label per seed node, deterministically (min) — callers passing a
    # conflicting seed frame get the smallest label, not a race
    sd = (
        seeds.select(
            F.col(node_col).cast("long").alias("node"),
            F.col(label_col).cast("long").alias("seed_lbl"),
        )
        .groupBy("node")
        .agg(F.min("seed_lbl").alias("seed_lbl"))
    )
    anchor = (
        nodes.join(F.broadcast(sd), "node", "left")
        .repartition("node")
        .localCheckpoint()
    )
    labels = anchor.select("node", F.col("seed_lbl").alias("lbl"))
    for it in range(rounds):
        lsrc = labels.where(F.col("lbl").isNotNull()).select(
            F.col("node").alias("src"), "lbl"
        )
        if broadcast_labels:
            lsrc = F.broadcast(lsrc)
        cnt = (
            ed.join(lsrc, "src")
            .groupBy("dst", "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # modal pick as max(struct(c, -lbl)) — highest count, ties to the
        # SMALLEST label — instead of a rank-window: stays in hash-agg
        # land (partial max map-side), one sort fewer per round
        pick = (
            cnt.groupBy("dst")
            .agg(F.max(F.struct(F.col("c"), (-F.col("lbl")).alias("nl"))).alias("m"))
            .select(F.col("dst").alias("node"), (-F.col("m.nl")).alias("prop_lbl"))
        )
        labels = anchor.join(pick, "node", "left").select(
            "node", F.coalesce("seed_lbl", "prop_lbl").alias("lbl")
        )
        # lazy intermediate / eager final, as in pagerank_integer (r15)
        if (it + 1) % max(1, checkpoint_interval) == 0 or it == rounds - 1:
            labels = labels.localCheckpoint(eager=(it == rounds - 1))
    out = labels.select("node", F.col("lbl").alias("label"))
    if broadcast_labels:
        ed.unpersist(blocking=False)
    return out


def label_propagation_sql(
    edges_sql: str, seeds_sql: str, rounds: int = 4
) -> str:
    """DuckDB twin of :func:`label_propagation` — the same clamped modal
    recurrence unrolled; ``seeds_sql`` must yield ``(node, label)``.
    The edge and anchor CTEs are MATERIALIZED (multiple readers across
    the unrolled rounds — the kcore_peel_sql inlining lesson)."""
    base = f"""
    e AS MATERIALIZED (SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst
                       FROM ({edges_sql})),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    sd AS (SELECT CAST(node AS BIGINT) AS node, MIN(CAST(label AS BIGINT)) AS seed_lbl
           FROM ({seeds_sql}) GROUP BY 1),
    anc AS MATERIALIZED (SELECT n.node, sd.seed_lbl
                         FROM nodes n LEFT JOIN sd USING (node)),
    l0 AS (SELECT node, seed_lbl AS lbl FROM anc)"""
    steps = []
    for t in range(rounds):
        steps.append(f"""
    c{t} AS (SELECT e.dst, l.lbl, COUNT(*) AS c
             FROM e JOIN l{t} l ON l.node = e.src AND l.lbl IS NOT NULL
             GROUP BY 1, 2),
    p{t} AS (SELECT dst AS node, lbl FROM c{t}
             QUALIFY ROW_NUMBER() OVER (PARTITION BY dst ORDER BY c DESC, lbl ASC) = 1),
    l{t + 1} AS (SELECT anc.node, COALESCE(anc.seed_lbl, p.lbl) AS lbl
                 FROM anc LEFT JOIN p{t} p USING (node))""")
    return (
        "WITH" + ",".join([base] + steps)
        + f"\n    SELECT node, lbl AS label FROM l{rounds}"
    )
