"""Property-based tests (hypothesis): upsert final-state semantics against a
pure-Python model, and sketch error bounds. Few, fat examples — each example
pays Spark job latency, so the strategies favor breadth per example."""

from __future__ import annotations

import sqlite3
from functools import partial

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bonobo_sqlalchemy_spark import DbapiService, Graph, InsertOrUpdate, run
from pyspark.sql import functions as F

rows_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=30), st.text(min_size=0, max_size=8)),
    min_size=0,
    max_size=40,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(first=rows_strategy, second=rows_strategy)
def test_upsert_final_state_matches_model(spark, tmp_path_factory, first, second):
    """Two sequential upsert batches must leave the table equal to the
    dict-model: apply batch1 keep-last-per-key, then batch2 keep-last-per-key
    overwriting batch1."""
    db = str(tmp_path_factory.mktemp("prop") / "t.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, value VARCHAR)")
    con.commit(); con.close()
    services = {"sqlalchemy.engine": DbapiService(partial(sqlite3.connect, db))}

    model: dict[int, str] = {}
    for batch in (first, second):
        if batch:
            # keep-last within a batch (documented set-based semantics)
            for k, v in batch:
                model[k] = v
            df = spark.createDataFrame(batch, "id int, value string").coalesce(1)
            run(Graph(df, InsertOrUpdate("t")), spark, services=services)

    con = sqlite3.connect(db)
    got = dict(con.execute("SELECT id, value FROM t").fetchall())
    con.close()
    assert got == model


def test_approx_distinct_error_bound(spark, sf_small):
    from bonobo_sqlalchemy_spark.queries import REGISTRY

    rows = REGISTRY["q_approx_distinct"].spark(spark, sf_small).collect()
    assert rows
    for r in rows:
        # the query exposes the bound check itself (driver-comparable);
        # both flags must hold on every group
        assert r.orders_within_bounds and r.parts_within_bounds
        assert r.exact_orders > 0 and r.exact_parts > 0


def test_asof_join_matches_naive_on_random_data(spark):
    """Differential check: the union+window as-of join must equal the naive
    (join-all-priors, keep latest) formulation on randomized data with key
    skew and boundary ties."""
    import datetime as dt
    import random

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from bonobo_sqlalchemy_spark.operators.asof import as_of_join

    rng = random.Random(1234)
    base = dt.datetime(2024, 1, 1)
    lrows = [
        (i, f"k{rng.randrange(5)}", base + dt.timedelta(seconds=rng.randrange(10000)))
        for i in range(300)
    ]
    seen = set()
    rrows = []
    for _ in range(120):
        k = f"k{rng.randrange(5)}"
        ts = base + dt.timedelta(seconds=rng.randrange(10000))
        if (k, ts) in seen:  # unique (key, ts): keeps both formulations deterministic
            continue
        seen.add((k, ts))
        rrows.append((k, ts, rng.random()))
    left = spark.createDataFrame(lrows, "lid long, key string, ts timestamp")
    right = spark.createDataFrame(rrows, "key string, ts timestamp, payload double")

    got = {
        (r.lid, r.r_ts, r.r_payload)
        for r in as_of_join(left, right, on=["key"]).collect()
    }
    j = left.join(
        right.select("key", F.col("ts").alias("rts"), "payload"),
        on=[left.key == right.key, F.col("rts") <= left.ts],
        how="left",
    )
    w = W.partitionBy("lid").orderBy(F.col("rts").desc())
    naive = {
        (r.lid, r.rts, r.payload)
        for r in j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .collect()
    }
    assert got == naive


def test_interval_join_matches_naive_on_random_data(spark):
    """Differential check: binned interval join == naive key-equal BETWEEN
    join on randomized points/intervals (including zero-length and
    bin-straddling intervals)."""
    import datetime as dt
    import random

    from pyspark.sql import functions as F

    from bonobo_sqlalchemy_spark.operators.rangejoin import interval_join

    rng = random.Random(99)
    base = dt.datetime(2024, 1, 1)
    pts = [
        (i, f"k{rng.randrange(4)}", base + dt.timedelta(seconds=rng.randrange(200000)))
        for i in range(400)
    ]
    ivs = []
    for i in range(80):
        s = rng.randrange(200000)
        ivs.append(
            (
                i,
                f"k{rng.randrange(4)}",
                base + dt.timedelta(seconds=s),
                base + dt.timedelta(seconds=s + rng.choice([0, 30, 3600, 90000])),
            )
        )
    points = spark.createDataFrame(pts, "pid long, key string, ts timestamp")
    intervals = spark.createDataFrame(ivs, "iid long, key string, s timestamp, e timestamp")

    got = {
        (r.pid, r.iid)
        for r in interval_join(
            points, intervals, on=["key"], ts_col="ts", start_col="s", end_col="e",
            bin_width="1 hour",
        ).collect()
    }
    naive = {
        (r.pid, r.iid)
        for r in points.alias("p")
        .join(
            intervals.alias("i"),
            (F.col("p.key") == F.col("i.key"))
            & (F.col("p.ts") >= F.col("i.s"))
            & (F.col("p.ts") <= F.col("i.e")),
        )
        .collect()
    }
    assert got == naive and got


def test_interleave_bits_is_bijective_property(spark):
    """Morton key bijectivity: de-interleaving the Spark-computed key
    recovers (x, y) exactly for random 16-bit pairs — no collisions, no
    bit loss (hypothesis-driven sample of the 2^32 domain)."""
    from hypothesis import given, settings, strategies as st

    from bonobo_sqlalchemy_spark.operators.zorder import interleave_bits

    def deinterleave(z: int) -> tuple[int, int]:
        x = y = 0
        for i in range(16):
            x |= ((z >> (2 * i)) & 1) << i
            y |= ((z >> (2 * i + 1)) & 1) << i
        return x, y

    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(0, (1 << 16) - 1), st.integers(0, (1 << 16) - 1)
            ),
            min_size=1,
            max_size=50,
        )
    )
    def check(pairs):
        df = spark.createDataFrame(pairs, "x bigint, y bigint")
        rows = df.select("x", "y", interleave_bits("x", "y").alias("z")).collect()
        for r in rows:
            assert deinterleave(r.z) == (r.x, r.y)

    check()


def test_containment_bounds_jaccard_on_random_corpora(spark):
    """Structural invariants on randomized corpora: for every pair,
    containment >= jaccard (min <= union), both in (0, 1], and the
    containment pair-set is a superset of the Jaccard pair-set at the same
    threshold."""
    import random

    from bonobo_sqlalchemy_spark.operators import dedup as D

    rng = random.Random(404)
    vocab = [f"w{i}" for i in range(40)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(5, 60))), "en")
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string, lang string")
    t = 0.3
    jac = {
        (r.id1, r.id2): r.jaccard
        for r in D.ngram_jaccard_pairs(df, n=2, threshold=t).collect()
    }
    cont = {
        (r.id1, r.id2): r.containment
        for r in D.containment_pairs(df, n=2, threshold=t).collect()
    }
    assert set(jac) <= set(cont), "containment must dominate jaccard"
    for pair, j in jac.items():
        c = cont[pair]
        assert c >= j - 1e-9
        assert 0 < c <= 1.0 + 1e-9


def test_mixture_sample_model_check(spark):
    """Differential check vs a pure-Python model: for random corpora and
    random quotas, mixture_sample == sort-by-md5-rank-and-take-quota."""
    import hashlib
    import random

    from bonobo_sqlalchemy_spark.operators.sampling import mixture_sample

    rng = random.Random(77)
    rows = [(i, f"s{rng.randrange(6)}") for i in range(200)]
    targets = {f"s{g}": rng.randrange(0, 40) for g in range(4)}  # s4/s5 dropped
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    got = {
        (r.doc_id, r.source)
        for r in mixture_sample(df, "source", targets, "doc_id", seed=9).collect()
    }

    def key(i):
        return hashlib.md5(f"9|{i}".encode()).hexdigest()

    model = set()
    for g, quota in targets.items():
        members = sorted(
            (i for i, s in rows if s == g), key=lambda i: (key(i), i)
        )[:quota]
        model |= {(i, g) for i in members}
    assert got == model


def test_profile_matches_pandas_model_on_random_frames(spark):
    """profile_columns vs a pandas model on randomized typed frames with
    nulls: counts, null counts, distincts, stringified min/max."""
    import random

    import pandas as pd

    from bonobo_sqlalchemy_spark.operators.profile import profile_columns

    rng = random.Random(5)
    n = 150
    ints = [rng.randrange(20) if rng.random() > 0.1 else None for _ in range(n)]
    strs = [rng.choice(["a", "bb", "ccc"]) if rng.random() > 0.2 else None for _ in range(n)]
    df = spark.createDataFrame(list(zip(ints, strs)), "i bigint, s string")
    got = {r.col_name: r for r in profile_columns(df, ["i", "s"]).collect()}
    # nullable Int64 keeps the int column integral (plain int64+None would
    # coerce to float and stringify as '0.0' vs Spark's '0')
    pdf = pd.DataFrame({"i": pd.array(ints, dtype="Int64"), "s": strs})
    for c in ("i", "s"):
        assert got[c].n_rows == n
        assert got[c].n_null == int(pdf[c].isna().sum())
        assert got[c].n_distinct == pdf[c].dropna().nunique()
        nonnull = pdf[c].dropna()
        assert got[c].min_value == str(nonnull.min())
        assert got[c].max_value == str(nonnull.max())


# ---------------------------------------------------------------------------
# Graph operators vs pure-Python models (round 14)
# ---------------------------------------------------------------------------

edge_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=14),
        st.integers(min_value=0, max_value=14),
    ),
    min_size=0,
    max_size=50,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edge_strategy)
def test_triangle_counts_match_model_on_random_graphs(spark, edges):
    """Degree-oriented counting equals brute-force adjacency intersection
    on arbitrary small graphs (duplicates, self-loops, both directions)."""
    from bonobo_sqlalchemy_spark.operators.graphalgo import triangle_counts
    from tests.test_graphalgo import _tri_reference

    und = {tuple(sorted(p)) for p in edges if p[0] != p[1]}
    if not und:
        return  # empty graph: nothing to compare
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: (r.tri, r.deg, r.lcc_micro) for r in triangle_counts(df).collect()
    }
    assert got == _tri_reference(edges)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=edge_strategy,
    k=st.integers(min_value=1, max_value=4),
    rounds=st.integers(min_value=1, max_value=4),
)
def test_kcore_matches_model_on_random_graphs(spark, edges, k, rounds):
    from bonobo_sqlalchemy_spark.operators.graphalgo import kcore_peel
    from tests.test_graphalgo import _kcore_reference

    simple = {tuple(sorted(p)) for p in edges if p[0] != p[1]}
    if not simple:
        return
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.deg_final for r in kcore_peel(df, k=k, rounds=rounds).collect()}
    assert got == _kcore_reference(edges, k, rounds)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=edge_strategy,
    seeds=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=14),
            st.integers(min_value=0, max_value=3),
        ),
        min_size=1,
        max_size=6,
    ),
    rounds=st.integers(min_value=1, max_value=3),
)
def test_labelprop_matches_model_on_random_graphs(spark, edges, seeds, rounds):
    from bonobo_sqlalchemy_spark.operators.graphalgo import label_propagation
    from tests.test_graphalgo import _lp_reference

    if not edges:
        return
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    seeds = [(n, l) for n, l in seeds if n in nodes]
    if not seeds:
        return
    df = spark.createDataFrame(edges, "src long, dst long")
    sd = spark.createDataFrame(seeds, "node long, label long")
    got = {
        r.node: r.label
        for r in label_propagation(df, sd, rounds=rounds).collect()
    }
    assert got == _lp_reference(edges, seeds, rounds)
