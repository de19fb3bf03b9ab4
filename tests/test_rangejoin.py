"""Binned interval-join semantics: inclusive bounds, overlapping intervals,
intervals spanning many bins, and candidate containment (no dup pairs)."""

from __future__ import annotations

import datetime as dt

from bonobo_sqlalchemy_spark.operators.rangejoin import interval_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    points = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01 10:30:00")),
            (2, "k1", _ts("2024-01-01 23:59:59")),
            (3, "k1", _ts("2024-01-03 00:00:00")),
            (4, "k2", _ts("2024-01-01 10:30:00")),
        ],
        "pid long, key string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            # two OVERLAPPING intervals around 10:30 -> point 1 matches both
            ("k1", 100, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00")),
            ("k1", 101, _ts("2024-01-01 10:15:00"), _ts("2024-01-01 10:45:00")),
            # spans 2+ days = ~48 hourly bins; inclusive end hits point 3
            ("k1", 102, _ts("2024-01-01 12:00:00"), _ts("2024-01-03 00:00:00")),
            # other key: same instant as point 4 but key k3 -> no match
            ("k3", 103, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00")),
        ],
        "key string, iid long, s timestamp, e timestamp",
    )
    return points, intervals


def test_inclusive_overlap_and_key_equality(spark):
    points, intervals = _frames(spark)
    got = {
        (r.pid, r.iid)
        for r in interval_join(
            points, intervals, on=["key"], ts_col="ts", start_col="s", end_col="e"
        ).collect()
    }
    assert got == {
        (1, 100),
        (1, 101),  # overlapping intervals both match; each pair exactly once
        (2, 102),
        (3, 102),  # inclusive end bound, interval spanning ~48 bins
    }


def test_bin_width_does_not_change_results(spark):
    points, intervals = _frames(spark)
    for width in ("1 minute", "6 hours", "3 days"):
        got = {
            (r.pid, r.iid)
            for r in interval_join(
                points,
                intervals,
                on=["key"],
                ts_col="ts",
                start_col="s",
                end_col="e",
                bin_width=width,
            ).collect()
        }
        assert got == {(1, 100), (1, 101), (2, 102), (3, 102)}, width


def test_ntz_timestamp_inputs(spark):
    """TIMESTAMP_NTZ point/interval columns must work (the regenerated
    testdata reads event timestamps as NTZ; FIXTURES.md data contract)."""
    points, intervals = _frames(spark)
    p_ntz = points.selectExpr("pid", "key", "CAST(ts AS TIMESTAMP_NTZ) AS ts")
    i_ntz = intervals.selectExpr(
        "key", "iid", "CAST(s AS TIMESTAMP_NTZ) AS s", "CAST(e AS TIMESTAMP_NTZ) AS e"
    )
    tz = {
        (r.pid, r.iid)
        for r in interval_join(
            points, intervals, on=["key"], ts_col="ts", start_col="s", end_col="e"
        ).collect()
    }
    ntz = {
        (r.pid, r.iid)
        for r in interval_join(
            p_ntz, i_ntz, on=["key"], ts_col="ts", start_col="s", end_col="e"
        ).collect()
    }
    assert ntz == tz and ntz
