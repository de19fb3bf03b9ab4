"""As-of join semantics: backward inclusive match, null on no-prior,
tolerance bound, and atomic multi-column payload."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bonobo_sqlalchemy_spark.operators.asof import as_of_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),
            (2, "u1", _ts("2024-01-01 12:00:00")),
            (3, "u2", _ts("2024-01-01 09:00:00")),
            (4, "u2", _ts("2024-01-02 09:00:00")),
        ],
        "event_id long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 10:00:00"), 100.0, "a"),  # tie with event 1
            ("u1", _ts("2024-01-01 11:00:00"), 200.0, None),  # null payload col
            ("u2", _ts("2024-01-01 12:00:00"), 300.0, "c"),
        ],
        "user string, ts timestamp, price double, tag string",
    )
    return left, right


def test_backward_inclusive_and_null_on_no_prior(spark):
    left, right = _frames(spark)
    got = {
        r.event_id: (r.r_price, r.r_tag)
        for r in as_of_join(left, right, on=["user"]).collect()
    }
    assert got[1] == (100.0, "a")  # tie: right at the same instant matches
    assert got[2] == (200.0, None)  # latest prior; tag null comes from THAT row
    assert got[3] == (None, None)  # nothing at or before 09:00
    assert got[4] == (300.0, "c")


def test_payload_columns_come_from_one_row(spark):
    """Event 2's match row has a null tag; a per-column last(ignorenulls)
    would leak 'a' from the older row — the struct payload must not."""
    left, right = _frames(spark)
    row = {
        r.event_id: r for r in as_of_join(left, right, on=["user"]).collect()
    }[2]
    assert row.r_price == 200.0 and row.r_tag is None


def test_tolerance_window(spark):
    left, right = _frames(spark)
    got = {
        r.event_id: r.r_price
        for r in as_of_join(left, right, on=["user"], tolerance="12 hours").collect()
    }
    assert got[4] is None  # u2's purchase is 21h old — outside tolerance
    assert got[2] == 200.0  # 1h old — inside


def test_matched_timestamp_exposed(spark):
    left, right = _frames(spark)
    out = as_of_join(left, right, on=["user"])
    assert "r_ts" in out.columns
    r2 = {r.event_id: r.r_ts for r in out.collect()}
    assert r2[2] == _ts("2024-01-01 11:00:00")
