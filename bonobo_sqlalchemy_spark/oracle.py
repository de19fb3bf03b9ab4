"""Local replica of the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle side-by-side on the same
parquet tables and compares: row count, sorted column names, and the
order-insensitive multiset of canonicalized values (columns sorted by name —
the driver's documented comparison shape). Strictness here is deliberately
*higher* than any plausible hash: exact string equality of canonicalized
cells, so a pass here implies a pass under the driver's hash.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from .sources.files import TABLES


def _canon(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if hasattr(v, "isoformat"):  # pandas Timestamp
        return v.isoformat()
    return str(v)


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    spark_cols: list[str]
    oracle_cols: list[str]
    mismatches: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        if self.mismatches:
            msg += "\n  " + "\n  ".join(self.mismatches[:8])
        return msg


def _rows_to_multiset(rows, cols_sorted_idx) -> list[tuple]:
    out = []
    for row in rows:
        out.append(tuple(_canon(row[i]) for i in cols_sorted_idx))
    out.sort()
    return out


def compare_query(
    spark: SparkSession, name: str, sf_dir: str = "/root/testdata/sf0.01"
) -> CompareResult:
    import duckdb

    from .queries import REGISTRY

    spec = REGISTRY[name]
    sdf = spec.spark(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    if spec.oracle is None:
        return CompareResult(
            name, True, len(spark_rows), -1, spark_cols, [], ["(rows-only: no oracle)"]
        )

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    cur = con.execute(spec.oracle)
    oracle_cols = [d[0] for d in cur.description]
    oracle_rows = cur.fetchall()

    mismatches: list[str] = []
    if sorted(spark_cols) != sorted(oracle_cols):
        mismatches.append(f"columns differ: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}")
    if len(spark_rows) != len(oracle_rows):
        mismatches.append("row counts differ")
    if not mismatches:
        s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
        o_idx = [oracle_cols.index(c) for c in sorted(oracle_cols)]
        s_ms = _rows_to_multiset(spark_rows, s_idx)
        o_ms = _rows_to_multiset(oracle_rows, o_idx)
        if s_ms != o_ms:
            diffs = 0
            for a, b in zip(s_ms, o_ms):
                if a != b:
                    mismatches.append(f"spark {a} != oracle {b}")
                    diffs += 1
                    if diffs >= 5:
                        break
    return CompareResult(
        name,
        not mismatches,
        len(spark_rows),
        len(oracle_rows),
        spark_cols,
        oracle_cols,
        mismatches,
    )


def compare_all(
    spark: SparkSession,
    sf_dir: str = "/root/testdata/sf0.01",
    names: list[str] | None = None,
) -> list[CompareResult]:
    from .queries import REGISTRY

    results = []
    for name in names or sorted(REGISTRY):
        try:
            results.append(compare_query(spark, name, sf_dir))
        except Exception as e:  # surface, don't abort the sweep
            results.append(
                CompareResult(name, False, -1, -1, [], [], [f"EXCEPTION: {type(e).__name__}: {e}"])
            )
    return results
