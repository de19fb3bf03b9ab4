"""Live-database read over JDBC: Select pushes SQL into an RDBMS, the
result lands in a warehouse table — the reference's core deployment shape
(``examples/select_insert.py`` with a real database on the read side).

The database here is a DuckDB file driven through the real Spark JDBC
source (driver jar discovered in local caches, `sources/jdbc.py`); with a
server database the only change is the JdbcService URL. Skips politely if
no driver jar is cached.

Run: python examples/jdbc_select.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bonobo_sqlalchemy_spark as bss
from bonobo_sqlalchemy_spark.sources.jdbc import duckdb_jdbc_service, find_jdbc_driver_jar


def main() -> None:
    if find_jdbc_driver_jar() is None:
        print("no JDBC driver jar in local caches; skipping")
        return
    import duckdb

    db = tempfile.mktemp(suffix=".db")
    con = duckdb.connect(db)
    con.execute(
        "CREATE TABLE sales AS SELECT range AS id, range % 7 AS region, "
        "range * 2.5 AS amount FROM range(1000)"
    )
    con.close()

    spark = bss.get_spark(app_name="example-jdbc-select")
    out = tempfile.mkdtemp() + "/warehouse"
    services = {
        # read side: the LIVE database over JDBC (query runs inside it)
        "sqlalchemy.pgengine": duckdb_jdbc_service(db),
        # write side: a parquet warehouse directory
        "sqlalchemy.engine": bss.PathService(out),
    }
    g = bss.Graph(
        bss.Select(
            "SELECT region, COUNT(*) AS n, SUM(amount) AS total "
            "FROM sales GROUP BY region",
            engine="sqlalchemy.pgengine",
            pack_size=500,
        ),
        bss.InsertOrUpdate("region_totals", discriminant=("region",)),
    )
    [landed] = bss.run(g, spark, services=services)
    print(f"landed {landed.count()} region rows -> {out}/region_totals.parquet")
    landed.orderBy("region").show()


if __name__ == "__main__":
    main()
