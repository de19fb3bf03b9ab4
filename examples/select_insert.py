"""Copy a query result into another table: Select -> InsertOrUpdate.

Engine analog of the reference's ``examples/select_insert.py``, including
its per-instance engine override (``Select(..., engine='sqlalchemy.
pgengine')``): each node names its service; the registry resolves both.

Run: python examples/select_insert.py
"""

from __future__ import annotations

import sqlite3
import sys
import tempfile
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bonobo_sqlalchemy_spark as bss


def main() -> None:
    spark = bss.get_spark(app_name="example-select-insert")
    db = tempfile.mktemp(suffix=".db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE top_orders (o_orderkey INTEGER PRIMARY KEY, o_totalprice DOUBLE)")
    con.commit(); con.close()

    services = {
        # read side: the parquet catalog (named like the reference's pgengine)
        "sqlalchemy.pgengine": bss.PathService("/root/testdata/sf0.001"),
        # write side: the default engine service
        "sqlalchemy.engine": bss.DbapiService(partial(sqlite3.connect, db)),
    }
    g = bss.Graph(
        bss.Select(
            "SELECT o_orderkey, o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC LIMIT 25",
            engine="sqlalchemy.pgengine",
        ),
        bss.InsertOrUpdate("top_orders", discriminant=("o_orderkey",)),
    )
    bss.run(g, spark, services=services)

    con = sqlite3.connect(db)
    for row in con.execute(
        "SELECT o_orderkey, o_totalprice FROM top_orders ORDER BY o_totalprice DESC LIMIT 5"
    ):
        print(row)
    con.close()


if __name__ == "__main__":
    main()
