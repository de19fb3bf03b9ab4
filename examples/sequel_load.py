"""Load generated rows into a database table through the upsert sink.

Engine analog of the reference's ``examples/sequel_load.py`` (generator ->
InsertOrUpdate): 1000 synthetic rows land in SQLite via the buffered
find-then-route upsert; rerunning is idempotent (all updates).

Run: python examples/sequel_load.py
"""

from __future__ import annotations

import sqlite3
import sys
import tempfile
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bonobo_sqlalchemy_spark as bss


@bss.producer(fields=("id", "value"))
def extract():
    for i in range(1000):  # reference scale: 1000-row load
        yield i, f"value for {i}"


def main() -> None:
    spark = bss.get_spark(app_name="example-load")
    db = tempfile.mktemp(suffix=".db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE example (id INTEGER PRIMARY KEY, value VARCHAR(255))")
    con.commit(); con.close()

    sink = bss.InsertOrUpdate("example", discriminant=("id",))
    services = {"sqlalchemy.engine": bss.DbapiService(partial(sqlite3.connect, db))}
    bss.run(bss.Graph(extract, sink), spark, services=services)
    print("stats:", sink.last_stats, "errors:", sink.last_errors)

    con = sqlite3.connect(db)
    print("rows:", con.execute("SELECT count(*) FROM example").fetchone()[0])
    con.close()


if __name__ == "__main__":
    main()
