"""Extract rows with a raw SQL query and pretty-print them.

Engine analog of the reference's ``examples/sequel_extract.py`` (Select ->
PrettyPrinter): the Select node evaluates arbitrary SQL over the registered
catalog; ``df.show`` is the print sink.

Run: python examples/sequel_extract.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bonobo_sqlalchemy_spark as bss


def main() -> None:
    spark = bss.get_spark(app_name="example-extract")
    bss.register_views(spark, "/root/testdata/sf0.001")
    [df] = bss.run(
        bss.Graph(
            bss.Select(
                "SELECT n_name, r_name FROM nation JOIN region "
                "ON n_regionkey = r_regionkey ORDER BY n_nationkey",
                limit=10,  # reference: Select(..., limit=100, pack_size=9)
            )
        ),
        spark,
    )
    df.show(truncate=False)


if __name__ == "__main__":
    main()
