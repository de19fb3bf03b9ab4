"""Execute a registered query and dump its FINAL adaptive plan (post-AQE),
which is where ReusedExchange/ReusedSubquery appear.

Usage: python scripts/final_plan.py <query> [<query> ...]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bonobo_sqlalchemy_spark.queries import REGISTRY
    from bonobo_sqlalchemy_spark.session import get_spark

    spark = get_spark(app_name="final_plan")
    for name in sys.argv[1:]:
        df = REGISTRY[name].spark(spark, sf_dir)
        df.collect()
        final = (
            df._jdf.queryExecution().executedPlan().toString().split("Initial Plan")[0]
        )
        scans = final.count("FileScan parquet")
        reused = final.count("ReusedExchange")
        print(f"===== {name}: FileScans={scans} ReusedExchange={reused}")
        print(final[:12000])


if __name__ == "__main__":
    main()
