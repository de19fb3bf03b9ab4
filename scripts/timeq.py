"""Time registered queries (or ad-hoc variants) with warm min-of-k.

Usage:
    python scripts/timeq.py q1_pricing_summary dedup_simhash [--runs 4]

Prints per-query min/median of warm runs (first run reported separately),
mirroring bench.py's discipline: interleaved rounds, collect() of the
final result, same session config.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    argv, args, runs = sys.argv[1:], [], 4
    i = 0
    while i < len(argv):
        if argv[i].startswith("--runs"):
            if "=" in argv[i]:
                runs = int(argv[i].split("=", 1)[1])
            else:
                i += 1
                runs = int(argv[i])
        else:
            args.append(argv[i])
        i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bonobo_sqlalchemy_spark.queries import REGISTRY
    from bonobo_sqlalchemy_spark.session import get_spark

    spark = get_spark(app_name="timeq")
    names = args or sorted(n for n, s in REGISTRY.items() if s.bench)
    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(runs + 1):  # +1 warm-up round counted as first-run
        for name in names:
            spark.sparkContext.setJobDescription(f"timeq:{name}")
            t0 = time.perf_counter()
            REGISTRY[name].spark(spark, sf_dir).collect()
            times[name].append(time.perf_counter() - t0)
    for name in names:
        first, warm = times[name][0], sorted(times[name][1:])
        med = warm[len(warm) // 2]
        print(
            f"{name:36s} min={warm[0]:6.2f} med={med:6.2f} "
            f"first={first:6.2f} warm={['%.2f' % t for t in times[name][1:]]}"
        )


if __name__ == "__main__":
    main()
