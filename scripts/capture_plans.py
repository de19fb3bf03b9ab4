"""Capture `.explain("formatted")` for bench queries into plans/r15/.

Usage:
    python scripts/capture_plans.py before [name ...]
    python scripts/capture_plans.py after  [name ...]

With no names, captures every bench=True query. Writes
plans/r15/<name>_<tag>.txt. Plans are captured with the same session
configuration as bench.py (session.get_spark), so Exchange counts / join
strategies match what the bench actually runs.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import contextlib
    import io

    from bonobo_sqlalchemy_spark.queries import REGISTRY
    from bonobo_sqlalchemy_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r15"
    out_dir.mkdir(parents=True, exist_ok=True)
    names = [
        n
        for n, s in sorted(REGISTRY.items())
        if s.bench and (not only or n in only)
    ]
    for name in names:
        try:
            df = REGISTRY[name].spark(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # capture must not die on one query
            plan = f"ERROR capturing plan: {type(exc).__name__}: {exc}"
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} chars)")


if __name__ == "__main__":
    main()
