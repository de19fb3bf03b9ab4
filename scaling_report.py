"""Regenerate SCALING.md: how query time scales with data size.

Runs the bench query set at sf0.001 / sf0.01 / sf0.1 (100x data spread),
reports steady-state (min-of-2) times and the empirical scaling exponent
alpha = log(t_hi / t_lo) / log(sf_hi / sf_lo) over the top decade —
alpha ~ 1 is linear scaling (the shape that survives a 100x scale-up),
alpha < 1 means fixed overhead still dominates at sf0.1, alpha >> 1 is
super-linear and a red flag.

Usage: python scaling_report.py
"""

from __future__ import annotations

import datetime
import math
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    from bonobo_sqlalchemy_spark.queries import REGISTRY
    from bonobo_sqlalchemy_spark.session import get_spark

    spark = get_spark(app_name="scaling_report")
    names = [n for n, s in sorted(REGISTRY.items()) if s.bench]
    # dev knob: comma-list subset for a fast dry run — prints the report to
    # stdout and does NOT write SCALING.md (a partial artifact would defeat
    # the staleness gate)
    import os

    subset = os.environ.get("SPARK_GRAFT_SCALING_QUERIES")
    if subset:
        want = {s.strip() for s in subset.split(",") if s.strip()}
        names = [n for n in names if n in want]

    # same trust signals bench.py carries: box load at start/end so a
    # reader can adjudicate run-to-run drift as noise vs regression
    import os as _os

    try:
        load1_start = round(_os.getloadavg()[0], 1)
    except OSError:
        load1_start = None

    from bonobo_sqlalchemy_spark.metrics import measure_volumes

    times: dict[str, dict[str, float]] = {n: {} for n in names}
    # steady-state shuffle-write bytes per (query, sf): taken from the
    # SECOND run so artifact-backed queries (saved indexes, snapshots)
    # report their probe-path volume, matching the min-of-2 time semantics
    vols: dict[str, dict[str, int]] = {n: {} for n in names}
    for sf_dir in SFS:
        sf = sf_dir.rsplit("sf", 1)[-1]
        for name in names:
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                try:
                    with measure_volumes(spark) as m:
                        REGISTRY[name].spark(spark, sf_dir).collect()
                except Exception:
                    best = None
                    break
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            if best is not None:
                times[name][sf] = round(best, 3)
                vols[name][sf] = m.delta.shuffle_write_bytes

    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=Path(__file__).parent,
        ).stdout.strip()
    except Exception:
        commit = "?"

    # source-hash stamp (parity_report.py's exact loop) so staleness is
    # checkable against the tree, not just the recording commit
    import hashlib

    h = hashlib.sha256()
    root = Path(__file__).parent
    for p in sorted((root / "bonobo_sqlalchemy_spark").rglob("*.py")) + [
        root / "__spark_entry__.py"
    ]:
        h.update(p.name.encode())
        h.update(p.read_bytes())
    src_hash = h.hexdigest()[:12]

    try:
        load1_end = round(_os.getloadavg()[0], 1)
    except OSError:
        load1_end = None

    lines = [
        "# SCALING — query time vs data size (sf0.001 → sf0.1, 100×)",
        "",
        f"Generated {datetime.date.today().isoformat()} at commit `{commit}` "
        f"(engine source sha256 `{src_hash}`); steady-state (min-of-2) "
        f"seconds per scale factor on local[32]. Box load1 at start "
        f"{load1_start}, at end {load1_end} (bench.py's trust-signal "
        "convention: high/shifting load means deltas vs a prior round are "
        "noise, not code).",
        "",
        "`alpha` = log-slope over the top decade (sf0.01 → sf0.1): the "
        "empirical scaling exponent. ~1.0 = linear in data (survives a "
        "100× scale-up at the same plan shape); < 1 = per-query fixed "
        "overhead (planning, codegen, Python-worker spin-up) still "
        "dominates at sf0.1, so the true data-bound slope is even safer; "
        "≫ 1 = super-linear — a scale red flag to fix.",
        "",
        "| Query | sf0.001 | sf0.01 | sf0.1 | alpha (0.01→0.1) |",
        "|---|---|---|---|---|",
    ]
    flagged = []
    for name in names:
        t = times[name]
        lo, mid, hi = t.get("0.001"), t.get("0.01"), t.get("0.1")
        if mid and hi and mid > 0:
            alpha = math.log(hi / mid) / math.log(10)
            astr = f"{alpha:.2f}"
            if alpha > 1.3:
                astr += " ⚠"
                flagged.append((name, alpha))
        else:
            astr = "—"
        fmt = lambda v: f"{v:.3f}" if v is not None else "err"
        lines.append(f"| `{name}` | {fmt(lo)} | {fmt(mid)} | {fmt(hi)} | {astr} |")

    # -------------------------------------------------------------------
    # Decade extension: most alphas < 1 at sf0.1 mean fixed overhead still
    # dominates there, so the true data-bound slope is unmeasured. If the
    # locally-synthesized sf1.0 exists (sf1_generate.py — empirically
    # resampled from the driver's sf0.1, git-ignored), measure the
    # HIGHEST-alpha queries one more decade out.
    sf1_dir = Path(__file__).parent / ".testdata" / "sf1.0"
    if sf1_dir.exists():
        ext_lines = [
            "",
            "### Decade extension (sf0.1 → sf1.0, locally synthesized)",
            "",
            "Every bench query re-measured at a 10× dataset (50k docs / "
            "1M events / 1.5M orders / 6M lineitem / 20k embeddings + "
            "scaled dimensions, distribution-resampled from sf0.1 by "
            "`sf1_generate.py`). `alpha (0.1→1.0)` is the next decade's "
            "log-slope — the one fixed overhead can no longer hide.",
            "",
            "| Query | sf0.1 | sf1.0 | alpha (0.1→1.0) |",
            "|---|---|---|---|",
        ]
        for name in names:
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                try:
                    with measure_volumes(spark) as m:
                        REGISTRY[name].spark(spark, str(sf1_dir)).collect()
                except Exception:
                    best = None
                    break
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            if best is not None:
                vols[name]["1.0"] = m.delta.shuffle_write_bytes
            hi = times[name].get("0.1")
            if best is not None and hi and hi > 0:
                a2 = math.log(best / hi) / math.log(10)
                astr = f"{a2:.2f}" + (" ⚠" if a2 > 1.3 else "")
                if a2 > 1.3:
                    flagged.append((name + " @sf1.0", a2))
                ext_lines.append(
                    f"| `{name}` | {hi:.3f} | {best:.3f} | {astr} |"
                )
            else:
                ext_lines.append(
                    f"| `{name}` | {hi if hi else 'err'} | err | — |"
                )
        ext_lines += [
            "",
            "SemDeDup scale note (round 13): the UNCAPPED fixed-k "
            "`z_dedup_semantic` measured decade alpha 1.52 in round 12 "
            "(quadratic intra-cluster pairs at constant n_clusters=16, by "
            "construction) and is RETIRED from the bench headline set — it "
            "stays registered as the oracle/recall fixture only. Its bench "
            "slot is carried by the two production-shaped variants "
            "measured above: `dedup_semantic_capped` (max_cluster_size "
            "sub-split bounds the per-cluster term) and "
            "`z_dedup_semantic_scaled` (the paper's k ∝ N recipe — "
            "n_clusters = max(16, ceil(N/24)) from one cheap count, "
            "holding expected cluster size fixed so pair volume is linear "
            "in N). The same pattern in miniature: "
            "`dedup_embedding_cosine` pins bits_per_table=4 for its "
            "oracle; the operator's DEFAULT now auto-scales bits to the "
            "corpus (`auto_bits_per_table`, occupancy-targeting — see the "
            "LSH bucket-occupancy appendix below).",
        ]
        lines += ext_lines

    # -------------------------------------------------------------------
    # Data movement: shuffle-write volume per query per scale factor.
    # Wall-clock at local[32] mixes data cost with fixed overhead; shuffle
    # bytes are deterministic per plan+input, so their decade exponent is
    # the cleanest answer to "does this operator's DATA MOVEMENT stay
    # linear at 100 TB?". beta ~ 1 = shuffle grows with data (expected for
    # shuffle-bound plans); beta ~ 0 = index/sketch-bounded probe (the
    # best shape); beta >> 1 = a join/agg whose intermediate explodes —
    # the true scale red flag even when wall time still looks flat.
    has_sf1 = sf1_dir.exists()
    mv = [
        "",
        "## Data movement (shuffle-write bytes, steady-state run)",
        "",
        "Captured from Spark's AppStatusStore around each query's second "
        "run (`bonobo_sqlalchemy_spark/metrics.py::measure_volumes`). "
        "`beta` = log-slope of shuffle volume over the top measured "
        "decade" + (" (sf0.1 → sf1.0)." if has_sf1 else " (sf0.01 → sf0.1)."),
        "",
        "| Query | sf0.01 MB | sf0.1 MB |" + (" sf1.0 MB |" if has_sf1 else "") + " beta |",
        "|---|---|---|" + ("---|" if has_sf1 else "") + "---|",
    ]
    mb = lambda b: f"{b / 1e6:.2f}" if b is not None else "err"
    for name in names:
        v = vols[name]
        lo_b, hi_b = v.get("0.01"), v.get("0.1")
        top_lo, top_hi = (hi_b, v.get("1.0")) if has_sf1 else (lo_b, hi_b)
        if top_lo and top_hi and top_lo > 0 and top_hi > 0:
            beta = math.log(top_hi / top_lo) / math.log(10)
            bstr = f"{beta:.2f}" + (" ⚠" if beta > 1.3 else "")
            if beta > 1.3:
                flagged.append((name + " [shuffle]", beta))
        elif top_lo == 0 and top_hi is not None and top_hi > 10_000_000:
            # 0 bytes at the lower decade -> a large volume at the upper
            # decade has no finite beta but is exactly the blow-up this
            # section exists to catch (r13 ADVICE): flag it explicitly
            # instead of hiding it behind '—'. Threshold 10 MB absolute.
            bstr = f"0 → {top_hi / 1e6:.0f} MB ⚠"
            flagged.append((name + " [shuffle 0→MB]", top_hi / 1e6))
        else:
            bstr = "— (≈0 shuffle)" if (top_hi is not None and top_hi == 0) else "—"
        row = f"| `{name}` | {mb(lo_b)} | {mb(hi_b)} |"
        if has_sf1:
            row += f" {mb(v.get('1.0'))} |"
        mv.append(row + f" {bstr} |")
    lines += mv

    tot = {sf: sum(t.get(sf, 0.0) for t in times.values()) for sf in ("0.001", "0.01", "0.1")}
    lines += [
        "",
        f"**Totals:** sf0.001 {tot['0.001']:.1f}s · sf0.01 {tot['0.01']:.1f}s · "
        f"sf0.1 {tot['0.1']:.1f}s — a 100× data spread costs "
        f"{tot['0.1'] / max(tot['0.001'], 1e-9):.1f}× the time of sf0.001 "
        "(fixed per-query overhead amortizing toward the linear regime).",
        "",
    ]
    if flagged:
        lines.append(
            "Flagged super-linear: " + ", ".join(f"`{n}` ({a:.2f})" for n, a in flagged)
        )
        lines.append("")

    if subset:
        print("\n".join(lines))
        print(f"(dry run over {len(names)} queries — SCALING.md NOT written)")
        return

    out = Path(__file__).parent / "SCALING.md"
    # Preserve hand-written appendices (e.g. the skew-hardening measurements)
    # across regenerations: everything from the first '## Skew hardening'
    # heading onward is carried over verbatim.
    appendix = ""
    if out.exists():
        prev = out.read_text()
        idx = prev.find("## Skew hardening")
        if idx != -1:
            appendix = "\n" + prev[idx:]
    out.write_text("\n".join(lines) + appendix)
    print(f"{len(names)} queries x {len(SFS)} sfs -> {out}; flagged: {len(flagged)}")


if __name__ == "__main__":
    main()
