"""Pre-snapshot smoke gate: fail loudly on any analysis-time breakage.

Round 4 ended with a red driver artifact because the regenerated
events.parquet changed physical timestamp type and every events query died
at *analysis* time — cheap to detect, expensive to miss. This gate:

1. reads every testdata table and runs one bounded action per table
   (``limit(1).collect()``) — catches physical-schema drift at the scan;
2. builds EVERY registry query plan and forces full analysis by touching
   ``df.schema`` — catches resolution/type errors without executing;
3. runs ``__spark_entry__.entry()`` end-to-end with a bounded collect.

Analysis is driver-side only, so the whole gate runs in ~1 minute. Run it
before any end-of-round commit:

    python tools/smoke_gate.py [--sf-dir /root/testdata/sf0.001]

Exit code 0 = safe to snapshot; 1 = something is analysis-broken (each
failure printed with its traceback).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from video_data_pipeline_spark.queries.registry import load_all, table
    from video_data_pipeline_spark.session import get_spark

    import tools.selfcheck as selfcheck

    spark = get_spark("smoke-gate")
    failures: list[str] = []
    t_start = time.time()

    # 1. one bounded action per table — catches scan-level drift
    for t in selfcheck.TABLES:
        try:
            table(spark, args.sf_dir, t).limit(1).collect()
            print(f"scan OK   {t}")
        except Exception:
            failures.append(f"table scan {t}")
            print(f"scan FAIL {t}\n{traceback.format_exc()}")

    # 2. analyze every registry plan (no execution)
    registry = load_all()
    for name, q in sorted(registry.items()):
        try:
            df = q.spark_fn(spark, args.sf_dir)
            _ = df.schema  # forces full analysis
            print(f"plan OK   {name}")
        except Exception:
            failures.append(f"query plan {name}")
            print(f"plan FAIL {name}\n{traceback.format_exc()}")

    # 3. flagship entry end-to-end (bounded)
    try:
        import __spark_entry__

        rows = __spark_entry__.entry(spark).limit(5).collect()
        print(f"entry OK  ({len(rows)} sample rows)")
    except Exception:
        failures.append("__spark_entry__.entry")
        print(f"entry FAIL\n{traceback.format_exc()}")

    # 4. gate-artifact freshness (r14, VERDICT r13 #1): the latest
    # committed plan-audit and full-sweep artifacts must describe THIS
    # registry — a query registered after the gates ran must fail the
    # pre-commit gate, not ship as a one-artifact lag
    from tools.gate_freshness import check_gate_artifacts

    # resolve artifacts against the REPO ROOT, not the invoker's cwd
    # (ADVICE r14: run from any other directory, the mandatory pre-commit
    # gate failed spuriously with "no PLANAUDIT artifact found")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    stale = check_gate_artifacts(repo_root, len(registry))
    for p in stale:
        failures.append(f"gate freshness: {p}")
        print(f"gate STALE {p}")
    if not stale:
        print("gates OK  (plan audit + full sweep match the registry)")

    dt = time.time() - t_start
    if failures:
        print(f"\nSMOKE GATE FAILED in {dt:.0f}s — {len(failures)} failure(s):")
        for f in failures:
            print(f"  - {f}")
        return 1
    print(f"\nSMOKE GATE PASSED in {dt:.0f}s "
          f"({len(selfcheck.TABLES)} tables, {len(registry)} plans, entry)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
