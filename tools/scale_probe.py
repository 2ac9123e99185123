"""Spark-side scale probe: run selected queries to a noop sink at one or
more sf directories and report per-query wall time + plan flags (r8
VERDICT #8: "sf30 probe of the top-10 most expensive queries; fix anything
super-linear").

No oracle, no collect — the full physical plan executes (noop sink), so
shuffles/AQE/spill all happen, but the measurement isolates OUR plan from
DuckDB throughput and driver-collect ceilings. Run the same query list at
two scales and compare: a healthy plan's time ratio should track the data
ratio (linear) or better; anything clearly super-linear is a scale bug.

Usage:
  python tools/scale_probe.py --sf-dirs /tmp/sf10,/tmp/sf30 \
      --queries q_simhash_near_pairs,q_cdc_chunks --json PROBE.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _dump_atomic(path: str, obj: dict) -> None:
    """Write JSON via a same-directory temp file + os.replace: an OOM kill
    mid-dump (the exact scenario the per-cell flush exists for) leaves the
    last good snapshot instead of a truncated file."""
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
    os.replace(tmp, path)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dirs", required=True, help="comma-separated")
    ap.add_argument("--queries", required=True, help="comma-separated")
    ap.add_argument("--json", default=None)
    ap.add_argument(
        "--count",
        action="store_true",
        help="run df.count() instead of the noop sink: same full plan plus "
        "a trivial final agg, and the output row count lands in the record "
        "as the TRUE-WORKLOAD measure for scaling-ratio analysis "
        "(perturbed corpora grow pair workloads faster than data size; "
        "time ratios only read against the workload ratio)",
    )
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from video_data_pipeline_spark.queries.registry import load_all
    from video_data_pipeline_spark.session import get_spark

    registry = load_all()
    names = [n for n in args.queries.split(",") if n]
    unknown = [n for n in names if n not in registry]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    from video_data_pipeline_spark.telemetry import StageMetricsDelta

    spark = get_spark("scale_probe")
    out: dict[str, dict] = {}
    for sf_dir in args.sf_dirs.split(","):
        res: dict[str, dict] = {}
        for name in names:
            # an executor/heap OOM in a previous cell stops the local-mode
            # SparkContext, and every later cell then fails with 'Cannot
            # call methods on a stopped SparkContext' (observed in the r12
            # sfp30 run: one dead cell poisoned the rest of the matrix).
            # Recreate the session so each cell's record is its own.
            if spark.sparkContext._jsc.sc().isStopped():
                print("SparkContext stopped by a previous cell — recreating")
                # explicit stop() first: getOrCreate returns the stale
                # session object while its JVM context is merely dead
                spark.stop()
                spark = get_spark("scale_probe")
            t0 = time.time()
            rec: dict = {}
            m = StageMetricsDelta(spark)
            try:
                with m:
                    df = registry[name].spark_fn(spark, sf_dir)
                    if args.count:
                        rec["rows"] = df.count()
                    else:
                        df.write.format("noop").mode("overwrite").save()
                rec["secs"] = round(time.time() - t0, 2)
                plan = df._jdf.queryExecution().executedPlan().toString()
                # post-execution AQE plan: record the surprise markers
                for flag in ("skewed=true", "CartesianProduct", "isEmptyRelation"):
                    n = plan.count(flag)
                    if n:
                        rec.setdefault("plan_flags", {})[flag] = n
            except Exception as e:  # noqa: BLE001
                rec["error"] = str(e)[:300]
                rec["secs"] = round(time.time() - t0, 2)
            # spill/shuffle delta lands for FAILED cells too (the spill of
            # a dying query is the number that names the pathology)
            rec.update(m.delta)
            if m.warning:
                rec["spill_warning"] = m.warning
                print(m.warning)
            res[name] = rec
            rows = f" rows={rec['rows']}" if "rows" in rec else ""
            spill = (f" spill={rec['disk_spill_bytes'] >> 20}MiB"
                     if rec.get("disk_spill_bytes") else "")
            print(f"{sf_dir} {name}: {rec.get('secs')}s{rows}{spill} "
                  f"{rec.get('plan_flags', '')}{rec.get('error', '')}")
            # flush after EVERY cell: a probe killed mid-run (the r10 sfp30
            # uncapped OOM) must still leave a machine-written artifact —
            # PROBE_SFP30_r10.json had to be hand-transcribed from the log
            # because this writer only fired at the end (r10 VERDICT #2)
            if args.json:
                out[sf_dir] = res
                _dump_atomic(args.json, out)
        out[sf_dir] = res
    dirs = list(out)
    if len(dirs) == 2:
        a, b = dirs
        print(f"\nscaling {a} -> {b}:")
        for name in names:
            sa, sb = out[a][name].get("secs"), out[b][name].get("secs")
            if sa and sb:
                ra, rb = out[a][name].get("rows"), out[b][name].get("rows")
                w = f"  rows {ra} -> {rb} ({rb / max(ra, 1):.2f}x)" if ra is not None and rb is not None else ""
                print(f"  {name}: {sa}s -> {sb}s  ({sb / sa:.2f}x){w}")
    if args.json:
        _dump_atomic(args.json, out)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
