"""Dump .explain('formatted') for headline (or named) queries to a directory.

The optimization rounds commit these as plans/r<N>/<query>_{before,after}.txt
so plan-shape claims (exchange counts, join strategies, pushed filters) are
checkable without running Spark.

Usage:
    python tools/plan_dump.py --out plans/r16 --suffix _before
    python tools/plan_dump.py --out plans/r16 --suffix _after --queries q_a,q_b
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--queries", default=None)
    args = ap.parse_args()

    from bench import HEADLINE
    from video_data_pipeline_spark.queries.registry import load_all
    from video_data_pipeline_spark.session import get_spark

    names = (
        [q.strip() for q in args.queries.split(",") if q.strip()]
        if args.queries
        else list(HEADLINE)
    )
    os.makedirs(args.out, exist_ok=True)
    registry = load_all()
    spark = get_spark("plan_dump")
    for name in names:
        try:
            df = registry[name].spark_fn(spark, args.sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            txt = f"EXPLAIN FAILED: {e!r}\n"
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        n_ex = txt.count("Exchange")
        print(f"{name}: {len(txt)} chars, Exchange x{n_ex}", flush=True)


if __name__ == "__main__":
    main()
