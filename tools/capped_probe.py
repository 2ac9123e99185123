"""Capped-variant companion to scale_probe: run the prefix-filter family's
production guards at a perturbed scale dir and record secs / rows /
oversized-bucket telemetry.

Motivation (r10): at sfp30 (300 perturbed clones per document) the
UNCAPPED registered joins' pair workload is ~9x sfp10's — the
verification-join shuffle spills past this single node's free disk and the
probe records SPILL_OUT_OF_MEMORY. That is the documented hot-bucket
pathology, and the caps are the designed answer: this tool shows the capped
variants completing at the same scale with bounded output, and records how
many buckets/postings the cap actually engaged on (the telemetry an
operator would alert on at 100 TB).

Usage:
  python tools/capped_probe.py --sf-dir /tmp/sfp30 --cap 256 --json OUT.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--cap", type=int, default=256)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from pyspark.sql.observation import Observation

    from video_data_pipeline_spark.queries.simjoin import (
        containment_pairs_capped,
        prefix_filter_pairs,
    )
    from video_data_pipeline_spark.session import get_spark

    spark = get_spark("capped_probe")
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    out: dict[str, dict] = {"sf_dir": args.sf_dir, "cap": args.cap}
    for name, fn, kw in (
        ("prefix_filter_pairs", prefix_filter_pairs, "max_bucket_size"),
        ("containment_pairs_capped", containment_pairs_capped, "max_posting_size"),
    ):
        obs = Observation(f"{name}_guard")
        t0 = time.time()
        rec: dict = {}
        try:
            rec["rows"] = fn(docs, **{kw: args.cap, "observation": obs}).count()
            rec["secs"] = round(time.time() - t0, 2)
            rec.update({k: int(v) for k, v in obs.get.items()})
        except Exception as e:  # noqa: BLE001
            rec["error"] = str(e)[:300]
            rec["secs"] = round(time.time() - t0, 2)
        out[name] = rec
        print(name, rec)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
