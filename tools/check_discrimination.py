"""Assert a corpus DISCRIMINATES containment from Jaccard (r16, VERDICT
r15 #2).

Before r16 every gate corpus satisfied C >= 0.8 <=> J >= 0.6 (perturbed
same-length clones), so q_containment_pairs and q_prefix_filter_join
returned IDENTICAL (doc_a, doc_b) sets at sf0.01, sfp1 and sfp10 — a
containment-specific regression at scale was invisible to every
CORRECTNESS artifact. The quote-inclusion perturb class (scale_up
--perturb, (doc_id+c)%10==7) fixes the corpus; this tool PROVES a given
directory exercises the asymmetry: it runs both uncapped exact joins
Spark-side, diffs the pair sets, writes/updates a "discrimination" block
into the given CORRECTNESS artifact, and exits nonzero if the diff is
empty (the corpus cannot falsify containment-specific logic).

Usage:
    python tools/check_discrimination.py --sf-dir /tmp/sfp1 \
        --json CORRECTNESS_sfp1_r16.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument(
        "--json", default=None,
        help="CORRECTNESS artifact to append the discrimination block to",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from video_data_pipeline_spark.queries.registry import table
    from video_data_pipeline_spark.queries.simjoin import (
        containment_pairs_capped,
        prefix_filter_pairs,
    )
    from video_data_pipeline_spark.session import get_spark

    spark = get_spark("check_discrimination")
    docs = table(spark, args.sf_dir, "documents")
    jac = (
        prefix_filter_pairs(docs, max_bucket_size=None)
        .select("doc_a", "doc_b")
    )
    cont = (
        containment_pairs_capped(docs, max_posting_size=None)
        .select("doc_a", "doc_b")
    )
    n_jac = jac.count()
    n_cont = cont.count()
    only_cont = cont.exceptAll(jac).count()
    only_jac = jac.exceptAll(cont).count()
    sample = [
        (r["doc_a"], r["doc_b"])
        for r in cont.exceptAll(jac).orderBy("doc_a", "doc_b").limit(5).collect()
    ]
    block = {
        "sf_dir": args.sf_dir,
        "jaccard_pairs": n_jac,
        "containment_pairs": n_cont,
        "containment_only": only_cont,
        "jaccard_only": only_jac,
        "containment_only_sample": sample,
        "discriminates": only_cont > 0,
        "note": (
            "containment_only > 0 proves this corpus has C>=0.8 & J<0.6 "
            "pairs (quote inclusions), so the containment family's "
            "asymmetric logic is falsifiable by the oracle pins above — "
            "the r15 VERDICT's gate blind spot (identical pair sets on "
            "every pre-r16 corpus) is closed"
        ),
    }
    print(json.dumps(block, indent=1))
    if args.json:
        with open(args.json) as f:
            payload = json.load(f)
        payload["discrimination"] = block
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"appended discrimination block to {args.json}")
    if only_cont == 0:
        print("FAIL: containment and Jaccard pair sets are identical — "
              "this corpus cannot falsify containment-specific logic")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
