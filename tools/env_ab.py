"""Same-tree env-flip A/B (r16 optimization round): alternate full bench
runs with an env var set to value A vs value B, in palindromic (ABBA)
order so linear ambient drift cancels, and report per-query A/B median
ratios. This isolates a config knob from every tree-checkout confound —
the code, data and process launcher are byte-identical between arms.

Usage:
    python tools/env_ab.py --var SPARK_GRAFT_AQE_MIN_PARTITION \
        --a 64k --b 1m --rounds 3 --json /tmp/aqe_ab.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def one_run(var: str, value: str) -> dict:
    env = dict(os.environ)
    env[var] = value
    out_file = os.path.join(ROOT, ".bench_run.json")
    env["SPARK_GRAFT_BENCH_OUT"] = out_file
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True, text=True, check=True, cwd=ROOT, env=env,
    )
    # full-precision per-query record lives in the artifact file; the last
    # stdout line is tail-budget-quantized since r17 (would smear ratios)
    with open(out_file) as f:
        return json.load(f)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--var", required=True)
    ap.add_argument("--a", required=True)
    ap.add_argument("--b", required=True)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--json", required=True)
    args = ap.parse_args()

    runs: dict[str, list[dict]] = {args.a: [], args.b: []}
    for i in range(args.rounds):
        order = [args.a, args.b] if i % 2 == 0 else [args.b, args.a]
        for v in order:
            print(f"round {i + 1}/{args.rounds}: {args.var}={v} ...", flush=True)
            runs[v].append(one_run(args.var, v))

    def med(vals):
        return round(statistics.median(vals), 3)

    qs = sorted(set().union(*[set(r["queries"]) for rs in runs.values() for r in rs]))
    per_q = {}
    for q in qs:
        a = med([r["queries"][q] for r in runs[args.a] if q in r["queries"]])
        b = med([r["queries"][q] for r in runs[args.b] if q in r["queries"]])
        per_q[q] = {"a_median": a, "b_median": b,
                    "ratio": round(a / b, 3) if b else None}
    ta = med([r["value"] for r in runs[args.a]])
    tb = med([r["value"] for r in runs[args.b]])
    result = {
        "var": args.var, "a": args.a, "b": args.b,
        "rounds": args.rounds, "order": "ABBA palindromic",
        "total": {"a_median": ta, "b_median": tb,
                  "ratio": round(ta / tb, 3)},
        "a_totals": [round(r["value"], 2) for r in runs[args.a]],
        "b_totals": [round(r["value"], 2) for r in runs[args.b]],
        "queries": per_q,
    }
    with open(args.json, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps(result["total"]))


if __name__ == "__main__":
    main()
