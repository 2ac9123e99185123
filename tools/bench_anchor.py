"""Refresh the quiet bench anchor (BENCH_BASELINE_r{N}.json).

Runs `bench.py` N times back-to-back on an otherwise-idle machine and
records per-query min/median plus the raw runs — the ambient band that
`tools/bench_trend.py` uses to separate real regressions from sandbox
noise (rounds 2-4 each burned a task chasing ±25% ambient drift).

Usage:
    python tools/bench_anchor.py --round 5 [--runs 3] [--out BENCH_BASELINE_r5.json]

Run this ONLY when nothing else is on the machine (no sweeps, no tests);
a concurrent job inflates the band and hides real regressions.

``--ab <git-ref>`` (r16, VERDICT r15 #3) is the INTERLEAVED A/B mode —
the cross-round regression signal that does not depend on ambient
epochs (which confounded the r9/r10/r15 absolute anchors: same code,
1.3–1.8x apart across days). It checks the ref out into a temporary
worktree and alternates full bench runs new/old/new/old/... in ONE
session, so both trees see the same machine state, then reports
per-query new/old median ratios over the common queries. A flat ratio
(~1.0) on untouched queries means any absolute anchor shift is ambient;
a per-query ratio off 1.0 is a real regression/improvement with the
epoch controlled away. Writes BENCH_AB_r{N}.json; TRENDS.md cross-round
claims should cite these ratios, not anchor-to-anchor absolutes.

    python tools/bench_anchor.py --round 16 --ab <last-round-commit>
"""

from __future__ import annotations

import argparse
import json
import os
import re
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: the one prose line that may quote the anchor; bench_anchor rewrites it
#: and REFUSES to finish if it is missing (r11 VERDICT #8: the quoted
#: number drifted from the committed artifact for two rounds)
ANCHOR_LINE_RE = re.compile(
    r"Current quiet anchor: BENCH_BASELINE_r\d+\.json = [\d.]+ s / \d+ queries\."
)


def update_roadmap_anchor_line(rnd: int, median: float, n_queries: int) -> None:
    """Rewrite ROADMAP.md's canonical anchor line to match the artifact
    just written. Exits nonzero if the marker line is gone — the anchor
    run is not 'done' while prose and artifact can disagree."""
    path = os.path.join(ROOT, "ROADMAP.md")
    text = open(path).read()
    new_line = (
        f"Current quiet anchor: BENCH_BASELINE_r{rnd}.json = "
        f"{median} s / {n_queries} queries."
    )
    text2, n = ANCHOR_LINE_RE.subn(new_line, text, count=1)
    if n != 1:
        sys.exit(
            "bench_anchor: ROADMAP.md's 'Current quiet anchor:' line is "
            "missing — restore it (see the anchor-line comment marker) so "
            "the quoted number cannot drift from the artifact"
        )
    with open(path, "w") as f:
        f.write(text2)
    print(f"updated ROADMAP.md anchor line: {new_line}")

PURPOSE = (
    "Quiet-environment bench anchor at sf0.1, local[32], {runs} consecutive runs "
    "with nothing else on the machine. Compare driver BENCH_r{{N}}.json against the "
    "per-query 'median' here; ambient sandbox noise is min..max across runs "
    "(typically +-25%), so only deltas beyond that band are real regressions."
)


def one_run(tree: str = ROOT) -> dict:
    env = dict(os.environ)
    # keep each tree's committed BENCH_FULL*.json untouched — A/B and
    # anchor runs are measurements, not artifact refreshes
    out_file = os.path.join(tree, ".bench_run.json")
    env["SPARK_GRAFT_BENCH_OUT"] = out_file
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        capture_output=True,
        text=True,
        check=True,
        cwd=tree,
        env=env,
    )
    # the artifact file carries the full 3-decimal per-query record; the
    # LAST stdout line may be tail-budget-quantized since r17 (2 sig figs),
    # which would smear every A/B ratio — never take timings from it
    try:
        with open(out_file) as f:
            return json.load(f)
    except OSError:
        # old trees (pre-r14 had no --out env honor): fall back to the
        # FIRST stdout record with the map, which is always full precision
        records = [
            json.loads(ln) for ln in out.stdout.splitlines() if ln.startswith("{")
        ]
        return next(r for r in records if "queries" in r)


def ab_run(ref: str, rnd: int, runs: int, load_at_start: float) -> int:
    """Interleaved A/B: alternate new-tree / old-tree full bench runs in
    one session, then report per-query new/old median ratios over the
    common queries. Whole-run (not per-query) alternation is deliberate:
    the two trees are the same package name, so one process cannot hold
    both registries; run-level interleaving in a single idle session is
    exactly the control that separated the r15 anchor jump into ambient
    epoch + flat code (TRENDS r15 note), now institutionalized."""
    wt = os.path.join(ROOT, f".wt_ab_r{rnd}")
    sha = subprocess.run(
        ["git", "rev-parse", "--short", ref], capture_output=True,
        text=True, check=True, cwd=ROOT,
    ).stdout.strip()
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, ref],
        check=True, cwd=ROOT, capture_output=True, text=True,
    )
    try:
        # ABBA ordering (r16 opt round): strict new/old alternation is
        # biased under MONOTONE ambient drift (this host's CPU-steal
        # epochs drain over a session, so whichever tree always runs
        # second in a pair is systematically penalized — observed as
        # ~0.6x "improvements" on queries neither tree changed).
        # Palindromic order cancels any linear drift component.
        new_runs, old_runs = [], []
        for i in range(runs):
            order = [("new", ROOT, new_runs), ("old", wt, old_runs)]
            if i % 2 == 1:
                order.reverse()
            for label, tree, sink in order:
                print(f"A/B round {i + 1}/{runs}: {label} tree ...")
                sink.append(one_run(tree))
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=ROOT, capture_output=True,
        )
    common = sorted(
        set(new_runs[0]["queries"]) & set(old_runs[0]["queries"])
    )
    per_q = {}
    for q in common:
        new_med = statistics.median(r["queries"][q] for r in new_runs)
        old_med = statistics.median(r["queries"][q] for r in old_runs)
        per_q[q] = {
            "new_median": round(new_med, 3),
            "old_median": round(old_med, 3),
            "ratio": round(new_med / old_med, 3) if old_med else None,
        }
    new_total = statistics.median(
        sum(r["queries"][q] for q in common) for r in new_runs
    )
    old_total = statistics.median(
        sum(r["queries"][q] for q in common) for r in old_runs
    )
    ratios = sorted(
        (v["ratio"], q) for q, v in per_q.items() if v["ratio"] is not None
    )
    payload = {
        "round": rnd,
        "purpose": (
            "Interleaved A/B (new/old/new/old/... full bench runs, one idle "
            "session): per-query new-tree vs old-tree median ratios on the "
            "common queries. Ambient epochs cancel — ratio ~1.0 on an "
            "untouched query means flat; cite THESE for cross-round perf "
            "claims, not anchor-to-anchor absolutes."
        ),
        "old_ref": ref,
        "old_sha": sha,
        "runs_per_tree": runs,
        "sf": new_runs[0]["sf"],
        "load_at_start": load_at_start,
        "n_common_queries": len(common),
        "new_only": sorted(set(new_runs[0]["queries"]) - set(common)),
        "old_only": sorted(set(old_runs[0]["queries"]) - set(common)),
        "common_total": {
            "new_median": round(new_total, 3),
            "old_median": round(old_total, 3),
            "ratio": round(new_total / old_total, 3) if old_total else None,
        },
        "worst_ratio": {"query": ratios[-1][1], "ratio": ratios[-1][0]}
        if ratios else None,
        "best_ratio": {"query": ratios[0][1], "ratio": ratios[0][0]}
        if ratios else None,
        "queries": per_q,
    }
    out = os.path.join(ROOT, f"BENCH_AB_r{rnd}.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(
        f"wrote {out}: common-total ratio "
        f"{payload['common_total']['ratio']} over {len(common)} queries "
        f"(new {payload['common_total']['new_median']}s vs old "
        f"{payload['common_total']['old_median']}s @ {sha}); worst "
        f"{payload['worst_ratio']}"
    )
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--ab", default=None, metavar="GIT_REF",
        help="interleaved A/B mode against this git ref (usually the "
        "previous round's final commit): alternate new/old full bench "
        "runs in one session and write per-query ratios to "
        "BENCH_AB_r{N}.json instead of an absolute anchor",
    )
    ap.add_argument(
        "--max-load", type=float, default=1.0,
        help="refuse to anchor while the 1-min load average exceeds this "
        "(r14: a post-pytest load drain produced a 141s anchor where the "
        "idle rerun read 97s — a uniform 1.25x of pure ambient). Waits up "
        "to 10 min for the machine to quiet, then proceeds WITH the load "
        "recorded so a noisy anchor can never pose as quiet.",
    )
    args = ap.parse_args()

    deadline = time.time() + 600
    while os.getloadavg()[0] > args.max_load and time.time() < deadline:
        print(f"load {os.getloadavg()[0]:.2f} > {args.max_load} — waiting "
              "for the machine to quiet (anchor must run idle)")
        time.sleep(30)
    load_at_start = round(os.getloadavg()[0], 2)

    if args.ab:
        return ab_run(args.ab, args.round, args.runs, load_at_start)

    runs = [one_run() for _ in range(args.runs)]
    names = list(runs[0]["queries"])
    per_q = {
        q: {
            "min": min(r["queries"][q] for r in runs),
            "median": round(statistics.median(r["queries"][q] for r in runs), 3),
            "runs": [r["queries"][q] for r in runs],
        }
        for q in names
    }
    payload = {
        "round": args.round,
        "purpose": PURPOSE.format(runs=args.runs),
        "headline_total": {
            "runs": [r["value"] for r in runs],
            "median": round(statistics.median(r["value"] for r in runs), 3),
        },
        "sf": runs[0]["sf"],
        "n_queries": len(names),
        "load_at_start": load_at_start,
        "queries": per_q,
    }
    out = args.out or os.path.join(ROOT, f"BENCH_BASELINE_r{args.round}.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {out}: total median {payload['headline_total']['median']}s "
          f"over {args.runs} runs, {len(names)} queries")
    if args.out is None:
        # only the official per-round artifact maintains the ROADMAP
        # anchor line; an explicit --out is a side study / smoke run
        update_roadmap_anchor_line(
            args.round, payload["headline_total"]["median"], len(names)
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
