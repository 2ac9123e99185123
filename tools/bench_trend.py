"""Per-family bench trend tracker (ROADMAP r5 #5 follow-through).

Reads every committed bench artifact in the repo root:

- ``BENCH_r{N}.json``         — the driver's per-round run (ambient noise!)
- ``BENCH_BASELINE_r{N}.json``— our quiet 3-run anchors (per-query medians)

and prints per-FAMILY subtotals per round plus per-query deltas against the
newest quiet anchor, flagging only moves beyond the ambient band (the
baseline's own min..max spread, default fallback ±30%). Families come from
each query's first registry tag, so new queries classify themselves.

Usage:
    python tools/bench_trend.py            # table to stdout
    python tools/bench_trend.py --md TRENDS.md
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

AMBIENT = 1.30  # fallback band when an anchor has no recorded spread


def load_rounds() -> dict[str, dict[str, float]]:
    """{label: {query: sec}} for every bench artifact, ordered r1..rN then
    quiet anchors (medians) last so the table reads chronologically."""
    out: dict[str, dict[str, float]] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r0*(\d+)\.json$", path)
        if not m:
            continue
        try:
            d = json.load(open(path))
        except json.JSONDecodeError:
            continue
        # driver format wraps our one-line JSON under 'parsed' (rc!=0 rounds
        # carry no timings — e.g. r4's events-drift crash); bare format is
        # bench.py's own output
        if "parsed" in d:
            d = d.get("parsed") or {}
        if d.get("queries"):
            out[f"r{m.group(1)}"] = d["queries"]
    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_BASELINE_r*.json"))):
        m = re.search(r"BENCH_BASELINE_r0*(\d+)\.json$", path)
        d = json.load(open(path))
        qs = d.get("queries", {})
        if qs and isinstance(next(iter(qs.values())), dict):
            out[f"quiet-r{m.group(1)}"] = {q: v["median"] for q, v in qs.items()}
        elif qs:
            out[f"quiet-r{m.group(1)}"] = qs
    return out


def family_of() -> dict[str, str]:
    from video_data_pipeline_spark.queries.registry import load_all

    return {name: (q.tags[0] if q.tags else "misc") for name, q in load_all().items()}


def newest_anchor(rounds: dict[str, dict[str, float]]) -> str | None:
    anchors = [k for k in rounds if k.startswith("quiet-")]
    return max(anchors, key=lambda k: int(k.split("-r")[1])) if anchors else None


def anchor_band(label: str) -> dict[str, tuple[float, float]]:
    """Per-query (lo, hi) ambient band from the anchor's recorded runs."""
    n = label.split("-r")[1]
    path = os.path.join(ROOT, f"BENCH_BASELINE_r{n}.json")
    d = json.load(open(path))
    band = {}
    for q, v in d.get("queries", {}).items():
        if isinstance(v, dict) and "runs" in v:
            band[q] = (min(v["runs"]), max(v["runs"]))
    return band


def build_report(md: bool = False) -> str:
    rounds = load_rounds()
    fam = family_of()
    labels = sorted(
        rounds,
        key=lambda k: (k.startswith("quiet-"), int(k.split("r")[-1])),
    )
    families = sorted({fam.get(q, "misc") for qs in rounds.values() for q in qs})

    lines: list[str] = []
    sep = " | " if md else "  "

    def row(cells: list[str]) -> str:
        return ("| " + " | ".join(cells) + " |") if md else sep.join(cells)

    lines.append("## Per-family headline subtotals (sec)" if md else
                 "Per-family headline subtotals (sec)")
    lines.append("")
    header = ["family" if md else f"{'family':<12}"] + [f"{lb:>8}" for lb in labels]
    lines.append(row(header))
    if md:
        lines.append(row(["---"] * len(header)))
    for f in families:
        cells = [f"{f:<12}" if not md else f]
        for lb in labels:
            qs = rounds[lb]
            tot = sum(t for q, t in qs.items() if fam.get(q, "misc") == f)
            cells.append(f"{tot:8.2f}" if tot else "       -")
        lines.append(row(cells))
    cells = ["TOTAL" + ("" if md else "       ")]
    for lb in labels:
        cells.append(f"{sum(rounds[lb].values()):8.2f}")
    lines.append(row(cells))

    # ---- normalized view (VERDICT r5 #10): the table above sums whatever
    # each round's headline contained, so totals grow with COVERAGE, not
    # slowness. This one restricts every column to the queries present in
    # ALL rounds (the shared subset) and reports per-query mean sec within
    # each family — an apples-to-apples trend as the headline grows.
    shared = set.intersection(*(set(qs) for qs in rounds.values())) if rounds else set()
    lines.append("")
    lines.append(
        (f"## Shared-subset mean sec/query ({len(shared)} queries in every round)"
         if md else
         f"Shared-subset mean sec/query ({len(shared)} queries in every round)")
    )
    lines.append("")
    lines.append(row(header))
    if md:
        lines.append(row(["---"] * len(header)))
    for f in families:
        fq = [q for q in shared if fam.get(q, "misc") == f]
        if not fq:
            continue
        cells = [f"{f + ' (' + str(len(fq)) + ')':<12}" if not md else f"{f} ({len(fq)})"]
        for lb in labels:
            qs = rounds[lb]
            cells.append(f"{sum(qs[q] for q in fq) / len(fq):8.3f}")
        lines.append(row(cells))
    if shared:
        cells = [("ALL shared" + ("" if md else " ")) if md else f"{'ALL shared':<12}"]
        for lb in labels:
            cells.append(f"{sum(rounds[lb][q] for q in shared) / len(shared):8.3f}")
        lines.append(row(cells))

    anchor = newest_anchor(rounds)
    if anchor:
        band = anchor_band(anchor)
        latest = max(
            (k for k in rounds if not k.startswith("quiet-")),
            key=lambda k: int(k[1:]),
            default=None,
        )
        if latest:
            lines.append("")
            lines.append(
                (f"## {latest} vs {anchor}: beyond-ambient moves" if md else
                 f"{latest} vs {anchor}: beyond-ambient moves")
            )
            lines.append("")
            # bench timer epoch (r10): BENCH_r*/anchors at r9 and earlier
            # timed only the final action; r10+ include plan construction
            # (AQE materializes lazy localCheckpoints there). Cross-epoch
            # pairs are expected to flag uniformly — say so in the artifact.
            l_n = int(latest[1:])
            a_n = int(anchor.split("-r")[1])
            if (l_n < 10) != (a_n < 10):
                lines.append(
                    "NOTE: cross-timer-epoch comparison — "
                    f"{latest} used the pre-r10 post-construction timer, "
                    f"{anchor} the r10+ construction-inclusive timer, and "
                    "the two sides also sit in different ambient-speed "
                    "epochs; the uniform offsets below conflate both and "
                    "are NOT code regressions (see 'Round 10: bench timer "
                    "epoch' and the r9 anchor-epoch analysis)."
                )
                lines.append("")
            flagged = 0
            for q, t in sorted(rounds[latest].items()):
                base = rounds[anchor].get(q)
                if base is None:
                    continue
                lo, hi = band.get(q, (base / AMBIENT, base * AMBIENT))
                if t > hi * AMBIENT or t < lo / AMBIENT:
                    flagged += 1
                    lines.append(
                        row([q, f"{t:.3f}s", f"anchor {base:.3f}s "
                             f"(band {lo:.2f}..{hi:.2f})",
                             f"{100 * (t / base - 1):+.0f}%"])
                    )
            if not flagged:
                lines.append("(none — every query inside its quiet band "
                             f"x{AMBIENT})")
    return "\n".join(lines) + "\n"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--md", metavar="FILE", help="also write markdown to FILE")
    args = ap.parse_args()
    print(build_report(md=False))
    if args.md:
        # carry forward hand-written analysis: everything from the first
        # MANUAL marker (or legacy `**Round-` note) onward survives rewrites
        manual = ""
        try:
            with open(args.md) as f:
                prev = f.read()
            for marker in ("<!-- MANUAL -->", "**Round-"):
                idx = prev.find(marker)
                if idx != -1:
                    manual = prev[idx:]
                    break
        except FileNotFoundError:
            pass
        with open(args.md, "w") as f:
            f.write("# Bench trends by family\n\n")
            f.write(build_report(md=True))
            if manual:
                f.write("\n" + manual)
        print(f"wrote {args.md}")


if __name__ == "__main__":
    main()
