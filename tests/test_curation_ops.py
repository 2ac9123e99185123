"""Independent (pure-Python recompute) semantic checks for the round-7
curation additions: exact-substring span merge, per-domain cap, and
temperature-balanced language resampling.

These deliberately do NOT reuse the DuckDB oracle SQL — the registry
selfcheck already compares against that. Here the expected output is
recomputed in plain Python over the sf0.001 parquet, so a shared
misconception between the Spark program and its SQL oracle would still
be caught.
"""

from __future__ import annotations

import math
import re

import pyarrow.parquet as pq

from video_data_pipeline_spark.queries.registry import load_all

REGISTRY = load_all()

SF = "/root/testdata/sf0.001"


def _docs():
    t = pq.read_table(f"{SF}/documents.parquet").to_pylist()
    return t


def test_substring_spans_match_pure_python(spark):
    W = 6
    docs = _docs()
    from collections import Counter

    positions = {}  # doc_id -> [start indices]
    counts = Counter()
    for d in docs:
        w = re.split(" +", d["text"].strip())
        if len(w) < W:
            continue
        wins = [" ".join(w[i : i + W]) for i in range(len(w) - W + 1)]
        positions[d["doc_id"]] = wins
        counts.update(wins)
    expected = set()
    for doc_id, wins in positions.items():
        dup_starts = [i for i, win in enumerate(wins) if counts[win] > 1]
        # island merge: overlap-or-adjacent (next start <= prev start + W)
        span = None
        for i in dup_starts:
            if span is None or i > span[1] - W + 1 + W:  # i > prev_start + W
                if span:
                    expected.add((doc_id, span[0], span[1], span[1] - span[0] + 1))
                span = [i, i + W - 1]
            else:
                span[1] = i + W - 1
        if span:
            expected.add((doc_id, span[0], span[1], span[1] - span[0] + 1))
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_words)
        for r in REGISTRY["q_substring_dedup_spans"].spark_fn(spark, SF).collect()
    }
    assert got == expected


def test_domain_cap_matches_pure_python(spark):
    N = 20
    docs = _docs()
    by_src = {}
    for d in docs:
        by_src.setdefault(d["source"], []).append(d)
    expected = set()
    for src, ds in by_src.items():
        ds.sort(key=lambda d: (-d["n_chars"], d["doc_id"]))
        for rnk, d in enumerate(ds[:N], start=1):
            expected.add((d["doc_id"], src, d["n_chars"], rnk))
    got = {
        (r.doc_id, r.source, r.score, r.rnk)
        for r in REGISTRY["q_domain_cap"].spark_fn(spark, SF).collect()
    }
    assert got == expected


def test_lang_temperature_mix_upweights_low_resource(spark):
    """The keep-RATE must be monotonically non-increasing in language size
    (that is the whole point of temperature sampling), capped at 1.0, and the
    kept set must be exactly {doc: uniform(doc) < rate(lang)} recomputed in
    Python."""
    import hashlib

    docs = _docs()
    n_by_lang = {}
    for d in docs:
        n_by_lang[d["lang"]] = n_by_lang.get(d["lang"], 0) + 1
    sm = {l: round(math.sqrt(float(n)) * 1000000) for l, n in n_by_lang.items()}
    total_n, total_sm = sum(n_by_lang.values()), sum(sm.values())
    rate = {
        l: min(1.0, ((0.5 * float(total_n)) * float(sm[l])) / (float(total_sm) * float(n)))
        for l, n in n_by_lang.items()
    }
    # monotone: bigger language -> rate no higher
    ordered = sorted(n_by_lang, key=n_by_lang.get)
    for small, big in zip(ordered, ordered[1:]):
        if n_by_lang[small] < n_by_lang[big]:
            assert rate[small] >= rate[big]

    def unit(doc_id):
        h = hashlib.md5(f"langmix:{doc_id}".encode()).hexdigest()
        return int(h[:15], 16) / float(1 << 60)

    expected = {
        (d["doc_id"], d["lang"], round(rate[d["lang"]] * 1000000))
        for d in docs
        if unit(d["doc_id"]) < rate[d["lang"]]
    }
    got = {
        (r.doc_id, r.lang, r.rate_micro)
        for r in REGISTRY["q_lang_temperature_mix"].spark_fn(spark, SF).collect()
    }
    assert got == expected
