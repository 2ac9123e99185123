"""Registry ordering contract: any 50-query prefix covers every family.

External verifiers may only check the first N registry entries; ``load_all``
therefore round-robins oracled queries across families and sorts oracle-less
(rows-only) queries last. These tests pin that contract.
"""

from collections import Counter

from video_data_pipeline_spark.queries.registry import load_all


def test_first_50_covers_every_family():
    reg = load_all()
    names = list(reg)
    first50 = names[:50]
    all_fams = {q.spark_fn.__module__ for q in reg.values() if q.oracle is not None}
    fams50 = Counter(reg[n].spark_fn.__module__ for n in first50)
    missing = all_fams - set(fams50)
    assert not missing, f"families absent from the first-50 window: {missing}"
    # every family gets a real foothold: a full round-robin share of the
    # window (floor(50 / #families)), or everything it has — whichever is
    # smaller. (Round-9 grew the family count past 16, so the old fixed
    # ">= 3 each" exceeded 50 total slots; single-query families —
    # audit/communities/simjoin — can contribute at most their own size.)
    fam_totals = Counter(
        q.spark_fn.__module__ for q in reg.values() if q.oracle is not None
    )
    share = max(1, len(first50) // len(all_fams))
    for fam in all_fams:
        want = min(share, fam_totals[fam])
        assert fams50[fam] >= want, (fam, fams50[fam], want, fams50)


def test_no_oracle_queries_sort_last():
    reg = load_all()
    names = list(reg)
    oracle_flags = [reg[n].oracle is not None for n in names]
    # once we hit the first oracle-less query, everything after is oracle-less
    if False in oracle_flags:
        first_false = oracle_flags.index(False)
        assert not any(oracle_flags[first_false:]), names[first_false:]


def test_load_all_idempotent():
    assert list(load_all()) == list(load_all())
