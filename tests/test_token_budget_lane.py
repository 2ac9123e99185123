"""q_token_budget_mix epochs math must be exact at 100 TB token counts.

r9 VERDICT #3 / ADVICE: the narrow form ``(budget * sm * 1e6) div (...)``
overflowed BIGINT beyond ~sf30-scale token counts (budget·sm·1e6 ≈ 1e25 at
1e13-token sources), silently corrupting the recipe. token_budget_recipe
now runs the multiply in a DECIMAL(38,0) lane; these tests drive it with
synthetic per-source aggregates at real 100 TB scale and pin the output
against Python bignum math (exact by construction).
"""

from __future__ import annotations

import math

from video_data_pipeline_spark.queries.curation2 import (
    _BUDGET_DIV,
    _MICRO,
    token_budget_recipe,
)

# a plausible 100 TB mix: ~2.5e13 total tokens, wildly skewed sources —
# a tiny curated source (upsampled, epochs >> 1) through a web-scale one
_SOURCES = [
    ("books", 40_000_000, 21_000_000_000),
    ("wiki", 8_000_000, 4_900_000_000),
    ("curated", 120_000, 60_000_000),
    ("web", 12_000_000_000, 19_700_000_000_000),
    ("code", 900_000_000, 5_300_000_000_000),
]


def _python_recipe():
    rows = [
        (s, nd, nt, int(round(math.sqrt(float(nt))))) for s, nd, nt in _SOURCES
    ]
    total_tok = sum(nt for _, _, nt, _ in rows)
    total_sm = sum(sm for _, _, _, sm in rows)
    budget = total_tok // _BUDGET_DIV
    return {
        s: (
            (sm * _MICRO) // total_sm,
            (budget * sm * _MICRO) // (total_sm * nt),  # exact bignum
        )
        for s, nd, nt, sm in rows
    }


def test_epochs_exact_at_100tb_scale(spark):
    c = spark.createDataFrame(
        [
            (s, nd, nt, int(round(math.sqrt(float(nt)))))
            for s, nd, nt in _SOURCES
        ],
        "source string, n_docs bigint, n_tokens bigint, sm bigint",
    )
    got = {
        r["source"]: (r["weight_micro"], r["epochs_micro"])
        for r in token_budget_recipe(c).collect()
    }
    want = _python_recipe()
    assert got == want
    # the lane actually mattered: the narrow-product numerator overflows
    budget = sum(nt for _, _, nt in _SOURCES) // _BUDGET_DIV
    sm_web = int(round(math.sqrt(float(19_700_000_000_000))))
    assert budget * sm_web * _MICRO >= 1 << 63
    # and no sign-flip / wrap leaked through
    assert all(e >= 0 and w >= 0 for w, e in got.values())
    # upsampling semantics survive: the tiny curated source gets epochs > 1
    assert got["curated"][1] > _MICRO
    assert got["web"][1] < _MICRO


def test_epochs_long_schema(spark):
    c = spark.createDataFrame(
        [("a", 10, 1000, 32), ("b", 5, 4000, 63)],
        "source string, n_docs bigint, n_tokens bigint, sm bigint",
    )
    df = token_budget_recipe(c)
    kinds = dict(df.dtypes)
    assert kinds["epochs_micro"] == "bigint" and kinds["weight_micro"] == "bigint"
