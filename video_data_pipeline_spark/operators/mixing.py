"""Stream-mixing operators (reference ``mix.py``).

- ``RoundRobin`` (mix.py:16-51) interleaves k iterators; in Spark batch,
  interleave order is meaningless — the faithful semantics is a union whose
  per-source cardinality matches the drain policy.
- ``RandomMix`` (mix.py:54-82) draws from source i with probability p_i; the
  Spark-native equivalent is a union of deterministic per-source samples with
  fractions ∝ p (ratio-faithful in expectation, exact under stable hashing).

Scale notes: ``unionByName`` is a zero-shuffle operator — each input keeps
its partitioning; sampling is a pushed-down filter.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame

from video_data_pipeline_spark.operators.sampling import rsample


def round_robin(*dfs: DataFrame, longest: bool = False, source_col: str | None = None):
    """Union k sources; ``longest=False`` truncates all to the shortest
    cardinality (RoundRobin stop-at-shortest policy, mix.py:38-44).

    Note: ``longest=False`` triggers per-source counts (an action); prefer
    ``longest=True`` (drain-all) in production plans.
    """
    from pyspark.sql import functions as F

    frames = list(dfs)
    if source_col is not None:
        frames = [df.withColumn(source_col, F.lit(i)) for i, df in enumerate(frames)]
    if not longest:
        n = min(df.count() for df in dfs)
        frames = [df.limit(n) for df in frames]
    return reduce(lambda a, b: a.unionByName(b), frames)


def random_mix(
    dfs: list[DataFrame],
    probs: list[float],
    key,
    seed: str = "mix",
) -> DataFrame:
    """Weighted mix: deterministic Bernoulli sample of each source with
    fraction ∝ its probability (normalized to max 1.0), then union.

    ``key`` may be a column name common to all sources or a per-source list
    of Columns; sampling is keyed so retries reproduce the same mix.
    """
    m = max(probs)
    fracs = [p / m for p in probs]
    keys = key if isinstance(key, list) else [key] * len(dfs)
    parts = []
    for i, (df, f, k) in enumerate(zip(dfs, fracs, keys)):
        parts.append(df if f >= 1.0 else df.transform(rsample(k, f, seed=f"{seed}:{i}")))
    return reduce(lambda a, b: a.unionByName(b), parts)
