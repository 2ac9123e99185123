"""Join-shaped operators.

The reference has exactly two join-shaped operators (SURVEY.md §2.7):
- ``associate`` (filters.py:350-361): enrich each sample from a key→dict
  lookup — a left-outer *broadcast hash join* in Spark terms.
- ``combineKeyFrames`` (pack/tools.py:155-197): sort-merge two time-ordered
  frame streams (I-frames, P-frames), tagging origin — a tagged
  ``unionByName`` + per-key ordering.

Scale notes: ``associate`` explicitly broadcasts (dimension side is small by
construction — it was an in-memory dict in the reference); the merge is a
zero-shuffle union whose ordering is deferred to the consumer window/sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def associate(lookup: DataFrame, on: str = "__key__", how: str = "left"):
    """Broadcast-join enrichment: ``df.transform(associate(dim, on="key"))``.

    Reference ``associate`` (filters.py:350-361) merges ``associator(key)``
    into the sample dict; here the lookup is a DataFrame and the merge is a
    broadcast hash join — no shuffle of the fact side.
    """

    def _op(df: DataFrame) -> DataFrame:
        return df.join(F.broadcast(lookup), on=on, how=how)

    return _op


def combine_keyframes(
    i_frames: DataFrame,
    p_frames: DataFrame,
    key_cols: list[str],
    time_col: str,
    tag_col: str = "frame_type",
) -> DataFrame:
    """Merge two time-ordered streams, tagging origin "I"/"P".

    Reference ``combineKeyFrames`` (pack/tools.py:155-197) walks both sorted
    lists with two cursors; distributed form: tagged union + per-key
    ``merge_pos`` window (ties broken I-before-P, matching the reference's
    ``<=`` cursor advance).
    """
    from pyspark.sql import Window

    tagged = i_frames.withColumn(tag_col, F.lit("I")).unionByName(
        p_frames.withColumn(tag_col, F.lit("P"))
    )
    w = Window.partitionBy(*key_cols).orderBy(F.col(time_col).asc(), F.col(tag_col).asc())
    return tagged.withColumn("merge_pos", F.row_number().over(w))
