"""Object tracking across video frames (SORT-style greedy IoU matching).

The reference *declares* tracking as a capability (README "sampling,
tracking") but stubs it (``tracking_process`` pack/tools.py:220-222 is
``pass``). This is the real operator: per-video sequential track
assignment — frame-ordered greedy IoU matching of detections to active
tracks, new track on no match, track retirement after ``max_age`` unseen
frames.

Spark shape: the same pattern as the greedy packer (SURVEY.md §7 (2)):
order-dependent per-video state runs in ``applyInPandas`` keyed by video;
thousands of videos track in parallel; state is the active-track list
(tiny). Detection *production* (the detector) is a media UDF upstream;
this operator is pure geometry and runs anywhere.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def _iou(a, b) -> float:
    ax2, ay2 = a[0] + a[2], a[1] + a[3]
    bx2, by2 = b[0] + b[2], b[1] + b[3]
    ix = max(0.0, min(ax2, bx2) - max(a[0], b[0]))
    iy = max(0.0, min(ay2, by2) - max(a[1], b[1]))
    inter = ix * iy
    union = a[2] * a[3] + b[2] * b[3] - inter
    return inter / union if union > 0 else 0.0


def assign_tracks(
    frames: list[tuple[int, list[tuple[int, float, float, float, float]]]],
    iou_threshold: float = 0.3,
    max_age: int = 3,
) -> dict[int, int]:
    """Pure kernel: [(frame_idx, [(det_id, x, y, w, h), ...])] ordered by
    frame → {det_id: track_id}. Greedy best-IoU matching per frame."""
    next_track = 0
    active: dict[int, tuple[float, float, float, float]] = {}
    last_seen: dict[int, int] = {}
    out: dict[int, int] = {}
    for frame_idx, dets in frames:
        # retire stale tracks
        for t in [t for t, seen in last_seen.items() if frame_idx - seen > max_age]:
            active.pop(t, None)
            last_seen.pop(t, None)
        # greedy matching: all (track, det) pairs by IoU desc
        pairs = []
        for det_id, x, y, w, h in dets:
            for t, box in active.items():
                iou = _iou((x, y, w, h), box)
                if iou >= iou_threshold:
                    pairs.append((iou, t, det_id))
        pairs.sort(key=lambda p: (-p[0], p[1], p[2]))
        matched_t: set[int] = set()
        matched_d: set[int] = set()
        det_boxes = {d[0]: d[1:] for d in dets}
        for iou, t, det_id in pairs:
            if t in matched_t or det_id in matched_d:
                continue
            matched_t.add(t)
            matched_d.add(det_id)
            out[det_id] = t
            active[t] = det_boxes[det_id]
            last_seen[t] = frame_idx
        for det_id, x, y, w, h in dets:
            if det_id not in matched_d:
                out[det_id] = next_track
                active[next_track] = (x, y, w, h)
                last_seen[next_track] = frame_idx
                next_track += 1
    return out


def track_objects(
    video_col: str = "video_id",
    frame_col: str = "frame_idx",
    det_col: str = "det_id",
    box_cols: tuple[str, str, str, str] = ("x", "y", "w", "h"),
    iou_threshold: float = 0.3,
    max_age: int = 3,
    track_col: str = "track_id",
):
    """DataFrame operator: detections → detections + ``track_col``.

    Input: one row per detection with video / frame / box columns.
    Output: same rows plus the assigned track id (per-video numbering).
    """

    def _track(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([frame_col, det_col], kind="mergesort").reset_index(drop=True)
        frames: dict[int, list] = {}
        for r in pdf.itertuples(index=False):
            d = dict(zip(pdf.columns, r))
            frames.setdefault(int(d[frame_col]), []).append(
                (
                    int(d[det_col]),
                    float(d[box_cols[0]]),
                    float(d[box_cols[1]]),
                    float(d[box_cols[2]]),
                    float(d[box_cols[3]]),
                )
            )
        assignment = assign_tracks(
            sorted(frames.items()), iou_threshold=iou_threshold, max_age=max_age
        )
        pdf[track_col] = pd.array(
            [assignment[int(d)] for d in pdf[det_col]], dtype="int64"
        )
        return pdf

    def _op(df: DataFrame) -> DataFrame:
        from video_data_pipeline_spark.session import ensure_shipped

        ensure_shipped(df.sparkSession)
        schema = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
        )
        return df.groupBy(video_col).applyInPandas(
            _track, schema=f"{schema}, `{track_col}` bigint"
        )

    return _op
