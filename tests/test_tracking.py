"""Tracking operator tests: two moving objects, occlusion, re-entry."""

from __future__ import annotations

from video_data_pipeline_spark.operators.tracking import assign_tracks, track_objects


def _linear_dets(n_frames, objects):
    """objects: [(x0, y0, vx, vy)] → per-frame detection rows."""
    rows = []
    det_id = 0
    for f in range(n_frames):
        for x0, y0, vx, vy in objects:
            rows.append((f, det_id, float(x0 + vx * f), float(y0 + vy * f), 10.0, 10.0))
            det_id += 1
    return rows


def test_assign_tracks_two_objects():
    rows = _linear_dets(10, [(0, 0, 1, 0), (100, 100, 0, 1)])
    frames: dict[int, list] = {}
    for f, d, x, y, w, h in rows:
        frames.setdefault(f, []).append((d, x, y, w, h))
    got = assign_tracks(sorted(frames.items()))
    # two stable tracks: even det_ids (object A) all one track, odds the other
    a_tracks = {got[d] for f, d, *_ in rows if d % 2 == 0}
    b_tracks = {got[d] for f, d, *_ in rows if d % 2 == 1}
    assert len(a_tracks) == 1 and len(b_tracks) == 1 and a_tracks != b_tracks


def test_track_reentry_after_max_age():
    # object visible frames 0-2, gone 3-7, back at 8 (same spot):
    # gap (5) > max_age (3) ⇒ new track id
    frames = [(f, [(f, 0.0, 0.0, 10.0, 10.0)]) for f in [0, 1, 2, 8]]
    got = assign_tracks(frames, max_age=3)
    assert got[0] == got[1] == got[2]
    assert got[8] != got[0]
    # with a generous max_age the track survives the gap
    got2 = assign_tracks(frames, max_age=10)
    assert got2[8] == got2[0]


def test_track_objects_dataframe(spark):
    rows = [
        ("v1", *r) for r in _linear_dets(6, [(0, 0, 2, 0), (50, 50, 0, 2)])
    ] + [("v2", *r) for r in _linear_dets(4, [(5, 5, 1, 1)])]
    df = spark.createDataFrame(
        rows, "video_id string, frame_idx int, det_id int, x double, y double, w double, h double"
    )
    out = df.transform(track_objects()).collect()
    v1 = [r for r in out if r.video_id == "v1"]
    v2 = [r for r in out if r.video_id == "v2"]
    assert len({r.track_id for r in v1}) == 2  # two objects, two tracks
    assert len({r.track_id for r in v2}) == 1
    # per-video numbering restarts (state is per-group)
    assert min(r.track_id for r in v2) == 0
