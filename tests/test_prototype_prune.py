"""q_prototype_prune (D4 prototypicality pruning): geometry + invariants.

Repo policy: oracle parity cannot catch shared-constant algebra bugs, so
the operator gets an independent semantic test — a crafted embedding
geometry with hand-computable assignments and prune flags, plus corpus
invariants on the real test table.
"""

from __future__ import annotations

from video_data_pipeline_spark.queries.similarity import (
    _N_CENTROIDS,
    _PRUNE_DEN,
    q_prototype_prune,
)

SF_DIR = "/root/testdata/sf0.001"


def test_crafted_geometry(spark, tmp_path):
    # centroids = the 8 unit basis vectors e_0..e_7 (vec_id < 8). Members:
    # 5 per cluster k, vec = e_k + b*e_(k+1 mod 8) with b growing by
    # member index j -> cosine to e_k = 1/sqrt(1+b^2) strictly DECREASES
    # in j, so prototypicality rank inside cluster k is: centroid itself
    # (cos 1.0), then members in j order. n_cluster = 6, floor(6/4) = 1:
    # exactly the centroid row is pruned in every cluster.
    dim = 8
    rows = []
    for k in range(_N_CENTROIDS):
        v = [0.0] * dim
        v[k] = 1.0
        rows.append((k, "c", v))
    vid = _N_CENTROIDS
    for k in range(_N_CENTROIDS):
        for j in range(5):
            v = [0.0] * dim
            v[k] = 1.0
            v[(k + 1) % dim] = 0.1 * (j + 1)
            rows.append((vid, "m", v))
            vid += 1
    spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    got = {r["vec_id"]: r for r in q_prototype_prune(spark, str(tmp_path)).collect()}
    assert len(got) == len(rows)
    for k in range(_N_CENTROIDS):
        members = sorted(
            (r for r in got.values() if r["centroid_id"] == k),
            key=lambda r: r["proto_rank"],
        )
        assert [m["vec_id"] for m in members] == [
            k,
            *[_N_CENTROIDS + k * 5 + j for j in range(5)],
        ], f"cluster {k}: prototypicality order broke"
        assert all(m["n_cluster"] == 6 for m in members)
        assert [m["pruned"] for m in members] == [1, 0, 0, 0, 0, 0]


def test_corpus_invariants(spark):
    rows = q_prototype_prune(spark, SF_DIR).collect()
    assert rows
    e_count = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert len(rows) == e_count, "prune table must cover every vector"
    assert len({r["vec_id"] for r in rows}) == e_count
    by_c = {}
    for r in rows:
        by_c.setdefault(r["centroid_id"], []).append(r)
    for cid, members in by_c.items():
        n = len(members)
        assert all(m["n_cluster"] == n for m in members)
        ranks = sorted(m["proto_rank"] for m in members)
        assert ranks == list(range(1, n + 1)), f"cluster {cid}: ranks not dense"
        pruned = [m for m in members if m["pruned"] == 1]
        assert len(pruned) == n // _PRUNE_DEN, (cid, n, len(pruned))
        # the pruned set is exactly the top-ranked (most prototypical) slice
        assert {m["proto_rank"] for m in pruned} == set(range(1, n // _PRUNE_DEN + 1))
        # prototypicality order matches cosine order within the cluster
        by_rank = sorted(members, key=lambda m: m["proto_rank"])
        cos = [m["cosine"] for m in by_rank]
        assert cos == sorted(cos, reverse=True)
