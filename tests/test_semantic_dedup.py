"""Semantics pin for dedup_semantic_cluster's greedy min-id keep rule.

The docstring documents a deliberate delta from the SemDeDup paper
(keep-farthest-from-centroid): we DROP a vector iff it has a smaller-id
within-cell neighbor above tau. That rule is greedy, not transitive —
for a chain a~b, b~c with a NOT~ c, both b and c are dropped (c's only
witness b is itself dropped). A crafted corpus pins exactly that
behavior so a future "fix" can't silently change the contract the
DuckDB oracle mirrors.

Geometry: k-means assignment is nearest-centroid (euclidean), the dup
test is cosine (direction). The chain rides a tiny POSITIVE bias on
axis 0 (so nearest-seed assignment is driven by that coordinate — the
seeds sit at 10 on their own axis) while the pairwise-cosine geometry
lives on NEGATIVE coordinates of axes 1-2, where the bias contributes
only ~0.01 to each dot product:

    v8  = [0.1, -1.00,  0.00]  cos(8,9)  ~ 0.80  >= tau
    v9  = [0.1, -0.80, -0.60]  cos(9,10) ~ 0.80  >= tau
    v10 = [0.1, -0.28, -0.96]  cos(8,10) ~ 0.287 <  tau (0.30)
"""

from __future__ import annotations

import math

import pytest


def _chain_vectors() -> dict[int, list[float]]:
    return {
        8: [0.1, -1.0, 0.0] + [0.0] * 5,
        9: [0.1, -0.8, -0.6] + [0.0] * 5,
        10: [0.1, -0.28, -0.96] + [0.0] * 5,
    }


def _write_embeddings(spark, path: str) -> None:
    rows = []
    # seeds 0..7 (vec_id < KMEANS_K): each dominates one positive axis
    for s in range(8):
        v = [0.0] * 8
        v[s] = 10.0
        rows.append((s, v, "seed"))
    for vid, v in _chain_vectors().items():
        rows.append((vid, v, "chain"))
    df = spark.createDataFrame(
        rows, "vec_id: long, embedding: array<float>, label: string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")


def test_greedy_min_id_keep_rule_on_a_chain(spark, tmp_path):
    from datafusion_loki_spark.operators.dedup import (
        SEMDEDUP_TAU,
        dedup_semantic_cluster,
    )

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
        )

    vecs = _chain_vectors()
    assert cos(vecs[8], vecs[9]) >= SEMDEDUP_TAU
    assert cos(vecs[9], vecs[10]) >= SEMDEDUP_TAU
    if cos(vecs[8], vecs[10]) >= SEMDEDUP_TAU:
        pytest.fail(
            "crafted chain no longer straddles tau — rebuild the geometry"
        )

    _write_embeddings(spark, str(tmp_path))
    out = {
        r.vec_id: r
        for r in dedup_semantic_cluster(spark, str(tmp_path)).collect()
    }
    assert len(out) == 11
    # the chain must land in ONE cell for the test to mean anything
    assert out[8].cluster_id == out[9].cluster_id == out[10].cluster_id
    # 8: no smaller-id neighbor -> kept, one dup edge (9)
    assert (out[8].is_kept, out[8].n_sem_dups) == (1, 1)
    # 9: neighbor 8 is smaller -> dropped, edges to both 8 and 10
    assert (out[9].is_kept, out[9].n_sem_dups) == (0, 2)
    # 10: its only witness 9 was itself dropped, but the greedy rule
    # still drops 10 — the documented non-transitive contract
    assert (out[10].is_kept, out[10].n_sem_dups) == (0, 1)
    # no seed has a cosine-above-tau neighbor: all kept with 0 dups
    for s in range(8):
        assert (out[s].is_kept, out[s].n_sem_dups) == (1, 0), s
