"""Max-weight matching golden (max_weight_matching.rs:1550-1588) and
Fruchterman-Reingold layout invariants."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _gf(ray_session, edges, n, w=None):
    import ray.data as rd
    from raphtory_ray.graph.graph_frame import GraphFrame
    cols = {"src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
            "t": pa.array([0] * len(edges), pa.int64()),
            "event_id": pa.array(np.arange(len(edges), dtype=np.int64))}
    if w is not None:
        cols["w"] = pa.array(np.asarray(w, np.float64))
    return GraphFrame(rd.from_arrow(pa.table(cols)), n)


def test_max_weight_matching_golden(ray_session):
    """Reference fixture: path 1-2(5), 2-3(11), 3-4(5)."""
    from raphtory_ray.algorithms.matching import max_weight_matching
    gf = _gf(ray_session, [(1, 2), (2, 3), (3, 4)], 5, w=[5.0, 11.0, 5.0])
    m = max_weight_matching(gf, "w", max_cardinality=False)
    assert len(m) == 1 and m.contains(2, 3)
    assert m.src(3) == 2 and m.src(2) is None
    assert m.dst(2) == 3 and m.dst(3) is None
    assert m.edges() == [(2, 3)]
    mc = max_weight_matching(gf, "w", max_cardinality=True)
    assert len(mc) == 2 and mc.contains(1, 2) and mc.contains(3, 4)


def test_fr_layout_invariants(ray_session):
    """Connected pairs end closer than unconnected ones; deterministic
    per seed; every node gets finite coordinates."""
    from raphtory_ray.algorithms.layout import (
        cohesive_fruchterman_reingold, fruchterman_reingold_unbounded)
    # two 3-cliques, NOT connected to each other
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)]
    gf = _gf(ray_session, edges, 6)
    pos = fruchterman_reingold_unbounded(gf, iter_count=150, seed=3)
    assert pos.shape == (6, 2) and np.isfinite(pos).all()
    intra = np.linalg.norm(pos[0] - pos[1])
    inter = np.linalg.norm(pos[0] - pos[3])
    assert intra < inter
    pos2 = fruchterman_reingold_unbounded(gf, iter_count=150, seed=3)
    np.testing.assert_array_equal(pos, pos2)
    # cohesive mirrors the reference (virtual graph unused quirk)
    pos3 = cohesive_fruchterman_reingold(gf, iter_count=150, seed=3)
    np.testing.assert_array_equal(pos, pos3)
