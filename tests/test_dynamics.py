"""SEIR / bipartite projection / alternating mask conformance.

Projection fixtures transcribed from
projections/temporal_bipartite_projection.rs:90-170 (small/larger delta);
SEIR checked by structural invariants (the reference's own test is
statistical, epidemics.rs:260+)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _gf(ray_session, edges, n):
    import ray.data as rd
    from raphtory_ray.graph.graph_frame import GraphFrame
    t = np.array([e[0] for e in edges], np.int64)
    s = np.array([e[1] for e in edges], np.int64)
    d = np.array([e[2] for e in edges], np.int64)
    return GraphFrame(rd.from_arrow(pa.table({
        "src": pa.array(s), "dst": pa.array(d), "t": pa.array(t),
        "event_id": pa.array(np.arange(len(s), dtype=np.int64))})), n)


# A,B,C → 0,1,2 ; pivots "1".."4" → 3,4,5,6
BIP = [(1, 0, 3), (3, 0, 4), (3, 1, 4), (4, 2, 5), (6, 1, 5), (8, 0, 5),
       (10, 2, 6), (11, 1, 6)]


def _edges_set(g):
    rows = set()
    for b in g.edges.iter_batches(batch_format="pyarrow"):
        for r in zip(b["src"].to_pylist(), b["dst"].to_pylist(),
                     b["t"].to_pylist()):
            rows.add(r)
    return rows


def test_bipartite_small_delta(ray_session):
    from raphtory_ray.algorithms.dynamics import temporal_bipartite_projection
    gf = _gf(ray_session, BIP, 7)
    proj = temporal_bipartite_projection(gf, 1, [3, 4, 5, 6])
    got = _edges_set(proj)
    assert (0, 1, 3) in got          # A→B at 3 via pivot "2"
    assert (2, 1, 10) in got         # C→B at 10 via pivot "4"
    assert not any((a, b) in {(0, 2), (2, 0)} for a, b, _ in got)


def test_bipartite_larger_delta(ray_session):
    from raphtory_ray.algorithms.dynamics import temporal_bipartite_projection
    gf = _gf(ray_session, BIP, 7)
    proj = temporal_bipartite_projection(gf, 3, [3, 4, 5, 6])
    got = _edges_set(proj)
    assert (0, 1, 3) in got          # earliest A↔B at 3
    assert (1, 0, 7) in got          # B→A at (6+8)//2 = 7 via pivot "3"
    assert (2, 1, 5) in got          # C→B at (4+6)//2 via pivot "3"
    assert (2, 1, 10) in got


def test_seir_si_spread(ray_session):
    """SI (no recovery), p=1, incubation 1: infection follows
    time-respecting paths with unit lag."""
    from raphtory_ray.algorithms.dynamics import temporal_SEIR
    # chain 0→1 (t=5), 1→2 (t=10), 2→3 (t=3: too early to ride)
    gf = _gf(ray_session, [(5, 0, 1), (10, 1, 2), (3, 2, 3)], 4)
    st = temporal_SEIR(gf, None, None, 1.0, 0, [0],
                       rng=np.random.default_rng(1))
    assert set(st) == {0, 1, 2}
    assert st[0][0] == 0 and st[0][1] == 1          # active at 1
    assert st[1][0] == 5 and st[1][1] == 6
    assert st[2][0] == 10
    big = np.iinfo(np.int64).max
    assert all(v[2] == big for v in st.values())    # SI: never recover


def test_seir_zero_prob_and_recovery(ray_session):
    from raphtory_ray.algorithms.dynamics import temporal_SEIR
    gf = _gf(ray_session, [(5, 0, 1), (10, 1, 2)], 3)
    st = temporal_SEIR(gf, None, None, 0.0, 0, [0],
                       rng=np.random.default_rng(1))
    assert set(st) == {0}
    st2 = temporal_SEIR(gf, 10.0, 2.0, 1.0, 0, [0],
                        rng=np.random.default_rng(7))
    for inf, act, rec in st2.values():
        assert inf <= act <= rec


def test_seir_number_seeds(ray_session):
    from raphtory_ray.algorithms.dynamics import temporal_SEIR
    gf = _gf(ray_session, [(1, 0, 1), (2, 1, 2), (3, 2, 3)], 4)
    st = temporal_SEIR(gf, None, None, 1.0, 0, 2,
                       rng=np.random.default_rng(3))
    assert len(st) >= 2


def test_alternating_mask(ray_session):
    from raphtory_ray.algorithms.dynamics import alternating_mask
    gf = _gf(ray_session, [(1, 0, 1)], 5)
    assert alternating_mask(gf).tolist() == [False, True, False, True, False]
