"""Generic superstep API (ATask/Job/TaskRunner equivalent) — user-written
supersteps reproduce built-in algorithms."""

from __future__ import annotations

import numpy as np


def _bsp(ray_session, edges, n):
    from raphtory_ray.state.shards import BspGraph
    s = np.array([e[0] for e in edges], np.int64)
    d = np.array([e[1] for e in edges], np.int64)
    return BspGraph.from_arrays(s, d, n)


def test_user_indegree(ray_session):
    from raphtory_ray.state.supersteps import run_supersteps
    g = _bsp(ray_session, [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)], 4)
    state, it = run_supersteps(
        g, np.zeros(4),
        message=lambda src_state, s, d: np.ones(len(s)),
        combine="sum", iter_count=1)
    assert it == 1
    np.testing.assert_array_equal(state, g.in_degree.astype(float))


def test_user_bfs_hops(ray_session):
    from raphtory_ray.state.supersteps import run_supersteps
    g = _bsp(ray_session, [(0, 1), (1, 2), (2, 3), (3, 4), (1, 4)], 5)
    inf = np.inf
    st0 = np.full(5, inf)
    st0[0] = 0.0
    state, it = run_supersteps(
        g, st0,
        message=lambda src_state, s, d: src_state + 1,
        combine="min",
        apply=lambda old, msg, got: np.minimum(old, np.where(got, msg, inf)),
        iter_count=30,
        check=lambda old, new: np.array_equal(old, new))
    np.testing.assert_array_equal(state, [0, 1, 2, 3, 2])
    assert it < 30


def test_user_wcc_min_label(ray_session):
    """Min-label propagation over the symmetrized graph equals built-in
    WCC labels."""
    from raphtory_ray.state.shards import BspGraph
    from raphtory_ray.state.supersteps import run_supersteps
    edges = [(0, 1), (1, 2), (3, 4)]
    und = edges + [(b, a) for a, b in edges]
    g = _bsp(ray_session, und, 5)
    state, _ = run_supersteps(
        g, np.arange(5, dtype=float),
        message=lambda src_state, s, d: src_state,
        combine="min",
        apply=lambda old, msg, got: np.minimum(old,
                                               np.where(got, msg, np.inf)),
        iter_count=50,
        check=lambda old, new: np.array_equal(old, new))
    np.testing.assert_array_equal(state, g.wcc().astype(float))


def test_katz_centrality_brute_force(ray_session):
    """Katz via run_supersteps vs a dense numpy recurrence; convergent
    mode stops early."""
    import numpy as np
    from raphtory_ray.algorithms import katz_centrality
    from raphtory_ray.state.shards import BspGraph
    rng = np.random.default_rng(5)
    src = rng.integers(0, 300, 1500)
    dst = rng.integers(0, 300, 1500)
    g = BspGraph.from_arrays(src, dst, 300, num_blocks=4)
    st = katz_centrality(g, alpha=1e-3, beta=2.0, iter_count=6, tol=0.0)
    assert st.iterations == 6
    pair = np.unique(src.astype(np.int64) * 300 + dst.astype(np.int64))
    s, d = pair // 300, pair % 300
    x = np.full(300, 2.0)
    for _ in range(6):
        contrib = np.zeros(300)
        np.add.at(contrib, d, x[s])
        x = 2.0 + 1e-3 * contrib
    assert np.allclose(st.values, x, atol=1e-12)
    st2 = katz_centrality(g, alpha=1e-3, beta=2.0, iter_count=500, tol=1e-12)
    assert st2.iterations < 500          # fixpoint reached early


def test_eigenvector_centrality_brute_force(ray_session):
    import numpy as np
    from raphtory_ray.algorithms import eigenvector_centrality
    from raphtory_ray.state.shards import BspGraph
    rng = np.random.default_rng(11)
    src = rng.integers(0, 250, 1200)
    dst = rng.integers(0, 250, 1200)
    g = BspGraph.from_arrays(src, dst, 250, num_blocks=4)
    st = eigenvector_centrality(g, iter_count=6, tol=0.0)
    pair = np.unique(src.astype(np.int64) * 250 + dst.astype(np.int64))
    s, d = pair // 250, pair % 250
    x = np.full(250, 1.0 / np.sqrt(250))
    for _ in range(6):
        nxt = np.zeros(250)
        np.add.at(nxt, d, x[s])
        nrm = np.sqrt(np.square(nxt).sum())
        x = nxt / nrm if nrm > 0 else nxt
    assert np.allclose(st.values, x, atol=1e-12)
    assert abs(float(np.square(st.values).sum()) - 1.0) < 1e-9  # unit norm
