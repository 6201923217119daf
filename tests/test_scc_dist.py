"""Distributed ColorSCC (components.scc_distributed) vs the sequential
Tarjan path — partition equality and the id=min-vid contract."""

import numpy as np
import pyarrow as pa
import pytest


def _gf(src, dst, n, ray_session):
    import ray.data as rd
    from raphtory_ray.graph.graph_frame import GraphFrame
    m = len(src)
    ds = rd.from_arrow(pa.table({
        "src": pa.array(np.asarray(src, np.int64)),
        "dst": pa.array(np.asarray(dst, np.int64)),
        "t": pa.array(np.arange(m, dtype=np.int64)),
        "event_id": pa.array(np.arange(m, dtype=np.int64))}))
    return GraphFrame(ds, n=n)


def _check(gf):
    from raphtory_ray.algorithms import strongly_connected_components_dist
    from raphtory_ray.algorithms.extra import strongly_connected_components
    ref = strongly_connected_components(gf).values
    got = strongly_connected_components_dist(gf).values
    np.testing.assert_array_equal(got, ref)


def test_scc_dist_random(ray_session):
    rng = np.random.default_rng(31)
    for trial in range(3):
        n = 300
        m = 900
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        _check(_gf(src, dst, n, ray_session))


def test_scc_dist_chain_of_cycles(ray_session):
    # k 3-cycles linked in a chain (deep condensation) with DECREASING ids
    # across the chain — the ColorSCC worst case the round cap guards.
    k = 12
    src, dst = [], []
    for c in range(k):
        base = (k - 1 - c) * 3   # decreasing ids along the chain
        src += [base, base + 1, base + 2]
        dst += [base + 1, base + 2, base]
        if c:
            prev_base = (k - c) * 3
            src.append(prev_base)
            dst.append(base)
    _check(_gf(src, dst, 3 * k, ray_session))


def test_scc_dist_residual_fallback(ray_session):
    # max_rounds=1 forces the Tarjan residual path on a two-SCC chain
    from raphtory_ray.algorithms import strongly_connected_components_dist
    from raphtory_ray.algorithms.extra import strongly_connected_components
    src = [5, 6, 7, 0, 1, 2, 7]
    dst = [6, 7, 5, 1, 2, 0, 0]
    gf = _gf(src, dst, 8, ray_session)
    ref = strongly_connected_components(gf).values
    got = strongly_connected_components_dist(gf, max_rounds=1).values
    np.testing.assert_array_equal(got, ref)


def test_scc_dist_dag_trims_entirely(ray_session):
    # pure DAG: every node is its own SCC; trim must resolve everything
    src = [0, 0, 1, 2, 3]
    dst = [1, 2, 3, 3, 4]
    _check(_gf(src, dst, 6, ray_session))
