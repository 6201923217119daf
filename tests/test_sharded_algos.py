"""ShardedAlgos (actor-partitioned WCC/LPA/k-core/HITS) — equivalence with
the task path in state/shards.py on random graphs, plus structural checks."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def rnd_graph(ray_session):
    from raphtory_ray.state.shards import BspGraph
    rng = np.random.default_rng(17)
    src = rng.integers(0, 1200, 6000)
    dst = rng.integers(0, 1200, 6000)
    # add isolated vertices + a disconnected clique to exercise components
    return BspGraph.from_arrays(src, dst, 1300, num_blocks=6)


def test_wcc_matches_task_engine(rnd_graph):
    from raphtory_ray.state.sharded_algos import ShardedAlgos
    want = rnd_graph.wcc()
    with ShardedAlgos(rnd_graph, num_workers=3) as eng:
        got = eng.wcc()
    assert np.array_equal(got, want)


def test_lpa_matches_task_engine(rnd_graph):
    from raphtory_ray.state.sharded_algos import ShardedAlgos
    want, it_w = rnd_graph.lpa(iter_count=7, until_converged=False)
    with ShardedAlgos(rnd_graph, num_workers=3) as eng:
        got, it_g = eng.lpa(iter_count=7, until_converged=False)
    assert it_w == it_g
    assert np.array_equal(got, want)


def test_kcore_matches_task_engine(rnd_graph):
    from raphtory_ray.state.sharded_algos import ShardedAlgos
    for k in (2, 5, 9):
        want = rnd_graph.kcore_set(k)
        with ShardedAlgos(rnd_graph, num_workers=3) as eng:
            got = eng.kcore_set(k)
        assert np.array_equal(got, want), f"k={k}"


def test_hits_matches_task_engine(rnd_graph):
    from raphtory_ray.state.sharded_algos import ShardedAlgos
    hub_w, auth_w, it_w = rnd_graph.hits(iter_count=30, tol=1e-3)
    with ShardedAlgos(rnd_graph, num_workers=3) as eng:
        hub_g, auth_g, it_g = eng.hits(iter_count=30, tol=1e-3)
    assert it_w == it_g
    assert np.allclose(hub_g, hub_w, atol=1e-10)
    assert np.allclose(auth_g, auth_w, atol=1e-10)


def test_wcc_disconnected_and_isolated(ray_session):
    """Known components: two chains + an isolated vertex."""
    from raphtory_ray.state.shards import BspGraph
    from raphtory_ray.state.sharded_algos import ShardedAlgos
    src = np.array([0, 1, 2, 5, 6])
    dst = np.array([1, 2, 3, 6, 7])
    g = BspGraph.from_arrays(src, dst, 9, num_blocks=3)
    with ShardedAlgos(g, num_workers=2) as eng:
        labels = eng.wcc()
    assert labels.tolist() == [0, 0, 0, 0, 4, 5, 5, 5, 8]
