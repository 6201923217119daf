"""Hub-skew behavior: a single vertex with extreme degree must not break
correctness or blow task memory — the north_rule's skew-mitigation claim.

Mechanisms under test: per-task local combiners (a hot destination costs
one float per block in the superstep), bounded wedge-chunk generation in
the triangle semi-join (a hub middle vertex expands in <= chunk_wedges
slices), and the distributed closure's bounded join chunks."""
import numpy as np
import pytest

from raphtory_ray.state.shards import BspGraph


def _star_plus_ring(n_spokes=20_000, seed=2):
    """Hub 0 -> every spoke, plus a ring over the spokes, plus a few
    triangles through the hub."""
    hub_src = np.zeros(n_spokes, np.int64)
    hub_dst = np.arange(1, n_spokes + 1, dtype=np.int64)
    ring_src = np.arange(1, n_spokes + 1, dtype=np.int64)
    ring_dst = np.roll(ring_src, -1)
    src = np.concatenate([hub_src, ring_src])
    dst = np.concatenate([hub_dst, ring_dst])
    return src, dst, n_spokes + 1


def test_hub_pagerank_and_degrees(ray_session):
    src, dst, n = _star_plus_ring()
    g = BspGraph.from_arrays(src, dst, n, num_blocks=8)
    assert g.out_degree[0] == 20_000
    assert int(g.in_degree.max()) == 2        # spokes: hub + ring
    rank, iters, _ = g.pagerank(iter_count=50, tol=1e-10)
    assert rank.sum() == pytest.approx(1.0, abs=1e-9)
    # every spoke is symmetric up to ring position: ranks must be equal
    assert float(np.std(rank[1:])) < 1e-12


def test_hub_triangles_bounded_chunks(ray_session):
    """Triangles through a 20k-degree hub with chunk_wedges=1000: the
    wedge expansion is forced through ~400 bounded slices and the count
    must stay exact (ring edge (i, i+1) + hub edges 0->i, 0->i+1)."""
    src, dst, n = _star_plus_ring(n_spokes=2_000)
    g = BspGraph.from_arrays(src, dst, n, num_blocks=8)
    total_small_chunks, _ = g.triangle_counts(chunk_wedges=1000)
    total_default, _ = g.triangle_counts()
    # ring of 2000 spokes: each consecutive pair forms one triangle with
    # the hub; the wrap-around edge too => exactly n_spokes triangles
    assert total_small_chunks == total_default == 2_000


def test_hub_wcc_single_component(ray_session):
    src, dst, n = _star_plus_ring(n_spokes=5_000)
    g = BspGraph.from_arrays(src, dst, n, num_blocks=8)
    labels = g.wcc()
    assert np.all(labels == 0)
