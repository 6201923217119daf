"""Conformance tests for the numpy kernels against the reference's golden
fixtures (FIXTURES.md §B, lifted from Raphtory's own test suites)."""

import numpy as np
import pytest

from raphtory_ray.core import kernels as K
from raphtory_ray.core.ids import encode_event_list

# B1: gen_graph (test_algorithms.py:8-23)
GEN_GRAPH_EVENTS = [
    (10, 1, 3), (11, 1, 2), (12, 1, 2), (9, 1, 2), (12, 2, 4), (13, 2, 5),
    (14, 5, 5), (14, 5, 4), (5, 4, 6), (15, 4, 7), (10, 4, 7), (11, 4, 7),
    (10, 5, 8),
]

GOLDEN_PAGERANK = {
    1: 0.07209850165402759, 2: 0.10274080842110422, 3: 0.10274080842110422,
    4: 0.1615298183542792, 5: 0.1615298183542792, 6: 0.14074777909144864,
    7: 0.14074777909144864, 8: 0.11786468661230831,
}

GOLDEN_LOCAL_CLUSTERING = {1: 0.0, 2: 1 / 3, 3: 0.0, 4: 1 / 6, 5: 1 / 3,
                           6: 0.0, 7: 0.0, 8: 0.0}


def gen_graph():
    t, s, d, gmap = encode_event_list(GEN_GRAPH_EVENTS)
    return s, d, gmap


def test_gen_graph_encoding_first_sight_order():
    _, _, gmap = gen_graph()
    # insertion order: 1,3,2,4,5,6,7,8
    assert list(gmap) == [1, 3, 2, 4, 5, 6, 7, 8]


def test_degree_semantics_micro():
    # B7 micro-fixtures: multi-event edge, reciprocal pair, self-loop
    s = np.array([0, 0, 0])
    d = np.array([1, 1, 1])
    assert K.out_degree(s, d, 2).tolist() == [1, 0]
    s = np.array([0, 1])
    d = np.array([1, 0])
    assert K.both_degree(s, d, 2).tolist() == [1, 1]
    assert K.out_degree(s, d, 2).tolist() == [1, 1]
    assert K.in_degree(s, d, 2).tolist() == [1, 1]
    s = np.array([0])
    d = np.array([0])
    assert K.both_degree(s, d, 1).tolist() == [1]
    u, v = K.undirected_pairs(s, d)
    assert u.tolist() == [0] and v.tolist() == [0]


def test_pagerank_golden():
    s, d, gmap = gen_graph()
    n = len(gmap)
    scores, iters = K.pagerank(s, d, n)
    assert iters == 10  # converges at iteration 10 on this fixture
    for gid, want in GOLDEN_PAGERANK.items():
        assert scores[gmap[gid]] == pytest.approx(want, abs=1e-6)


def test_pagerank_no_early_stop_runs_cap():
    s, d, gmap = gen_graph()
    scores, iters = K.pagerank(s, d, len(gmap), tol=0.0, iter_count=7)
    assert iters == 7


def test_wcc_single_component():
    s, d, gmap = gen_graph()
    labels = K.wcc(s, d, len(gmap))
    assert set(labels.tolist()) == {0}


def test_wcc_two_components():
    # B3: (1,2,1)(2,3,2)(3,4,3)(3,5,4)(6,5,5)(7,8,6)(8,7,7) as (t,src,dst)
    events = [(1, 1, 2), (2, 2, 3), (3, 3, 4), (4, 3, 5), (5, 6, 5),
              (6, 7, 8), (7, 8, 7)]
    t, s, d, gmap = encode_event_list(events)
    labels = K.wcc(s, d, len(gmap))
    comp = {}
    for gid, vid in gmap.items():
        comp.setdefault(labels[vid], set()).add(gid)
    assert sorted(map(frozenset, comp.values()), key=len) == [
        frozenset({7, 8}), frozenset({1, 2, 3, 4, 5, 6})]
    # canonical label = min vid in component
    for lab, members in comp.items():
        assert lab == min(gmap[g] for g in members)


def test_lpa_golden_communities():
    # B2 fixture: undirected pairs at t=1 (order defines node positions)
    pairs = [("R1", "R2"), ("R1", "R3"), ("R2", "R3"), ("R3", "G"),
             ("G", "B1"), ("G", "B3"), ("B1", "B2"), ("B2", "B3"),
             ("B2", "B4"), ("B3", "B4"), ("B3", "B5"), ("B4", "B5")]
    events = [(1, a, b) for a, b in pairs]
    t, s, d, gmap = encode_event_list(events)
    assert list(gmap) == ["R1", "R2", "R3", "G", "B1", "B3", "B2", "B4", "B5"]
    n = len(gmap)
    labels, iters = K.lpa(s, d, n)
    by_label = {}
    for gid, vid in gmap.items():
        by_label.setdefault(int(labels[vid]), set()).add(gid)
    assert by_label == {2: {"R1", "R2", "R3"},
                        8: {"G", "B1", "B2", "B3", "B4", "B5"}}


def test_kcore_golden():
    # B4 fixture: (src, dst, t) events; k=2 core
    events_sdt = [
        (1, 2, 1), (1, 3, 2), (1, 4, 3), (3, 1, 4), (3, 4, 5), (3, 5, 6),
        (4, 5, 7), (5, 6, 8), (5, 8, 9), (7, 5, 10), (8, 5, 11), (1, 9, 12),
        (9, 1, 13), (6, 3, 14), (4, 8, 15), (8, 3, 16), (5, 10, 17),
        (10, 5, 18), (10, 8, 19), (1, 11, 20), (11, 1, 21), (9, 11, 22),
        (11, 9, 23),
    ]
    events = [(t, s, d) for (s, d, t) in events_sdt]
    t, s, d, gmap = encode_event_list(events)
    alive = K.kcore_set(s, d, len(gmap), k=2)
    got = {gid for gid, vid in gmap.items() if alive[vid]}
    assert got == {1, 3, 4, 5, 6, 8, 9, 10, 11}


def test_triangle_count_doc_fixture():
    # B5: 3 disjoint triangles + one extra triangle sharing an edge → 4 total
    pairs = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (7, 8), (8, 9),
             (9, 7), (8, 10), (10, 9)]
    events = [(1, a, b) for a, b in pairs]
    t, s, d, gmap = encode_event_list(events)
    total, local = K.triangle_counts(s, d, len(gmap))
    assert total == 4


def test_triangle_local_fixture():
    # B5 local: events (t,src,dst) = (1,1,2)(2,1,3)(3,2,1)(4,3,2) → each of
    # nodes 1,2,3 in exactly 1 triangle
    events = [(1, 1, 2), (2, 1, 3), (3, 2, 1), (4, 3, 2)]
    t, s, d, gmap = encode_event_list(events)
    total, local = K.triangle_counts(s, d, len(gmap))
    assert total == 1
    assert local.tolist() == [1, 1, 1]


def test_local_clustering_golden():
    s, d, gmap = gen_graph()
    cc = K.local_clustering(s, d, len(gmap))
    for gid, want in GOLDEN_LOCAL_CLUSTERING.items():
        assert cc[gmap[gid]] == pytest.approx(want)


def test_triangles_ignore_self_loops_and_direction():
    # self loop + reciprocal edges on a triangle still count 1
    events = [(1, 1, 1), (2, 1, 2), (3, 2, 1), (4, 2, 3), (5, 3, 1)]
    t, s, d, gmap = encode_event_list(events)
    total, local = K.triangle_counts(s, d, len(gmap))
    assert total == 1


def test_triplet_count():
    # star 1-(2,3,4): node 1 has C(3,2)=3 triplets
    events = [(1, 1, 2), (2, 1, 3), (3, 1, 4)]
    t, s, d, gmap = encode_event_list(events)
    assert K.triplet_count(s, d, len(gmap)) == 3


def test_degree_centrality_fixture():
    # B6: edges at t=0 (1,2)(1,3)(1,4)(2,3)(2,4) → {1:1, 2:1, 3:2/3, 4:2/3}
    events = [(0, 1, 2), (0, 1, 3), (0, 1, 4), (0, 2, 3), (0, 2, 4)]
    t, s, d, gmap = encode_event_list(events)
    deg = K.both_degree(s, d, len(gmap)).astype(float)
    cent = deg / deg.max()
    want = {1: 1.0, 2: 1.0, 3: 2 / 3, 4: 2 / 3}
    for gid, w in want.items():
        assert cent[gmap[gid]] == pytest.approx(w)


def test_wcc_random_vs_networkx_style_oracle():
    # property-style check: random graph, compare partitions against a
    # simple BFS union-find oracle
    rng = np.random.default_rng(7)
    n = 200
    m = 400
    s = rng.integers(0, n, m)
    d = rng.integers(0, n, m)
    labels = K.wcc(s, d, n)

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(s.tolist(), d.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    oracle = [find(i) for i in range(n)]
    # same partition
    import collections
    g1 = collections.defaultdict(set)
    g2 = collections.defaultdict(set)
    for i in range(n):
        g1[labels[i]].add(i)
        g2[oracle[i]].add(i)
    assert sorted(map(sorted, g1.values())) == sorted(map(sorted, g2.values()))


def test_pagerank_superstep_partial_decomposition():
    # per-block partial bincounts sum to the full superstep contribution —
    # the identity the distributed engine relies on
    s, d, gmap = gen_graph()
    n = len(gmap)
    s, d = K.dedup_pairs(s, d)
    outdeg = np.bincount(s, minlength=n).astype(float)
    prev = np.full(n, 1.0 / n)
    full = K.pagerank_superstep(s, d, prev, outdeg, n, 0.85)
    # split into 3 blocks
    parts = np.array_split(np.arange(len(s)), 3)
    contrib = np.zeros(n)
    for p in parts:
        contrib += np.bincount(d[p], weights=prev[s[p]] / outdeg[s[p]], minlength=n)
    sink = prev[outdeg == 0].sum()
    stitched = (1 - 0.85) / n + 0.85 * contrib + 0.85 / n * sink
    np.testing.assert_allclose(stitched, full, rtol=0, atol=1e-15)
