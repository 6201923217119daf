"""Maximum weight matching (bipartite/max_weight_matching.rs:880-1540).

The reference ships a 1.5k-line port of Galil's blossom algorithm
("Efficient algorithms for finding maximum matching in graphs", via the
NetworkX implementation it credits). It is strictly sequential. This engine
reduces the EVENT log to the weighted simple-edge graph distributedly
(latest event's weight per edge, same reduction as louvain) and runs the
very same Galil/NetworkX blossom on the reduced graph — identical
semantics, identical scalability class as the reference."""

from __future__ import annotations

import numpy as np

from raphtory_ray.algorithms.louvain import latest_weight_edges


class Matching:
    """Result surface mirroring the reference Matching (len/contains/
    src/dst/edges — max_weight_matching.rs Matching impl)."""

    def __init__(self, pairs: set[tuple[int, int]], directed_edges: set):
        # store matched pairs oriented as the ORIGINAL graph's edges when
        # that orientation exists (reference matching.edges())
        self._pairs = set()
        for a, b in pairs:
            if (a, b) in directed_edges:
                self._pairs.add((a, b))
            elif (b, a) in directed_edges:
                self._pairs.add((b, a))
            else:
                self._pairs.add((min(a, b), max(a, b)))

    def __len__(self) -> int:
        return len(self._pairs)

    def contains(self, src: int, dst: int) -> bool:
        return (src, dst) in self._pairs or (dst, src) in self._pairs

    def src(self, dst: int):
        for a, b in self._pairs:
            if b == dst:
                return a
        return None

    def dst(self, src: int):
        for a, b in self._pairs:
            if a == src:
                return b
        return None

    def edges(self) -> list[tuple[int, int]]:
        return sorted(self._pairs)


def max_weight_matching(gf, weight_col: str | None = None,
                        max_cardinality: bool = True) -> Matching:
    """Matching maximizing total edge weight (optionally among maximum-
    cardinality matchings). Undirected over the simple-edge graph; per
    undirected pair the weight is the max over its directed edges' latest
    weights (the reference keeps one undirected edge per pair)."""
    import networkx as nx
    s, d, w = latest_weight_edges(gf, weight_col)
    m = s != d
    s, d, w = s[m], d[m], w[m]
    g = nx.Graph()
    for a, b, ww in zip(s.tolist(), d.tolist(), w.tolist()):
        lo, hi = (a, b) if a < b else (b, a)
        if g.has_edge(lo, hi):
            g[lo][hi]["weight"] = max(g[lo][hi]["weight"], ww)
        else:
            g.add_edge(lo, hi, weight=ww)
    pairs = nx.max_weight_matching(g, maxcardinality=max_cardinality,
                                   weight="weight")
    return Matching({(int(a), int(b)) for a, b in pairs},
                    {(int(a), int(b)) for a, b in zip(s, d)})
