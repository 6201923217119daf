"""Force-directed layouts (algorithms/layout/fruchterman_reingold.rs:18-128,
cohesive_fruchterman_reingold.rs:25-56).

Vectorized numpy: the reference iterates all node pairs per step (O(V²)
repulsion, layout/fruchterman_reingold.rs:75-97); here the pairwise force
matrix is one broadcast — same complexity class, C speed. Layouts are a
visualization aid (driver-scale by nature in the reference too)."""

from __future__ import annotations

import numpy as np


def _und_pairs(gf):
    """Distinct undirected neighbour pairs (u < v) from the edge Dataset."""
    import pyarrow as pa
    parts = []
    for b in gf.edges.select_columns(["src", "dst"]).iter_batches(
            batch_format="pyarrow"):
        if b.num_rows:
            s = b["src"].to_numpy(zero_copy_only=False)
            d = b["dst"].to_numpy(zero_copy_only=False)
            lo = np.minimum(s, d)
            hi = np.maximum(s, d)
            m = lo != hi
            parts.append(np.unique(lo[m] * np.int64(gf.n) + hi[m]))
    if not parts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    key = np.unique(np.concatenate(parts))
    return key // gf.n, key % gf.n


def fruchterman_reingold_unbounded(gf, iter_count: int = 100,
                                   scale: float = 1.0,
                                   node_start_size: float = 1.0,
                                   cooloff_factor: float = 0.95,
                                   dt: float = 0.1,
                                   seed: int = 0) -> np.ndarray:
    """(n, 2) coordinates. Forces per fruchterman_reingold.rs:
    repulsion −scale²/dist toward every other node, attraction dist²/scale
    along every undirected neighbour pair, velocity damped by
    cooloff_factor (reference seeds positions with quad_rand; here a
    seeded numpy RNG — layouts are stable per seed, not cross-engine)."""
    n = gf.n
    rng = np.random.default_rng(seed)
    half = node_start_size / 2.0
    pos = rng.uniform(-half, half, size=(n, 2))
    vel = np.zeros((n, 2))
    u, v = _und_pairs(gf)
    for _ in range(int(iter_count)):
        diff = pos[None, :, :] - pos[:, None, :]          # (n, n, 2) a→b
        dist = np.sqrt((diff ** 2).sum(-1))
        np.fill_diagonal(dist, np.inf)
        unit = diff / dist[:, :, None]
        # repulsion: −(scale²/dist)·unit summed over all others
        force = (-(scale * scale) / dist)[:, :, None] * unit
        force = force.sum(axis=1)
        # attraction along undirected neighbour pairs (both directions)
        if len(u):
            d2 = ((pos[v] - pos[u]) ** 2).sum(-1)
            dd = np.sqrt(d2)
            dd[dd == 0] = np.inf
            f = (d2 / scale)[:, None] * (pos[v] - pos[u]) / dd[:, None]
            np.add.at(force, u, f)
            np.add.at(force, v, -f)
        vel = (vel + force * dt) * cooloff_factor
        pos = pos + vel * dt
    return pos


def cohesive_fruchterman_reingold(gf, iter_count: int = 100,
                                  scale: float = 1.0,
                                  node_start_size: float = 1.0,
                                  cooloff_factor: float = 0.95,
                                  dt: float = 0.1,
                                  seed: int = 0) -> np.ndarray:
    """cohesive_fruchterman_reingold.rs:25-56. NOTE the reference builds a
    virtual graph with bridge edges between components and then lays out
    the ORIGINAL graph (the virtual graph is unused in the final call) —
    mirrored faithfully, so this equals the unbounded layout."""
    return fruchterman_reingold_unbounded(gf, iter_count, scale,
                                          node_start_size, cooloff_factor,
                                          dt, seed)
