"""Generic user superstep API — the ATask / Job / TaskRunner equivalent.

Reference surface: db/task/task.rs (ATask, Step::Continue/Done),
task_runner.rs (TaskRunner::run(init_tasks, tasks, ...)) — there a user
writes a per-node closure over EvalNodeView with accumulators. Here the
user writes VECTORIZED closures over edge blocks (this engine's native
granularity; per-row Python closures cannot scale):

    state, iters = run_supersteps(
        g, state0,
        message=lambda src_state, src, dst: src_state + 1,
        combine="min",
        apply=lambda old, msg, got: np.minimum(old, np.where(got, msg, old)),
        iter_count=30,
        check=lambda old, new: np.array_equal(old, new))

Execution per superstep: the current O(V) state is broadcast once
(ray.put); each dst-owned edge block computes messages vectorized and
reduces them per destination LOCALLY (sort + reduceat); because blocks
partition by hash(dst), the per-block sparse results are disjoint and the
driver's scatter is O(V) total per superstep — the same task-engine
contract as the built-in WCC/LPA/k-core (shards.py) that the actor-sharded
path specializes."""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import ray

_IDENT = {"sum": 0.0, "min": np.inf, "max": -np.inf}


@ray.remote
def _user_step(block: pa.Table, state, message: Callable, combine: str):
    s = block["src"].to_numpy(zero_copy_only=False)
    d = block["dst"].to_numpy(zero_copy_only=False)
    if len(s) == 0:
        return (np.empty(0, np.int64), np.empty(0, np.float64))
    msg = np.asarray(message(state[s], s, d), dtype=np.float64)
    order = np.argsort(d, kind="stable")
    ds, ms = d[order], msg[order]
    seg = np.r_[0, np.flatnonzero(ds[1:] != ds[:-1]) + 1]
    ids = ds[seg]
    if combine == "sum":
        vals = np.add.reduceat(ms, seg)
    elif combine == "min":
        vals = np.minimum.reduceat(ms, seg)
    elif combine == "max":
        vals = np.maximum.reduceat(ms, seg)
    else:
        raise ValueError(f"unknown combine {combine!r}")
    return ids, vals


def run_supersteps(g, state0: np.ndarray, message: Callable,
                   combine: str = "sum",
                   apply: Callable | None = None,
                   iter_count: int = 20,
                   check: Callable | None = None):
    """Run user supersteps over a BspGraph.

    - ``message(src_state, src, dst) -> np.ndarray``: vectorized message
      per edge (the eval-node step body).
    - ``combine``: per-destination reduction ('sum' | 'min' | 'max') — the
      accumulator (state/agg.rs SumDef/MinDef/MaxDef vocabulary).
    - ``apply(old_state, combined, got_msg_mask) -> new_state``: state
      update after the exchange; default keeps the combined value where a
      message arrived and the old state elsewhere.
    - ``check(old, new) -> bool``: convergence test (Step::Done);
      iteration also stops at ``iter_count`` (TaskRunner num_iterations).

    Returns (state, iterations_run)."""
    state = np.asarray(state0, dtype=np.float64).copy()
    n = g.n
    ident = _IDENT[combine]
    it = 0
    for it in range(1, iter_count + 1):
        st_ref = ray.put(state)
        parts = ray.get([_user_step.remote(r, st_ref, message, combine)
                         for r in g.refs])
        agg = np.full(n, ident, dtype=np.float64)
        got = np.zeros(n, dtype=bool)
        for ids, vals in parts:
            agg[ids] = vals          # dst-ownership ⇒ disjoint scatter
            got[ids] = True
        if apply is None:
            new_state = np.where(got, agg, state)
        else:
            new_state = np.asarray(apply(state, agg, got), dtype=np.float64)
        done = check is not None and check(state, new_state)
        state = new_state
        if done:
            break
    return state, it
