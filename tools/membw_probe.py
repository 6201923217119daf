"""Hardware ceiling probe: parallel random-gather bandwidth, no Ray.
Each worker does the PageRank-superstep inner op (w = rank[idx]) on its own
arrays sized like one partition of the scaling workload."""
import multiprocessing as mp, numpy as np, time, sys

EDGES_PER_WORKER = 6_250_000   # 2e8 edges / 32 partitions
N_VERT = 10_000_000

def worker(q, reps):
    rng = np.random.default_rng(mp.current_process().pid)
    idx = rng.integers(0, N_VERT, EDGES_PER_WORKER).astype(np.int32)
    rank = rng.standard_normal(N_VERT).astype(np.float32)
    out = np.empty(EDGES_PER_WORKER, np.float32)
    # warmup
    np.take(rank, idx, out=out)
    t0 = time.perf_counter()
    for _ in range(reps):
        np.take(rank, idx, out=out)
    q.put((time.perf_counter() - t0) / reps)

def run(nproc, reps=8):
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(q, reps)) for _ in range(nproc)]
    t0 = time.perf_counter()
    for p in ps: p.start()
    times = [q.get() for _ in ps]
    for p in ps: p.join()
    per_gather = max(times)
    total_edges = EDGES_PER_WORKER * nproc
    return total_edges / per_gather

if __name__ == "__main__":
    for nproc in (8, 32):
        best = max(run(nproc) for _ in range(2))
        print(f"nproc={nproc}: {best/1e6:.0f}M gathers/s aggregate")
