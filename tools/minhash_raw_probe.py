"""Raw-multiprocessing comparator for the compute-bound scaling workload.

Runs the SAME MinHashStage kernel over the SAME sf0.1 corpus content with
plain ``multiprocessing`` (no Ray): the engine-vs-raw throughput ratio at
matched worker counts is the round-2 verdict's bar (engine >= 0.9x raw at
both levels). Protocol mirrors bench.run_scaling_compute_single: 4x input
replication, batches of 2048 (bench.run_scaling_compute_single batch_size),
warm pass then timed pass within the same
worker pool (startup amortized identically).

Usage: python tools/minhash_raw_probe.py [lo hi]   (default 8 32)
"""
import glob
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_BATCH = 2048
# replication factor of the corpus (weak-scaling harness scales input with
# worker count through this; must match bench.run_scaling_compute_single)
_REPL = int(os.environ.get("RA_DOC_REPL", "4"))


_TBL_CACHE: dict = {}


def _shard(args):
    files, reps = args
    import pyarrow as pa
    import pyarrow.parquet as pq
    from raphtory_ray.data.dedup import MinHashStage
    st = MinHashStage()
    total = 0
    key = tuple(files)
    if key not in _TBL_CACHE:      # decode once per worker process: the
        _TBL_CACHE.clear()         # engine reads pre-decoded object-store
        _TBL_CACHE[key] = [        # blocks, so raw gets the same courtesy
            pq.read_table(f, columns=["content"]) for f in files]
    tbls = _TBL_CACHE[key]
    for _ in range(reps):
        for tbl in tbls:
            n = tbl.num_rows
            for lo in range(0, n, _BATCH):
                sl = tbl.slice(lo, min(_BATCH, n - lo))
                batch = pa.table({
                    "doc_id": pa.array(range(sl.num_rows), pa.int64()),
                    "text": sl["content"]})
                total += st(batch).num_rows
    return total


def run(nproc: int) -> dict:
    if (os.environ.get("RA_AFFINITY") == "1"
            and hasattr(os, "sched_setaffinity")):
        # match bench.py's affinity-pinned protocol: the N-worker level
        # runs on exactly N cores (pool children inherit the mask)
        os.sched_setaffinity(0, set(range(nproc)))
    import ray  # only to reuse the cached corpus generator
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    from raphtory_ray.sources.corpus import ensure_corpus
    corpus = ensure_corpus(sf=0.1)
    ray.shutdown()
    files = sorted(glob.glob(os.path.join(corpus, "*.parquet")))
    shards = [files[i::nproc] for i in range(nproc)]
    with mp.get_context("spawn").Pool(nproc) as pool:
        pool.map(_shard, [(s, 1) for s in shards])          # warm pass
        t0 = time.perf_counter()
        counts = pool.map(_shard, [(s, _REPL) for s in shards])
        wall = time.perf_counter() - t0
    docs = sum(counts)
    return {"nproc": nproc, "docs": docs, "wall_sec": wall,
            "docs_per_sec": docs / wall}


if __name__ == "__main__":
    levels = [int(x) for x in sys.argv[1:]] or [8, 32]
    out = {}
    for nc in levels:
        out[str(nc)] = run(nc)
        print(json.dumps(out[str(nc)]))
    if len(levels) == 2:
        lo, hi = levels
        eff = out[str(hi)]["docs_per_sec"] / (
            out[str(lo)]["docs_per_sec"] * hi / lo)
        print(json.dumps({"raw_scaling_efficiency": eff}))
