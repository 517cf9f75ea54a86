"""Headline benchmark: LINE node-embedding training throughput on one chip.

Mirrors the reference's north-star workload (Youtube LINE: dim 128,
1 negative, 2000 epochs over 4.9M edges in 70.2s on 4xV100 ~= 3.5e7
edge-samples/s per GPU; BASELINE.md "Derived throughput target").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the ratio of this chip's edge-samples/s to the reference's
per-GPU rate.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_PER_GPU = 3.5e7  # edge-samples/s per V100 (BASELINE.md)


def synthetic_graph(num_vertex=1_000_000, num_edge=5_000_000, seed=0):
    """Power-law-ish random graph at Youtube scale (|V|=1.1M, |E|=4.9M)."""
    rng = np.random.default_rng(seed)
    # Zipf-like head/tail draw: squash uniform^alpha to concentrate mass
    u = (rng.random(num_edge) ** 2.5 * num_vertex).astype(np.int64)
    v = (rng.random(num_edge) ** 2.5 * num_vertex).astype(np.int64)
    keep = u != v
    u, v = u[keep], v[keep]
    from graphvite_tpu.graph import Graph
    g = Graph()
    g.num_vertex = num_vertex
    g.num_edge = u.size
    g.id2name = None  # anonymous; samplers only touch the arrays below
    g.name2id = None
    g.as_undirected = True
    heads = np.concatenate([u, v])
    tails = np.concatenate([v, u])
    g.edge_heads = heads
    g.edge_tails = tails
    g.edge_weights = np.ones(heads.size, dtype=np.float32)
    g._finalize(normalization=False)
    return g


def main():
    t0 = time.time()
    from graphvite_tpu.solver import GraphSolver

    dim = int(os.environ.get("BENCH_DIM", "128"))
    num_negative = int(os.environ.get("BENCH_NEG", "1"))
    batch_size = int(os.environ.get("BENCH_BATCH", "200000"))
    num_epoch = int(os.environ.get("BENCH_EPOCH", "40"))

    g = synthetic_graph()
    solver = GraphSolver(dim=dim)
    solver.build(g, num_negative=num_negative, batch_size=batch_size,
                 episode_size=50)

    # warmup run (compile + pipeline fill); 3 epochs -> num_batch >= the
    # episode length so the timed run reuses the same compiled episode
    solver.train(model="LINE", num_epoch=3, augmentation_step=1,
                 log_frequency=10**9)
    # timed run
    start = time.time()
    solver.train(model="LINE", num_epoch=num_epoch, augmentation_step=1,
                 log_frequency=10**9)
    elapsed = time.time() - start
    # count the batch size the solver ACTUALLY ran (it may shrink the
    # requested batch to fit step intermediates / the staleness cap)
    samples = solver.num_batch * solver.effective_batch
    rate = samples / elapsed

    print(json.dumps({
        "metric": "line_edge_samples_per_s",
        "value": round(rate, 1),
        "unit": "samples/s",
        "vs_baseline": round(rate / BASELINE_PER_GPU, 4),
    }))
    sys.stderr.write("total wall %.1fs (train %.1fs, %d samples)\n"
                     % (time.time() - t0, elapsed, samples))


if __name__ == "__main__":
    main()
