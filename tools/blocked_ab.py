"""Flat vs blocked A/B at huge V (VERDICT round-1 item 9).

XLA's scatter lowering scans the whole destination table (77.9 ns/row at
V=4M vs 15.8 at 250k — tools/microbench.py); the blocked episode mode
bounds the scan to one partition's cap x D. This measures both end-to-end
through solver.train on a synthetic power-law graph to pick the auto
default.

Usage: python tools/blocked_ab.py [num_vertex] [mode ...]
  mode in {flat, blocked4, blocked8, blocked16, ...}; default runs all.
Prints one JSON line per mode.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_graph(num_vertex, num_edge, seed=0):
    rng = np.random.default_rng(seed)
    u = (rng.random(num_edge) ** 2.5 * num_vertex).astype(np.int64)
    v = (rng.random(num_edge) ** 2.5 * num_vertex).astype(np.int64)
    keep = u != v
    u, v = u[keep], v[keep]
    from graphvite_tpu.graph import Graph
    g = Graph()
    g.num_vertex = num_vertex
    g.num_edge = 2 * u.size
    g.id2name = None
    g.name2id = None
    g.as_undirected = True
    g.edge_heads = np.concatenate([u, v])
    g.edge_tails = np.concatenate([v, u])
    g.edge_weights = np.ones(g.edge_heads.size, dtype=np.float32)
    g._finalize(normalization=False)
    return g


def run(g, num_partition, num_epoch):
    from graphvite_tpu.solver import GraphSolver
    s = GraphSolver(dim=128, seed=0)
    s.build(g, num_partition=num_partition, num_negative=1,
            batch_size=200000)
    # warmup/compile epoch
    s.train(model="LINE", num_epoch=1, augmentation_step=1,
            log_frequency=10**9)
    s.batch_id = 0
    t0 = time.time()
    s.train(model="LINE", num_epoch=num_epoch, augmentation_step=1,
            resume=True, log_frequency=10**9)
    dt = time.time() - t0
    samples = (s.num_batch - 0) * s.effective_batch
    return samples / dt, s.effective_batch


def main():
    num_vertex = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    modes = sys.argv[2:] or ["flat", "blocked8", "blocked32"]
    g = synthetic_graph(num_vertex, num_vertex * 5)
    num_epoch = max(2, 20_000_000 * 40 // g.num_edge // 10)
    for mode in modes:
        p = 1 if mode == "flat" else int(mode.replace("blocked", ""))
        try:
            rate, eff = run(g, p, num_epoch)
            print(json.dumps({"mode": mode, "num_vertex": num_vertex,
                              "samples_per_s": round(rate),
                              "effective_batch": eff}), flush=True)
        except Exception as e:
            print(json.dumps({"mode": mode,
                              "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
