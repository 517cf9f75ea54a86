"""Pallas-sweep fate A/B (VERDICT r4 weak #3 / item 7): the one regime
where the sweep kernels could still win end to end is V >= 4M, where
XLA's scatter-add degrades ~4x (77.9 vs 19.7 ns/row, PERF.md
access-pattern floors). Run the banded DeepWalk protocol step at V=4M
with the default XLA scatters vs GRAPHVITE_SWEEP_BANDED=1 (the unsorted
Pallas sweep on both table updates) and record which wins — the result
decides whether ops/pallas_scatter.py stays product-default anywhere or
is demoted to documented opt-in.

Usage: python tools/sweep_banded_ab.py [--v 4000000] [--epochs 40]
Prints one JSON line for PERF.md.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_graph(V, seed=0):
    from graphvite_tpu.graph import Graph

    rng = np.random.default_rng(seed)
    E = V * 5
    g = Graph()
    g.num_vertex = V
    g.num_edge = 2 * E
    g.id2name = None
    g.name2id = None
    g.as_undirected = True
    u = (rng.random(E) ** 2.5 * V).astype(np.int64)
    v = (rng.random(E) ** 2.5 * V).astype(np.int64)
    keep = u != v
    u, v = u[keep], v[keep]
    g.num_edge = 2 * u.size
    g.edge_heads = np.concatenate([u, v])
    g.edge_tails = np.concatenate([v, u])
    g.edge_weights = np.ones(g.num_edge, np.float32)
    g._finalize(normalization=False)
    return g


def one_run(g, sweep, epochs):
    from graphvite_tpu.solver import GraphSolver

    os.environ["GRAPHVITE_SWEEP_BANDED"] = "1" if sweep else "0"
    s = GraphSolver(dim=128, float_type="bfloat16", seed=0)
    s.build(g, num_negative=1, batch_size=250_000, episode_size=50)
    s.train(model="DeepWalk", num_epoch=1, augmentation_step=5,
            random_walk_length=40, log_frequency=10**9)  # compile
    t0 = time.time()
    s.train(model="DeepWalk", num_epoch=epochs, augmentation_step=5,
            random_walk_length=40, log_frequency=10**9)
    dt = time.time() - t0
    samples = s.num_batch * s.effective_batch
    assert np.isfinite(np.asarray(s.state["tables"][0],
                                  dtype=np.float32)).all()
    return samples / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--v", type=int, default=4_000_000)
    ap.add_argument("--epochs", type=int, default=40)
    args = ap.parse_args()
    g = build_graph(args.v)
    default_rate = one_run(g, False, args.epochs)
    sweep_rate = one_run(g, True, args.epochs)
    del os.environ["GRAPHVITE_SWEEP_BANDED"]
    print(json.dumps({
        "V": args.v, "epochs": args.epochs,
        "banded_xla_scatter_slots_per_s": round(default_rate, 1),
        "banded_pallas_sweep_slots_per_s": round(sweep_rate, 1),
        "sweep_wins": bool(sweep_rate > default_rate),
    }), flush=True)


if __name__ == "__main__":
    main()
