"""BlogCatalog-statistics synthetic clone + the quick-start protocol.

The environment has no egress, so the real BlogCatalog (10,312 vertices,
333,983 undirected edges, 39 multi-labels; reference README.md:135-158:
link-prediction AUC 0.8999, micro-F1@20% 0.3913) cannot be downloaded.
This generates a planted-community graph with matching statistics —
power-law degrees, 39 overlapping communities, a mixing fraction of
cross-community edges — and runs the full `config/demo/quick_start.yaml`
pipeline (LINE dim 128, SGD 0.025/wd 5e-3, aug 2, negative_weight 5,
2000 epochs; 5%% of edges held out for link prediction with an equal
number of non-edge negatives; one 20%% node-classification split).

Usage: python tools/blogcatalog_clone.py [num_epoch]
Prints one JSON line with both metrics for RESULTS.md.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

V = 10_312
E_TARGET = 333_983
NUM_COMMUNITY = 39
MIXING = 0.25       # fraction of stubs wired to the global background


def generate(seed=0):
    rng = np.random.default_rng(seed)
    # power-law degrees, min 2, exponent ~2.2, scaled to 2*E stubs
    deg = np.maximum((rng.pareto(1.2, V) + 1) * 2, 2)
    deg = np.floor(deg * (2.0 * E_TARGET / deg.sum())).astype(np.int64)
    deg = np.maximum(deg, 2)
    # overlapping communities with power-law sizes (BlogCatalog's labels
    # are group memberships; average memberships/vertex ~ 1.4)
    comm_w = (np.arange(1, NUM_COMMUNITY + 1) ** -0.7)
    comm_w /= comm_w.sum()
    memberships = [[] for _ in range(V)]
    labels = np.zeros((V, NUM_COMMUNITY), np.int64)
    for v in range(V):
        k = 1 + (rng.random() < 0.4)
        cs = rng.choice(NUM_COMMUNITY, size=k, replace=False, p=comm_w)
        for c in cs:
            memberships[v].append(int(c))
            labels[v, c] = 1
    members = [np.nonzero(labels[:, c])[0] for c in range(NUM_COMMUNITY)]
    # stub matching: intra-community stubs pair within the community
    # (degree-weighted), mixing stubs pair globally
    edges = set()

    def add_pairs(pool_v, pool_deg, n_pairs):
        if pool_v.size < 2 or n_pairs <= 0:
            return
        p = pool_deg / pool_deg.sum()
        a = rng.choice(pool_v, size=n_pairs, p=p)
        b = rng.choice(pool_v, size=n_pairs, p=p)
        for u, w in zip(a, b):
            if u != w:
                edges.add((min(u, w), max(u, w)))

    for c in range(NUM_COMMUNITY):
        m = members[c]
        if m.size < 2:
            continue
        intra_stubs = deg[m] * (1 - MIXING) / np.maximum(
            [len(memberships[v]) for v in m], 1)
        n_pairs = int(intra_stubs.sum() / 2)
        add_pairs(m, deg[m].astype(np.float64), n_pairs)
    add_pairs(np.arange(V), deg.astype(np.float64),
              int(deg.sum() * MIXING / 2))
    edges = np.asarray(sorted(edges), dtype=np.int64)
    return edges, labels


def main():
    num_epoch = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    float_type = sys.argv[2] if len(sys.argv) > 2 else "float32"
    model = sys.argv[3] if len(sys.argv) > 3 else "LINE"
    batch_size = int(sys.argv[4]) if len(sys.argv) > 4 else 100000
    t0 = time.time()
    edges, labels = generate()
    rng = np.random.default_rng(1)
    perm = rng.permutation(len(edges))
    n_test = len(edges) // 20
    test_e = edges[perm[:n_test]]
    train_e = edges[perm[n_test:]]

    from graphvite_tpu.graph import Graph
    from graphvite_tpu.solver import GraphSolver
    from graphvite_tpu.application import evaluate as ev

    g = Graph().load_edge_list(
        [(str(u), str(v)) for u, v in train_e], as_undirected=True)
    solver = GraphSolver(dim=128, float_type=float_type)
    solver.build(g, num_negative=1, batch_size=batch_size, episode_size=500)
    kw = dict(p=0.25, q=0.25) if model == "node2vec" else {}
    solver.train(model=model, num_epoch=num_epoch, augmentation_step=2,
                 random_walk_length=40, negative_weight=5.0,
                 log_frequency=10**9, **kw)
    train_s = time.time() - t0
    emb = solver.vertex_embeddings
    if not np.isfinite(emb).all():
        print(json.dumps({"error": "non-finite embeddings (diverged)"}),
              flush=True)
        sys.exit(1)

    # link prediction: held-out edges vs equal # of non-edges (the
    # quick-start split protocol, dataset.py link_prediction_split)
    name2id = g.name2id
    known = {(min(u, v), max(u, v)) for u, v in edges}
    pos = [(name2id[str(u)], name2id[str(v)]) for u, v in test_e
           if str(u) in name2id and str(v) in name2id]
    neg = []
    while len(neg) < len(pos):
        u, v = rng.integers(V), rng.integers(V)
        if u == v or (min(u, v), max(u, v)) in known:
            continue
        if str(u) in name2id and str(v) in name2id:
            neg.append((name2id[str(u)], name2id[str(v)]))
    pairs = np.asarray(pos + neg)
    y = np.array([1] * len(pos) + [0] * len(neg))
    scores = solver.predict(pairs)
    auc = ev.rank_sum_auc(scores, y)

    # node classification @20%
    ids = np.asarray([name2id[str(v)] for v in range(V)
                      if str(v) in name2id])
    orig = np.asarray([v for v in range(V) if str(v) in name2id])
    f1 = ev.linear_classification(solver.vertex_embeddings[ids],
                                  labels[orig], 0.2, seed=0)
    import os
    print(json.dumps({
        "config": "demo/quick_start.yaml (BlogCatalog-statistics clone)", "model": model,
        "float_type": float_type,
        "num_epoch": num_epoch,
        "batch_size": batch_size,
        "trust": os.environ.get("GRAPHVITE_TRUST", "default(0.25)"),
        "neg_sharing": os.environ.get("GRAPHVITE_NEG_SHARING", "default(1)"),
        "auc": round(auc, 4),
        "micro_f1_20": round(f1["micro-F1@20%"], 4),
        "macro_f1_20": round(f1["macro-F1@20%"], 4),
        "train_s": round(train_s, 1),
        "reference": {"auc": 0.8999, "micro_f1_20": 0.3913},
    }), flush=True)


if __name__ == "__main__":
    main()
