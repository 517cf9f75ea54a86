"""Math-fixture quality gate via the API with a cheap numpy filtered
tail ranking (RotatE only; the streaming jitted eval is the product
path — this exists for fast ablations). RESULTS.md pooled-KG ablation
rows come from here.
Usage: python tools/math_quality.py [pool_size] [neg_share]
"""
import os, sys, time
sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))
pool = int(sys.argv[1]) if len(sys.argv) > 1 else 0
share = sys.argv[2] if len(sys.argv) > 2 else "1"
if pool:
    os.environ["GRAPHVITE_KG_POOL_SIZE"] = str(pool)
os.environ["GRAPHVITE_KG_NEG_SHARING"] = share

import numpy as np
from graphvite_tpu.dataset import math as math_ds
from graphvite_tpu.graph import KnowledgeGraph
from graphvite_tpu.solver import KnowledgeGraphSolver

g = KnowledgeGraph()
g.load_file(math_ds.train)
solver = KnowledgeGraphSolver(dim=128, seed=0)
solver.build(g, optimizer={"type": "Adam", "lr": 5.0e-3, "weight_decay": 0},
             num_negative=8, batch_size=100000, episode_size=100)
t0 = time.time()
solver.train(model="RotatE", num_epoch=500, margin=9,
             adversarial_temperature=2, log_frequency=10**9)
train_s = time.time() - t0

# numpy filtered tail ranking (V ~ 1k: full score matrix is tiny)
ent = np.asarray(solver.state["tables"][0], np.float32)
rel = np.asarray(solver.state["tables"][1], np.float32)
V, D = ent.shape
margin = 9.0

# file format: head relation tail (graph.py KnowledgeGraph.load_file)
def load(path):
    out = []
    with open(path) as f:
        for line in f:
            p = line.split()
            if len(p) >= 3 and p[0] in g.entity2id and p[2] in g.entity2id \
               and p[1] in g.relation2id:
                out.append((g.entity2id[p[0]], g.entity2id[p[2]],
                            g.relation2id[p[1]]))
    return np.asarray(out, np.int64)

test = load(math_ds.test)
known = set()
for path in (math_ds.train, math_ds.valid, math_ds.test):
    for h, t, r in load(path):
        known.add((h, r, t))

h_re, h_im = ent[:, 0::2], ent[:, 1::2]
ranks = []
for h, t, r in test[:2000]:
    phase = rel[r, : D // 2]
    r_re, r_im = np.cos(phase), np.sin(phase)
    q_re = h_re[h] * r_re - h_im[h] * r_im
    q_im = h_re[h] * r_im + h_im[h] * r_re
    d_re = q_re[None, :] - h_re
    d_im = q_im[None, :] - h_im
    scores = margin - np.sqrt(d_re * d_re + d_im * d_im).sum(-1)
    truth = scores[t]
    mask = np.ones(V, bool)
    for tt in range(V):
        if tt != t and (h, r, tt) in known:
            mask[tt] = False
    rank = 1 + int((scores[mask] > truth).sum())
    ranks.append(rank)
ranks = np.asarray(ranks, np.float64)
import json
print(json.dumps({"pool_size": pool, "share": share,
                  "train_s": round(train_s, 1),
                  "MRR": round(float((1.0 / ranks).mean()), 4),
                  "HITS@10": round(float((ranks <= 10).mean()), 4),
                  "n_test": len(ranks)}))
