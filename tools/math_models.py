"""Per-model math-fixture quality (classic path, dim 128, 500 epochs).
Usage: python tools/math_models.py <Model> [margin_or_lr adjustments applied
per model like the reference's defaults]."""
import os, sys, time, json
sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))
os.environ["GRAPHVITE_KG_NEG_SHARING"] = "0"

import numpy as np
from graphvite_tpu.dataset import math as math_ds
from graphvite_tpu.graph import KnowledgeGraph
from graphvite_tpu.solver import KnowledgeGraphSolver

model = sys.argv[1]
g = KnowledgeGraph()
g.load_file(math_ds.train)
solver = KnowledgeGraphSolver(dim=128, seed=0)
solver.build(g, optimizer={"type": "Adam", "lr": 5.0e-3, "weight_decay": 0},
             num_negative=8, batch_size=100000, episode_size=100)
t0 = time.time()
kw = dict(model=model, num_epoch=500, adversarial_temperature=2,
          log_frequency=10**9)
if model in ("TransE", "RotatE"):
    kw["margin"] = 9
solver.train(**kw)
train_s = time.time() - t0


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


test = load(math_ds.test)[:1000]
known = set()
for path in (math_ds.train, math_ds.valid, math_ds.test):
    for h, t, r in load(path):
        known.add((h, r, t))

V = g.num_vertex
ranks = []
cands = np.arange(V, dtype=np.int64)
for h, t, r in test:
    batch = np.stack([np.full(V, h), cands, np.full(V, r)], axis=1)
    scores = solver.predict(batch)
    truth = scores[t]
    mask = np.ones(V, bool)
    for tt in range(V):
        if tt != t and (h, r, tt) in known:
            mask[tt] = False
    ranks.append(1 + int((scores[mask] > truth).sum()))
ranks = np.asarray(ranks, np.float64)
print(json.dumps({"model": model, "train_s": round(train_s, 1),
                  "MRR": round(float((1.0 / ranks).mean()), 4),
                  "HITS@10": round(float((ranks <= 10).mean()), 4)}))
