"""FB15k-scale evaluation wall-clock (VERDICT r3 item 7).

The reference publishes EVALUATION times next to training times (FB15k
RotatE eval 55.8 s on 4xV100, doc/source/benchmark.rst:110; memory-aware
one-vs-all batching, application.py:948-961). This times our streaming
filtered-ranking kernel (application/evaluate.py filtered_rankings) and the
streaming entity-prediction top-k on the exact FB15k protocol shape:

  dim 2048, |E| = 14,951 entities, 59,071 test triplets ranked on BOTH
  sides against all entities, filtered by ~592k known triplets.

Embeddings are random (eval cost is shape-dependent, not value-dependent);
the filter dicts are built from a synthetic train set with FB15k's size.

Usage: python tools/eval_timing.py [n_test] [dim]
Prints one JSON line for RESULTS.md; the comparison bar is one V100's
share of the reference's 4-GPU eval: 55.8 s * 4 = 223 s.
"""
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_ENTITY = 14_951
NUM_RELATION = 1_345
NUM_TRAIN = 483_142
NUM_TEST = 59_071


def main():
    n_test = int(sys.argv[1]) if len(sys.argv) > 1 else NUM_TEST
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

    from graphvite_tpu.application import evaluate as ev

    rng = np.random.default_rng(0)
    entity = rng.normal(size=(NUM_ENTITY, dim)).astype(np.float32) * 0.1
    relation = rng.normal(size=(NUM_RELATION, dim)).astype(np.float32) * 0.1

    def draw(n):
        return (rng.integers(0, NUM_ENTITY, n),
                rng.integers(0, NUM_RELATION, n),
                rng.integers(0, NUM_ENTITY, n))

    trH, trR, trT = draw(NUM_TRAIN)
    H, R, T = draw(n_test)

    # filter sets over train + test (the reference filters all splits)
    exclude_H = defaultdict(set)
    exclude_T = defaultdict(set)
    for h, r, t in zip(trH, trR, trT):
        exclude_H[(t, r)].add(h)
        exclude_T[(h, r)].add(t)
    for h, r, t in zip(H, R, T):
        exclude_H[(t, r)].add(h)
        exclude_T[(h, r)].add(t)

    # warm the jitted kernels on a tiny slice so the timed run is compile-free
    ev.filtered_rankings("RotatE", entity, relation, H[:32], R[:32], T[:32],
                         exclude_H, exclude_T, 24.0, "both")
    t0 = time.time()
    rk = ev.filtered_rankings("RotatE", entity, relation, H, R, T,
                              exclude_H, exclude_T, 24.0, "both")
    rank_s = time.time() - t0

    # entity_prediction: streaming top-10 over all entities
    ep_n = min(n_test, 10_000)
    vals, ids = ev.kg_topk("RotatE", entity, relation, H[:ep_n],
                           R[:ep_n], T[:ep_n], "tail", 24.0, k=10)
    t1 = time.time()
    vals, ids = ev.kg_topk("RotatE", entity, relation, H[:ep_n],
                           R[:ep_n], T[:ep_n], "tail", 24.0, k=10)
    topk_s = time.time() - t1

    ref_share_s = 55.8 * 4
    print(json.dumps({
        "protocol": "FB15k RotatE link-prediction eval (dim %d, %d test "
                    "triplets, both sides, filtered)" % (dim, n_test),
        "rank_eval_s": round(rank_s, 1),
        "triplets_per_s": round(n_test / rank_s, 1),
        "entity_prediction_s_per_10k": round(topk_s * 10_000 / ep_n, 2),
        "n_rankings": int(rk.size),
        "reference": {"eval_s_4xV100": 55.8,
                      "eval_s_one_V100_share": ref_share_s},
        "vs_one_v100_share": round(ref_share_s / rank_s, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
