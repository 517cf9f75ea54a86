"""FB15k-statistics clone + the RotatE protocol runner (VERDICT r4 item 2).

The environment has no egress, so the real FB15k
(/root/reference/python/graphvite/dataset.py:612-629; 14,951 entities,
1,345 relations, 483,142/50,000/59,071 train/valid/test triplets) cannot
be downloaded. This scales the reference's own synthetic-math generator
(dataset.py:562-610: deterministic `t = f_r(h)` modular arithmetic) to
FB15k's exact statistics, so filtered MRR is a REAL signal — every (h, r)
has exactly one correct tail the model can learn, and the relation family
(translations + their inverses + multiplicative maps mod a prime) mirrors
FB15k's inverse-pair-heavy relation structure (the property behind its
high published MRR, benchmark.rst:126-139):

* entities 0..14950 (N = 14951, prime — multiplicative maps are bijections)
* 1,345 relations: "+c"/"-c" for c in 1..500 (inverse pairs) and "*a" for
  345 odd multipliers
* triplets sampled with Zipf-skewed entity/relation propensities (FB15k's
  degree and relation-frequency profiles are heavy-tailed), deduplicated,
  split 483,142 / 50,000 / 59,071.

`run` executes the rotate_fb15k.yaml protocol end to end through the real
application pipeline (dim 2048, K=64, Adam 2e-4, margin 24, adversarial
temperature 2) and times train + BOTH eval tasks on the trained
embeddings — the timed-eval numbers RESULTS.md records against the
reference's 28.1 min train / 55.8 s eval on 4xV100 (README.md:66).

`ab` trains pooled vs classic (GRAPHVITE_KG_NEG_SHARING=0) at equal
reduced epochs and compares MRR — the protocol-shape quality parity check
that the round-4 M=64-at-dim-128 fixture ablation could not give.

Usage:
  python tools/fb15k_clone.py generate [--seed 0]
  python tools/fb15k_clone.py run [--epochs 1000] [--dim 2048]
  python tools/fb15k_clone.py ab [--epochs 50] [--dim 2048]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ENT = 14951            # prime (checked in generate)
N_TRAIN, N_VALID, N_TEST = 483_142, 50_000, 59_071
DATA_DIR = os.path.expanduser(
    os.environ.get("GRAPHVITE_CLONE_DIR", "~/.graphvite_tpu/fb15k_clone"))


def _relations():
    """1,345 deterministic maps mod N_ENT: +c/-c inverse pairs + odd
    multipliers (bijective since N_ENT is prime)."""
    rels = []
    for c in range(1, 501):
        rels.append(("+%d" % c, c, 0))       # t = h + c
    for c in range(1, 501):
        rels.append(("-%d" % c, -c, 0))      # t = h - c
    a = 3
    while len(rels) < 1345:
        rels.append(("*%d" % a, 0, a))       # t = h * a
        a += 2
    return rels


def generate(seed=0):
    for p in range(2, 123):
        assert N_ENT % p != 0, "N_ENT must be prime"
    rng = np.random.default_rng(seed)
    rels = _relations()
    adds = np.array([a for _, a, _ in rels], np.int64)
    muls = np.array([m for _, _, m in rels], np.int64)

    # Zipf-skewed propensities over shuffled ranks (FB15k's entity degrees
    # and relation frequencies are both heavy-tailed)
    ent_rank = rng.permutation(N_ENT)
    ent_p = (ent_rank + 10.0) ** -0.8
    ent_p /= ent_p.sum()
    rel_rank = rng.permutation(len(rels))
    rel_p = (rel_rank + 3.0) ** -0.9
    rel_p /= rel_p.sum()

    need = N_TRAIN + N_VALID + N_TEST
    draw = int(need * 2.2)
    h = rng.choice(N_ENT, draw, p=ent_p)
    r = rng.choice(len(rels), draw, p=rel_p)
    pair = h * np.int64(len(rels)) + r
    _, first = np.unique(pair, return_index=True)
    first = rng.permutation(first)
    assert first.size >= need, first.size
    h, r = h[first[:need]], r[first[:need]]
    t = np.where(muls[r] > 0, (h * muls[r]) % N_ENT,
                 (h + adds[r]) % N_ENT)

    os.makedirs(DATA_DIR, exist_ok=True)
    names = [n for n, _, _ in rels]
    splits = {"train": slice(0, N_TRAIN),
              "valid": slice(N_TRAIN, N_TRAIN + N_VALID),
              "test": slice(N_TRAIN + N_VALID, need)}
    for split, sl in splits.items():
        path = os.path.join(DATA_DIR, "%s.txt" % split)
        with open(path, "w") as f:
            f.write("".join("%d\t%s\t%d\n" % (hh, names[rr], tt)
                            for hh, rr, tt in zip(h[sl], r[sl], t[sl])))
        print("wrote %s (%d triplets)" % (path, sl.stop - sl.start))


def _paths():
    return {s: os.path.join(DATA_DIR, "%s.txt" % s)
            for s in ("train", "valid", "test")}


def run(epochs=1000, dim=2048, eval_fast=None, num_negative=64,
        float_type="float32", episode_size=50, seed=1024, tag="protocol",
        do_entity=True):
    from graphvite_tpu.application import Application

    p = _paths()
    if not os.path.exists(p["train"]):
        generate()
    app = Application("knowledge graph", dim=dim, float_type=float_type)
    app.load(file_name=p["train"])
    app.build(optimizer={"type": "Adam", "lr": 2.0e-4, "weight_decay": 0},
              num_negative=num_negative, batch_size=100_000,
              episode_size=episode_size)
    # warm the executable so the timed run is pure training (the remote
    # compile service costs minutes on a cold cache)
    app.solver.seed = seed
    app.train(model="RotatE", num_epoch=1, margin=24,
              adversarial_temperature=2, log_frequency=10**9)
    t0 = time.time()
    app.train(model="RotatE", num_epoch=epochs, margin=24,
              adversarial_temperature=2, log_frequency=2000)
    train_s = time.time() - t0
    samples = app.solver.num_batch * app.solver.effective_batch

    t1 = time.time()
    lp = app.evaluate("link prediction", file_name=p["test"],
                      filter_files=[p["train"], p["valid"], p["test"]],
                      fast_mode=eval_fast)
    link_s = time.time() - t1
    out = {"tag": tag, "epochs": epochs, "dim": dim, "K": num_negative,
           "float_type": float_type,
           "train_s": round(train_s, 1),
           "triplets_per_s": round(samples / train_s, 1),
           "link_prediction_s": round(link_s, 1),
           "eval_triplets": eval_fast or N_TEST,
           **{k: round(float(v), 4) for k, v in lp.items()}}
    if do_entity:
        # entity_prediction has no fast_mode; time it on a 10k-query slice
        H, R, T = app._read_triplet_file(p["test"])
        nq = 10_000
        t2 = time.time()
        ep = app.evaluate("entity prediction", H=H[:nq], R=R[:nq],
                          T=T[:nq], k=10)
        out["entity_prediction_s"] = round(time.time() - t2, 1)
        out["entity_prediction_queries"] = nq
        del ep
    print(json.dumps(out), flush=True)
    return out


def ab(epochs=50, dim=2048):
    """Pooled vs classic quality at the protocol dim/K, equal samples."""
    results = {}
    for mode, env in (("pooled", "1"), ("classic", "0")):
        os.environ["GRAPHVITE_KG_NEG_SHARING"] = env
        try:
            r = run(epochs=epochs, dim=dim, eval_fast=3000, tag=mode,
                    do_entity=False)
        finally:
            del os.environ["GRAPHVITE_KG_NEG_SHARING"]
        results[mode] = r
    print(json.dumps({"ab": {m: {"MRR": r["MRR"], "HITS@10": r["HITS@10"],
                                 "train_s": r["train_s"]}
                             for m, r in results.items()}}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["generate", "run", "ab"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--dim", type=int, default=2048)
    ap.add_argument("--eval-fast", type=int, default=None)
    args = ap.parse_args()
    if args.cmd == "generate":
        generate(args.seed)
    elif args.cmd == "run":
        run(epochs=args.epochs, dim=args.dim, eval_fast=args.eval_fast)
    else:
        ab(epochs=args.epochs, dim=args.dim)


if __name__ == "__main__":
    main()
