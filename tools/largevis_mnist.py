"""MNIST-scale LargeVis end-to-end measurement (VERDICT round-1 item 8).

The environment has no egress, so real MNIST cannot be downloaded; this uses
a statistics-matched synthetic clone: 70,000 points x 784 dims, 10 Gaussian
class clusters living in a low-dimensional subspace plus pixel-scale noise —
the same shape/scale the reference benchmarks (README.md:78: 13.9 s train on
4xV100, config/visualization/largevis_mnist_2d.yaml hyperparameters).

Runs the exact shipped-config pipeline: KNN graph build (num_neighbor 200,
perplexity 20) then LargeVis train (dim 2, Adam 0.5/wd 1e-5, 5 negatives,
negative_weight 3, 50 epochs), timing each phase separately (the reference's
13.9 s figure is training only; its KNN build is a separate FAISS phase).

Also reports a cluster-quality probe: 10-NN label agreement of the 2-D
layout (synthetic labels are known), so speed numbers can't silently come
from a degenerate layout.

Usage: python tools/largevis_mnist.py [num_epoch]
Prints one JSON line for RESULTS.md.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 70_000
DIMS = 784
CLASSES = 10


def generate(seed=0):
    rng = np.random.default_rng(seed)
    # class means in a 40-dim latent subspace, projected up to 784
    latent = 40
    means = rng.normal(size=(CLASSES, latent)) * 4.0
    proj = rng.normal(size=(latent, DIMS)) / np.sqrt(latent)
    labels = rng.integers(0, CLASSES, N)
    z = means[labels] + rng.normal(size=(N, latent))
    x = z @ proj + rng.normal(size=(N, DIMS)) * 0.3
    return x.astype(np.float32), labels


def main():
    num_epoch = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    x, labels = generate()

    from graphvite_tpu.knn import KNNGraph
    from graphvite_tpu.solver import VisualizationSolver

    t0 = time.time()
    g = KNNGraph()
    g.load_numpy(x, num_neighbor=200, perplexity=20)
    knn_s = time.time() - t0

    solver = VisualizationSolver(dim=2)
    solver.build(g, optimizer={"type": "Adam", "lr": 0.5,
                               "weight_decay": 1e-5},
                 num_negative=5, batch_size=100000, episode_size=200)
    t1 = time.time()
    solver.train(model="LargeVis", num_epoch=num_epoch, negative_weight=3,
                 log_frequency=10**9)
    train_s = time.time() - t1

    # quality probe: 10-NN label agreement in the 2-D layout on a subsample
    coord = np.asarray(solver.coordinates)
    sub = np.random.default_rng(1).choice(N, 4000, replace=False)
    c = coord[sub]
    d2 = ((c[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    nn = np.argsort(d2, axis=1)[:, :10]
    agree = float((labels[sub][nn] == labels[sub][:, None]).mean())

    samples = solver.num_batch * solver.effective_batch
    print(json.dumps({
        "config": "visualization/largevis_mnist_2d.yaml (synthetic clone)",
        "knn_build_s": round(knn_s, 1),
        "train_s": round(train_s, 1),
        "samples_per_s": round(samples / train_s, 1),
        "num_epoch": num_epoch,
        "knn_10nn_label_agreement": round(agree, 4),
        "reference": {"train_s": 13.9, "hardware": "4xV100"},
    }), flush=True)


if __name__ == "__main__":
    main()
