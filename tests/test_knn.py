"""KNN graph construction tests (the FAISS replacement, ref
visualization.cuh:59-412)."""
import numpy as np
import pytest

from graphvite_tpu import knn as K


def test_exact_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    v = rng.standard_normal((300, 12)).astype(np.float32)
    dist, labels = K.exact_knn(v, 8, row_chunk=128)
    d2 = ((v[:, None, :] - v[None, :, :]) ** 2).sum(-1)
    for i in range(0, 300, 37):
        ref = set(np.argsort(d2[i])[:9])
        got = set(labels[i])
        assert len(ref & got) >= 8  # allow one approx_max_k swap
    # first neighbor is self at distance ~0
    assert (labels[:, 0] == np.arange(300)).all()
    np.testing.assert_allclose(dist[:, 0], 0.0, atol=1e-3)
    # distances ascending
    assert (np.diff(dist, axis=1) >= -1e-4).all()


def test_perplexity_entropy_hits_target():
    rng = np.random.default_rng(1)
    d = rng.random((128, 40)).astype(np.float32) * 3
    for fn in (K.perplexity_weights, K.perplexity_weights_device):
        w = np.asarray(fn(d, 15.0))
        np.testing.assert_allclose(w.sum(1), 1.0, rtol=1e-4)
        ent = -(w * np.log(w + 1e-12)).sum(1)
        np.testing.assert_allclose(ent, np.log(15.0), atol=1e-3)


def test_knn_graph_reciprocal_weights():
    rng = np.random.default_rng(2)
    v = rng.standard_normal((60, 5)).astype(np.float32)
    g = K.KNNGraph().load_numpy(v, num_neighbor=6, perplexity=3)
    assert g.num_vertex == 60
    assert g.num_edge == 60 * 6
    # no self edges
    assert (g.edge_heads != g.edge_tails).all()
    # reciprocal pairs carry identical weight (averaged)
    wmap = {(int(h), int(t)): float(w) for h, t, w in
            zip(g.edge_heads, g.edge_tails, g.edge_weights)}
    recip = [(k, wmap[(k[1], k[0])]) for k in wmap if (k[1], k[0]) in wmap]
    assert recip, "expected some reciprocal edges"
    for (h, t), w_rev in recip:
        assert abs(wmap[(h, t)] - w_rev) < 1e-6


def test_ivf_knn_recall_on_clusters():
    """IVF cluster-probe KNN must reach high recall on clusterable data
    (the regime it exists for — LargeVis feature inputs)."""
    rng = np.random.default_rng(3)
    centers = rng.standard_normal((20, 16)).astype(np.float32) * 5
    labels = rng.integers(0, 20, 2000)
    v = centers[labels] + rng.standard_normal((2000, 16)).astype(np.float32)
    dist, nbrs = K.ivf_knn(v, k=10, nlist=32, nprobe=8, sample=1024,
                           seed=0)
    assert nbrs.shape == (2000, 10)
    assert (nbrs != np.arange(2000)[:, None]).all(), "self must be excluded"
    rec = K.knn_recall(v, nbrs, nq=200)
    assert rec > 0.85, rec
    # distances ascend (approx top-k keeps near-sorted order; check first)
    assert (dist[:, 0] <= dist[:, 1] + 1e-4).all()
