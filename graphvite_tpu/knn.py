"""KNN graph construction for LargeVis visualization.

TPU-native replacement for the reference's FAISS-based KNNGraph
(include/instance/visualization.cuh:59-412): exact K-nearest-neighbor search
is a tiled ``|x|^2 + |y|^2 - 2 x.y^T`` matmul + top-k on the MXU instead of
`faiss::GpuIndexFlatL2`. Per-dim normalization (visualization.cuh:179-193),
perplexity-calibrated Gaussian weights via vectorized binary search on beta
(:196-237) and reciprocal-edge weight averaging (:240-253) preserve the
reference's statistics exactly.
"""
from __future__ import annotations

import numpy as np

from graphvite_tpu.utils.common import EPSILON, auto, logger


def exact_knn(vectors: np.ndarray, k: int, row_chunk: int = 4096,
              exact: bool = False):
    """Top-(k+1) nearest neighbors by squared L2, including self.

    Returns (distances, labels) of shape [n, k+1], ascending distance —
    the same contract as faiss' L2 search (visualization.cuh:89-93).

    By default uses the TPU-optimized `approx_max_k` (recall target 0.99 —
    a sort-based exact top-k is ~10x slower on TPU and LargeVis weights are
    insensitive to swapping the farthest neighbors); pass exact=True for
    the full sort.
    """
    import jax
    import jax.numpy as jnp

    n, d = vectors.shape
    kk = min(k + 1, n)
    # pad rows to a whole number of fixed-size chunks (one compiled program)
    npad = (-n) % row_chunk
    xs = np.concatenate([vectors, vectors[:1].repeat(npad, 0)]) \
        if npad else vectors
    x = jnp.asarray(xs, jnp.float32)
    sq = jnp.sum(x * x, axis=1)
    # padded duplicate rows must never win a neighbor slot
    col_sq = jnp.where(jnp.arange(n + npad) >= n, jnp.inf, sq)

    @jax.jit
    def chunk_knn(lo):
        rows = jax.lax.dynamic_slice_in_dim(x, lo, row_chunk, 0)
        rsq = jax.lax.dynamic_slice_in_dim(sq, lo, row_chunk, 0)
        dots = jnp.dot(rows, x.T, preferred_element_type=jnp.float32)
        d2 = rsq[:, None] + col_sq[None, :] - 2.0 * dots
        if exact:
            neg_dist, idx = jax.lax.top_k(-d2, kk)
        else:
            neg_dist, idx = jax.lax.approx_max_k(-d2, kk,
                                                 recall_target=0.99)
        return -neg_dist, idx

    dist = np.empty((n + npad, kk), dtype=np.float32)
    labels = np.empty((n + npad, kk), dtype=np.int64)
    for i in range(0, n + npad, row_chunk):
        dd, ii = chunk_knn(i)
        dist[i:i + row_chunk] = np.asarray(dd)
        labels[i:i + row_chunk] = np.asarray(ii)
    return dist[:n], labels[:n]


def perplexity_weights_device(distances, perplexity: float,
                              num_iteration: int = 100, tol: float = 1e-5):
    """Device version of the per-row beta bisection (one jitted fori_loop
    over [n, k] arrays); returns normalized weights [n, k] float32."""
    import jax
    import jax.numpy as jnp

    target = float(np.log(perplexity))

    @jax.jit
    def solve(d):
        n = d.shape[0]
        init = (jnp.ones((n,)), jnp.full((n,), -1.0), jnp.full((n,), -1.0))

        def body(_, state):
            beta, low, high = state
            w = jnp.exp(-beta[:, None] * d)
            norm = w.sum(axis=1)
            entropy = (beta * (d * w).sum(axis=1)) / norm + jnp.log(norm)
            done = jnp.abs(entropy - target) < tol
            too_high = (entropy > target) & ~done
            too_low = (entropy < target) & ~done  # noqa: F841 (symmetry)
            new_low = jnp.where(too_high, beta, low)
            new_high = jnp.where(~too_high & ~done, beta, high)
            # entropy decreases in beta: overshoot -> bisect toward high,
            # undershoot -> bisect toward low (visualization.cuh:218-231)
            beta_up = jnp.where(high < 0, beta * 2, (beta + high) / 2)
            beta_dn = jnp.where(low < 0, beta / 2, (low + beta) / 2)
            new_beta = jnp.where(done, beta,
                                 jnp.where(too_high, beta_up, beta_dn))
            return new_beta, new_low, new_high

        beta, _, _ = jax.lax.fori_loop(0, num_iteration, body, init)
        w = jnp.exp(-beta[:, None] * d)
        return w / w.sum(axis=1, keepdims=True)

    return solve(jnp.asarray(distances, jnp.float32))


def perplexity_weights(distances: np.ndarray, perplexity: float,
                       num_iteration: int = 100, tol: float = 1e-5):
    """Per-row Gaussian kernel calibration: find beta_i such that the entropy
    of w_ij = exp(-beta_i * d_ij) matches log(perplexity); 100-iteration
    bisection, vectorized over rows (visualization.cuh:196-237)."""
    d = np.asarray(distances, dtype=np.float64)
    n = d.shape[0]
    beta = np.ones(n)
    low = np.full(n, -1.0)
    high = np.full(n, -1.0)
    target = np.log(perplexity)
    done = np.zeros(n, dtype=bool)
    norm = np.ones(n)
    for _ in range(num_iteration):
        w = np.exp(-beta[:, None] * d)
        norm = w.sum(axis=1)
        entropy = (beta[:, None] * d * w).sum(axis=1) / norm + np.log(norm)
        newly = np.abs(entropy - target) < tol
        done |= newly
        if done.all():
            break
        too_high = (entropy > target) & ~done
        too_low = ~too_high & ~done
        low[too_high] = beta[too_high]
        beta[too_high] = np.where(high[too_high] < 0, beta[too_high] * 2,
                                  (beta[too_high] + high[too_high]) / 2)
        # bisect toward `low` (the reference midpoints (low + beta) / 2,
        # visualization.cuh:228-230; using the just-assigned high would
        # leave beta unchanged)
        high[too_low] = beta[too_low]
        beta[too_low] = np.where(low[too_low] < 0, beta[too_low] / 2,
                                 (low[too_low] + beta[too_low]) / 2)
    w = np.exp(-beta[:, None] * d)
    return (w / norm[:, None]).astype(np.float32)


class KNNGraph:
    """KNN graph container consumed by VisualizationSolver.

    Produces the same flat directed-edge arrays as Graph; vertex_weights are
    all 1 (uniform negative sampling base, visualization.cuh:235)."""

    def __init__(self, device_ids=None, num_thread_per_worker=auto):
        self.clear()

    def clear(self):
        self.num_vertex = 0
        self.num_edge = 0
        self.dim = 0
        self.num_neighbor = 200
        self.perplexity = 50.0
        self.vector_normalization = True
        self.id2name = []
        self.name2id = {}
        self.edge_heads = np.zeros(0, dtype=np.int64)
        self.edge_tails = np.zeros(0, dtype=np.int64)
        self.edge_weights = np.zeros(0, dtype=np.float32)
        self.vertex_weights = np.zeros(0, dtype=np.float64)

    def load_numpy(self, vectors, num_neighbor=200, perplexity=50,
                   vector_normalization=True):
        vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        if vectors.ndim != 2:
            vectors = vectors.reshape(len(vectors), -1)
        self.clear()
        self.num_vertex, self.dim = vectors.shape
        self.num_neighbor = min(int(num_neighbor), self.num_vertex - 1)
        self.perplexity = float(perplexity)
        self.vector_normalization = bool(vector_normalization)
        self.id2name = [str(i) for i in range(self.num_vertex)]
        self.name2id = {n: i for i, n in enumerate(self.id2name)}
        self._build(vectors)
        return self

    load_vectors = load_numpy

    def load_file(self, file_name, num_neighbor=200, perplexity=50,
                  vector_normalization=True, delimiters=None, comment="#"):
        from graphvite_tpu.graph import _make_tokenizer
        tokenize = _make_tokenizer(delimiters)
        rows = []
        with open(file_name) as f:
            for line in f:
                ci = line.find(comment)
                if ci >= 0:
                    line = line[:ci]
                parts = tokenize(line)
                if parts:
                    rows.append([float(p) for p in parts])
        return self.load_numpy(np.asarray(rows, dtype=np.float32),
                               num_neighbor, perplexity, vector_normalization)

    def _build(self, vectors):
        k = self.num_neighbor
        if self.vector_normalization:
            # per-dim: subtract mean, divide by max |.| (visualization.cuh:179-193)
            vectors = vectors - vectors.mean(axis=0, keepdims=True)
            vectors = vectors / (np.abs(vectors).max(axis=0, keepdims=True) + EPSILON)
        logger.info("building %d-NN graph over %d x %d vectors",
                    k, self.num_vertex, self.dim)
        dist, labels = exact_knn(vectors, k)
        # drop self (first column)
        dist = dist[:, 1:k + 1]
        labels = labels[:, 1:k + 1]
        weights = np.asarray(
            perplexity_weights_device(dist, self.perplexity))
        # reciprocal-edge averaging (visualization.cuh:240-253)
        n = self.num_vertex
        heads = np.repeat(np.arange(n, dtype=np.int64), k)
        tails = labels.reshape(-1).astype(np.int64)
        w = weights.reshape(-1).astype(np.float64)
        key = heads * n + tails
        rkey = tails * n + heads
        order = np.argsort(key)
        skey = key[order]
        pos = np.searchsorted(skey, rkey)
        pos = np.minimum(pos, skey.size - 1)
        has_recip = skey[pos] == rkey
        recip_w = np.where(has_recip, w[order][pos], 0.0)
        w = np.where(has_recip, (w + recip_w) / 2.0, w)
        self.edge_heads = heads
        self.edge_tails = tails
        self.edge_weights = w.astype(np.float32)
        self.num_edge = heads.size
        self.vertex_weights = np.ones(n, dtype=np.float64)

    def info(self):
        return ("#vertex: %d, #nearest neighbor: %d\nperplexity: %g, "
                "vector normalization: %s"
                % (self.num_vertex, self.num_neighbor, self.perplexity,
                   "yes" if self.vector_normalization else "no"))

    def __repr__(self):
        return "KNNGraph<%d vertices, %d-NN>" % (self.num_vertex, self.num_neighbor)
