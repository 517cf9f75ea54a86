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


def _kmeans_device(x_dev, sq_dev, nlist: int, sample: int, iters: int,
                   seed: int):
    """Mini-batch-free Lloyd k-means on a device-resident sample: assign by
    argmin squared-L2 (one matmul), update by segment-sum. Returns
    centroids [nlist, D] f32. Empty clusters keep their previous centroid."""
    import jax
    import jax.numpy as jnp

    n = x_dev.shape[0]
    rng = np.random.default_rng(seed)
    sample = min(sample, n)
    # keep index arrays HOST-side: a closure-captured device array is
    # embedded as a compile-time constant via a D2H copy, and this
    # environment's tunnel can fail that copy with ResourceExhausted
    # while large uploads are in flight
    sidx = np.sort(rng.choice(n, sample, replace=False)).astype(np.int32)
    xs = x_dev[jnp.asarray(sidx)].astype(jnp.float32)     # [S, D]
    cidx = rng.choice(sample, nlist, replace=False).astype(np.int32)

    @jax.jit
    def run(xs):
        cent = xs[jnp.asarray(cidx)]

        def body(_, cent):
            d2 = (jnp.sum(cent * cent, axis=1)[None, :]
                  - 2.0 * jnp.dot(xs, cent.T,
                                  preferred_element_type=jnp.float32))
            a = jnp.argmin(d2, axis=1)                    # [S]
            ssum = jax.ops.segment_sum(xs, a, num_segments=nlist)
            cnt = jax.ops.segment_sum(jnp.ones((xs.shape[0],)), a,
                                      num_segments=nlist)
            new = ssum / jnp.maximum(cnt, 1.0)[:, None]
            return jnp.where((cnt > 0)[:, None], new, cent)

        return jax.lax.fori_loop(0, iters, body, cent)

    return run(xs)


def ivf_knn(vectors: np.ndarray, k: int, nlist: int = 0, nprobe: int = 16,
            sample: int = 131072, kmeans_iters: int = 10, seed: int = 0,
            row_chunk: int = 8192, dtype="bfloat16"):
    """Approximate KNN by inverted-file cluster probing — the TPU-native
    replacement for FAISS at million-row scale, where brute force
    (exact_knn) is O(n^2 d) MXU-hours (ImageNet 1.33M x 2048 would be
    ~7e18 FLOPs; visualization.cuh:60-95 brute-forces on 4 GPUs because
    V100-class FAISS had no better exact option).

    Everything is matmuls: k-means centroids on a sample, one chunked
    assignment matmul over all rows, per-CLUSTER probing (each cluster's
    members share one candidate set = the members of its `nprobe` nearest
    clusters), one [m_c, D] x [D, ccap] matmul + approx top-k per cluster.
    Shared candidate sets keep the compute dense — a per-query candidate
    gather would kill the MXU layout.

    Returns (dist [n, k], labels [n, k]) EXCLUDING self (masked by id).
    Recall is a statistical property (use knn_recall to measure); LargeVis
    weights are insensitive to swapping far neighbors — the original
    LargeVis itself uses approximate RP-tree neighbors (arXiv:1602.00370).
    """
    import jax
    import jax.numpy as jnp

    n, d = vectors.shape
    if nlist <= 0:
        nlist = max(int(np.sqrt(n) * 2), 64)
    nprobe = min(nprobe, nlist)
    if dtype == "bfloat16":
        # cast on HOST before upload: a device-side cast holds the f32 AND
        # bf16 copies simultaneously (10.9 + 5.5 GB at ImageNet scale =
        # HBM OOM), and bf16 halves the upload too
        import ml_dtypes
        vectors = np.asarray(vectors).astype(ml_dtypes.bfloat16)
    x_dev = jnp.asarray(vectors)
    # fused under jit: the eager form materializes a FULL f32 copy of the
    # bf16 table (10.9 GB at ImageNet scale) before reducing
    sq_dev = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32) ** 2,
                                       axis=1))(x_dev)
    row_chunk = min(row_chunk, n)
    logger.info("IVF KNN: %d rows, %d clusters, %d probes", n, nlist, nprobe)
    cent = _kmeans_device(x_dev, sq_dev, nlist, sample, kmeans_iters, seed)
    cent_t = cent.astype(x_dev.dtype)

    # full assignment (chunked argmin matmul). Big device arrays are
    # explicit jit ARGUMENTS throughout this function: closure-captured
    # arrays can be materialized host-side as compile constants (a
    # multi-GB D2H this environment's tunnel fails with
    # ResourceExhausted).
    @jax.jit
    def assign_chunk(xd, ct, csq, lo):
        rows = jax.lax.dynamic_slice_in_dim(xd, lo, row_chunk, 0)
        d2 = (csq[None, :]
              - 2.0 * jnp.dot(rows, ct.T,
                              preferred_element_type=jnp.float32))
        return jnp.argmin(d2, axis=1)

    cent_sq = jnp.sum(cent * cent, axis=1)
    assign = np.empty(n, np.int32)
    for lo in range(0, n, row_chunk):
        hi = min(lo + row_chunk, n)
        a = np.asarray(assign_chunk(x_dev, cent_t, cent_sq,
                                    min(lo, n - row_chunk)))
        assign[lo:hi] = a[lo - min(lo, n - row_chunk):][:hi - lo]

    # per-cluster probe lists (own cluster first)
    cc = np.asarray(jax.jit(lambda c, csq: (
        csq[None, :]
        - 2.0 * jnp.dot(c, c.T,
                        preferred_element_type=jnp.float32)))(cent, cent_sq))
    probe = np.argsort(cc, axis=1)[:, :nprobe].astype(np.int32)  # [nlist, np]

    # member lists, padded/truncated to mcap (truncation only affects the
    # CANDIDATE role; every row is processed as a query below)
    counts = np.bincount(assign, minlength=nlist)
    mcap = max(int(np.quantile(counts, 0.98)), 8)
    members = np.full((nlist, mcap), n, np.int32)       # pad id = n
    order = np.argsort(assign, kind="stable")
    offs = np.concatenate([[0], np.cumsum(counts)])
    for c in range(nlist):
        m = order[offs[c]:offs[c + 1]][:mcap]
        members[c, :m.size] = m
    trunc = int(np.maximum(counts - mcap, 0).sum())
    if trunc:
        logger.info("IVF: %d rows truncated from candidate lists (%.2f%%)",
                    trunc, 100.0 * trunc / n)

    members_dev = jnp.asarray(members)
    ccap = nprobe * mcap
    kk = min(k, n - 1)
    # pad row: x_dev[n] would be OOB; gather pads with clamp — mask by id
    qshapes = (128, 512, 2048)

    def make_query_fn(Q):
        @jax.jit
        def query(xd, sq, q_ids, cand_ids):
            qrows = xd[q_ids]                               # [Q, D] (clamped)
            crows = xd[jnp.minimum(cand_ids, n - 1)]        # [ccap, D]
            d2 = (sq[q_ids][:, None]
                  + jnp.where(cand_ids >= n, jnp.inf,
                              sq[jnp.minimum(cand_ids, n - 1)])[None, :]
                  - 2.0 * jnp.dot(qrows, crows.T,
                                  preferred_element_type=jnp.float32))
            d2 = jnp.where(cand_ids[None, :] == q_ids[:, None], jnp.inf, d2)
            neg, idx = jax.lax.approx_max_k(-d2, kk, recall_target=0.95)
            return -neg, cand_ids[idx]

        return query

    qfns = {Q: make_query_fn(Q) for Q in qshapes}
    dist = np.empty((n, kk), np.float32)
    labels = np.empty((n, kk), np.int64)
    for c in range(nlist):
        rows_c = order[offs[c]:offs[c + 1]]
        if rows_c.size == 0:
            continue
        cand = members[probe[c]].reshape(-1)                # [ccap]
        cand_dev = jnp.asarray(cand)
        pos = 0
        while pos < rows_c.size:
            take = rows_c.size - pos
            Q = next((s for s in qshapes if take <= s), qshapes[-1])
            chunk = rows_c[pos:pos + Q]
            pad = Q - chunk.size
            q_ids = np.concatenate([chunk, np.zeros(pad, np.int64)]) \
                if pad else chunk
            dd, ll = qfns[Q](x_dev, sq_dev, jnp.asarray(q_ids, jnp.int32),
                             cand_dev)
            dd = np.asarray(dd)[:chunk.size]
            ll = np.asarray(ll)[:chunk.size]
            dist[chunk] = dd
            labels[chunk] = ll
            pos += chunk.size
    # unfilled slots (clusters smaller than probes provide) carry inf —
    # clamp to the largest finite distance so downstream weights vanish
    bad = ~np.isfinite(dist)
    if bad.any():
        dist[bad] = np.nanmax(np.where(np.isfinite(dist), dist, np.nan))
        labels[bad] = np.where(bad, labels[:, :1].repeat(kk, 1), labels)[bad]
    return dist, labels


def knn_recall(vectors: np.ndarray, labels: np.ndarray, nq: int = 1000,
               seed: int = 0):
    """recall@k of `labels` vs exact brute force on nq random queries."""
    import jax
    import jax.numpy as jnp

    n, d = vectors.shape
    k = labels.shape[1]
    rng = np.random.default_rng(seed)
    q = rng.choice(n, min(nq, n), replace=False)
    import ml_dtypes
    x = jnp.asarray(np.asarray(vectors).astype(ml_dtypes.bfloat16))
    sq = jax.jit(lambda xx: jnp.sum(xx.astype(jnp.float32) ** 2,
                                    axis=1))(x)

    @jax.jit
    def exact(xd, sqd, q_ids):
        rows = xd[q_ids]
        d2 = (sqd[None, :] - 2.0 * jnp.dot(rows, xd.T,
                                           preferred_element_type=jnp.float32))
        d2 = d2.at[jnp.arange(q_ids.shape[0]), q_ids].set(jnp.inf)
        _, idx = jax.lax.top_k(-d2, k)
        return idx

    hits = 0
    for lo in range(0, q.size, 256):
        chunk = q[lo:lo + 256]
        ex = np.asarray(exact(x, sq, jnp.asarray(
            np.pad(chunk, (0, 256 - chunk.size)), jnp.int32)))[:chunk.size]
        for i, qq in enumerate(chunk):
            hits += len(set(ex[i]) & set(labels[qq]))
    return hits / (q.size * k)


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

    # past this row count, brute force is O(n^2 d) MXU-hours and the
    # IVF cluster-probe search takes over (method="auto")
    IVF_THRESHOLD = 200_000

    def load_numpy(self, vectors, num_neighbor=200, perplexity=50,
                   vector_normalization=True, method="auto", nprobe=16):
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
        if method == "auto":
            method = ("ivf" if self.num_vertex > self.IVF_THRESHOLD
                      else "exact")
        self._build(vectors, method=method, nprobe=nprobe)
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

    def _build(self, vectors, method="exact", nprobe=16):
        k = self.num_neighbor
        if self.vector_normalization:
            # per-dim: subtract mean, divide by max |.| (visualization.cuh:179-193)
            vectors = vectors - vectors.mean(axis=0, keepdims=True)
            vectors = vectors / (np.abs(vectors).max(axis=0, keepdims=True) + EPSILON)
        logger.info("building %d-NN graph over %d x %d vectors (%s)",
                    k, self.num_vertex, self.dim, method)
        if method == "ivf":
            dist, labels = ivf_knn(vectors, k, nprobe=nprobe)
        else:
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
