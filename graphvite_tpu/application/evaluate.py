"""Evaluation tasks, re-implemented in JAX (the reference delegates these to
PyTorch: python/graphvite/application/application.py:456-533 node
classification, :353-453 link-pred AUC, :787-946 filtered ranking;
network.py:27-42 linear probe)."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from graphvite_tpu.models import KG_MODELS
from graphvite_tpu.utils.common import logger


# ---------------------------------------------------------------------------
# node classification: one-vs-rest linear probe
# ---------------------------------------------------------------------------

def linear_classification(embeddings, labels, portion, normalization=False,
                          times=1, patience=100, seed=0):
    """Frozen-embedding linear probe with the reference's protocol
    (application.py:458-533): per positive label the sample is duplicated
    with a one-hot target; full-batch SGD(lr=1, momentum=0.9, wd=2e-5) with
    loss-patience early stop; prediction thresholds at each node's true label
    count (top-|labels| trick).

    labels: dense (num_sample, num_class) 0/1 matrix.
    Returns dict with macro/micro F1 at this portion.
    """
    rng = np.random.default_rng(seed)
    embeddings = np.asarray(embeddings, dtype=np.float32)
    if normalization:
        embeddings = embeddings / np.linalg.norm(embeddings, axis=1, keepdims=True)
    num_sample, num_class = labels.shape
    num_train = int(num_sample * portion)
    dim = embeddings.shape[1]

    @jax.jit
    def train_probe(x, y, w, b, mw, mb):
        def loss_fn(w, b):
            logits = x @ w + b
            return jnp.mean(
                jnp.maximum(logits, 0) - logits * y
                + jnp.log1p(jnp.exp(-jnp.abs(logits))))
        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(w, b)
        gw = grads[0] + 2e-5 * w
        gb = grads[1] + 2e-5 * b
        mw = 0.9 * mw + gw
        mb = 0.9 * mb + gb
        return loss, w - 1.0 * mw, b - 1.0 * mb, mw, mb

    macro, micro = [], []
    for _ in range(max(times, 1)):
        perm = rng.permutation(num_sample)
        train_idx = perm[:num_train]
        test_idx = perm[num_train:]
        # one-vs-rest duplication: one training row per positive label
        rows, cls = np.nonzero(labels[train_idx])
        x = jnp.asarray(embeddings[train_idx][rows])
        y = jnp.zeros((rows.size, num_class), jnp.float32).at[
            jnp.arange(rows.size), jnp.asarray(cls)].set(1.0)

        w = jnp.zeros((dim, num_class), jnp.float32)
        b = jnp.zeros((num_class,), jnp.float32)
        mw = jnp.zeros_like(w)
        mb = jnp.zeros_like(b)
        best_loss, best_epoch = np.inf, -1
        for epoch in range(100000):
            loss, w, b, mw, mb = train_probe(x, y, w, b, mw, mb)
            loss = float(loss)
            if loss < best_loss:
                best_loss, best_epoch = loss, epoch
            if epoch == best_epoch + patience:
                break

        logits = np.asarray(jnp.asarray(embeddings[test_idx]) @ w + b)
        test_labels = labels[test_idx]
        num_labels = test_labels.sum(axis=1, keepdims=True).astype(int)
        srt = np.sort(logits, axis=1)[:, ::-1]
        thresholds = np.take_along_axis(srt, np.maximum(num_labels - 1, 0), axis=1)
        predictions = (logits >= thresholds).astype(np.int32)
        tp_c = (predictions & test_labels).sum(axis=0).astype(float)
        t_c = test_labels.sum(axis=0).astype(float)
        p_c = predictions.sum(axis=0).astype(float)
        macro.append(np.mean(2 * tp_c / np.maximum(t_c + p_c, 1e-12)))
        micro.append(2 * tp_c.sum() / max(t_c.sum() + p_c.sum(), 1e-12))
    return {
        "macro-F1@%g%%" % (portion * 100): float(np.mean(macro)),
        "micro-F1@%g%%" % (portion * 100): float(np.mean(micro)),
    }


# ---------------------------------------------------------------------------
# link prediction AUC (rank-sum estimator, application.py:438-450)
# ---------------------------------------------------------------------------

def rank_sum_auc(scores, labels):
    order = np.argsort(-np.asarray(scores), kind="stable")
    y = np.asarray(labels)[order]
    hit = np.cumsum(y)
    denom = float((y == 0).sum()) * float((y == 1).sum())
    return float(hit[y == 0].sum() / denom)


# ---------------------------------------------------------------------------
# KG filtered ranking (application.py:829-856, 979-996)
# ---------------------------------------------------------------------------

# models whose score is LINEAR in the candidate side: one-vs-all scoring
# becomes q @ entity^T on the MXU (q = d(score)/d(candidate) at gradient 1,
# reusing the hand-derived backward)
BILINEAR_MODELS = {"DistMult", "ComplEx", "SimplE", "QuatE"}


def kg_score_all(model_name, entity, relation, h, r, t, target,
                 margin_or_l3, chunk=None):
    """Score each triplet against ALL candidate entities in `target` role.
    Returns a (len(h), num_entity) numpy array.

    Multiplicative models ride the MXU: score(h, t, r) is linear in the
    candidate row, so scores-vs-all = query @ entity^T where the query is
    the score gradient wrt the candidate. Distance models (TransE, RotatE)
    use a chunked broadcast (VPU-bound, like the reference's predict pools).
    """
    model = KG_MODELS[model_name]
    ent = jnp.asarray(entity)
    rel = jnp.asarray(relation)
    num_entity, dim = entity.shape

    if model_name in BILINEAR_MODELS:
        ones = lambda b: jnp.ones((b,), ent.dtype)

        @jax.jit
        def score_mxu(hh, rr, tt):
            hrow = ent[hh]
            trow = ent[tt]
            rrow = rel[rr]
            gh, gt, _ = model.backward(hrow, trow, rrow,
                                       ones(hh.shape[0]), 0.0)
            q = gh if target == "head" else gt
            return jnp.dot(q, ent.T, preferred_element_type=jnp.float32)

        fn = score_mxu
        if chunk is None:
            chunk = max(int(512e6 / (num_entity * 4)), 16)
    else:
        @jax.jit
        def score_heads(hh, rr, tt):
            return model.score(ent[None, :, :], ent[tt][:, None, :],
                               rel[rr][:, None, :], margin_or_l3)

        @jax.jit
        def score_tails(hh, rr, tt):
            return model.score(ent[hh][:, None, :], ent[None, :, :],
                               rel[rr][:, None, :], margin_or_l3)

        fn = score_heads if target == "head" else score_tails
        if chunk is None:
            # ~256 MiB of [B, V, D] f32 intermediates per chunk
            chunk = max(int(256e6 / (num_entity * dim * 4)), 1)
    out = []
    for i in range(0, len(h), chunk):
        hh = jnp.asarray(h[i:i + chunk], jnp.int32)
        rr = jnp.asarray(r[i:i + chunk], jnp.int32)
        tt = jnp.asarray(t[i:i + chunk], jnp.int32)
        out.append(np.asarray(fn(hh, rr, tt)))
    return np.concatenate(out)


def filtered_rankings(model_name, entity, relation, H, R, T, exclude_H,
                      exclude_T, margin_or_l3, target="both"):
    """Optimistic filtered rank per triplet: rank = #(masked scores >= truth)
    with known true triplets (except the test one) masked out
    (application.py:842-855)."""
    num_entity = entity.shape[0]
    rankings = []
    sides = []
    if target in ("head", "both"):
        sides.append("head")
    if target in ("tail", "both"):
        sides.append("tail")
    for side in sides:
        scores = kg_score_all(model_name, entity, relation, H, R, T, side,
                              margin_or_l3)
        positives = H if side == "head" else T
        exclude = exclude_H if side == "head" else exclude_T
        for i, (hh, rr, tt) in enumerate(zip(H, R, T)):
            key = (tt, rr) if side == "head" else (hh, rr)
            mask = np.ones(num_entity, dtype=bool)
            excl = exclude.get(key)
            if excl:
                mask[list(excl)] = False
            mask[positives[i]] = True
            truth = scores[i, positives[i]]
            rankings.append(int(((scores[i] >= truth) & mask).sum()))
    return np.asarray(rankings, dtype=np.float64)


def ranking_metrics(rankings):
    r = np.asarray(rankings, dtype=np.float64)
    return {
        "MR": float(np.mean(r)),
        "MRR": float(np.mean(1.0 / r)),
        "HITS@1": float(np.mean(r <= 1)),
        "HITS@3": float(np.mean(r <= 3)),
        "HITS@10": float(np.mean(r <= 10)),
    }
