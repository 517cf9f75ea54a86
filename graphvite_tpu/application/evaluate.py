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

    def probe_step(x, y, w, b, mw, mb):
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

    # `patience` epochs per device call: one call + one loss readback PER
    # EPOCH costs a host round-trip each (25 ms through this
    # environment's device tunnel -> 100x the step itself); the patience
    # rule is applied to the returned loss history, overshooting the
    # per-epoch stop by at most one chunk of a converged probe
    @jax.jit
    def train_chunk(x, y, w, b, mw, mb):
        def body(carry, _):
            w, b, mw, mb = carry
            loss, w, b, mw, mb = probe_step(x, y, w, b, mw, mb)
            return (w, b, mw, mb), loss
        (w, b, mw, mb), losses = jax.lax.scan(
            body, (w, b, mw, mb), None, length=max(patience, 1))
        return losses, w, b, mw, mb

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
        best_loss, best_epoch, epoch0 = np.inf, -1, 0
        for _ in range(max(100000 // max(patience, 1), 1)):
            losses, w, b, mw, mb = train_chunk(x, y, w, b, mw, mb)
            hist = np.asarray(losses)
            i = int(np.argmin(hist))
            if hist[i] < best_loss:
                best_loss, best_epoch = float(hist[i]), epoch0 + i
            epoch0 += hist.size
            if epoch0 - 1 >= best_epoch + patience:
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


import functools


@functools.lru_cache(maxsize=32)
def _make_topk_fn(model_name, target, b, cand_block, nblk, num_entity,
                  margin_or_l3, k):
    """Jitted streaming top-k scorer: candidate blocks are scanned on-device
    with a running [b, k] top-k merge (lax.top_k over the carried heap +
    the block), so the [b, V] score matrix NEVER materializes — host memory
    stays O(n * k) regardless of V (the scaling fix for entity_prediction
    over the reference's memory-sized predict pools,
    application.py:650-785, :948-961)."""
    model = KG_MODELS[model_name]
    bilinear = model_name in BILINEAR_MODELS

    @jax.jit
    def topk(ent_pad, rel, hh, rr, tt):
        dim = ent_pad.shape[1]
        fixed = ent_pad[tt if target == "head" else hh]      # [b, D]
        rrow = rel[rr]
        if bilinear:
            ones = jnp.ones((b, 1), ent_pad.dtype)
            hrow = ent_pad[hh][:, None, :]
            trow = ent_pad[tt][:, None, :]
            gh, gt, _ = model.backward(hrow, trow, rrow[:, None, :],
                                       ones, 0.0)
            q = (gh if target == "head" else gt)[:, 0, :]    # [b, D]
        ent_blocks = ent_pad.reshape(nblk, cand_block, dim)

        def blk(carry, xs):
            tv, ti = carry
            blk_i, blk_ent = xs
            base = blk_i * cand_block
            gidx = base + jnp.arange(cand_block, dtype=jnp.int32)
            valid = gidx < num_entity
            if bilinear:
                s = jnp.dot(q, blk_ent.T,
                            preferred_element_type=jnp.float32)
            else:
                c = blk_ent[None, :, :]
                f = fixed[:, None, :]
                r_ = rrow[:, None, :]
                s = (model.score(c, f, r_, margin_or_l3)
                     if target == "head"
                     else model.score(f, c, r_, margin_or_l3))
            s = jnp.where(valid[None, :], s, -jnp.inf)
            cat_v = jnp.concatenate([tv, s], axis=1)
            cat_i = jnp.concatenate(
                [ti, jnp.broadcast_to(gidx[None, :], (b, cand_block))],
                axis=1)
            nv, sel = jax.lax.top_k(cat_v, k)
            ni = jnp.take_along_axis(cat_i, sel, axis=1)
            return (nv, ni), None

        init = (jnp.full((b, k), -jnp.inf, jnp.float32),
                jnp.zeros((b, k), jnp.int32))
        (tv, ti), _ = jax.lax.scan(
            blk, init, (jnp.arange(nblk, dtype=jnp.int32), ent_blocks))
        return tv, ti

    return topk


def kg_topk(model_name, entity, relation, H, R, T, target, margin_or_l3,
            k=10):
    """Top-k candidate entities per query, streamed in bounded memory.
    Returns (values [n, k] f32, ids [n, k] i32), best first."""
    num_entity, dim = entity.shape
    bilinear = model_name in BILINEAR_MODELS
    if bilinear:
        cand_block = 8192
        b = 1024
    else:
        cand_block = 2048
        b = max(min(int(512e6 / (cand_block * dim * 4)), 512), 16)
    nblk = -(-num_entity // cand_block)
    ent_pad = jnp.zeros((nblk * cand_block, dim), jnp.float32).at[
        :num_entity].set(jnp.asarray(entity, jnp.float32))
    rel_dev = jnp.asarray(relation, jnp.float32)
    fn = _make_topk_fn(model_name, target, b, cand_block, nblk, num_entity,
                       float(margin_or_l3), int(k))
    H = np.asarray(H, np.int64)
    R = np.asarray(R, np.int64)
    T = np.asarray(T, np.int64)
    n = len(R)
    vals = np.empty((n, k), np.float32)
    ids = np.empty((n, k), np.int32)
    for i in range(0, n, b):
        sl = slice(i, min(i + b, n))
        m = sl.stop - sl.start
        pad = b - m
        hh = np.concatenate([H[sl], np.zeros(pad, np.int64)])
        rr = np.concatenate([R[sl], np.zeros(pad, np.int64)])
        tt = np.concatenate([T[sl], np.zeros(pad, np.int64)])
        tv, ti = fn(ent_pad, rel_dev, jnp.asarray(hh, jnp.int32),
                    jnp.asarray(rr, jnp.int32), jnp.asarray(tt, jnp.int32))
        vals[sl] = np.asarray(tv)[:m]
        ids[sl] = np.asarray(ti)[:m]
    return vals, ids


@functools.lru_cache(maxsize=32)
def _make_rank_fn(model_name, side, b, cand_block, nblk, num_entity,
                  margin_or_l3):
    """Jitted streaming rank kernel: never materializes [b, V] on host.

    rank = #(candidates with score >= truth) - #(excluded with score >=
    truth, excluding the positive itself): candidate blocks are scanned
    on-device accumulating counts; excluded triplets are scored directly
    (a tiny [P] batch), so host memory stays O(b) regardless of V
    (the scaling fix over the reference's memory-sized predict pools,
    application.py:948-961)."""
    model = KG_MODELS[model_name]
    bilinear = model_name in BILINEAR_MODELS

    @jax.jit
    def ranks(ent_pad, rel, fixed_ids, rels, pos, ex_rows, ex_ents,
              ex_valid):
        dim = ent_pad.shape[1]
        fixed = ent_pad[fixed_ids]                       # [b, D]
        rrow = rel[rels]
        posrow = ent_pad[pos]

        def pair_score(cand, fix, rr):
            c = cand[:, None, :]
            f = fix[:, None, :]
            if side == "head":
                return model.score(c, f, rr[:, None, :], margin_or_l3)[:, 0]
            return model.score(f, c, rr[:, None, :], margin_or_l3)[:, 0]

        truth = pair_score(posrow, fixed, rrow)          # [b]

        if bilinear:
            # one-vs-all on the MXU: the score is linear in the candidate
            # row, so q = d(score)/d(candidate) and scores = q @ ent^T
            ones = jnp.ones((b, 1), ent_pad.dtype)
            hrow = posrow if side == "head" else fixed
            trow = fixed if side == "head" else posrow
            gh, gt, _ = model.backward(hrow[:, None, :], trow[:, None, :],
                                       rrow[:, None, :], ones, 0.0)
            q = (gh if side == "head" else gt)[:, 0, :]  # [b, D]
            truth = jnp.einsum("bd,bd->b", q, posrow)

        ent_blocks = ent_pad.reshape(nblk, cand_block, dim)

        def blk(carry, xs):
            blk_i, blk_ent = xs
            base = blk_i * cand_block
            gidx = base + jax.lax.broadcasted_iota(jnp.int32,
                                                   (1, cand_block), 1)
            valid = gidx < num_entity                    # [1, Vc]
            if bilinear:
                s = jnp.dot(q, blk_ent.T,
                            preferred_element_type=jnp.float32)
            else:
                c = blk_ent[None, :, :]
                f = fixed[:, None, :]
                r_ = rrow[:, None, :]
                s = (model.score(c, f, r_, margin_or_l3) if side == "head"
                     else model.score(f, c, r_, margin_or_l3))
            cnt = jnp.sum((s >= truth[:, None]) & valid, axis=1,
                          dtype=jnp.int32)
            return carry + cnt, None

        total_ge, _ = jax.lax.scan(
            blk, jnp.zeros((b,), jnp.int32),
            (jnp.arange(nblk, dtype=jnp.int32), ent_blocks))

        # excluded candidates, scored directly
        cand = ent_pad[jnp.minimum(ex_ents, ent_pad.shape[0] - 1)]
        es = pair_score(cand, fixed[ex_rows], rrow[ex_rows])
        if bilinear:
            es = jnp.einsum("pd,pd->p", q[ex_rows], cand)
        hit = ((es >= truth[ex_rows]) & ex_valid
               & (ex_ents != pos[ex_rows]))
        excl_ge = jax.ops.segment_sum(hit.astype(jnp.int32), ex_rows,
                                      num_segments=b)
        # the positive itself always counts (mask[positives] = True in the
        # dense reference): clip to 1 in case broadcast-vs-block rounding
        # drops the self-comparison
        return jnp.maximum(total_ge - excl_ge, 1)

    return ranks


def filtered_rankings(model_name, entity, relation, H, R, T, exclude_H,
                      exclude_T, margin_or_l3, target="both"):
    """Optimistic filtered rank per triplet: rank = #(masked scores >= truth)
    with known true triplets (except the test one) masked out
    (application.py:842-855). Streaming: candidate blocks are scanned
    on-device and only per-triplet counts return to host, so 5M-entity
    tables evaluate in bounded host memory."""
    num_entity, dim = entity.shape
    bilinear = model_name in BILINEAR_MODELS
    if bilinear:
        cand_block = 8192
        b = 1024
    else:
        cand_block = 2048
        b = max(min(int(512e6 / (cand_block * dim * 4)), 512), 16)
    nblk = -(-num_entity // cand_block)
    ent_pad = jnp.zeros((nblk * cand_block, dim), jnp.float32).at[
        :num_entity].set(jnp.asarray(entity, jnp.float32))
    rel_dev = jnp.asarray(relation, jnp.float32)

    H = np.asarray(H, dtype=np.int64)
    R = np.asarray(R, dtype=np.int64)
    T = np.asarray(T, dtype=np.int64)
    rankings = []
    sides = []
    if target in ("head", "both"):
        sides.append("head")
    if target in ("tail", "both"):
        sides.append("tail")
    for side in sides:
        fn = _make_rank_fn(model_name, side, b, cand_block, nblk, num_entity,
                           float(margin_or_l3))
        positives = H if side == "head" else T
        fixed_all = T if side == "head" else H
        exclude = exclude_H if side == "head" else exclude_T
        n = len(H)
        for i in range(0, n, b):
            sl = slice(i, min(i + b, n))
            m = sl.stop - sl.start
            pad = b - m
            fixed = np.concatenate([fixed_all[sl], np.zeros(pad, np.int64)])
            rels = np.concatenate([R[sl], np.zeros(pad, np.int64)])
            pos = np.concatenate([positives[sl], np.zeros(pad, np.int64)])
            rows, ents = [], []
            for j in range(m):
                key = ((T[sl][j], R[sl][j]) if side == "head"
                       else (H[sl][j], R[sl][j]))
                for e in exclude.get(key, ()):
                    rows.append(j)
                    ents.append(e)
            np_pairs = max(len(rows), 1)
            padded = 1 << (np_pairs - 1).bit_length()     # retrace buckets
            ex_rows = np.zeros(padded, np.int32)
            ex_ents = np.full(padded, num_entity, np.int64)
            ex_valid = np.zeros(padded, bool)
            if rows:
                ex_rows[:len(rows)] = rows
                ex_ents[:len(rows)] = ents
                ex_valid[:len(rows)] = True
            r = np.asarray(fn(ent_pad, rel_dev,
                              jnp.asarray(fixed, jnp.int32),
                              jnp.asarray(rels, jnp.int32),
                              jnp.asarray(pos, jnp.int32),
                              jnp.asarray(ex_rows, jnp.int32),
                              jnp.asarray(ex_ents, jnp.int32),
                              jnp.asarray(ex_valid)))
            rankings.extend(int(x) for x in r[:m])
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
