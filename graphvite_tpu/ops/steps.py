"""Jitted training/prediction steps: the TPU replacement for the reference's
fused CUDA kernels (include/instance/gpu/{graph,knowledge_graph,visualization}.cuh).

Design: instead of hogwild warp-per-sample updates, each step processes a
batch of B positive samples and K on-device-sampled negatives in one traced
program: gather rows -> score 1+K pairs -> logistic (or student-t) loss ->
per-touch regularized gradients -> row-sparse optimizer scatter updates
(duplicates within a batch accumulate; see graphvite_tpu.optim).

Each builder returns a function over a `state` pytree
    state = {"tables": (...), "moments": ((...m1, m2...), ...)}
that is scanned over a pool of batches in a single device call (the episode
machinery of solver.h:588-654 reborn as `lax.scan`).

Loss conventions match gpu/graph.cuh:73-92, gpu/knowledge_graph.cuh:59-124
and gpu/visualization.cuh:96-124.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from graphvite_tpu.optim import Optimizer, apply_row_updates
from graphvite_tpu.ops.alias import device_sample
from graphvite_tpu.utils.common import EPSILON


def _logistic_terms(logits, num_negative, negative_weight, mask=None):
    """Per-subsample gradient (dL/dlogit) / weight / loss for the layout
    [negatives..., positive] along the last axis. `mask` ([B] in {0,1})
    zeroes padded sample slots (device walk samplers emit fixed-shape pools
    with dead-walk padding)."""
    prob = jax.nn.sigmoid(logits)
    k = num_negative
    label = jnp.concatenate(
        [jnp.zeros((k,), logits.dtype), jnp.ones((1,), logits.dtype)])
    label = jnp.broadcast_to(label, logits.shape)
    gradient = prob - label
    weight = jnp.where(label > 0, 1.0, negative_weight).astype(logits.dtype)
    if mask is not None:
        gradient = gradient * mask[:, None]
        weight = weight * mask[:, None]
    # stable logistic loss: -log sigmoid(z) = softplus(-z);
    # -log(1 - sigmoid(z)) = softplus(z). (The naive -log(1-p+eps) form is
    # algebraically simplified by XLA into log(expr-that-can-be-0).)
    loss = jnp.where(label > 0,
                     jax.nn.softplus(-logits),
                     jax.nn.softplus(logits))
    sample_loss = jnp.sum(weight * loss, axis=-1) / (1.0 + k * negative_weight)
    return gradient, weight, sample_loss


def _mask_ids(ids, mask, sentinel):
    """Route masked slots' scatter ids out of range so apply_row_updates
    drops them entirely — a zero-gradient touch would still inflate dedup
    touch counts and decay EMA moments for the padded slot's rows."""
    if mask is None:
        return ids
    dead = mask <= 0
    while dead.ndim < ids.ndim:
        dead = dead[..., None]
    return jnp.where(dead, jnp.asarray(sentinel, ids.dtype), ids)


# ---------------------------------------------------------------------------
# node embedding (vertex/context tables; ref gpu/graph.cuh)
# ---------------------------------------------------------------------------

def make_graph_train_step(model, opt: Optimizer, num_negative: int,
                          negative_weight: float, trust=None):
    """state tables: (vertex, context); batch: (heads[B], tails[B]);
    negative sampler state: (prob[Vc], alias[Vc]) device alias arrays.
    `trust` (solver paths): per-row displacement clip for the SGD rule —
    see optim.apply_row_updates."""

    def step(state, heads, tails, key, lr, *neg_state, mask=None):
        vertex, context = state["tables"]
        v_moms, c_moms = state["moments"]
        b = heads.shape[0]
        k = num_negative
        k1, k2 = jax.random.split(key)
        u1 = jax.random.uniform(k1, (b, k))
        u2 = jax.random.uniform(k2, (b, k))
        negs = device_sample(*neg_state, u1, u2)

        # gathers hit the (possibly bf16) table for HBM-traffic savings;
        # all scoring/gradient compute is f32 (scatter casts back)
        v = vertex[heads].astype(jnp.float32)                # [B, D]
        ctx_ids = jnp.concatenate([negs, tails[:, None]], axis=1)  # [B, K+1]
        c = context[ctx_ids].astype(jnp.float32)             # [B, K+1, D]
        logits = model.score(v[:, None, :], c)               # [B, K+1]
        gradient, weight, sample_loss = _logistic_terms(
            logits, k, negative_weight, mask)

        gv, gc = model.backward(v[:, None, :], c, gradient)  # [B,K+1,D] each
        w = weight[..., None]
        wd = opt.weight_decay
        # vertex row: touched K+1 times per sample; accumulate before scatter
        # (the reference keeps the vertex row in a local warp buffer across
        # subsamples, gpu/graph.cuh:59-93). With moment optimizers, pass the
        # touch count and per-touch squared gradients so the collapsed entry
        # preserves per-touch moment dynamics.
        per_touch_v = w * (gv + wd * v[:, None, :])          # [B, K+1, D]
        reg_v = jnp.sum(per_touch_v, axis=1)
        reg_c = w * gc + wd * w * c
        v_counts = v_sqs = None
        if opt.num_moment > 0:
            v_counts = jnp.full((b,), k + 1, jnp.float32)
            v_sqs = jnp.sum(per_touch_v * per_touch_v, axis=1)
        new_vertex, new_v_moms = apply_row_updates(
            vertex, v_moms, _mask_ids(heads, mask, vertex.shape[0]),
            reg_v, opt, lr, entry_counts=v_counts, entry_sqs=v_sqs,
            trust=trust)
        new_context, new_c_moms = apply_row_updates(
            context, c_moms,
            _mask_ids(ctx_ids, mask, context.shape[0]).reshape(-1),
            reg_c.reshape(b * (k + 1), -1), opt, lr, trust=trust)
        new_state = {"tables": (new_vertex, new_context),
                     "moments": (new_v_moms, new_c_moms)}
        if mask is None:
            mean_loss = jnp.mean(sample_loss)
        else:
            mean_loss = jnp.sum(sample_loss) / jnp.maximum(jnp.sum(mask), 1.0)
        return new_state, mean_loss

    return step


def graph_predict(model, vertex, context, heads, tails):
    return model.score(vertex[heads], context[tails])


def graph_pool_groups(batch_size: int, target_group: int = 2048,
                      lo: int = 8, hi: int = 256):
    """Pool-group count for a batch: bound the per-group sample count so a
    pool row's batch-accumulated update stays a small multiple of lr times
    its own norm (see make_graph_pool_step stability note)."""
    g = lo
    while g < hi and batch_size // g > target_group:
        g *= 2
    while batch_size % g and g > 1:
        g //= 2
    return max(g, 1)


def make_graph_pool_step(opt: Optimizer, num_negative: int,
                         negative_weight: float, pool_size: int = 256,
                         pool_groups: int = 8, trust: float = 0.25,
                         sweep_vertex: bool = False, sweep_tile: int = 1024,
                         sweep_chunk: int = 512, sweep_context: bool = False,
                         sweep_gather: bool = False,
                         sweep_gather_tile: int = 256,
                         sort_heads: bool = False):
    """Shared-negative-pool graph step (negative sharing).

    Instead of K per-sample noise draws (gpu/graph.cuh:48-58 draws per
    sample), each of `pool_groups` sample groups draws ONE pool of
    `pool_size` noise rows and every sample in the group scores against the
    whole pool, weighted `negative_weight * K / pool_size` per pool negative
    so the expected negative gradient mass per sample matches the K-draw
    step. All negative scoring/backward becomes MXU matmuls ([Bg, D] x
    [D, M]), the per-sample alias draws disappear (M draws per group
    instead of B*K), and negative row traffic drops from B*K rows to
    G*M rows per batch — the structural fix for the scatter/gather-bound
    LINE step (PERF.md trace). Grouping bounds the gradient mass any pool
    row accumulates at one stale point to Bg * neg_w * sigma.

    All graph models share score = <v, c> (models/graph.py), so scoring is
    hardcoded as a matmul. Moment optimizers get exact per-touch counts and
    squared-gradient sums (weight decay excluded from the squares;
    second-order-small).
    """
    k = num_negative
    M = int(pool_size)
    G = int(pool_groups)
    neg_w = float(negative_weight) * k / M
    import os as _os
    # experimental: run the three big einsums with bf16 OPERANDS (f32
    # accumulation on the MXU) when the tables are bf16 — the per-term
    # negative gradients round to bf16, which matches the precision of a
    # bf16 table write anyway
    bf16_mm = _os.environ.get("GRAPHVITE_BF16_COMPUTE", "0") == "1"

    def step(state, heads, tails, key, lr, *neg_state, mask=None):
        vertex, context = state["tables"]
        v_moms, c_moms = state["moments"]
        b = heads.shape[0]
        assert b % G == 0, "batch must divide pool_groups"
        bg = b // G
        if sort_heads:
            # walk-mode front-end for the sweep paths: heads arrive
            # unsorted (walk-pair emission order), so sort the BATCH by
            # head id — three [B] i32 permutes, while the sweeps it
            # unlocks replace per-row gather+scatter with table streams.
            # Masked (dead-walk) slots route to row V-1 with zeroed
            # updates below; within-batch update order is accumulation-
            # invariant so the reordering is semantics-free.
            if mask is not None:
                heads = jnp.where(mask > 0, heads,
                                  jnp.asarray(vertex.shape[0] - 1,
                                              heads.dtype))
            order = jnp.argsort(heads)
            heads = heads[order]
            tails = tails[order]
            if mask is not None:
                mask = mask[order]
        k1, k2 = jax.random.split(key)
        u1 = jax.random.uniform(k1, (G, M))
        u2 = jax.random.uniform(k2, (G, M))
        pool_ids = device_sample(*neg_state, u1, u2)         # [G, M]

        # f32 compute over (possibly bf16) gathered rows
        if sweep_gather and b % sweep_chunk == 0:
            # SORTED heads ride the streaming sweep gather (tiles DMA'd
            # sequentially + one-hot matmul row select) instead of XLA's
            # ~11 ns/row per-row gather — solver gates this on the sorted
            # edge stream and an 8-aligned table
            from graphvite_tpu.ops.pallas_scatter import sweep_gather_sorted
            v = sweep_gather_sorted(
                vertex, heads.astype(jnp.int32),
                tile_rows=sweep_gather_tile, chunk=sweep_chunk
            ).reshape(G, bg, -1).astype(jnp.float32)
        else:
            v = vertex[heads].reshape(G, bg, -1).astype(jnp.float32)
        c = context[tails].reshape(G, bg, -1).astype(jnp.float32)
        P = context[pool_ids].astype(jnp.float32)             # [G, M, D]

        mm = (jnp.bfloat16 if bf16_mm and vertex.dtype == jnp.bfloat16
              else jnp.float32)
        pos_logit = jnp.sum(v * c, axis=-1)                  # [G, Bg]
        neg_logits = jnp.einsum("gbd,gmd->gbm", v.astype(mm), P.astype(mm),
                                preferred_element_type=jnp.float32)
        gpos = jax.nn.sigmoid(pos_logit) - 1.0               # [G, Bg]
        gneg = jax.nn.sigmoid(neg_logits) * neg_w            # [G, Bg, M]
        if mask is not None:
            m2 = mask.reshape(G, bg)
            gpos = gpos * m2
            gneg = gneg * m2[..., None]
            n_active = jnp.sum(mask)
        else:
            m2 = None
            n_active = jnp.float32(b)
        # reported loss on the K-draw scale (match _logistic_terms norm)
        loss_terms = (jax.nn.softplus(-pos_logit)
                      + neg_w * jnp.sum(jax.nn.softplus(neg_logits), axis=-1))
        if m2 is not None:
            loss_terms = loss_terms * m2
        mean_loss = (jnp.sum(loss_terms) / jnp.maximum(n_active, 1.0)
                     / (1.0 + k * negative_weight))

        wd = opt.weight_decay
        # gradients (weights folded into gpos/gneg)
        dv = (gpos[..., None] * c
              + jnp.einsum("gbm,gmd->gbd", gneg.astype(mm), P.astype(mm),
                           preferred_element_type=jnp.float32)
              + wd * (1.0 + M * neg_w) * v)
        dc = gpos[..., None] * v + wd * c
        dP = (jnp.einsum("gbm,gbd->gmd", gneg.astype(mm), v.astype(mm),
                         preferred_element_type=jnp.float32)
              + wd * (neg_w * bg) * P)
        if mask is not None and (sweep_vertex or sweep_context):
            # the sweep paths park dead slots at row V-1 instead of
            # dropping them, so their wd residue (the only unmasked term
            # in dv/dc) must be zeroed HERE — before c_sqs/sweep slabs
            # derive from dc — or row V-1's moments absorb phantom touches
            dv = dv * m2[..., None]
            dc = dc * m2[..., None]
        # STABILITY: a pool row accumulates up to Bg * neg_w weight mass at
        # one stale point; when the group's v vectors are mutually aligned
        # (community structure) the sum is coherent and lr * |dP| can exceed
        # |P| itself — divergent oscillation (observed as NaN on a
        # BlogCatalog-scale clone). Trust-ratio clip: the applied update may
        # move a pool row by at most `trust` x (its norm + eps) per
        # batch; inactive for incoherent (large-graph) regimes where
        # |dP| ~ sqrt(Bg). The primary control is graph_pool_groups
        # bounding Bg; this is the safety net.
        if trust is not None:
            dnorm = jnp.linalg.norm(dP.astype(jnp.float32), axis=-1,
                                    keepdims=True)
            limit = (trust * (jnp.linalg.norm(P.astype(jnp.float32),
                                              axis=-1, keepdims=True)
                              + 1e-2)
                     / jnp.maximum(lr, EPSILON))
            dP = dP * jnp.minimum(1.0, limit / jnp.maximum(dnorm, EPSILON))

        v_counts = v_sqs = c_counts = c_sqs = None
        if opt.num_moment > 0:
            # EMULATED K-draw touch counts (see make_vis_pool_step): the
            # moment rules' displacement is lr * count, so the counts must
            # reflect the K-draw scheme being emulated (v: K+1, c: 1, pool
            # row: Bg*K/M expected draws), and summed squared gradients
            # rescale by M/K (per-draw grad = M/K * per-term grad)
            sq_scale = M / max(k, 1)
            v_counts = jnp.full((b,), k + 1, jnp.float32)
            if mask is not None:
                # dead slots register no touches (the sweep path keeps
                # their parked V-1 row's moments undecayed)
                v_counts = v_counts * mask
            v_sqs = ((gpos[..., None] * c) ** 2
                     + sq_scale * jnp.einsum(
                         "gbm,gmd->gbd", gneg ** 2, P ** 2,
                         preferred_element_type=jnp.float32)
                     ).reshape(b, -1)
            p_counts = jnp.full((G, M), bg * k / M, jnp.float32)
            if m2 is not None:
                p_counts = jnp.broadcast_to(
                    jnp.sum(m2, axis=1)[:, None] * (k / M), (G, M))
            tail_cnt = (jnp.ones((b,), jnp.float32) if mask is None
                        else mask.astype(jnp.float32))
            c_counts = jnp.concatenate([tail_cnt, p_counts.reshape(-1)])
            p_sqs = sq_scale * jnp.einsum(
                "gbm,gbd->gmd", gneg ** 2, v ** 2,
                preferred_element_type=jnp.float32)
            c_sqs = jnp.concatenate(
                [(dc ** 2).reshape(b, -1), p_sqs.reshape(G * M, -1)])

        if sweep_vertex and b % sweep_chunk == 0:
            # Pallas tile-sweep scatter (ops/pallas_scatter): heads are
            # sorted here (sorted edge stream, or the sort_heads front-end
            # for walk batches); masked (dead-walk) slots sit at row V-1
            # with dv/dc already zeroed above.
            if opt.num_moment == 0:
                from graphvite_tpu.ops.pallas_scatter import (
                    sweep_scatter_add)
                delta = (lr * dv.reshape(b, -1)).astype(jnp.float32)
                new_vertex = sweep_scatter_add(
                    vertex, heads.astype(jnp.int32), -delta,
                    tile_rows=sweep_tile, chunk=sweep_chunk)
                new_v_moms = v_moms
            else:
                # moment rules ride the same sweep: [gsum|gsq|count] slab,
                # one closed-form c-touch update per tile row — one table +
                # moment pass replaces the dedup chain's sort/permute +
                # per-row moment gather/scatter (gpu/graph.cuh:104-242)
                from graphvite_tpu.ops.pallas_scatter import (
                    sweep_scatter_update)
                new_vertex, new_v_moms = sweep_scatter_update(
                    vertex, v_moms, heads.astype(jnp.int32),
                    dv.reshape(b, -1), opt, lr, entry_counts=v_counts,
                    entry_sqs=v_sqs, tile_rows=sweep_tile,
                    chunk=sweep_chunk)
        else:
            new_vertex, new_v_moms = apply_row_updates(
                vertex, v_moms, _mask_ids(heads, mask, vertex.shape[0]),
                dv.reshape(b, -1), opt, lr,
                entry_counts=v_counts, entry_sqs=v_sqs, trust=trust)
        if sweep_context and mask is not None:
            # sweep ids must stay in range: masked tails park at row V-1
            # (zeroed rows) instead of the out-of-range drop sentinel
            sweep_tails = jnp.where(mask > 0, tails,
                                    jnp.asarray(context.shape[0] - 1,
                                                tails.dtype))
            ctx_ids = jnp.concatenate([sweep_tails, pool_ids.reshape(-1)])
        else:
            ctx_ids = jnp.concatenate(
                [_mask_ids(tails, mask, context.shape[0]),
                 pool_ids.reshape(-1)])
        ctx_grads = jnp.concatenate(
            [dc.reshape(b, -1), dP.reshape(G * M, -1)])
        if sweep_context:
            # unsorted-id sweep (argsort front-end): tails never arrive
            # sorted, so this pays an extra sort + row permute — the
            # solver gates it behind its own measured auto-rule/env knob.
            if opt.num_moment == 0:
                from graphvite_tpu.ops.pallas_scatter import (
                    sweep_scatter_add_unsorted)
                cdelta = (lr * ctx_grads).astype(jnp.float32)
                new_context = sweep_scatter_add_unsorted(
                    context, ctx_ids.astype(jnp.int32), -cdelta,
                    tile_rows=sweep_tile, chunk=sweep_chunk,
                    permute_dtype=(jnp.bfloat16
                                   if context.dtype == jnp.bfloat16
                                   else None))
                new_c_moms = c_moms
            else:
                from graphvite_tpu.ops.pallas_scatter import (
                    sweep_scatter_update_unsorted)
                new_context, new_c_moms = sweep_scatter_update_unsorted(
                    context, c_moms, ctx_ids.astype(jnp.int32), ctx_grads,
                    opt, lr, entry_counts=c_counts, entry_sqs=c_sqs,
                    tile_rows=sweep_tile, chunk=sweep_chunk)
        else:
            new_context, new_c_moms = apply_row_updates(
                context, c_moms, ctx_ids, ctx_grads, opt, lr,
                entry_counts=c_counts, entry_sqs=c_sqs, trust=trust)
        new_state = {"tables": (new_vertex, new_context),
                     "moments": (new_v_moms, new_c_moms)}
        return new_state, mean_loss

    return step


def make_graph_pool_multitail_step(opt: Optimizer, num_negative: int,
                                   negative_weight: float, num_tail: int,
                                   pool_size: int = 128,
                                   pool_groups: int = 8,
                                   trust: float = 0.25):
    """Shared-negative-pool graph step over POSITION-MAJOR walk samples:
    each sample is one walk position (head) with `num_tail` augmentation
    tails (emit_walk_positions). Exact regrouping of make_graph_pool_step
    over the expanded (head, tail) pairs — same gradients, same moment
    counts/squares (exactness-tested in tests/test_pool_steps.py) — but
    the head row is gathered/scattered ONCE for its T pairs and the
    negative pool is scored ONCE per head instead of once per pair:
    head row traffic and the pool einsums shrink by T. Walk heads arrive
    unsorted (no sweep kernels apply), so cutting row COUNT is the lever
    (gpu/graph.cuh:59-93 keeps the vertex row in registers across
    subsamples for the same reason).

    step(state, heads [B], tails [B, T], key, lr, *neg_state,
         mask [B, T]) -> (state, loss); B must divide pool_groups."""
    k = num_negative
    M = int(pool_size)
    G = int(pool_groups)
    T = int(num_tail)
    neg_w = float(negative_weight) * k / M

    def step(state, heads, tails, key, lr, *neg_state, mask=None):
        vertex, context = state["tables"]
        v_moms, c_moms = state["moments"]
        b = heads.shape[0]
        assert b % G == 0, "batch must divide pool_groups"
        bg = b // G
        k1, k2 = jax.random.split(key)
        u1 = jax.random.uniform(k1, (G, M))
        u2 = jax.random.uniform(k2, (G, M))
        pool_ids = device_sample(*neg_state, u1, u2)         # [G, M]

        if mask is None:
            mask = jnp.ones((b, T), jnp.float32)
        m3 = mask.reshape(G, bg, T)
        cnt = jnp.sum(m3, axis=-1)                           # [G, Bg]

        v = vertex[heads].reshape(G, bg, -1).astype(jnp.float32)
        c = context[tails.reshape(-1)].reshape(G, bg, T, -1).astype(
            jnp.float32)
        P = context[pool_ids].astype(jnp.float32)            # [G, M, D]

        pos_logit = jnp.einsum("gbd,gbtd->gbt", v, c,
                               preferred_element_type=jnp.float32)
        neg_logits = jnp.einsum("gbd,gmd->gbm", v, P,
                                preferred_element_type=jnp.float32)
        gpos = (jax.nn.sigmoid(pos_logit) - 1.0) * m3        # [G, Bg, T]
        # per-HEAD negative gradient: each of its cnt pairs contributes
        # sigmoid(v.P) * neg_w, so the head total carries weight cnt
        gneg_u = jax.nn.sigmoid(neg_logits) * neg_w          # [G, Bg, M]
        gneg = gneg_u * cnt[..., None]
        n_active = jnp.sum(mask)
        loss_terms = (jnp.sum(m3 * jax.nn.softplus(-pos_logit), axis=-1)
                      + cnt * (neg_w * jnp.sum(jax.nn.softplus(neg_logits),
                                               axis=-1)))
        mean_loss = (jnp.sum(loss_terms) / jnp.maximum(n_active, 1.0)
                     / (1.0 + k * negative_weight))

        wd = opt.weight_decay
        dv = (jnp.einsum("gbt,gbtd->gbd", gpos, c,
                         preferred_element_type=jnp.float32)
              + jnp.einsum("gbm,gmd->gbd", gneg, P,
                           preferred_element_type=jnp.float32)
              + (wd * (1.0 + M * neg_w)) * cnt[..., None] * v)
        dc = gpos[..., None] * v[:, :, None, :] + wd * c     # [G,Bg,T,D]
        dc = jnp.where(m3[..., None] > 0, dc, 0.0)
        dP = (jnp.einsum("gbm,gbd->gmd", gneg, v,
                         preferred_element_type=jnp.float32)
              + wd * (neg_w * bg * T) * P)
        if trust is not None:
            dnorm = jnp.linalg.norm(dP, axis=-1, keepdims=True)
            limit = (trust * (jnp.linalg.norm(P, axis=-1, keepdims=True)
                              + 1e-2)
                     / jnp.maximum(lr, EPSILON))
            dP = dP * jnp.minimum(1.0, limit / jnp.maximum(dnorm, EPSILON))

        v_counts = v_sqs = c_counts = c_sqs = None
        if opt.num_moment > 0:
            sq_scale = M / max(k, 1)
            v_counts = ((k + 1.0) * cnt).reshape(b)
            v_sqs = (jnp.einsum("gbt,gbtd->gbd", gpos * gpos, c * c,
                                preferred_element_type=jnp.float32)
                     + sq_scale * cnt[..., None] * jnp.einsum(
                         "gbm,gmd->gbd", gneg_u ** 2, P ** 2,
                         preferred_element_type=jnp.float32)).reshape(b, -1)
            p_counts = jnp.broadcast_to(
                jnp.sum(cnt, axis=1)[:, None] * (k / M), (G, M))
            c_counts = jnp.concatenate([mask.reshape(-1),
                                        p_counts.reshape(-1)])
            p_sqs = sq_scale * jnp.einsum(
                "gbm,gbd->gmd", gneg_u ** 2 * cnt[..., None], v ** 2,
                preferred_element_type=jnp.float32)
            c_sqs = jnp.concatenate(
                [(dc ** 2).reshape(b * T, -1), p_sqs.reshape(G * M, -1)])

        head_mask = (cnt > 0).reshape(b).astype(jnp.float32)
        new_vertex, new_v_moms = apply_row_updates(
            vertex, v_moms, _mask_ids(heads, head_mask, vertex.shape[0]),
            dv.reshape(b, -1), opt, lr,
            entry_counts=v_counts, entry_sqs=v_sqs, trust=trust)
        ctx_ids = jnp.concatenate(
            [_mask_ids(tails.reshape(-1), mask.reshape(-1),
                       context.shape[0]),
             pool_ids.reshape(-1)])
        ctx_grads = jnp.concatenate(
            [dc.reshape(b * T, -1), dP.reshape(G * M, -1)])
        new_context, new_c_moms = apply_row_updates(
            context, c_moms, ctx_ids, ctx_grads, opt, lr,
            entry_counts=c_counts, entry_sqs=c_sqs, trust=trust)
        new_state = {"tables": (new_vertex, new_context),
                     "moments": (new_v_moms, new_c_moms)}
        return new_state, mean_loss

    return step


def walk_shift_fwd(x, kk):
    """result[:, i] = x[:, i + kk] along the walk axis (dim 1),
    zero-padded — the static band shift shared by the banded step core and
    the mesh walks engine's fetch-mask plumbing."""
    if kk == 0:
        return x
    pad = jnp.zeros(x.shape[:1] + (abs(kk),) + x.shape[2:], x.dtype)
    if kk > 0:
        return jnp.concatenate([x[:, kk:], pad], axis=1)
    return jnp.concatenate([pad, x[:, :kk]], axis=1)


def make_graph_banded_core(opt: Optimizer, num_negative: int,
                           negative_weight: float, aug: int, bidir: bool,
                           pool_size: int = 128, pool_groups: int = 8,
                           trust: float = 0.25):
    """The banded whole-walk math on PRE-GATHERED rows: given the chain's
    vertex-role rows v [B, L1, D], context-role rows c [B, L1, D], the
    shared negative pool rows P [G, M, D] and the pair-validity mask
    [B, L1, T], compute every gradient/count/square the banded step needs.
    Factoring the math out of the table gather/scatter lets the flat step
    (local HBM rows) and the sharded mesh engine (rows fetched over ICI,
    gradients routed back to owners — parallel/mesh.py) run the IDENTICAL
    step family (the reference's multi-GPU mode dispatches the same fused
    kernels as single-GPU, solver.h:588-654 -> gpu/graph.cuh:36-95).

    `pool_mask` [G, M] (optional) zeroes pool slots whose rows could not be
    fetched (mesh capacity overflow) so they contribute no gradient.

    Returns a dict: dv [B,L1,D], dc [B,L1,D], dP [G,M,D] (trust-clipped),
    cnt/cntc [B,L1] head/context touch counts, loss_sum, n_active, and
    (moment rules only) v_counts/v_sqs, c_counts_main/c_sqs_main,
    p_counts/p_sqs."""
    from graphvite_tpu.ops.device_sampler import walk_offsets

    k = num_negative
    M = int(pool_size)
    G = int(pool_groups)
    offs = walk_offsets(int(aug), bool(bidir))
    T = len(offs)
    neg_w = float(negative_weight) * k / M
    import os as _os
    # experimental: run the shifted band products with bf16 operands
    # (f32 sums). The per-term positive gradients round to bf16
    # precision, matching a bf16 table write anyway; gated until the
    # clone quality A/B (GRAPHVITE_BF16_BAND=1)
    bf16_band = _os.environ.get("GRAPHVITE_BF16_BAND", "0") == "1"

    def core(v, c, P, mask, lr, table_bf16=False, pool_mask=None):
        B, L1 = v.shape[0], v.shape[1]
        assert B % G == 0, "walk batch must divide pool_groups"
        bg = B // G
        npos = B * L1
        shift_fwd = walk_shift_fwd
        band_dt = (jnp.bfloat16 if (bf16_band and table_bf16)
                   else jnp.float32)
        vb = v.astype(band_dt)
        cb = c.astype(band_dt)

        # positive band: per offset, shifted elementwise product
        gpos_list, csh_list = [], []
        pos_loss = jnp.float32(0.0)
        for t_i, kk in enumerate(offs):
            csh = shift_fwd(cb, kk)
            logit = jnp.sum((vb * csh).astype(jnp.float32), axis=-1)
            m = mask[..., t_i]
            gpos_list.append((jax.nn.sigmoid(logit) - 1.0) * m)
            csh_list.append(csh.astype(jnp.float32))
            pos_loss = pos_loss + jnp.sum(m * jax.nn.softplus(-logit))
        cnt = jnp.sum(mask, axis=-1)                         # [B, L1]

        v4 = v.reshape(G, bg * L1, -1)
        neg_logits = jnp.einsum("gpd,gmd->gpm", v4, P,
                                preferred_element_type=jnp.float32)
        gneg_u = jax.nn.sigmoid(neg_logits) * neg_w          # [G, Pg, M]
        if pool_mask is not None:
            gneg_u = gneg_u * pool_mask[:, None, :]
        cnt_g = cnt.reshape(G, bg * L1)
        gneg = gneg_u * cnt_g[..., None]
        n_active = jnp.sum(mask)
        sp = jax.nn.softplus(neg_logits)
        if pool_mask is not None:
            sp = sp * pool_mask[:, None, :]
        neg_loss = jnp.sum(cnt_g * (neg_w * jnp.sum(sp, axis=-1)))

        wd = opt.weight_decay
        dv = sum(g[..., None] * csh
                 for g, csh in zip(gpos_list, csh_list))
        dv = (dv + jnp.einsum("gpm,gmd->gpd", gneg, P,
                              preferred_element_type=jnp.float32
                              ).reshape(B, L1, -1)
              + (wd * (1.0 + M * neg_w)) * cnt[..., None] * v)
        # context side: head i's positive gradient g*v lands at tail i+kk
        gv_list = [g[..., None] * v for g in gpos_list]
        dc_main = sum(shift_fwd(gv, -kk)
                      for gv, kk in zip(gv_list, offs))
        cntc = sum(shift_fwd(mask[..., t_i], -kk)
                   for t_i, kk in enumerate(offs))           # [B, L1]
        dc = dc_main + wd * cntc[..., None] * c
        dP = (jnp.einsum("gpm,gpd->gmd", gneg, v4,
                         preferred_element_type=jnp.float32)
              + wd * (neg_w * bg * L1 * T) * P)
        if trust is not None:
            dnorm = jnp.linalg.norm(dP, axis=-1, keepdims=True)
            limit = (trust * (jnp.linalg.norm(P, axis=-1, keepdims=True)
                              + 1e-2)
                     / jnp.maximum(lr, EPSILON))
            dP = dP * jnp.minimum(1.0, limit / jnp.maximum(dnorm, EPSILON))

        outs = {"dv": dv, "dc": dc, "dP": dP, "cnt": cnt, "cntc": cntc,
                "loss_sum": pos_loss + neg_loss, "n_active": n_active}
        if opt.num_moment > 0:
            sq_scale = M / max(k, 1)
            outs["v_counts"] = ((k + 1.0) * cnt).reshape(npos)
            outs["v_sqs"] = (
                sum((g * g)[..., None] * (csh * csh)
                    for g, csh in zip(gpos_list, csh_list))
                + sq_scale * cnt[..., None] * jnp.einsum(
                    "gpm,gmd->gpd", gneg_u ** 2, P ** 2,
                    preferred_element_type=jnp.float32
                ).reshape(B, L1, -1)).reshape(npos, -1)
            p_counts = jnp.broadcast_to(
                jnp.sum(cnt_g, axis=1)[:, None] * (k / M), (G, M))
            if pool_mask is not None:
                p_counts = p_counts * pool_mask
            outs["p_counts"] = p_counts
            # per-touch tail sq (g v + wd c)^2 summed over valid touches:
            # sum(g^2 v^2) + 2 wd c . sum(g v) + cntc (wd c)^2
            s2 = sum(shift_fwd(gv * gv, -kk)
                     for gv, kk in zip(gv_list, offs))
            outs["c_counts_main"] = cntc.reshape(npos)
            outs["c_sqs_main"] = (s2 + 2.0 * wd * c * dc_main
                                  + (wd * c) ** 2 * cntc[..., None]
                                  ).reshape(npos, -1)
            outs["p_sqs"] = sq_scale * jnp.einsum(
                "gpm,gpd->gmd", gneg_u ** 2 * cnt_g[..., None], v4 ** 2,
                preferred_element_type=jnp.float32)
        return outs

    return core, (k, M, G, T, neg_w)


def make_graph_banded_fused_step(opt: Optimizer, num_negative: int,
                                 negative_weight: float, aug: int,
                                 bidir: bool, pool_size: int = 128,
                                 pool_groups: int = 8):
    """SGD fast path of the banded walk step over a FUSED (vertex|context)
    arena: state = {"tables": (vc [V, 2D],), "moments": ((),)}. One
    [B*L1, 2D] gather and ONE scatter-add replace the two-per-table row
    ops — scatter cost on v5e is per-row-op bound, and the banded step's
    two scatters were 43% of its time (PERF.md r4 floor analysis). The
    mesh engine's W=1 parity came from exactly this fusion; this brings
    it to the flat engine. Deltas are applied in the table dtype like the
    unfused scatter (identical rounding). SGD only, and only when the
    trust clip is inactive (big tables): the clip's row-norm logic is
    per-table, not per fused row. The solver packs/unpacks the canonical
    (vertex, context) state once per EPISODE (make_fused_runner
    state_pack), amortizing the concat/split to noise."""
    core, (k, M, G, T, _) = make_graph_banded_core(
        opt, num_negative, negative_weight, aug, bidir, pool_size,
        pool_groups, trust=None)
    assert opt.num_moment == 0, "fused arena is the SGD fast path"

    def step(state, chain, _tails, key, lr, *neg_state, mask=None):
        (vc,) = state["tables"]
        D = vc.shape[1] // 2
        B, L1 = chain.shape
        npos = B * L1
        k1, k2 = jax.random.split(key)
        u1 = jax.random.uniform(k1, (G, M))
        u2 = jax.random.uniform(k2, (G, M))
        pool_ids = device_sample(*neg_state, u1, u2)         # [G, M]

        if mask is None:
            mask = jnp.ones((B, L1, T), jnp.float32)
        rows = vc[chain]                                     # [B, L1, 2D]
        v = rows[..., :D].astype(jnp.float32)
        c = rows[..., D:].astype(jnp.float32)
        P = vc[pool_ids][..., D:].astype(jnp.float32)        # [G, M, D]

        o = core(v, c, P, mask, lr, table_bf16=vc.dtype == jnp.bfloat16)
        mean_loss = (o["loss_sum"] / jnp.maximum(o["n_active"], 1.0)
                     / (1.0 + k * negative_weight))
        # dead slots carry exactly-zero grads (masked in the core), so
        # in-range ids scatter-add as no-ops — no sentinel routing needed
        delta = jnp.concatenate(
            [jnp.concatenate([o["dv"].reshape(npos, -1),
                              o["dc"].reshape(npos, -1)], axis=-1),
             jnp.concatenate([jnp.zeros((G * M, D), jnp.float32),
                              o["dP"].reshape(G * M, -1)], axis=-1)])
        ids = jnp.concatenate([chain.reshape(npos), pool_ids.reshape(-1)])
        new_vc = vc.at[ids].add(-(lr * delta).astype(vc.dtype),
                                mode="drop")
        return {"tables": (new_vc,), "moments": ((),)}, mean_loss

    return step


def banded_fused_pack(state):
    """Canonical graph state -> fused-arena state (one concat per episode)."""
    vertex, context = state["tables"]
    return {"tables": (jnp.concatenate([vertex, context], axis=-1),),
            "moments": ((),)}


def banded_fused_unpack(state):
    (vc,) = state["tables"]
    D = vc.shape[1] // 2
    return {"tables": (vc[:, :D], vc[:, D:]), "moments": ((), ())}


def make_graph_banded_walk_step(opt: Optimizer, num_negative: int,
                                negative_weight: float, aug: int,
                                bidir: bool, pool_size: int = 128,
                                pool_groups: int = 8, trust: float = 0.25):
    """Shared-negative-pool graph step over WHOLE WALKS: input is the walk
    chain [B, L+1] plus a pair-validity mask [B, L+1, T]
    (emit_walk_banded). Exact regrouping of make_graph_pool_multitail_step
    — same gradients, moment counts/squares, loss (exactness-tested) —
    but both SIDES of every pair are deduplicated at walk granularity:
    each chain vertex is gathered once as head and once as context, the
    positive band (v_i . c_{i+k} for the T static offsets) is computed by
    shifted elementwise products, and each vertex receives ONE accumulated
    update for all pairs it participates in. Row traffic per pair drops
    from the pair step's ~2 rows to ~2/T; the negative pool is scored once
    per position (the reference's warp kernel holds the vertex row in
    registers across subsamples for the same reason, gpu/graph.cuh:59-93;
    this extends the idea to the context side, which a warp-per-sample
    layout cannot).

    step(state, chain [B, L1], _ (chain again, ignored), key, lr,
         *neg_state, mask [B, L1, T]) -> (state, loss); B % pool_groups
    == 0. Offset order must match ops.device_sampler.walk_offsets. The
    math lives in make_graph_banded_core (shared with the mesh engine)."""
    core, (k, M, G, T, _) = make_graph_banded_core(
        opt, num_negative, negative_weight, aug, bidir, pool_size,
        pool_groups, trust)

    def step(state, chain, _tails, key, lr, *neg_state, mask=None):
        vertex, context = state["tables"]
        v_moms, c_moms = state["moments"]
        B, L1 = chain.shape
        npos = B * L1
        k1, k2 = jax.random.split(key)
        u1 = jax.random.uniform(k1, (G, M))
        u2 = jax.random.uniform(k2, (G, M))
        pool_ids = device_sample(*neg_state, u1, u2)         # [G, M]

        if mask is None:
            mask = jnp.ones((B, L1, T), jnp.float32)
        v = vertex[chain].astype(jnp.float32)                # [B, L1, D]
        c = context[chain].astype(jnp.float32)
        P = context[pool_ids].astype(jnp.float32)            # [G, M, D]

        o = core(v, c, P, mask, lr,
                 table_bf16=vertex.dtype == jnp.bfloat16)
        mean_loss = (o["loss_sum"] / jnp.maximum(o["n_active"], 1.0)
                     / (1.0 + k * negative_weight))

        v_counts = v_sqs = c_counts = c_sqs = None
        if opt.num_moment > 0:
            v_counts = o["v_counts"]
            v_sqs = o["v_sqs"]
            c_counts = jnp.concatenate([o["c_counts_main"],
                                        o["p_counts"].reshape(-1)])
            c_sqs = jnp.concatenate(
                [o["c_sqs_main"], o["p_sqs"].reshape(G * M, -1)])

        flat_ids = chain.reshape(npos)
        import os as _os
        # opt-in A/B knob (VERDICT r4 weak #3): route the banded table
        # updates through the Pallas unsorted sweeps instead of XLA
        # scatter — the one regime the sweeps could still win is V >= 4M,
        # where XLA's scatter degrades ~4x (PERF.md access-pattern
        # floors). SGD only; dead slots carry exactly-zero gradients so
        # in-range ids scatter-add as no-ops.
        sweep_banded = (_os.environ.get("GRAPHVITE_SWEEP_BANDED",
                                        "0") == "1"
                        and opt.num_moment == 0)
        if sweep_banded:
            from graphvite_tpu.ops.pallas_scatter import (
                sweep_scatter_add_unsorted)
            pdt = (jnp.bfloat16 if vertex.dtype == jnp.bfloat16 else None)
            new_vertex = sweep_scatter_add_unsorted(
                vertex, flat_ids.astype(jnp.int32),
                -(lr * o["dv"].reshape(npos, -1)).astype(jnp.float32),
                permute_dtype=pdt)
            new_v_moms = v_moms
            ctx_ids = jnp.concatenate([flat_ids, pool_ids.reshape(-1)])
            ctx_grads = jnp.concatenate(
                [o["dc"].reshape(npos, -1), o["dP"].reshape(G * M, -1)])
            new_context = sweep_scatter_add_unsorted(
                context, ctx_ids.astype(jnp.int32),
                -(lr * ctx_grads).astype(jnp.float32), permute_dtype=pdt)
            new_c_moms = c_moms
            new_state = {"tables": (new_vertex, new_context),
                         "moments": (new_v_moms, new_c_moms)}
            return new_state, mean_loss
        head_mask = (o["cnt"] > 0).reshape(npos).astype(jnp.float32)
        new_vertex, new_v_moms = apply_row_updates(
            vertex, v_moms, _mask_ids(flat_ids, head_mask,
                                      vertex.shape[0]),
            o["dv"].reshape(npos, -1), opt, lr,
            entry_counts=v_counts, entry_sqs=v_sqs, trust=trust)
        ctx_mask = (o["cntc"] > 0).reshape(npos).astype(jnp.float32)
        ctx_ids = jnp.concatenate(
            [_mask_ids(flat_ids, ctx_mask, context.shape[0]),
             pool_ids.reshape(-1)])
        ctx_grads = jnp.concatenate(
            [o["dc"].reshape(npos, -1), o["dP"].reshape(G * M, -1)])
        new_context, new_c_moms = apply_row_updates(
            context, c_moms, ctx_ids, ctx_grads, opt, lr,
            entry_counts=c_counts, entry_sqs=c_sqs, trust=trust)
        new_state = {"tables": (new_vertex, new_context),
                     "moments": (new_v_moms, new_c_moms)}
        return new_state, mean_loss

    return step


# ---------------------------------------------------------------------------
# knowledge graph (tied entity table + global relation table;
# ref gpu/knowledge_graph.cuh)
# ---------------------------------------------------------------------------

def make_kg_train_step(model, opt: Optimizer, num_negative: int,
                       margin_or_l3: float, adversarial_temperature: float,
                       relation_lr_multiplier: float, external_pool=False):
    """state tables: (entity, relation). Negatives are uniform over
    2 * num_entity ids: id < V corrupts the head, else the tail
    (the split-id trick of gpu/knowledge_graph.cuh:65-69 applied to the
    whole entity table instead of a partition pair).

    With `external_pool=True` the step takes candidate ROWS from a
    caller-owned negative pool instead of gathering them from the entity
    table: signature becomes
    `step(state, heads, tails, rels, key, lr, mask, pool_rows, pool_idx,
    corrupt_head)` and it returns `(new_state, loss, cand_grad)` with
    `cand_grad` the [B, K, D] per-draw regularized candidate gradients —
    the caller scatters them into pool space and routes them back to the
    rows' owner devices (the sharded trainer's global-pool negatives)."""

    def step(state, heads, tails, rels, key, lr, mask=None, negatives=None,
             pool=None):
        entity, relation = state["tables"]
        e_moms, r_moms = state["moments"]
        b = heads.shape[0]
        k = num_negative
        num_entity = entity.shape[0]

        if external_pool:
            pool_rows, pool_idx, corrupt_head = pool
            cand_ids = None
            cand = pool_rows[pool_idx].astype(jnp.float32)   # [B, K, D]
        elif negatives is None:
            neg_ids = jax.random.randint(key, (b, k), 0, 2 * num_entity)
            corrupt_head = neg_ids < num_entity
            cand_ids = jnp.where(corrupt_head, neg_ids,
                                 neg_ids - num_entity)
        else:
            # caller-supplied corruption (the sharded trainer draws
            # candidates from the resident entity partitions only,
            # knowledge_graph.cuh:316-319)
            cand_ids, corrupt_head = negatives

        # gather only the K+2 distinct rows per sample (positive head,
        # positive tail, K corruption candidates) instead of 2(K+1) — the
        # corrupted side reuses the candidate row, the other side reuses
        # the positive row (split-id trick, gpu/knowledge_graph.cuh:65-69)
        h_pos = entity[heads][:, None, :].astype(jnp.float32)  # [B, 1, D]
        t_pos = entity[tails][:, None, :].astype(jnp.float32)
        if not external_pool:
            cand = entity[cand_ids].astype(jnp.float32)      # [B, K, D]
        ch = corrupt_head[..., None]
        h = jnp.concatenate([jnp.where(ch, cand, h_pos), h_pos], axis=1)
        t = jnp.concatenate([jnp.where(ch, t_pos, cand), t_pos], axis=1)
        r = relation[rels][:, None, :].astype(jnp.float32)   # [B, 1, D]
        logits = model.score(h, t, r, margin_or_l3)          # [B, K+1]

        prob = jax.nn.sigmoid(logits)
        # stable: -log sigmoid(z) = softplus(-z); -log(1-sigmoid(z)) = softplus(z)
        pos_loss = jax.nn.softplus(-logits[:, -1])
        neg_logits = logits[:, :k]
        if adversarial_temperature > EPSILON:
            # exact softmax normalizer; the reference's stale-normalizer clip
            # (gpu/knowledge_graph.cuh:109-112) kept for parity
            neg_w = jax.nn.softmax(neg_logits / adversarial_temperature, axis=-1)
            neg_w = jnp.minimum(neg_w, 1.0)
        else:
            neg_w = jnp.full_like(neg_logits, 1.0 / k)
        neg_loss = jnp.sum(neg_w * jax.nn.softplus(neg_logits), axis=-1)
        sample_loss = (pos_loss + neg_loss) / 2.0

        label = jnp.concatenate(
            [jnp.zeros((b, k), logits.dtype), jnp.ones((b, 1), logits.dtype)], axis=1)
        gradient = prob - label
        weight = jnp.concatenate([neg_w, jnp.ones((b, 1), logits.dtype)], axis=1)
        if mask is not None:
            gradient = gradient * mask[:, None]
            weight = weight * mask[:, None]
            sample_loss = sample_loss * mask

        gh, gt, gr = model.backward(h, t, r, gradient, margin_or_l3)
        w = weight[..., None]
        wd = opt.weight_decay
        reg_h = w * (gh + wd * h)                            # [B, K+1, D]
        reg_t = w * (gt + wd * t)
        # relation row: one touch per subsample (the reference's backward
        # updates the relation row on every s = 0..K, gpu/knowledge_graph.cuh
        # train_1_moment loop)
        per_touch_r = w * (gr + wd * r)                      # [B, K+1, D]
        reg_r = jnp.sum(per_touch_r, axis=1)                 # [B, D]

        # scatter K+2 rows per sample: candidate rows get the corrupted
        # side's gradient; the positive head/tail rows accumulate their
        # positive-pair gradient plus every negative subsample where they
        # stayed in place. Collapsed entries carry their true touch count and
        # per-touch squared gradients so moment updates match the reference's
        # per-subsample dynamics.
        cand_grad = jnp.where(ch, reg_h[:, :k], reg_t[:, :k])  # [B, K, D]
        chf = corrupt_head[..., None].astype(reg_h.dtype)
        head_touch = reg_h[:, :k] * (1 - chf)                # [B, K, D]
        tail_touch = reg_t[:, :k] * chf
        head_grad = reg_h[:, k] + jnp.sum(head_touch, axis=1)
        tail_grad = reg_t[:, k] + jnp.sum(tail_touch, axis=1)
        pos_ids = [_mask_ids(heads, mask, num_entity),
                   _mask_ids(tails, mask, num_entity)]
        pos_grads = [head_grad, tail_grad]
        if not external_pool:
            pos_ids.append(_mask_ids(cand_ids, mask, num_entity).reshape(-1))
            pos_grads.append(cand_grad.reshape(b * k, -1))
        ent_ids = jnp.concatenate(pos_ids)
        ent_grads = jnp.concatenate(pos_grads)
        ent_counts = ent_sqs = r_counts = r_sqs = None
        if opt.num_moment > 0:
            chn = corrupt_head.astype(jnp.float32)           # [B, K]
            cnts = [1 + jnp.sum(1 - chn, axis=1), 1 + jnp.sum(chn, axis=1)]
            sqs = [reg_h[:, k] ** 2 + jnp.sum(head_touch * head_touch,
                                              axis=1),
                   reg_t[:, k] ** 2 + jnp.sum(tail_touch * tail_touch,
                                              axis=1)]
            if not external_pool:
                cnts.append(jnp.ones((b * k,), jnp.float32))
                sqs.append((cand_grad * cand_grad).reshape(b * k, -1))
            ent_counts = jnp.concatenate(cnts)
            ent_sqs = jnp.concatenate(sqs)
            r_counts = jnp.full((b,), k + 1, jnp.float32)
            r_sqs = jnp.sum(per_touch_r * per_touch_r, axis=1)
        new_entity, new_e_moms = apply_row_updates(
            entity, e_moms, ent_ids, ent_grads, opt, lr,
            entry_counts=ent_counts, entry_sqs=ent_sqs)
        new_relation, new_r_moms = apply_row_updates(
            relation, r_moms, _mask_ids(rels, mask, relation.shape[0]),
            reg_r, opt, lr, lr_scale=relation_lr_multiplier,
            entry_counts=r_counts, entry_sqs=r_sqs)
        new_state = {"tables": (new_entity, new_relation),
                     "moments": (new_e_moms, new_r_moms)}
        if mask is None:
            mean_loss = jnp.mean(sample_loss)
        else:
            mean_loss = jnp.sum(sample_loss) / jnp.maximum(jnp.sum(mask), 1.0)
        if external_pool:
            return new_state, mean_loss, cand_grad
        return new_state, mean_loss

    return step


def kg_pool_groups(batch_size: int, target_group: int = 512,
                   lo: int = 2, hi: int = 1024):
    """Group count for the pooled KG step: bounds the per-group sample
    count Bg so a shared candidate row's emulated touch count (Bg * K / M)
    stays near the staleness bound. Always even (half the groups corrupt
    heads, half tails)."""
    g = lo
    while g < hi and batch_size // g > target_group:
        g *= 2
    while (batch_size % g or g % 2) and g > 2:
        g //= 2
    return max(g, 2)


def make_kg_pool_step(model, opt: Optimizer, num_negative: int,
                      margin_or_l3: float, adversarial_temperature: float,
                      relation_lr_multiplier: float, pool_size: int = 0,
                      pool_groups: int = 8, trust: float = 0.25):
    """Shared-negative-pool KG step with MIXED-side pools.

    Two structural changes vs make_kg_train_step, both measured on a
    device trace of RotatE dim-2048 (PERF.md round-2):

    1. The classic step mixes head/tail corruption per draw
       (gpu/knowledge_graph.cuh:65-69), which on a batched backend forces
       [B, K+1, D] concat + select chains (~8 ms/batch at dim 2048) to
       assemble the (h, t) pair per subsample. Here each group of Bg
       samples shares ONE pool of M candidate rows, the first M/2 slots
       scoring as head corruptions and the rest as tail corruptions — the
       negative scoring becomes two clean broadcasts, score(cand, t) and
       score(h, cand), with no per-draw selects, while each sample's
       self-adversarial softmax still normalizes over a MIXED candidate
       set exactly like the reference's uniform-over-2V draw.

    2. Candidate gather/scatter drops from B*K rows to G*M — at dim 2048
       the B*K-entry dense-accumulator build + scatter was ~10 ms/batch,
       the single largest cost.

    Emulated K-draw touch counts (each pool slot stands for K/M draws per
    active sample; positive rows get 1 + K/2) and M/K-rescaled
    squared-gradient sums follow make_vis_pool_step. Trust-ratio clip on
    the accumulated candidate-row displacement mirrors
    make_graph_pool_step's pool clip (inactive under moment rules).
    """
    k = num_negative
    # default pool size: quality on the math fixture is a function of the
    # shared-candidate diversity — MRR 0.585 at M=16 vs 0.6695 at M=64
    # (classic per-draw: 0.679), so the default gives every group at least
    # 64 distinct candidates and never fewer than 2K
    M = int(pool_size) if pool_size else max(2 * int(num_negative), 64)
    M += M % 2
    G = int(pool_groups)
    M2 = M // 2
    uses_margin = bool(getattr(model, "uses_margin", False))
    bw_hyper = margin_or_l3 if uses_margin else 0.0
    l3 = 0.0 if uses_margin else margin_or_l3
    sq_scale = M / max(k, 1)
    import os as _os
    # RotatE fast pooled body (exactness-tested against the generic body,
    # tests/test_pool_steps.py): |c*e^{i phi} - t| = |c - t*e^{-i phi}|
    # (rotation isometry), so the [Bg, M, D] negative chains reduce to ONE
    # complex difference d = c - u with u = t*e^{-i phi} computed per
    # SAMPLE, all rotation work dropping from O(Bg*M*D) to O(Bg*D); the
    # candidate / staying-side / phase gradient sums then all factor
    # through the same weighted reductions of z = gn/rho * d. Replaces the
    # ~40 full-D elementwise passes of score+backward with ~20 half-D
    # passes — the KG pillar is VPU-elementwise-bound (PERF.md trace).
    # Exact only when wd == 0 (FB15k RotatE protocol, rotate_fb15k.yaml
    # trains with weight_decay 0); wd != 0 falls back to the generic body.
    fast_rotate = (getattr(model, "name", "") == "RotatE"
                   and opt.weight_decay == 0.0
                   and _os.environ.get("GRAPHVITE_KG_FAST", "1") != "0")

    def _reg(p, wd):
        r = wd * p
        if not uses_margin and l3:
            r = r + (3.0 * l3) * jnp.abs(p) * p
        return r

    def step(state, heads, tails, rels, key, lr, mask=None, negatives=None):
        entity, relation = state["tables"]
        e_moms, r_moms = state["moments"]
        b = heads.shape[0]
        num_entity = entity.shape[0]
        assert b % G == 0, "batch must divide pool_groups"
        bg = b // G
        wd = opt.weight_decay
        f32 = jnp.float32

        maskf = None if mask is None else mask.astype(f32)
        if negatives is not None:
            # caller-supplied candidate pool ids [G, M] (the sharded mesh
            # trainer draws uniformly over its RESIDENT entity partitions,
            # matching the reference's resident-only corruption,
            # knowledge_graph.cuh:316-319; ids index the local arena)
            cand_ids = negatives
        else:
            cand_ids = jax.random.randint(key, (G, M), 0, num_entity)

        # ---- positive pairs: one [b, D]-wide pass, no K dimension ------
        h_pos = entity[heads].astype(f32)
        t_pos = entity[tails].astype(f32)
        r_pos = relation[rels].astype(f32)
        pos_logit = model.score(h_pos, t_pos, r_pos, margin_or_l3)
        g_pos = jax.nn.sigmoid(pos_logit) - 1.0
        pos_loss = jax.nn.softplus(-pos_logit)
        if maskf is not None:
            g_pos = g_pos * maskf
            pos_loss = pos_loss * maskf
        # backward(margin_or_l3) already includes the l3 term; add only wd
        ghp, gtp, grp = model.backward(h_pos, t_pos, r_pos, g_pos,
                                       margin_or_l3)
        wp = 1.0 if maskf is None else maskf[:, None]
        reg_hp = ghp + wp * (wd * h_pos)
        reg_tp = gtp + wp * (wd * t_pos)
        reg_rp = grp + wp * (wd * r_pos)

        def fast_rotate_body(carry, xs):
            """RotatE-specialized negative body; same `outs` contract as
            the generic body below, derived via the rotation-isometry
            rewrite (see make_kg_pool_step header). Exactness vs the
            generic body is tested in tests/test_pool_steps.py."""
            h_g, t_g, r_g, cand_g, m_g = xs
            h = entity[h_g].astype(f32)                      # [Bg, D]
            t = entity[t_g].astype(f32)
            r = relation[r_g].astype(f32)
            cand = entity[cand_g].astype(f32)                # [M, D]
            Dh = h.shape[-1] // 2
            h_re, h_im = h[..., 0::2], h[..., 1::2]          # [Bg, Dh]
            t_re, t_im = t[..., 0::2], t[..., 1::2]
            phase = r[..., :Dh]
            cosp, sinp = jnp.cos(phase), jnp.sin(phase)      # per SAMPLE
            # u = t * e^{-i phi} (head-corrupt frame), w = h * e^{i phi}
            u_re = t_re * cosp + t_im * sinp
            u_im = t_im * cosp - t_re * sinp
            w_re = h_re * cosp - h_im * sinp
            w_im = h_re * sinp + h_im * cosp
            c_re = cand[..., 0::2]                           # [M, Dh]
            c_im = cand[..., 1::2]

            def side(fixed_re, fixed_im, cs_re, cs_im, sgn):
                """One corruption side. d = sgn * (cand - fixed) per
                (sample, candidate, dim); returns logits plus the factored
                reductions every gradient/sq output needs.
                sgn=+1: head-corrupt (d = c - u); sgn=-1: tail-corrupt
                (d = w - c, written as -(c - w))."""
                d_re = (cs_re[None, :, :] - fixed_re[:, None, :]) * sgn
                d_im = (cs_im[None, :, :] - fixed_im[:, None, :]) * sgn
                sq = d_re * d_re + d_im * d_im               # [Bg, M2, Dh]
                rinv = jax.lax.rsqrt(jnp.maximum(sq, EPSILON * EPSILON))
                logits = margin_or_l3 - jnp.sum(sq * rinv, axis=-1)
                return d_re, d_im, rinv, logits

            dh_re, dh_im, rinv_h, lg_h = side(u_re, u_im, c_re[:M2],
                                              c_im[:M2], 1.0)
            dt_re, dt_im, rinv_t, lg_t = side(w_re, w_im, c_re[M2:],
                                              c_im[M2:], -1.0)
            logits = jnp.concatenate([lg_h, lg_t], axis=-1)  # [Bg, M]
            if adversarial_temperature > EPSILON:
                w = jax.nn.softmax(logits / adversarial_temperature,
                                   axis=-1)
                w = jnp.minimum(w, 1.0)
            else:
                w = jnp.full_like(logits, 1.0 / M)
            if m_g is not None:
                w = w * m_g[:, None]
            loss_neg = jnp.sum(w * jax.nn.softplus(logits), axis=-1)
            gn = jax.nn.sigmoid(logits) * w                  # [Bg, M]

            def side_grads(gn_s, d_re, d_im, rinv):
                """z = (gn/rho) * d (the per-pair gradient kernel); every
                gradient/sq output factors through raw sums of z and z^2
                over b (candidate side) or m (sample side) — signs are
                applied at the use sites below."""
                alpha = gn_s[:, :, None] * rinv              # [Bg, M2, Dh]
                z_re = alpha * d_re
                z_im = alpha * d_im
                zr2 = z_re * z_re
                zi2 = z_im * z_im
                zri = z_re * z_im
                B_re = jnp.sum(z_re, axis=0)                 # [M2, Dh]
                B_im = jnp.sum(z_im, axis=0)
                B_rr = jnp.sum(zr2, axis=0)
                B_ii = jnp.sum(zi2, axis=0)
                E_re = jnp.sum(z_re, axis=1)                 # [Bg, Dh]
                E_im = jnp.sum(z_im, axis=1)
                S_rr = jnp.sum(zr2, axis=1)
                S_ii = jnp.sum(zi2, axis=1)
                S_ri = jnp.sum(zri, axis=1)
                return ((B_re, B_im, B_rr, B_ii),
                        (E_re, E_im, S_rr, S_ii, S_ri))

            need_sq = opt.num_moment > 0
            (cgh, (Eh_re, Eh_im, Sh_rr, Sh_ii, Sh_ri)) = side_grads(
                gn[:, :M2], dh_re, dh_im, rinv_h)
            (cgt, (Et_re, Et_im, St_rr, St_ii, St_ri)) = side_grads(
                gn[:, M2:], dt_re, dt_im, rinv_t)

            def interleave(re, im):
                out = jnp.stack([re, im], axis=-1)
                return out.reshape(out.shape[:-2] + (-1,))

            # head-corrupt: d = c - u, dL/dc = -z, dL/dt = +R^{+phi}(z)
            # (gradient of |c - t e^{-i phi}| pulled back through the
            # unitary frame). tail-corrupt: d = w - c, dL/dc = +z,
            # dL/dh = -R^{-phi}(z).
            tail_g = interleave(Eh_re * cosp - Eh_im * sinp,
                                Eh_re * sinp + Eh_im * cosp)
            head_g = -interleave(Et_re * cosp + Et_im * sinp,
                                 Et_im * cosp - Et_re * sinp)
            # phase gradient per pair: dL/dphi = z_re*f_im - z_im*f_re
            # (f = the rotated frame: u on the head side, w on the tail
            # side; matches model/knowledge_graph.h:497-498 after the
            # frames cancel the rotations)
            gphase = ((Eh_re * u_im - Eh_im * u_re)
                      + (Et_re * w_im - Et_im * w_re))
            rel_g = jnp.concatenate([gphase, jnp.zeros_like(gphase)],
                                    axis=-1)
            outs = {
                "cand": jnp.concatenate(
                    [interleave(-cgh[0], -cgh[1]),
                     interleave(cgt[0], cgt[1])]),           # [M, D]
                "head": head_g,
                "tail": tail_g,
                "rel": rel_g,
                "loss": loss_neg,
                "msum": (jnp.float32(bg) if m_g is None
                         else jnp.sum(m_g)),
            }
            if need_sq:
                outs["cand_sqs"] = sq_scale * jnp.concatenate(
                    [interleave(cgh[2], cgh[3]),
                     interleave(cgt[2], cgt[3])])
                # staying-side squares: the per-pair grad is a rotation of
                # z, so sum_m (R z)_re^2 = cos^2*S_rr +- 2 cos sin*S_ri
                # + sin^2*S_ii (rotation mixes re/im BEFORE the square)
                c2, s2, cs = cosp * cosp, sinp * sinp, cosp * sinp
                # tail row rotated by +phi: re = z_re cos - z_im sin
                outs["tail_sqs"] = sq_scale * interleave(
                    c2 * Sh_rr - 2.0 * cs * Sh_ri + s2 * Sh_ii,
                    s2 * Sh_rr + 2.0 * cs * Sh_ri + c2 * Sh_ii)
                # head row rotated by -phi: re = z_re cos + z_im sin
                outs["head_sqs"] = sq_scale * interleave(
                    c2 * St_rr + 2.0 * cs * St_ri + s2 * St_ii,
                    s2 * St_rr - 2.0 * cs * St_ri + c2 * St_ii)
                # phase grad per pair = z_re*f_im - z_im*f_re (f = frame)
                ph_h = (u_im * u_im * Sh_rr - 2.0 * u_re * u_im * Sh_ri
                        + u_re * u_re * Sh_ii)
                ph_t = (w_im * w_im * St_rr - 2.0 * w_re * w_im * St_ri
                        + w_re * w_re * St_ii)
                outs["rel_sqs"] = sq_scale * jnp.concatenate(
                    [ph_h + ph_t, jnp.zeros_like(ph_h)], axis=-1)
            return carry, outs

        def body(carry, xs):
            h_g, t_g, r_g, cand_g, m_g = xs
            h = entity[h_g].astype(f32)                      # [Bg, D]
            t = entity[t_g].astype(f32)
            r = relation[r_g].astype(f32)
            cand = entity[cand_g].astype(f32)                # [M, D]
            ch = cand[:M2][None, :, :]                       # head-corrupt
            ct = cand[M2:][None, :, :]                       # tail-corrupt
            lg_h = model.score(ch, t[:, None, :], r[:, None, :],
                               margin_or_l3)                 # [Bg, M2]
            lg_t = model.score(h[:, None, :], ct, r[:, None, :],
                               margin_or_l3)
            logits = jnp.concatenate([lg_h, lg_t], axis=-1)  # [Bg, M]
            # self-adversarial weights (softmax per sample over the MIXED
            # pool, stale-normalizer clip kept for parity,
            # gpu/knowledge_graph.cuh:59-78); else uniform mass 1
            if adversarial_temperature > EPSILON:
                w = jax.nn.softmax(logits / adversarial_temperature,
                                   axis=-1)
                w = jnp.minimum(w, 1.0)
            else:
                w = jnp.full_like(logits, 1.0 / M)
            if m_g is not None:
                w = w * m_g[:, None]
            loss_neg = jnp.sum(w * jax.nn.softplus(logits), axis=-1)
            gn = jax.nn.sigmoid(logits) * w                  # [Bg, M]
            gn_h, gn_t = gn[:, :M2], gn[:, M2:]
            gc_h, gs_h, gr_h = model.backward(
                ch, t[:, None, :], r[:, None, :], gn_h, bw_hyper)
            gs_t, gc_t, gr_t = model.backward(
                h[:, None, :], ct, r[:, None, :], gn_t, bw_hyper)
            # per-entry regularized grads ([Bg, M2, D]); weights fold into
            # gn already, the reg terms scale by w per touch
            w_h = w[:, :M2, None]
            w_t = w[:, M2:, None]
            reg_ch = gc_h + w_h * _reg(ch, wd)
            reg_ct = gc_t + w_t * _reg(ct, wd)
            reg_sh = gs_h + w_h * _reg(t[:, None, :], wd)    # tail stays
            reg_st = gs_t + w_t * _reg(h[:, None, :], wd)    # head stays
            rel_h = gr_h + w_h * _reg(r[:, None, :], wd)
            rel_t = gr_t + w_t * _reg(r[:, None, :], wd)
            outs = {
                "cand": jnp.concatenate(
                    [jnp.sum(reg_ch, axis=0), jnp.sum(reg_ct, axis=0)]),
                "head": jnp.sum(reg_st, axis=1),             # [Bg, D]
                "tail": jnp.sum(reg_sh, axis=1),
                "rel": jnp.sum(rel_h, axis=1) + jnp.sum(rel_t, axis=1),
                "loss": loss_neg,
                # active-sample count (touch counts must NOT be
                # weight-scaled: the reference counts each draw as one
                # optimizer touch however small its adversarial weight)
                "msum": (jnp.float32(bg) if m_g is None
                         else jnp.sum(m_g)),
            }
            if opt.num_moment > 0:
                outs["cand_sqs"] = sq_scale * jnp.concatenate(
                    [jnp.sum(reg_ch * reg_ch, axis=0),
                     jnp.sum(reg_ct * reg_ct, axis=0)])
                outs["head_sqs"] = sq_scale * jnp.sum(reg_st * reg_st,
                                                      axis=1)
                outs["tail_sqs"] = sq_scale * jnp.sum(reg_sh * reg_sh,
                                                      axis=1)
                outs["rel_sqs"] = sq_scale * (
                    jnp.sum(rel_h * rel_h, axis=1)
                    + jnp.sum(rel_t * rel_t, axis=1))
            return carry, outs

        xs = (heads.reshape(G, bg), tails.reshape(G, bg),
              rels.reshape(G, bg), cand_ids,
              None if maskf is None else maskf.reshape(G, bg))
        _, outs = jax.lax.scan(fast_rotate_body if fast_rotate else body,
                               0, xs)

        # ---- assemble entity updates -----------------------------------
        head_grad = reg_hp + outs["head"].reshape(b, -1)
        tail_grad = reg_tp + outs["tail"].reshape(b, -1)
        cand_grad = outs["cand"].reshape(G * M, -1)
        if trust is not None:
            # a shared candidate row accumulates Bg coherent sample
            # gradients at one stale point (make_graph_pool_step note)
            dnorm = jnp.linalg.norm(cand_grad, axis=-1, keepdims=True)
            crows = entity[cand_ids.reshape(-1)].astype(f32)
            limit = (trust * (jnp.linalg.norm(crows, axis=-1,
                                              keepdims=True) + 1e-2)
                     / jnp.maximum(lr, EPSILON))
            cand_grad = cand_grad * jnp.minimum(
                1.0, limit / jnp.maximum(dnorm, EPSILON))
        ent_ids = jnp.concatenate(
            [_mask_ids(heads, mask, num_entity),
             _mask_ids(tails, mask, num_entity),
             cand_ids.reshape(-1)])
        ent_grads = jnp.concatenate([head_grad, tail_grad, cand_grad])
        rel_grad = reg_rp + outs["rel"].reshape(b, -1)

        ent_counts = ent_sqs = r_counts = r_sqs = None
        if opt.num_moment > 0:
            kf = float(k)
            # positives: 1 own touch + K/2 expected stay-side touches
            pos_cnt = jnp.full((2 * b,), 1.0 + kf / 2.0, f32)
            # each pool slot stands for msum * K / M emulated draws
            cand_cnt = jnp.repeat(outs["msum"] * (kf / M), M)
            ent_counts = jnp.concatenate([pos_cnt, cand_cnt])
            h_sqs = reg_hp * reg_hp + outs["head_sqs"].reshape(b, -1)
            t_sqs = reg_tp * reg_tp + outs["tail_sqs"].reshape(b, -1)
            cand_sqs = outs["cand_sqs"].reshape(G * M, -1)
            ent_sqs = jnp.concatenate([h_sqs, t_sqs, cand_sqs])
            r_counts = jnp.full((b,), kf + 1.0, f32)
            r_sqs = reg_rp * reg_rp + outs["rel_sqs"].reshape(b, -1)

        new_entity, new_e_moms = apply_row_updates(
            entity, e_moms, ent_ids, ent_grads, opt, lr,
            entry_counts=ent_counts, entry_sqs=ent_sqs)
        new_relation, new_r_moms = apply_row_updates(
            relation, r_moms, _mask_ids(rels, mask, relation.shape[0]),
            rel_grad, opt, lr, lr_scale=relation_lr_multiplier,
            entry_counts=r_counts, entry_sqs=r_sqs)
        new_state = {"tables": (new_entity, new_relation),
                     "moments": (new_e_moms, new_r_moms)}
        sample_loss = (pos_loss + outs["loss"].reshape(b)) / 2.0
        if mask is None:
            mean_loss = jnp.mean(sample_loss)
        else:
            mean_loss = jnp.sum(sample_loss) / jnp.maximum(jnp.sum(mask),
                                                           1.0)
        return new_state, mean_loss

    return step


def kg_predict(model, entity, relation, heads, tails, rels, margin_or_l3):
    return model.score(entity[heads], entity[tails], relation[rels], margin_or_l3)


# ---------------------------------------------------------------------------
# visualization / LargeVis (single shared coordinate table;
# ref gpu/visualization.cuh)
# ---------------------------------------------------------------------------

def make_vis_train_step(model, opt: Optimizer, num_negative: int,
                        negative_weight: float, trust=None):
    SMOOTH = 0.1  # gpu/visualization.cuh:29

    def step(state, heads, tails, key, lr, *neg_state, mask=None):
        (coord,) = state["tables"]
        (moms,) = state["moments"]
        b = heads.shape[0]
        k = num_negative
        k1, k2 = jax.random.split(key)
        u1 = jax.random.uniform(k1, (b, k))
        u2 = jax.random.uniform(k2, (b, k))
        negs = device_sample(*neg_state, u1, u2)

        h = coord[heads][:, None, :].astype(jnp.float32)     # [B, 1, D]
        t_ids = jnp.concatenate([negs, tails[:, None]], axis=1)
        t = coord[t_ids].astype(jnp.float32)                 # [B, K+1, D]
        x = model.score(h, t)                                # [B, K+1]
        prob = 1.0 / (1.0 + x)
        is_pos = jnp.concatenate(
            [jnp.zeros((b, k), x.dtype), jnp.ones((b, 1), x.dtype)], axis=1)
        gradient = jnp.where(is_pos > 0, 2.0 * prob,
                             -2.0 * prob / (x + SMOOTH))
        weight = jnp.where(is_pos > 0, 1.0, negative_weight).astype(x.dtype)
        if mask is not None:
            gradient = gradient * mask[:, None]
            weight = weight * mask[:, None]
        # prob = 1/(1+x): -log(prob) = log1p(x);
        # -log(1-prob) = log1p(x) - log(x), with an epsilon floor on x only
        # (naive 1-prob+eps gets simplified to x/(1+x) by XLA -> log(0))
        log1px = jnp.log1p(x)
        loss = jnp.where(is_pos > 0,
                         log1px,
                         log1px - jnp.log(x + EPSILON))
        sample_loss = jnp.sum(weight * loss, axis=-1) / (1.0 + k * negative_weight)

        gh, gt = model.backward(h, t, gradient)
        w = weight[..., None]
        wd = opt.weight_decay
        per_touch_h = w * (gh + wd * h)                      # [B, K+1, D]
        reg_h = jnp.sum(per_touch_h, axis=1)
        reg_t = w * (gt + wd * t)
        ids = jnp.concatenate([_mask_ids(heads, mask, coord.shape[0]),
                               _mask_ids(t_ids, mask,
                                         coord.shape[0]).reshape(-1)])
        grads = jnp.concatenate([reg_h, reg_t.reshape(b * (k + 1), -1)])
        counts = sqs = None
        if opt.num_moment > 0:
            counts = jnp.concatenate(
                [jnp.full((b,), k + 1, jnp.float32),
                 jnp.ones((b * (k + 1),), jnp.float32)])
            sqs = jnp.concatenate(
                [jnp.sum(per_touch_h * per_touch_h, axis=1),
                 (reg_t * reg_t).reshape(b * (k + 1), -1)])
        new_coord, new_moms = apply_row_updates(coord, moms, ids, grads, opt,
                                                lr, entry_counts=counts,
                                                entry_sqs=sqs, trust=trust)
        if mask is None:
            mean_loss = jnp.mean(sample_loss)
        else:
            mean_loss = jnp.sum(sample_loss) / jnp.maximum(jnp.sum(mask), 1.0)
        return ({"tables": (new_coord,), "moments": (new_moms,)},
                mean_loss)

    return step


def make_vis_pool_step(opt: Optimizer, num_negative: int,
                       negative_weight: float, pool_size: int = 256,
                       pool_groups: int = 8, trust: float = 0.25):
    """Shared-negative-pool LargeVis step (the make_graph_pool_step
    structure applied to the student-t kernel, gpu/visualization.cuh:38-240).

    Negatives are the dominant row traffic of the classic step
    (B*(K+1) of B*(K+2) row touches at K=5); each of `pool_groups` groups
    draws ONE pool of `pool_size` rows and every sample scores the whole
    pool through pairwise squared distances ||h||^2 + ||P||^2 - 2 h.P —
    an MXU matmul — weighted negative_weight * K / pool_size per pool
    entry so the expected negative gradient mass per sample matches the
    K-draw kernel. Row traffic per batch drops from B*(2+K) entries to
    2B + G*M, and with the dense small-table path every update lands in
    ONE wide scatter (optim._apply_row_updates_dense)."""
    k = num_negative
    M = int(pool_size)
    G = int(pool_groups)
    neg_w = float(negative_weight) * k / M
    SMOOTH = 0.1  # gpu/visualization.cuh:29

    def step(state, heads, tails, key, lr, *neg_state, mask=None):
        (coord,) = state["tables"]
        (moms,) = state["moments"]
        b = heads.shape[0]
        assert b % G == 0, "batch must divide pool_groups"
        bg = b // G
        k1, k2 = jax.random.split(key)
        u1 = jax.random.uniform(k1, (G, M))
        u2 = jax.random.uniform(k2, (G, M))
        pool_ids = device_sample(*neg_state, u1, u2)          # [G, M]

        h = coord[heads].reshape(G, bg, -1).astype(jnp.float32)
        t = coord[tails].reshape(G, bg, -1).astype(jnp.float32)
        P = coord[pool_ids].astype(jnp.float32)               # [G, M, D]

        d = h - t
        x_pos = jnp.sum(d * d, axis=-1)                       # [G, Bg]
        gpos = 2.0 / (1.0 + x_pos)                            # 2 * prob
        hh = jnp.sum(h * h, axis=-1)                          # [G, Bg]
        pp = jnp.sum(P * P, axis=-1)                          # [G, M]
        x = (hh[:, :, None] + pp[:, None, :]
             - 2.0 * jnp.einsum("gbd,gmd->gbm", h, P,
                                preferred_element_type=jnp.float32))
        x = jnp.maximum(x, 0.0)                               # fp cancellation
        prob = 1.0 / (1.0 + x)
        gneg = -2.0 * prob / (x + SMOOTH) * neg_w             # [G, Bg, M]
        if mask is not None:
            m2 = mask.reshape(G, bg)
            gpos = gpos * m2
            gneg = gneg * m2[..., None]
            n_active = jnp.sum(mask)
        else:
            m2 = None
            n_active = jnp.float32(b)

        # loss on the K-draw scale (matches make_vis_train_step)
        log1px = jnp.log1p(x)
        loss_terms = (jnp.log1p(x_pos)
                      + neg_w * jnp.sum(log1px - jnp.log(x + EPSILON),
                                        axis=-1))
        if m2 is not None:
            loss_terms = loss_terms * m2
        mean_loss = (jnp.sum(loss_terms) / jnp.maximum(n_active, 1.0)
                     / (1.0 + k * negative_weight))

        wd = opt.weight_decay
        gneg_sum = jnp.sum(gneg, axis=-1)                     # [G, Bg]
        gnegP = jnp.einsum("gbm,gmd->gbd", gneg, P,
                           preferred_element_type=jnp.float32)
        dh = (gpos[..., None] * d + gneg_sum[..., None] * h - gnegP
              + wd * (1.0 + M * neg_w) * h)
        dt = -gpos[..., None] * d + wd * t
        gnegT_sum = jnp.sum(gneg, axis=1)                     # [G, M]
        gnegTh = jnp.einsum("gbm,gbd->gmd", gneg, h,
                            preferred_element_type=jnp.float32)
        dP = (gnegT_sum[..., None] * P - gnegTh
              + wd * (neg_w * bg) * P)

        counts = sqs = None
        if opt.num_moment > 0:
            # EMULATED K-draw touch counts: moment-rule displacement is
            # lr * count (optim.moment_delta), so counts must reflect the
            # K-draw scheme this step emulates, not the M pool terms it
            # computes with — count = M+1 made Adam move head rows ~lr*257
            # per batch and diverge. h: K+1 draws; t: 1; pool row:
            # Bg*K/M expected draws. Per-draw grad = (M/K) * per-term grad,
            # so summed squares rescale by M/K.
            sq_scale = M / max(k, 1)
            g2 = gneg * gneg
            g2_sum = jnp.sum(g2, axis=-1)
            h_neg_sqs = (g2_sum[..., None] * (h * h)
                         - 2.0 * h * jnp.einsum(
                             "gbm,gmd->gbd", g2, P,
                             preferred_element_type=jnp.float32)
                         + jnp.einsum("gbm,gmd->gbd", g2, P * P,
                                      preferred_element_type=jnp.float32))
            h_sqs = (gpos[..., None] * d) ** 2 + sq_scale * h_neg_sqs
            t_sqs = (gpos[..., None] * d) ** 2
            g2T_sum = jnp.sum(g2, axis=1)                     # [G, M]
            p_sqs = sq_scale * (
                g2T_sum[..., None] * (P * P)
                - 2.0 * P * jnp.einsum("gbm,gbd->gmd", g2, h,
                                       preferred_element_type=jnp.float32)
                + jnp.einsum("gbm,gbd->gmd", g2, h * h,
                             preferred_element_type=jnp.float32))
            p_counts = jnp.full((G, M), bg * k / M, jnp.float32)
            if m2 is not None:
                p_counts = jnp.broadcast_to(
                    jnp.sum(m2, axis=1)[:, None] * (k / M), (G, M))
            counts = jnp.concatenate(
                [jnp.full((b,), k + 1, jnp.float32),
                 jnp.ones((b,), jnp.float32),
                 p_counts.reshape(-1)])
            # squared-gradient sums are nonnegative by construction; the
            # expanded (a-b)^2 forms can go slightly negative in fp
            sqs = jnp.maximum(jnp.concatenate(
                [h_sqs.reshape(b, -1), t_sqs.reshape(b, -1),
                 p_sqs.reshape(G * M, -1)]), 0.0)

        ids = jnp.concatenate(
            [_mask_ids(heads, mask, coord.shape[0]),
             _mask_ids(tails, mask, coord.shape[0]),
             pool_ids.reshape(-1)])
        grads = jnp.concatenate(
            [dh.reshape(b, -1), dt.reshape(b, -1), dP.reshape(G * M, -1)])
        new_coord, new_moms = apply_row_updates(coord, moms, ids, grads, opt,
                                                lr, entry_counts=counts,
                                                entry_sqs=sqs, trust=trust)
        return ({"tables": (new_coord,), "moments": (new_moms,)},
                mean_loss)

    return step


# ---------------------------------------------------------------------------
# sequential micro-stepping: hogwild-like freshness inside one batch
# ---------------------------------------------------------------------------

def make_micro_step(step_fn, num_micro: int, has_relation: bool = False):
    """Split each batch into `num_micro` sequential micro-steps inside the
    jitted step: chunk i's row updates are applied before chunk i+1 is
    scored.

    The reference's hogwild kernels apply every sample at the then-current
    table (gpu/graph.cuh:36-95 runs warp-per-sample read-modify-write), while
    a batched step accumulates all updates at one stale parameter point —
    quality collapses when touches-per-row-per-batch grows large (math
    fixture MRR 0.67 at ~20 touches/row vs 0.13 at ~490, PERF.md). Scanning
    micro-chunks bounds the per-application touch density at
    batch/num_micro samples while preserving the configured batch size for
    LR-schedule and accounting semantics — replacing the round-1
    effective-batch shrink (GRAPHVITE_MAX_TOUCH now caps the micro-chunk)."""
    R = int(num_micro)
    if R <= 1:
        return step_fn

    if has_relation:
        def step(state, heads, tails, rels, key, lr, mask=None):
            bm = heads.shape[0] // R
            xs = [heads.reshape(R, bm), tails.reshape(R, bm),
                  rels.reshape(R, bm), jax.random.split(key, R)]
            if mask is not None:
                xs.append(mask.reshape(R, bm))

            def body(st, x):
                if mask is None:
                    h, t, r, k = x
                    return step_fn(st, h, t, r, k, lr)
                h, t, r, k, m = x
                return step_fn(st, h, t, r, k, lr, mask=m)

            state, losses = jax.lax.scan(body, state, tuple(xs))
            return state, jnp.mean(losses)

        return step

    def step(state, heads, tails, key, lr, *neg_state, mask=None):
        bm = heads.shape[0] // R
        # heads/tails/mask may carry trailing dims (multi-tail / banded
        # walk steps: [B, T] tails, [B, L1] chains, [B, L1, T] masks)
        xs = [heads.reshape((R, bm) + heads.shape[1:]),
              tails.reshape((R, bm) + tails.shape[1:]),
              jax.random.split(key, R)]
        if mask is not None:
            xs.append(mask.reshape((R, bm) + mask.shape[1:]))

        def body(st, x):
            if mask is None:
                h, t, k = x
                return step_fn(st, h, t, k, lr, *neg_state)
            h, t, k, m = x
            return step_fn(st, h, t, k, lr, *neg_state, mask=m)

        state, losses = jax.lax.scan(body, state, tuple(xs))
        return state, jnp.mean(losses)

    return step


# ---------------------------------------------------------------------------
# fused runner: positives sampled ON DEVICE inside the scan — zero per-batch
# host traffic (the TPU-native replacement for the 2-pool CPU pipeline of
# solver.h:417-462; see graphvite_tpu.ops.device_sampler)
# ---------------------------------------------------------------------------

def make_fused_runner(step_fn, sample_fn, opt: Optimizer, ep_groups: int,
                      positive_reuse: int = 1, has_relation: bool = False,
                      bulk_sample_fn=None, state_pack=None,
                      state_unpack=None):
    """Compile a runner that trains `ep_groups * positive_reuse` batches per
    device call, generating positives via `sample_fn(key, *sampler_arrays)`
    inside jit. Each group reuses its positives `positive_reuse` times with
    fresh negatives (the reference's positive_reuse semantics,
    solver.h train loop).

    `num_batch_total` (the LR-schedule denominator, solver.h:607) is a
    traced argument so one compiled executable serves any run length.

    With `bulk_sample_fn` (walk samplers), ALL ep_groups batches of
    positives are generated in one wide call before the training scan —
    the L-step walk scan is fixed-overhead bound at per-batch lane counts,
    so this amortizes it ep_groups-fold (device trace, PERF.md round 4).
    The reference does the same thing one level up: its CPU samplers fill
    the whole episode pool before the GPUs train it (solver.h:417-462).

    Returned callable: run(state, batch_id0, num_batch_total, base_key,
    sampler_arrays, neg_state) -> (state, losses[ep_groups * positive_reuse]).
    """
    R = max(int(positive_reuse), 1)

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=())
    def run(state, batch_id0, num_batch_total, base_key, sampler_arrays,
            neg_state):
        if state_pack is not None:
            # e.g. the banded SGD fused arena: pack the canonical state
            # into the step's layout once per episode (amortized over
            # ep_groups batches), unpack before returning
            state = state_pack(state)
        if bulk_sample_fn is not None:
            # fold value ep_groups cannot collide with any group's key
            # (groups fold g in [0, ep_groups))
            pool = bulk_sample_fn(jax.random.fold_in(base_key, ep_groups),
                                  *sampler_arrays)

        def group(carry, g):
            st = carry
            key = jax.random.fold_in(base_key, g)
            ks, kt = jax.random.split(key)
            if bulk_sample_fn is not None:
                out = tuple(x[g] for x in pool)
            else:
                out = sample_fn(ks, *sampler_arrays)

            def reuse_body(st, r):
                i = g * R + r
                lr = opt.schedule_lr(batch_id0 + i, num_batch_total)
                kr = jax.random.fold_in(kt, r)
                if has_relation:
                    heads, tails, rels, mask = out
                    new_st, loss = step_fn(st, heads, tails, rels, kr, lr,
                                           mask=mask)
                else:
                    heads, tails, mask = out
                    new_st, loss = step_fn(st, heads, tails, kr, lr,
                                           *neg_state, mask=mask)
                return new_st, loss

            if R == 1:
                return reuse_body(st, jnp.int32(0))
            st, losses = jax.lax.scan(
                reuse_body, st, jnp.arange(R, dtype=jnp.int32))
            return st, losses

        state, losses = jax.lax.scan(
            group, state, jnp.arange(ep_groups, dtype=jnp.int32))
        if state_unpack is not None:
            state = state_unpack(state)
        return state, losses.reshape(-1)

    return run


# ---------------------------------------------------------------------------
# scan-over-pool wrapper: one device call trains many batches
# ---------------------------------------------------------------------------

def make_pool_runner(step_fn, num_batch_total: int, opt: Optimizer,
                     has_relation: bool = False, uses_alias_negatives: bool = True):
    """Compile a function running `step_fn` over a pool of stacked batches.

    pool layout: ids [N, B] arrays. batch_id0 is the global batch counter for
    the LR schedule (solver.h:607: lr = init_lr * schedule(batch_id, num_batch)).
    """

    @functools.partial(jax.jit, donate_argnums=(0,),
                       static_argnames=())
    def run_pool(state, pool, batch_id0, base_key, *sampler_state):
        def body(carry, xs):
            st, i = carry
            lr = opt.schedule_lr(batch_id0 + i, num_batch_total)
            key = jax.random.fold_in(base_key, i)
            if has_relation:
                heads, tails, rels = xs
                new_st, loss = step_fn(st, heads, tails, rels, key, lr,
                                       *sampler_state)
            else:
                heads, tails = xs
                new_st, loss = step_fn(st, heads, tails, key, lr,
                                       *sampler_state)
            return (new_st, i + 1), loss

        (state, _), losses = jax.lax.scan(body, (state, jnp.int32(0)), pool)
        return state, losses

    return run_pool
