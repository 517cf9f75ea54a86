"""Block-partitioned single-chip training (the episode grid on one device).

Profiling on v5e shows XLA lowers scatter-add as a sort + merge scan over
the ENTIRE destination table — per-batch cost proportional to V * D, the
dominant term for large vertex tables. GraphVite's partition grid, built to
fit GPU memory, is reborn here to bound that scan: vertices are zigzag-
partitioned into P buckets (solver.h:873-887), tables stored [P, cap, D],
and every batch trains ONE (head_block, tail_block) pair sliced out of the
arena — its scatters touch cap * D instead of V * D.

Sampling stays exact: each batch first draws its block ∝ total block edge
weight (alias over P^2 blocks), then edges within the block ∝ edge weight
(the same two-level factorization as the reference's sample pools,
solver.h:417-462), and negatives come from the resident tail partition's
degree^0.75 alias table (solver.h:1264-1278).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from graphvite_tpu.optim import Optimizer
from graphvite_tpu.ops.alias import AliasTable
from graphvite_tpu.parallel.mesh import VertexPartition


def choose_num_partition(num_vertex: int, dim: int,
                         target_block_bytes: int = 32 << 20) -> int:
    """Smallest power of two P with a block (cap x D f32) under the target."""
    p = 1
    while (num_vertex // p + 1) * dim * 4 > target_block_bytes and p < 256:
        p *= 2
    return p


class FlatBlockTables:
    """All P^2 block edge tables packed flat on one device.

    offsets[b], offsets[b+1] delimit block b = i * P + j; heads/tails are
    partition-LOCAL ids; block_prob/block_alias is the P^2-way alias table
    over total block weights for the first-level draw.
    """

    def __init__(self, graph, partition: VertexPartition):
        P_ = partition.num_partition
        hp = partition.part_of[graph.edge_heads]
        tp = partition.part_of[graph.edge_tails]
        lh = partition.local_of[graph.edge_heads]
        lt = partition.local_of[graph.edge_tails]
        w = np.asarray(graph.edge_weights, np.float64)
        blk = hp.astype(np.int64) * P_ + tp
        order = np.argsort(blk, kind="stable")
        blk, lh, lt, w = blk[order], lh[order], lt[order], w[order]
        counts = np.bincount(blk, minlength=P_ * P_)
        offsets = np.zeros(P_ * P_ + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        prob = np.empty(w.size, np.float32)
        alias = np.empty(w.size, np.int32)
        block_w = np.zeros(P_ * P_, np.float64)
        for b in range(P_ * P_):
            lo, hi = offsets[b], offsets[b + 1]
            if hi > lo:
                t = AliasTable(w[lo:hi])
                prob[lo:hi] = t.prob
                alias[lo:hi] = t.alias
                block_w[b] = w[lo:hi].sum()
        bt = AliasTable(np.maximum(block_w, 1e-300)
                        if block_w.sum() > 0 else np.ones_like(block_w))
        # zero-weight blocks keep ~0 probability mass (1e-300)
        self.prob = prob
        self.alias = alias
        self.heads = lh.astype(np.int32)
        self.tails = lt.astype(np.int32)
        self.offsets = offsets.astype(np.int32)
        self.block_prob = bt.prob.astype(np.float32)
        self.block_alias = bt.alias.astype(np.int32)

    def device_arrays(self):
        return tuple(jnp.asarray(a) for a in
                     (self.prob, self.alias, self.heads, self.tails,
                      self.offsets, self.block_prob, self.block_alias))


def make_block_episode_runner(step_fn, opt: Optimizer, batch_size: int,
                              ep_batches: int):
    """One device call = one episode on ONE (head, tail) block, with the
    block identity entering ONLY through the arrays passed in (the block's
    edge-range scalars and the resident shards). A single compiled
    executable therefore serves every block, and donation updates the
    shards in place — no [P, cap, D] arena and no dynamic_update_slice
    inside the loop (whose whole-arena copies made the round-1 blocked
    runner lose to the flat path, PERF.md). This is the reference's episode
    residency (solver.h:588-654) with HBM shards instead of GPU caches.

    step_fn: make_sharded_graph_step signature —
    step(local, (heads, tails, mask), key, lr, neg_prob, neg_alias,
    neg_size) over partition-LOCAL ids.

    run(local, lo, n_blk, batch_id0, num_batch_total, base_key,
        eprob, ealias, eheads, etails, nprob, nalias, nsize)
      -> (local, losses[ep_batches])
    where (eprob, ealias, eheads, etails) are FlatBlockTables flat arrays
    and [lo, lo + n_blk) the block's edge range.
    """
    B = int(batch_size)
    EP = int(ep_batches)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(local, lo, n_blk, batch_id0, num_batch_total, base_key,
            eprob, ealias, eheads, etails, nprob, nalias, nsize):
        def body(carry, it):
            st = carry
            lr = opt.schedule_lr(batch_id0 + it, num_batch_total)
            key = jax.random.fold_in(base_key, it)
            ks, kt = jax.random.split(key)
            ue = jax.random.uniform(ks, (2, B))
            safe_n = jnp.maximum(n_blk, 1)
            idx = lo + jnp.minimum((ue[0] * safe_n).astype(jnp.int32),
                                   safe_n - 1)
            eid = jnp.where(ue[1] < eprob[idx], idx, lo + ealias[idx])
            h = eheads[eid]
            t = etails[eid]
            mask = jnp.broadcast_to((n_blk > 0).astype(jnp.float32), (B,))
            return step_fn(st, (h, t, mask), kt, lr, nprob, nalias, nsize)

        local, losses = jax.lax.scan(
            body, local, jnp.arange(EP, dtype=jnp.int32))
        return local, losses

    return run


def make_blocked_runner(step_fn, opt: Optimizer, num_partition: int,
                        batch_size: int, ep_batches: int):
    """Episode runner over a [P, cap, D] arena.

    step_fn: the block-local step (make_sharded_graph_step signature:
    step(state, (heads, tails, mask), key, lr, neg_prob, neg_alias,
    neg_size)).

    Returned callable:
    run(arena, batch_id0, num_batch_total, base_key, block_arrays,
        neg_arrays) -> (arena, losses[ep_batches])
      arena: {"tables": (vertex [P,cap,D], context [P,cap,D]),
              "moments": ((...), (...)) same leading layout}
      neg_arrays: (prob [P,cap], alias [P,cap], sizes [P])
    """
    P_ = int(num_partition)
    B = int(batch_size)
    EP = int(ep_batches)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(arena, batch_id0, num_batch_total, base_key, block_arrays,
            neg_arrays):
        (eprob, ealias, eheads, etails, offsets, bprob, balias) = block_arrays
        nprob, nalias, nsizes = neg_arrays

        def body(carry, it):
            ar = carry
            lr = opt.schedule_lr(batch_id0 + it, num_batch_total)
            key = jax.random.fold_in(base_key, it)
            kb, ks, kt = jax.random.split(key, 3)
            # level 1: block ~ total block weight
            u = jax.random.uniform(kb, (2,))
            bidx = jnp.minimum((u[0] * (P_ * P_)).astype(jnp.int32),
                               P_ * P_ - 1)
            blk = jnp.where(u[1] < bprob[bidx], bidx, balias[bidx])
            i = blk // P_
            j = blk % P_
            lo = offsets[blk]
            n_blk = jnp.maximum(offsets[blk + 1] - lo, 0)
            # level 2: edges within the block ~ edge weight
            ue = jax.random.uniform(ks, (2, B))
            safe_n = jnp.maximum(n_blk, 1)
            idx = lo + jnp.minimum((ue[0] * safe_n).astype(jnp.int32),
                                   safe_n - 1)
            eid = jnp.where(ue[1] < eprob[idx], idx, lo + ealias[idx])
            h = eheads[eid]
            t = etails[eid]
            mask = jnp.broadcast_to((n_blk > 0).astype(jnp.float32), (B,))

            vertex, context = ar["tables"]
            v_moms, c_moms = ar["moments"]
            take = lambda x, k: jax.lax.dynamic_index_in_dim(
                x, k, axis=0, keepdims=False)
            local = {
                "tables": (take(vertex, i), take(context, j)),
                "moments": (tuple(take(m, i) for m in v_moms),
                            tuple(take(m, j) for m in c_moms)),
            }
            new_local, loss = step_fn(
                local, (h, t, mask), kt, lr,
                take(nprob, j), take(nalias, j), nsizes[j])

            put = lambda x, v, k: jax.lax.dynamic_update_index_in_dim(
                x, v, k, axis=0)
            nv, nc = new_local["tables"]
            nvm, ncm = new_local["moments"]
            ar = {
                "tables": (put(vertex, nv, i), put(context, nc, j)),
                "moments": (tuple(put(m, v, i) for m, v in zip(v_moms, nvm)),
                            tuple(put(m, v, j) for m, v in zip(c_moms, ncm))),
            }
            return ar, loss

        arena, losses = jax.lax.scan(
            body, arena, jnp.arange(EP, dtype=jnp.int32))
        return arena, losses

    return run
