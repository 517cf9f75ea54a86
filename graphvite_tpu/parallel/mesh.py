"""Sharded training over a device mesh: partitioned tables + ring rotation.

TPU-native redesign of the reference's multi-GPU core (SolverMixin episode
machinery, include/core/solver.h:519-654 + WorkerMixin partition caches
:1349-1495). See package docstring for the mapping.

Layout
------
Vertices are assigned to P partitions by zigzag-dealt degree order
(solver.h:873-887) and renumbered so partition p owns a contiguous local id
range. Tables become [P, Vp, D] arrays sharded over the mesh axis "p" on
dim 0:

    vertex  [P, Vp, D]  stationary: device p always holds head partition p
    context [P, Vp, D]  rotating: at episode e device p holds tail
                        partition (p + e) % P
    (+ moment tables and the per-partition negative alias arrays, which
    travel with their role's shard)

One episode = one shard_map'd device call that scans a pool of batches for
the (head=p, tail=(p+e)%P) block, then ppermutes the tail-role state one
step around the ring.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graphvite_tpu.optim import Optimizer, apply_row_updates
from graphvite_tpu.ops.alias import AliasTable


def make_mesh(n_devices: Optional[int] = None, axis: str = "p") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


class VertexPartition:
    """Zigzag degree-balanced partition of vertices (solver.h:873-887).

    deal index i of the degree-descending order to bucket
    min(i % 2P, 2P - 1 - (i % 2P)) so heavy vertices spread evenly.
    """

    def __init__(self, degrees: np.ndarray, num_partition: int):
        self.num_partition = int(num_partition)
        n = degrees.shape[0]
        order = np.argsort(-np.asarray(degrees), kind="stable")
        twop = 2 * self.num_partition
        slot = np.arange(n) % twop
        bucket = np.minimum(slot, twop - 1 - slot)
        part_of = np.empty(n, dtype=np.int32)
        part_of[order] = bucket.astype(np.int32)
        self.part_of = part_of                     # global id -> partition
        counts = np.bincount(part_of, minlength=self.num_partition)
        self.capacity = int(counts.max()) if n else 0
        # local index within partition, in global-id order
        local = np.zeros(n, dtype=np.int32)
        for p in range(self.num_partition):
            members = np.nonzero(part_of == p)[0]
            local[members] = np.arange(members.size, dtype=np.int32)
        self.local_of = local                      # global id -> local idx
        # partition-major gather map: [P, cap] -> global id (padded with 0)
        self.members = np.zeros((self.num_partition, self.capacity),
                                dtype=np.int64)
        self.valid = np.zeros((self.num_partition, self.capacity),
                              dtype=bool)
        for p in range(self.num_partition):
            m = np.nonzero(part_of == p)[0]
            self.members[p, : m.size] = m
            self.valid[p, : m.size] = True

    def shard_rows(self, table: np.ndarray) -> np.ndarray:
        """[V, D] -> [P, cap, D] partition-major copy (padded rows zero)."""
        out = np.zeros((self.num_partition, self.capacity) + table.shape[1:],
                       dtype=table.dtype)
        out[self.valid] = table[self.members[self.valid]]
        return out

    def unshard_rows(self, sharded: np.ndarray) -> np.ndarray:
        """[P, cap, D] -> [V, D]."""
        v = self.part_of.shape[0]
        out = np.empty((v,) + sharded.shape[2:], dtype=sharded.dtype)
        out[self.members[self.valid]] = sharded[self.valid]
        return out

    def negative_alias_arrays(self, weights: np.ndarray,
                              exponent: float = 0.75):
        """Per-partition alias tables over member weights^exponent
        (solver.h:1264-1278), padded to [P, cap] each."""
        prob = np.zeros((self.num_partition, self.capacity), dtype=np.float32)
        alias = np.zeros((self.num_partition, self.capacity), dtype=np.int32)
        sizes = np.zeros((self.num_partition,), dtype=np.int32)
        w = np.maximum(np.asarray(weights, np.float64), 1e-12) ** exponent
        for p in range(self.num_partition):
            m = self.members[p][self.valid[p]]
            sizes[p] = m.size
            if m.size:
                t = AliasTable(w[m])
                prob[p, : m.size] = t.prob
                alias[p, : m.size] = t.alias
        return prob, alias, sizes


def _local_episode_scan(step_fn, opt: Optimizer, num_batch_total: int):
    """Scan `step_fn` over the local pool of batches (single-device code,
    run per-shard inside shard_map)."""

    def run(state, pool, batch_id0, base_key, neg_prob, neg_alias, neg_size):
        def body(carry, xs):
            st, i = carry
            lr = opt.schedule_lr(batch_id0 + i, num_batch_total)
            key = jax.random.fold_in(base_key, i)
            new_st, loss = step_fn(st, xs, key, lr, neg_prob, neg_alias,
                                   neg_size)
            return (new_st, i + 1), loss

        (state, _), losses = jax.lax.scan(body, (state, jnp.int32(0)), pool)
        return state, losses

    return run


def make_sharded_graph_step(model, opt: Optimizer, num_negative: int,
                            negative_weight: float):
    """Local (per-device) fused train step for one (head, tail) block.

    state tables: vertex/context [cap, D] local shards; ids in the batch are
    LOCAL indices into the resident shards. Mirrors
    graphvite_tpu.ops.steps.make_graph_train_step with partition-local
    negative sampling (alias arrays of the resident tail partition).
    """

    def step(state, xs, key, lr, neg_prob, neg_alias, neg_size):
        heads, tails, wmask = xs                     # [B] local ids + validity
        vertex, context = state["tables"]
        v_moms, c_moms = state["moments"]
        b = heads.shape[0]
        k = num_negative
        k1, k2 = jax.random.split(key)
        u1 = jax.random.uniform(k1, (b, k))
        u2 = jax.random.uniform(k2, (b, k))
        idx = jnp.minimum((u1 * neg_size).astype(jnp.int32), neg_size - 1)
        negs = jnp.where(u2 < neg_prob[idx], idx, neg_alias[idx])

        v = vertex[heads]
        ctx_ids = jnp.concatenate([negs, tails[:, None]], axis=1)
        c = context[ctx_ids]
        logits = model.score(v[:, None, :], c)
        prob = jax.nn.sigmoid(logits)
        label = jnp.concatenate(
            [jnp.zeros((b, k), logits.dtype), jnp.ones((b, 1), logits.dtype)],
            axis=1)
        gradient = (prob - label) * wmask[:, None]
        weight = jnp.where(label > 0, 1.0, negative_weight).astype(logits.dtype)
        loss = jnp.where(label > 0, -jnp.log(prob + 1e-15),
                         -jnp.log(1.0 - prob + 1e-15))
        sample_loss = (jnp.sum(weight * loss, axis=-1)
                       / (1.0 + k * negative_weight)) * wmask

        gv, gc = model.backward(v[:, None, :], c, gradient)
        w = weight[..., None]
        wd = opt.weight_decay
        reg_v = jnp.sum(w * gv, axis=1) + \
            (jnp.sum(weight * wmask[:, None], axis=-1)[:, None] * wd) * v
        reg_c = w * gc + (wd * w * wmask[:, None, None]) * c
        new_vertex, new_v_moms = apply_row_updates(
            vertex, v_moms, heads, reg_v, opt, lr)
        new_context, new_c_moms = apply_row_updates(
            context, c_moms, ctx_ids.reshape(-1),
            reg_c.reshape(b * (k + 1), -1), opt, lr)
        new_state = {"tables": (new_vertex, new_context),
                     "moments": (new_v_moms, new_c_moms)}
        denom = jnp.maximum(jnp.sum(wmask), 1.0)
        return new_state, jnp.sum(sample_loss) / denom

    return step


class ShardedGraphTrainer:
    """Episode-scheduled sharded training of (vertex, context) tables.

    Owns the device-side machinery only; the host side (pool binning by
    (head_part, tail_part) block) is `bin_pool`. The full solver wires a
    sampler into this; `__graft_entry__.dryrun_multichip` drives it with a
    synthetic pool.
    """

    def __init__(self, mesh: Mesh, partition: VertexPartition, dim: int,
                 model, opt: Optimizer, num_negative: int = 1,
                 negative_weight: float = 5.0, num_batch_total: int = 1000,
                 axis: str = "p"):
        self.mesh = mesh
        self.partition = partition
        self.axis = axis
        self.dim = dim
        self.opt = opt
        self.num_partition = partition.num_partition
        assert self.num_partition == mesh.devices.size, \
            "one partition per device"
        step = make_sharded_graph_step(model, opt, num_negative,
                                       negative_weight)
        episode = _local_episode_scan(step, opt, num_batch_total)

        def device_episode(state, pool, batch_id0, keys,
                           neg_prob, neg_alias, neg_size):
            # all arrays here are the LOCAL shard (leading axis 1 stripped)
            local_state = jax.tree_util.tree_map(lambda x: x[0], state)
            new_local, losses = episode(
                local_state, jax.tree_util.tree_map(lambda x: x[0], pool),
                batch_id0, keys[0], neg_prob[0], neg_alias[0], neg_size[0])
            # rotate tail-role state one step around the ring so the next
            # episode trains block (p, (p + e + 1) % P)
            perm = [(i, (i - 1) % self.num_partition)
                    for i in range(self.num_partition)]

            def rot(x):
                return jax.lax.ppermute(x, axis, perm)

            vertex, context = new_local["tables"]
            v_moms, c_moms = new_local["moments"]
            context = rot(context)
            c_moms = jax.tree_util.tree_map(rot, c_moms)
            out_state = {"tables": (vertex, context),
                         "moments": (v_moms, c_moms)}
            out_state = jax.tree_util.tree_map(lambda x: x[None], out_state)
            return out_state, (rot(neg_prob[0])[None], rot(neg_alias[0])[None],
                               rot(neg_size[0][None])), losses[None]

        pspec = P(axis)
        self._episode_fn = jax.jit(
            jax.shard_map(
                device_episode, mesh=mesh,
                in_specs=(pspec, pspec, P(), pspec, pspec, pspec, pspec),
                out_specs=(pspec, (pspec, pspec, pspec), pspec),
                check_vma=False),
            donate_argnums=(0,))

    # -- host-side state construction -------------------------------------
    def init_state(self, vertex_np: np.ndarray, context_np: np.ndarray):
        """Shard [V, D] host tables into [P, cap, D] device arrays."""
        shard = NamedSharding(self.mesh, P(self.axis))
        part = self.partition
        tables = tuple(
            jax.device_put(part.shard_rows(t), shard)
            for t in (vertex_np, context_np))
        moments = tuple(
            tuple(jax.device_put(
                np.zeros((part.num_partition, part.capacity, self.dim),
                         t.dtype), shard)
                  for _ in range(self.opt.num_moment))
            for t in (vertex_np, context_np))
        return {"tables": tables, "moments": moments}

    def init_negative_state(self, vertex_weights: np.ndarray,
                            exponent: float = 0.75):
        prob, alias, sizes = self.partition.negative_alias_arrays(
            vertex_weights, exponent)
        shard = NamedSharding(self.mesh, P(self.axis))
        return (jax.device_put(prob, shard), jax.device_put(alias, shard),
                jax.device_put(sizes, shard))

    def bin_pool(self, heads: np.ndarray, tails: np.ndarray, episode: int,
                 num_batch: int, batch_size: int):
        """Route a host pool of GLOBAL (head, tail) pairs to the block each
        device trains this episode; convert to local ids; pad with masked
        slots. Returns ([P, N, B] heads, tails, mask_f32) host arrays.

        Samples whose (head_part, tail_part) doesn't match any active block
        this episode are dropped (they belong to other episodes; the caller's
        sampler feeds each episode from the matching bins, so in steady state
        nothing is wasted — this mirrors the per-block pools of
        solver.h:417-462).
        """
        part = self.partition
        p_of = part.part_of
        hp = p_of[heads]
        tp = p_of[tails]
        P_ = self.num_partition
        want_tail = (hp + episode) % P_
        match = tp == want_tail
        dev = hp  # device == head partition
        n = num_batch * batch_size
        out_h = np.zeros((P_, num_batch, batch_size), dtype=np.int32)
        out_t = np.zeros((P_, num_batch, batch_size), dtype=np.int32)
        out_m = np.zeros((P_, num_batch, batch_size), dtype=np.float32)
        lh = part.local_of[heads]
        lt = part.local_of[tails]
        for p in range(P_):
            sel = match & (dev == p)
            h = lh[sel][:n]
            t = lt[sel][:n]
            m = h.shape[0]
            out_h[p].reshape(-1)[:m] = h
            out_t[p].reshape(-1)[:m] = t
            out_m[p].reshape(-1)[:m] = 1.0
        return out_h, out_t, out_m

    def run_episode(self, state, pool, neg_state, batch_id0, seed):
        keys = jax.random.split(jax.random.PRNGKey(seed),
                                self.num_partition)
        state, neg_state, losses = self._episode_fn(
            state, pool, jnp.int32(batch_id0), keys, *neg_state)
        return state, neg_state, losses

    def gather_tables(self, state):
        """Bring tables back to host [V, D] in global order.

        NOTE: after `e` episodes the context/tail shards have been rotated
        `e` times; the caller must undo the rotation by running episodes in
        multiples of P (rotation is then identity)."""
        part = self.partition
        v, c = (np.asarray(t) for t in state["tables"])
        return part.unshard_rows(v), part.unshard_rows(c)
