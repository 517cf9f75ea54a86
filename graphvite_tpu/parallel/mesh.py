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
from graphvite_tpu.ops.steps import _logistic_terms


def make_mesh(n_devices: Optional[int] = None, axis: str = "p") -> Mesh:
    """1-D device mesh over the partition axis.

    Multi-host: the episode engine is plain shard_map + ppermute/psum, so
    it runs unchanged over a mesh spanning hosts once the JAX distributed
    runtime is up; set GRAPHVITE_COORDINATOR=host:port (plus
    GRAPHVITE_NUM_PROCESSES / GRAPHVITE_PROCESS_ID) before the first
    device query and every process sees the global device list here. The
    ring rotation (ppermute by mesh order) then rides ICI within a slice
    and DCN across hosts, matching SURVEY §5's communication plan."""
    import os
    coord = os.environ.get("GRAPHVITE_COORDINATOR")
    if coord and not getattr(make_mesh, "_dist_initialized", False):
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["GRAPHVITE_NUM_PROCESSES"]),
            process_id=int(os.environ["GRAPHVITE_PROCESS_ID"]))
        make_mesh._dist_initialized = True
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


class BlockEdgeTables:
    """Per-device alias tables over the P x P edge blocks.

    Edges are grouped by (head_partition, tail_partition); device i owns all
    blocks (i, *) — stationary, like the head-role table. Within a device the
    P blocks are packed contiguously with `offsets[i, j]` delimiting block
    (i, j); each block has its own alias table (local indices). At episode e
    device i samples positives from block (i, (i + e) % P) entirely
    on-device — the sample pools of solver.h:417-462 with zero host traffic.
    """

    def __init__(self, graph, partition: VertexPartition):
        P_ = partition.num_partition
        hp = partition.part_of[graph.edge_heads]
        tp = partition.part_of[graph.edge_tails]
        lh = partition.local_of[graph.edge_heads]
        lt = partition.local_of[graph.edge_tails]
        w = np.asarray(graph.edge_weights, np.float64)
        order = np.lexsort((tp, hp))
        hp, tp, lh, lt, w = hp[order], tp[order], lh[order], lt[order], w[order]
        # per-device max packed size (padded)
        counts = np.bincount(hp * P_ + tp, minlength=P_ * P_).reshape(P_, P_)
        per_dev = counts.sum(axis=1)
        cap = int(per_dev.max()) if per_dev.size else 0
        cap = max(cap, 1)
        self.capacity = cap
        prob = np.zeros((P_, cap), np.float32)
        alias = np.zeros((P_, cap), np.int32)
        heads = np.zeros((P_, cap), np.int32)
        tails = np.zeros((P_, cap), np.int32)
        offsets = np.zeros((P_, P_ + 1), np.int32)
        start = np.concatenate([[0], np.cumsum(per_dev)[:-1]])
        for i in range(P_):
            offsets[i, 1:] = np.cumsum(counts[i])
            sl = slice(start[i], start[i] + per_dev[i])
            heads[i, : per_dev[i]] = lh[sl]
            tails[i, : per_dev[i]] = lt[sl]
            for j in range(P_):
                lo, hi = offsets[i, j], offsets[i, j + 1]
                if hi > lo:
                    t = AliasTable(w[sl][lo:hi])
                    prob[i, lo:hi] = t.prob
                    alias[i, lo:hi] = t.alias
        self.prob, self.alias = prob, alias
        self.heads, self.tails = heads, tails
        self.offsets = offsets

    def device_arrays(self, mesh, axis="p"):
        shard = NamedSharding(mesh, P(axis))
        return tuple(jax.device_put(a, shard) for a in
                     (self.prob, self.alias, self.heads, self.tails,
                      self.offsets))



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

        # gathers may hit bf16 tables; all scoring/gradient compute is f32
        # (solver.py _allocate invariant: bf16 loses the update signal at
        # GraphVite's betas — the same rule holds for the sharded step)
        v = vertex[heads].astype(jnp.float32)
        ctx_ids = jnp.concatenate([negs, tails[:, None]], axis=1)
        c = context[ctx_ids].astype(jnp.float32)
        logits = model.score(v[:, None, :], c)
        # shared stable softplus loss/gradient forms (ops/steps.py; the naive
        # -log(1 - sigmoid + eps) form goes inf under XLA simplification)
        gradient, weight, sample_loss = _logistic_terms(
            logits, k, negative_weight, wmask)

        gv, gc = model.backward(v[:, None, :], c, gradient)
        w = weight[..., None]
        wd = opt.weight_decay
        reg_v = jnp.sum(w * gv, axis=1) + \
            (jnp.sum(weight, axis=-1)[:, None] * wd) * v
        reg_c = w * gc + wd * w * c
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




class ReplicatedEdgeTrainer:
    """Naive-parallel training for SMALL shared tables over a mesh —
    the multi-GPU LargeVis mode (visualization.cuh:417-596 runs the same
    SolverMixin machinery; at visualization scale the coordinate table is
    tiny, so the TPU-native translation is the reference's naive_parallel
    (solver.h:383, 526-529): full replicas per device, each training its
    own positive stream, episode deltas psum-merged at write-back).

    step_fn: a (h, t)-style step `(state, heads, tails, key, lr,
    *neg_state, mask=None)` over state {"tables": (table,), "moments":
    ((m...),)} — make_vis_pool_step / make_vis_train_step qualify.
    Moments stay device-local (per-GPU moment caches).
    """

    def __init__(self, mesh: Mesh, step_fn, opt: Optimizer,
                 batch_size: int, ep_batches: int,
                 positive_reuse: int = 1, axis: str = "p"):
        self.mesh = mesh
        self.axis = axis
        self.opt = opt
        self.batch_size = int(batch_size)
        self.ep_batches = int(ep_batches)
        n_dev = mesh.devices.size
        self.n_dev = n_dev
        B = self.batch_size
        EP = self.ep_batches
        R = max(int(positive_reuse), 1)
        self.positive_reuse = R

        def device_episode(tables, moments, edge_arrays, neg_state,
                           batch_id0, num_batch_total, keys):
            key0 = keys[0]
            eprob, ealias, eheads, etails = edge_arrays
            start = tables
            state = {"tables": tables,
                     "moments": jax.tree_util.tree_map(lambda m: m[0],
                                                       moments)}

            def body(carry, i):
                st = carry
                key = jax.random.fold_in(key0, i)
                ks, kt = jax.random.split(key)
                u = jax.random.uniform(ks, (2, B))
                n_edge = eprob.shape[0]
                idx = jnp.minimum((u[0] * n_edge).astype(jnp.int32),
                                  n_edge - 1)
                eid = jnp.where(u[1] < eprob[idx], idx, ealias[idx])
                h, t = eheads[eid], etails[eid]

                def reuse_body(st, r):
                    # each drawn positive batch is reused R times with
                    # fresh negatives (the reference's positive_reuse);
                    # all devices consume batches concurrently, so global
                    # sample progress advances n_dev per local batch
                    lr = opt.schedule_lr(batch_id0 + (i * R + r) * n_dev,
                                         num_batch_total)
                    return step_fn(st, h, t, jax.random.fold_in(kt, r),
                                   lr, *neg_state)

                if R == 1:
                    return reuse_body(st, jnp.int32(0))
                st, losses = jax.lax.scan(
                    reuse_body, st, jnp.arange(R, dtype=jnp.int32))
                return st, jnp.mean(losses)

            state, losses = jax.lax.scan(
                body, state, jnp.arange(EP, dtype=jnp.int32))
            # MEAN delta merge: with full replication EVERY row receives W
            # episode deltas; summing multiplies the effective Adam step by
            # W, which oscillates at LargeVis's lr=0.5 from W=4 (measured:
            # separation 0.3-vs-5.0, divergence at short episodes). The
            # mean keeps single-chip step dynamics while W streams sample
            # W x more edges per wall-second.
            merged = tuple(
                s0 + jax.lax.pmean(s - s0, axis)
                for s0, s in zip(start, state["tables"]))
            moments_out = jax.tree_util.tree_map(lambda m: m[None],
                                                 state["moments"])
            return merged, moments_out, losses[None]

        pspec = P(axis)
        self._episode_fn = jax.jit(
            jax.shard_map(
                device_episode, mesh=mesh,
                in_specs=(P(), pspec, P(), P(), P(), P(), pspec),
                out_specs=(P(), pspec, pspec),
                check_vma=False),
            donate_argnums=(0, 1))

    def init_state(self, tables_np, moments_np=None):
        """tables_np: tuple of [*, D] host arrays (replicated); per-device
        f32 moment slabs (leading device axis). `moments_np` (same
        structure as the solver's canonical state, one [*, D] array per
        moment) seeds every device's slab — resume=True after a mesh run
        continues from the checkpointed moments instead of zeros."""
        rep = NamedSharding(self.mesh, P())
        shard = NamedSharding(self.mesh, P(self.axis))
        tables = tuple(jax.device_put(t, rep) for t in tables_np)
        if moments_np is None:
            moments_np = tuple((None,) * self.opt.num_moment
                               for _ in tables_np)
        moments = tuple(
            tuple(jax.device_put(
                np.zeros((self.n_dev,) + t.shape, np.float32) if m is None
                else np.broadcast_to(
                    np.asarray(m, np.float32),
                    (self.n_dev,) + t.shape).copy(), shard)
                for m in side)
            for t, side in zip(tables_np, moments_np))
        return tables, moments

    def init_edges(self, graph):
        t = AliasTable(graph.edge_weights)
        arrays = (np.asarray(t.prob, np.float32),
                  np.asarray(t.alias, np.int32),
                  np.asarray(graph.edge_heads, np.int32),
                  np.asarray(graph.edge_tails, np.int32))
        rep = NamedSharding(self.mesh, P())
        return tuple(jax.device_put(a, rep) for a in arrays)

    def run_episode(self, tables, moments, edge_arrays, neg_state,
                    batch_id0, num_batch_total, seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), self.n_dev)
        return self._episode_fn(tables, moments, edge_arrays, neg_state,
                                jnp.int32(batch_id0),
                                jnp.int32(num_batch_total), keys)


class ShardedGraphTrainer:
    """Episode-scheduled sharded training, fully device-resident.

    Per device: stationary head-role shard (vertex table + moments);
    rotating tail-role shard (context table + moments + per-partition
    negative alias arrays). One call to `run_episode` scans `ep_batches`
    batches for the resident (head=i, tail=(i+e)%P) block and then rotates
    the tail role one step around the ring via ppermute — the orthogonal
    episode schedule of solver.h:519-575 as static ICI communication.

    Positive sampling per `sampler_mode`:

    * "edges" (LINE / aug=1): per-device block alias tables
      (BlockEdgeTables, edges pre-bucketed on host) — zero routing.
    * "walks" (DeepWalk / node2vec): every device generates random walks
      over the REPLICATED graph arrays (graph topology is small next to
      embedding tables), emits aug-window pairs, routes each pair to the
      device owning its head partition with one all_to_all, then buckets
      the received pool by tail partition; episode e trains batches drawn
      (with replacement) from bucket (i+e)%P. This replaces the reference's
      CPU sampler threads + P x P sample pools (solver.h:417-462,
      graph.cuh:376-450) with on-device generation + ICI routing.
    """

    def __init__(self, mesh: Mesh, partition: VertexPartition, dim: int,
                 model, opt: Optimizer, num_negative: int = 1,
                 negative_weight: float = 5.0, batch_size: int = 100000,
                 ep_batches: int = 50, axis: str = "p",
                 sampler_mode: str = "edges", walk_cfg: Optional[dict] = None):
        self.mesh = mesh
        self.partition = partition
        self.axis = axis
        self.dim = dim
        self.opt = opt
        self.batch_size = int(batch_size)
        self.ep_batches = int(ep_batches)
        self.rotation = 0
        self.sampler_mode = sampler_mode
        self.walk_cfg = dict(walk_cfg or {})
        import os as _os
        if "route_slack" not in self.walk_cfg:
            self.walk_cfg["route_slack"] = float(
                _os.environ.get("GRAPHVITE_WALK_ROUTE_SLACK", 2.0))
        # walk-pair routing drop accounting (see episode_walks)
        self.pair_drops = 0
        self.pair_emitted = 0
        self._drop_warned = False
        self.num_partition = partition.num_partition
        assert self.num_partition == mesh.devices.size, \
            "one partition per device"
        P_ = self.num_partition
        B = self.batch_size
        EP = self.ep_batches
        step = make_sharded_graph_step(model, opt, num_negative,
                                       negative_weight)

        def train_block(local, draw_batch, neg, key0, batch_id0,
                        num_batch_total):
            """Scan EP batches; draw_batch(key, i) -> (h, t, mask) local ids.
            The LR schedule advances by P per batch: all devices train
            concurrently, so global sample progress is P x the per-device
            batch count."""
            nprob, nalias, nsize = neg

            def body(carry, i):
                st = carry
                lr = opt.schedule_lr(batch_id0 + i * P_, num_batch_total)
                key = jax.random.fold_in(key0, i)
                ks, kt = jax.random.split(key)
                h, t, mask = draw_batch(ks, i)
                new_st, loss = step(st, (h, t, mask), kt, lr, nprob, nalias,
                                    nsize)
                return new_st, loss

            return jax.lax.scan(body, local, jnp.arange(EP, dtype=jnp.int32))

        def rotate(local, nprob, nalias, nsize, losses):
            perm = [(i, (i - 1) % P_) for i in range(P_)]

            def rot(x):
                return jax.lax.ppermute(x, self.axis, perm)

            vertex, context = local["tables"]
            v_moms, c_moms = local["moments"]
            context = rot(context)
            c_moms = jax.tree_util.tree_map(rot, c_moms)
            out_state = {"tables": (vertex, context),
                         "moments": (v_moms, c_moms)}
            out_state = jax.tree_util.tree_map(lambda x: x[None], out_state)
            return (out_state,
                    (rot(nprob)[None], rot(nalias)[None], rot(nsize[None])),
                    losses[None])

        def episode_edges(state, blocks, neg_prob, neg_alias, neg_size,
                          episode_idx, batch_id0, num_batch_total, keys):
            # local shards (leading device axis stripped)
            local = jax.tree_util.tree_map(lambda x: x[0], state)
            bprob, balias, bheads, btails, boffsets = (
                jax.tree_util.tree_map(lambda x: x[0], blocks))
            neg = (neg_prob[0], neg_alias[0], neg_size[0])
            key0 = keys[0]
            my = jax.lax.axis_index(self.axis)
            j = (my + episode_idx) % P_
            lo = boffsets[j]
            hi = boffsets[j + 1]
            n_block = jnp.maximum(hi - lo, 0)

            def draw_batch(ks, i):
                u = jax.random.uniform(ks, (2, B))
                safe_n = jnp.maximum(n_block, 1)
                idx = lo + jnp.minimum((u[0] * safe_n).astype(jnp.int32),
                                       safe_n - 1)
                eid = jnp.where(u[1] < bprob[idx], idx, lo + balias[idx])
                mask = jnp.broadcast_to((n_block > 0).astype(jnp.float32),
                                        (B,))
                return bheads[eid], btails[eid], mask

            local, losses = train_block(local, draw_batch, neg, key0,
                                        batch_id0, num_batch_total)
            return rotate(local, *neg, losses)

        def episode_walks(state, walk_arrays, part_of, local_of,
                          neg_prob, neg_alias, neg_size,
                          episode_idx, batch_id0, num_batch_total, keys):
            from graphvite_tpu.ops.device_sampler import (make_walk_chain_fn,
                                                          emit_walk_pairs)

            cfg = self.walk_cfg
            aug = cfg["augmentation_step"]
            Lw = cfg["walk_length"]
            Wp = cfg["pool_walks"]
            ppw = sum(Lw + 1 - k for k in range(1, aug + 1))
            S = Wp * ppw
            # per-destination all_to_all capacity. Walk pairs concentrate on
            # hub heads, so a skewed partition can exceed the default 2x
            # slack; overflow pairs are DROPPED — run_episode counts them
            # (psum'd stats below) and warns past 1%. Raise the slack to
            # eliminate drops on hub-heavy graphs.
            slack = float(cfg.get("route_slack", 2.0))
            C = max(-(-int(slack * S) // P_), 1)
            chain_fn = make_walk_chain_fn(
                cfg["uniform"], Lw, Wp, biased=cfg.get("biased", False),
                p=cfg.get("p", 1.0), q=cfg.get("q", 1.0),
                bs_iters=cfg.get("bs_iters", 32))

            local = jax.tree_util.tree_map(lambda x: x[0], state)
            neg = (neg_prob[0], neg_alias[0], neg_size[0])
            key0 = keys[0]
            my = jax.lax.axis_index(self.axis)
            j = (my + episode_idx) % P_

            # -- build the pair pool: walk, emit, route to owners ------------
            kp, kb = jax.random.split(jax.random.fold_in(key0, EP + 1))
            chain, valid = chain_fn(kp, *walk_arrays)
            h, t, m = emit_walk_pairs(chain, valid, aug)      # [S] global ids
            owner = jnp.where(m, part_of[h], P_)              # invalid -> P
            order = jnp.argsort(owner)
            h, t, owner = h[order], t[order], owner[order]
            off = jnp.searchsorted(owner, jnp.arange(P_ + 1, dtype=owner.dtype))
            # send buffer: for dst p, slots off[p] + 0..C-1 (masked past count)
            slot = jax.lax.broadcasted_iota(jnp.int32, (P_, C), 1)
            src = jnp.minimum(off[:-1, None] + slot, S - 1)
            send_ok = slot < (off[1:, None] - off[:-1, None])
            # drop accounting: pairs beyond a destination's capacity never
            # ride the all_to_all (the reference's sampler emits everything,
            # graph.cuh:376-450 — silent loss here would bias the sample
            # distribution invisibly)
            per_dst = off[1:] - off[:-1]
            n_drop = jnp.sum(jnp.maximum(per_dst - C, 0))
            n_emit = jnp.sum(m.astype(jnp.int32))
            stats = jnp.stack([n_drop, n_emit]).astype(jnp.int32)
            payload = jnp.stack(
                [jnp.where(send_ok, h[src], 0),
                 jnp.where(send_ok, t[src], 0),
                 send_ok.astype(jnp.int32)], axis=-1)         # [P, C, 3]
            recv = jax.lax.all_to_all(payload, self.axis, 0, 0, tiled=False)
            rh = recv[..., 0].reshape(-1)                     # [P*C]
            rt = recv[..., 1].reshape(-1)
            rvalid = recv[..., 2].reshape(-1) > 0
            # -- bucket the received pool by tail partition ------------------
            tp = jnp.where(rvalid, part_of[rt], P_)
            order2 = jnp.argsort(tp)
            pool_h = local_of[rh[order2]]
            pool_t = local_of[rt[order2]]
            tp = tp[order2]
            boff = jnp.searchsorted(tp, jnp.arange(P_ + 1, dtype=tp.dtype))
            lo = boff[j]
            n_bucket = jnp.maximum(boff[j + 1] - lo, 0)

            def draw_batch(ks, i):
                u = jax.random.uniform(ks, (B,))
                safe_n = jnp.maximum(n_bucket, 1)
                idx = lo + jnp.minimum((u * safe_n).astype(jnp.int32),
                                       safe_n - 1)
                mask = jnp.broadcast_to((n_bucket > 0).astype(jnp.float32),
                                        (B,))
                return pool_h[idx], pool_t[idx], mask

            local, losses = train_block(local, draw_batch, neg, key0,
                                        batch_id0, num_batch_total)
            return rotate(local, *neg, losses) + (stats[None],)

        pspec = P(axis)
        rep = P()
        if sampler_mode == "edges":
            self._episode_fn = jax.jit(
                jax.shard_map(
                    episode_edges, mesh=mesh,
                    in_specs=(pspec, pspec, pspec, pspec, pspec,
                              rep, rep, rep, pspec),
                    out_specs=(pspec, (pspec, pspec, pspec), pspec),
                    check_vma=False),
                donate_argnums=(0,))
        elif sampler_mode == "walks":
            n_arrays = 9 if self.walk_cfg.get("biased") else 8
            self._episode_fn = jax.jit(
                jax.shard_map(
                    episode_walks, mesh=mesh,
                    in_specs=(pspec, (rep,) * n_arrays, rep, rep,
                              pspec, pspec, pspec, rep, rep, rep, pspec),
                    out_specs=(pspec, (pspec, pspec, pspec), pspec, pspec),
                    check_vma=False),
                donate_argnums=(0,))
        else:
            raise ValueError(sampler_mode)

    # -- host-side state construction -------------------------------------
    def init_state(self, vertex_np: np.ndarray, context_np: np.ndarray,
                   moments_np=None):
        """Shard [V, D] host tables into [P, cap, D] device arrays.
        `moments_np` ((v_moms...), (c_moms...)) canonical [V, D] arrays
        seed the partition-sharded moment slabs — resume=True continues
        from the exact moments the previous mesh run gathered back."""
        shard = NamedSharding(self.mesh, P(self.axis))
        part = self.partition
        self.rotation = 0
        tables = tuple(
            jax.device_put(part.shard_rows(t), shard)
            for t in (vertex_np, context_np))
        if moments_np is None:
            moments_np = ((None,) * self.opt.num_moment,) * 2
        # moments are ALWAYS f32 regardless of the table dtype: bf16 EMA
        # accumulators lose the update signal at GraphVite's beta values
        # (1 - beta ~ 1e-3 < bf16 epsilon 7.8e-3; solver.py _allocate)
        moments = tuple(
            tuple(jax.device_put(
                np.zeros((part.num_partition, part.capacity, self.dim),
                         np.float32) if m is None
                else part.shard_rows(np.asarray(m, np.float32)), shard)
                  for m in side)
            for side in moments_np)
        return {"tables": tables, "moments": moments}

    def init_negative_state(self, vertex_weights: np.ndarray,
                            exponent: float = 0.75):
        prob, alias, sizes = self.partition.negative_alias_arrays(
            vertex_weights, exponent)
        shard = NamedSharding(self.mesh, P(self.axis))
        return (jax.device_put(prob, shard), jax.device_put(alias, shard),
                jax.device_put(sizes, shard))

    def build_blocks(self, graph):
        return BlockEdgeTables(graph, self.partition).device_arrays(
            self.mesh, self.axis)

    def build_sample_state(self, graph):
        """Device arrays for positive sampling: block alias tables (edges
        mode, sharded) or replicated walk arrays + partition maps (walks)."""
        if self.sampler_mode == "edges":
            return self.build_blocks(graph)
        rep = NamedSharding(self.mesh, P())
        t = AliasTable(graph.edge_weights)
        w = np.asarray(graph.csr_weights, np.float64)
        uniform = bool(w.size == 0 or np.all(w == w[0]))
        self.walk_cfg["uniform"] = uniform
        deg = np.diff(np.asarray(graph.indptr))
        max_deg = int(deg.max()) if deg.size else 1
        self.walk_cfg["bs_iters"] = max(
            int(np.ceil(np.log2(max_deg + 1))) + 1, 1)
        if uniform:
            nbr_prob = np.zeros(0, np.float32)
            nbr_alias = np.zeros(0, np.int32)
        else:
            from graphvite_tpu.ops.alias import PackedAliasTables
            packed = PackedAliasTables(w, graph.indptr)
            nbr_prob = packed.prob.astype(np.float32)
            nbr_alias = packed.alias.astype(np.int32)
        indptr = np.asarray(graph.indptr)
        arrays = [t.prob.astype(np.float32), t.alias.astype(np.int32),
                  np.asarray(graph.edge_heads, np.int32),
                  np.asarray(graph.edge_tails, np.int32),
                  # packed (CSR row start, degree): one row gather per
                  # walk step instead of two scalar indptr gathers
                  np.stack([indptr[:-1], np.diff(indptr)],
                           axis=1).astype(np.int32),
                  np.asarray(graph.indices, np.int32),
                  nbr_prob, nbr_alias]
        if self.walk_cfg.get("biased"):
            order = np.lexsort((graph.indices,
                                np.repeat(np.arange(graph.indptr.size - 1),
                                          np.diff(graph.indptr))))
            arrays.append(np.asarray(graph.indices[order], np.int32))
        walk_arrays = tuple(jax.device_put(a, rep) for a in arrays)
        part_of = jax.device_put(self.partition.part_of.astype(np.int32), rep)
        local_of = jax.device_put(self.partition.local_of.astype(np.int32),
                                  rep)
        return (walk_arrays, part_of, local_of)

    def run_episode(self, state, sample_state, neg_state, batch_id0,
                    num_batch_total, seed):
        keys = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(seed), self.rotation),
            self.num_partition)
        if self.sampler_mode == "edges":
            args = (state, sample_state)
            state, neg_state, losses = self._episode_fn(
                *args, *neg_state,
                jnp.int32(self.rotation % self.num_partition),
                jnp.int32(batch_id0), jnp.int32(num_batch_total), keys)
        else:
            walk_arrays, part_of, local_of = sample_state
            args = (state, walk_arrays, part_of, local_of)
            state, neg_state, losses, stats = self._episode_fn(
                *args, *neg_state,
                jnp.int32(self.rotation % self.num_partition),
                jnp.int32(batch_id0), jnp.int32(num_batch_total), keys)
            stats = np.asarray(stats).reshape(-1, 2)
            self.pair_drops += int(stats[:, 0].sum())
            self.pair_emitted += int(stats[:, 1].sum())
            if (self.pair_emitted
                    and self.pair_drops > 0.01 * self.pair_emitted
                    and not self._drop_warned):
                from graphvite_tpu.utils.common import logger
                logger.warning(
                    "walk-pair routing dropped %d of %d emitted pairs "
                    "(%.1f%%) — hub-skewed partition exceeds the "
                    "all_to_all capacity; raise walk_cfg['route_slack'] "
                    "(GRAPHVITE_WALK_ROUTE_SLACK) above %.1f",
                    self.pair_drops, self.pair_emitted,
                    100.0 * self.pair_drops / self.pair_emitted,
                    float(self.walk_cfg.get("route_slack", 2.0)))
                self._drop_warned = True
        self.rotation += 1
        return state, neg_state, losses

    def gather_tables(self, state):
        """Bring tables back to host [V, D] in global order, undoing the
        tail-shard rotation (after e episodes device i holds tail partition
        (i + e) % P)."""
        part = self.partition
        v, c = (np.asarray(t) for t in state["tables"])
        e = self.rotation % self.num_partition
        c = np.roll(c, e, axis=0)
        return part.unshard_rows(v), part.unshard_rows(c)
