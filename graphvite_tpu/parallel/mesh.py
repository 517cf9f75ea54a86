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
                              exponent: float = 0.75,
                              padded_uniform: bool = False):
        """Per-partition alias tables over member weights^exponent
        (solver.h:1264-1278), padded to [P, cap] each.

        `padded_uniform=True` builds each table over the FULL cap-length
        padded weight vector (zero weight beyond the partition size), so a
        uniform draw over all cap slots realizes the member distribution —
        the form `device_sample`/the pooled steps consume directly. The
        default form is only correct for draws bounded by `sizes`."""
        prob = np.zeros((self.num_partition, self.capacity), dtype=np.float32)
        alias = np.zeros((self.num_partition, self.capacity), dtype=np.int32)
        sizes = np.zeros((self.num_partition,), dtype=np.int32)
        w = np.maximum(np.asarray(weights, np.float64), 1e-12) ** exponent
        for p in range(self.num_partition):
            m = self.members[p][self.valid[p]]
            sizes[p] = m.size
            if not m.size:
                continue
            if padded_uniform:
                wp = np.zeros((self.capacity,), np.float64)
                wp[: m.size] = w[m]
                t = AliasTable(wp)
                prob[p] = t.prob
                alias[p] = t.alias
            else:
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

    def __init__(self, graph, partition: VertexPartition, seed: int = 7):
        P_ = partition.num_partition
        hp = partition.part_of[graph.edge_heads]
        tp = partition.part_of[graph.edge_tails]
        lh = partition.local_of[graph.edge_heads]
        lt = partition.local_of[graph.edge_tails]
        w = np.asarray(graph.edge_weights, np.float64)
        # block-sort, then SHUFFLE within each block: uniform-weight graphs
        # can then draw a batch as one random contiguous WINDOW (two i32
        # dynamic slices) instead of B alias draws — per-sample alias
        # sampling costs ~4 random scalar gathers per edge (~6.5 ns each
        # on v5e), which dominated the pooled edges engine (PERF.md r5).
        # This is the reference's pseudo-shuffle economics (graph.cuh:
        # 362-365): decorrelate once at build, read sequentially after.
        rng = np.random.default_rng(seed)
        key = hp.astype(np.int64) * P_ + tp
        order = np.argsort(key * (1 << 20)
                           + rng.integers(0, 1 << 20, key.size))
        hp, tp, lh, lt, w = hp[order], tp[order], lh[order], lt[order], w[order]
        self.uniform = bool(w.size == 0 or np.all(w == w[0]))
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
      (BlockEdgeTables, edges pre-bucketed on host) — zero routing; the
      shared-negative POOL step runs on the resident block (the flat
      engine's tuned step family; negative_sharing=False falls back to
      the classic per-draw step).
    * "walks" (DeepWalk / node2vec): the BANDED whole-walk step over
      row-sharded tables with distributed row fetch/update — every device
      generates whole walks over the REPLICATED graph arrays (topology is
      small next to embedding tables), fetches the chain's vertex/context
      rows and the negative-pool rows from their owner shards by
      capacity-bounded all_to_all, runs ops.steps.make_graph_banded_core
      locally, and routes the per-row gradients back to the owners for
      the sparse optimizer update (see _build_banded_episode). This
      replaces the reference's CPU sampler threads + P x P sample pools
      (solver.h:417-462, graph.cuh:376-450) with on-device generation +
      the TPU-embedding-lookup communication pattern, and runs the SAME
      step family as the flat engine (solver.h:588-654 dispatches the
      same fused kernels on every GPU for the same reason).
    """

    def __init__(self, mesh: Mesh, partition: VertexPartition, dim: int,
                 model, opt: Optimizer, num_negative: int = 1,
                 negative_weight: float = 5.0, batch_size: int = 100000,
                 ep_batches: int = 50, axis: str = "p",
                 sampler_mode: str = "edges", walk_cfg: Optional[dict] = None,
                 negative_sharing: bool = True, pool_size: int = 128,
                 trust: float = 0.25):
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
        # the TUNED shared-negative pool step (VERDICT r4 item 1): the same
        # step family the flat engine runs, over the local shards — per-group
        # shared pools drawn from the RESIDENT tail partition via padded
        # alias arrays (solver.h:1264-1278 rebuilds the negative sampler
        # over the resident partition the same way). Classic per-draw step
        # kept as the negative_sharing=False fallback.
        self.negative_sharing = bool(negative_sharing)
        if self.negative_sharing:
            from graphvite_tpu.ops.steps import (make_graph_pool_step,
                                                 graph_pool_groups)
            pool_groups = graph_pool_groups(B)
            step = make_graph_pool_step(
                opt, num_negative, negative_weight, pool_size=int(pool_size),
                pool_groups=pool_groups, trust=trust)
        else:
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
                if self.negative_sharing:
                    # padded-uniform alias arrays: device_sample over all
                    # cap slots realizes the resident member distribution
                    new_st, loss = step(st, h, t, kt, lr, nprob, nalias,
                                        mask=mask)
                else:
                    new_st, loss = step(st, (h, t, mask), kt, lr, nprob,
                                        nalias, nsize)
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
                if getattr(self, "_edges_uniform", False):
                    # uniform weights: one random contiguous window of the
                    # block's pre-shuffled edges — two sequential slices
                    # instead of B random alias/row gathers (pseudo-shuffle
                    # economics, graph.cuh:362-365). Blocks smaller than B
                    # mask the tail slots (their ids belong to neighboring
                    # blocks; weight-0 slots contribute nothing).
                    u = jax.random.uniform(ks, ())
                    span = jnp.maximum(n_block - B, 0)
                    start = lo + (u * (span + 1)).astype(jnp.int32)
                    start = jnp.minimum(start, bheads.shape[0] - B)
                    h = jax.lax.dynamic_slice_in_dim(bheads, start, B)
                    t = jax.lax.dynamic_slice_in_dim(btails, start, B)
                    # mask by actual block membership (the slice may be
                    # clamped into a neighboring block near the array end)
                    pos = start + jnp.arange(B)
                    mask = ((pos >= lo) & (pos < hi)).astype(jnp.float32)
                    return h, t, mask
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
            # the banded distributed-row engine is built lazily in
            # build_sample_state (its fetch capacity depends on the graph's
            # partition degree shares); see _build_banded_episode
            self._episode_fn = None
            self._banded_opt = opt
            self._banded_hyper = (num_negative, negative_weight,
                                  float(trust) if trust else None)
        else:
            raise ValueError(sampler_mode)

    def _build_banded_episode(self, s_max: float):
        """Compile the walks-mode episode: the BANDED whole-walk step
        (ops.steps.make_graph_banded_core — the flat engine's tuned step
        family, VERDICT r4 item 1) over row-sharded tables with
        distributed row fetch/update.

        Design (the TPU-embedding-lookup pattern, not the reference's
        partition staging): vertex AND context tables are row-sharded by
        the same partition; each device generates whole walks over the
        replicated graph, then for each batch
          1. requests the chain's (vertex, context) row pairs and the
             shared-negative-pool rows from their owner shards via one
             capacity-bounded all_to_all (ids), one all_to_all back (rows);
          2. runs the banded core locally on the fetched rows;
          3. routes per-row gradients (+ touch counts/squared sums for
             moment rules) back to the owners, which apply the sparse
             optimizer update on their resident shard.
        The banded step touches ~2 rows per T pairs, so the ICI payload is
        ~(2 fetch + 2 return) x D floats per walk POSITION, not per pair —
        the property that makes walks mode viable over ICI at all (a
        per-pair engine would move TxL1 more bytes). At W=1 the collectives
        are self-permutes and the engine reduces to the flat banded step.

        Per-destination capacity C = N * max(slack/P, 1.3 * s_max) bounds
        the all_to_all buffers; overflow requests are DROPPED with their
        band slots masked (counted + warned past 1%, like the r3 pair
        router). Zigzag partitioning balances degree mass, so expected
        per-owner load is N/P and drops require a >slack x skew."""
        from graphvite_tpu.ops.steps import (make_graph_banded_core,
                                             graph_pool_groups,
                                             walk_shift_fwd)
        from graphvite_tpu.ops.device_sampler import (make_walk_chain_fn,
                                                      emit_walk_banded,
                                                      walk_offsets)
        from graphvite_tpu.ops.alias import device_sample

        cfg = self.walk_cfg
        opt = self._banded_opt
        num_negative, negative_weight, trust = self._banded_hyper
        P_ = self.num_partition
        EP = self.ep_batches
        aug = int(cfg["augmentation_step"])
        Lw = int(cfg["walk_length"])
        L1 = Lw + 1
        bidir = bool(cfg.get("bidir", True))
        offs = walk_offsets(aug, bidir)
        T = len(offs)
        slot_unit = T * L1
        Bw = max(int(cfg.get("batch_walks")
                     or max(self.batch_size // slot_unit, 1)), 1)
        G = graph_pool_groups(Bw, target_group=max(2048 // slot_unit, 1))
        M = int(cfg.get("pool_size", 64))
        core, (k, M, G, T_, neg_w) = make_graph_banded_core(
            opt, num_negative, negative_weight, aug, bidir,
            pool_size=M, pool_groups=G, trust=trust)
        self._banded_shape = dict(Bw=Bw, L1=L1, T=T, G=G, M=M)
        D = self.dim
        Npos = Bw * L1
        N = Npos + G * M
        slack = float(cfg.get("route_slack", 2.0))
        C = int(min(N, max(int(np.ceil(N * max(slack / P_, 1.3 * s_max))),
                           8)))
        self._banded_capacity = C
        chain_fn = make_walk_chain_fn(
            cfg["uniform"], Lw, Bw, biased=cfg.get("biased", False),
            p=cfg.get("p", 1.0), q=cfg.get("q", 1.0),
            bs_iters=cfg.get("bs_iters", 32))
        n_mom = opt.num_moment
        ret_w = 2 * D if n_mom == 0 else 4 * D + 2
        f32 = jnp.float32

        def a2a(x):
            """Route [P, C, ...] chunks to their destination devices; a
            1-device mesh is the identity (XLA does not reliably elide the
            degenerate all_to_all — measured ~1 ms/batch of copies)."""
            if P_ == 1:
                return x
            return jax.lax.all_to_all(x, self.axis, 0, 0, tiled=False)

        def episode(state, walk_arrays, part_of, local_of, neg_prob,
                    neg_alias, batch_id0, num_batch_total, keys):
            local = jax.tree_util.tree_map(lambda x: x[0], state)
            key0 = keys[0]
            if n_mom == 0:
                # SGD fast path: fuse (vertex | context) into one
                # [cap, 2D] arena for the episode — the serve gather and
                # the owner update each become ONE row op instead of two
                # (scatter cost on v5e is per-row-op bound), and the
                # gradient return ships pre-scaled TABLE-dtype deltas
                # (bf16 tables halve the return payload; the flat path
                # rounds each delta to the table dtype at the scatter
                # anyway, so precision is identical). The concat/split is
                # one table pass per EPISODE, amortized over EP batches.
                local = {"vc": jnp.concatenate(local["tables"], axis=-1)}

            def body(carry, i):
                st = carry
                if n_mom == 0:
                    vc = st["vc"]
                    vertex = vc[:, :D]
                    context = vc[:, D:]
                    v_moms = c_moms = ()
                else:
                    vertex, context = st["tables"]
                    v_moms, c_moms = st["moments"]
                cap = vertex.shape[0]
                lr = opt.schedule_lr(batch_id0 + i * P_, num_batch_total)
                key = jax.random.fold_in(key0, i)
                kw, kp = jax.random.split(key)
                chain, valid = chain_fn(kw, *walk_arrays)     # [L1, Bw]
                chainT, pmask = emit_walk_banded(chain, valid, aug, bidir)
                u1, u2 = jax.random.uniform(kp, (2, G, M))
                pool_ids = device_sample(neg_prob, neg_alias, u1, u2)

                # ---- distributed row fetch -------------------------------
                # All staging between the flat request order and the
                # per-destination all_to_all layout is done by ARITHMETIC
                # indexing + row gathers — no [N, 2D] row scatters (each
                # costs ~2x a gather on v5e and they dominated the first
                # cut of this engine: 28.2M vs the flat engine's 42.7M
                # slots/s at W=1).
                ids = jnp.concatenate([chainT.reshape(-1),
                                       pool_ids.reshape(-1)])  # [N] global
                owner = part_of[ids]
                lid = local_of[ids]
                # per-owner slot assignment WITHOUT a sort (TPU sorts cost
                # ~1 ms at this N): slot_of[i] = #{j < i : owner[j] ==
                # owner[i]} via a one-hot exclusive cumsum over the small
                # device axis, then one cheap i32 scatter builds the
                # slot -> request-index map the gathers below invert.
                onehot = (owner[:, None] ==
                          jnp.arange(P_, dtype=owner.dtype)[None, :]
                          ).astype(jnp.int32)                  # [N, P]
                csum = jnp.cumsum(onehot, axis=0)
                cntp = csum[-1]                                # [P]
                slot_of = jnp.take_along_axis(
                    csum, owner[:, None].astype(jnp.int32), axis=1
                )[:, 0] - 1                                    # [N]
                fetched = slot_of < C
                loc = owner * C + jnp.minimum(slot_of, C - 1)  # [N] in [P*C]
                n_drop = jnp.sum(jnp.maximum(cntp - C, 0))
                src2 = jnp.full((P_ * C,), N, jnp.int32).at[
                    jnp.where(fetched, loc, P_ * C)].set(
                        jnp.arange(N, dtype=jnp.int32), mode="drop")
                ok = (src2 < N).reshape(P_, C)
                src2 = jnp.minimum(src2, N - 1).reshape(P_, C)
                reqpay = jnp.stack(
                    [jnp.where(ok, lid[src2], 0),
                     ok.astype(jnp.int32)], axis=-1)           # [P, C, 2]
                got = a2a(reqpay)
                glid = got[..., 0]                             # [P, C]
                gok = got[..., 1] > 0
                # serve both tables' rows in the TABLE dtype (bf16 tables
                # halve the fetch payload over ICI); rows for padding
                # slots are garbage but provably unreferenced (loc only
                # maps fetched requests), so no zeroing pass
                if n_mom == 0:
                    serve = st["vc"][glid]                     # [P, C, 2D]
                else:
                    serve = jnp.concatenate(
                        [vertex[glid], context[glid]], axis=-1)
                rows = a2a(serve)
                flat = jnp.where(fetched[:, None],
                                 rows.reshape(P_ * C, -1)[loc], 0)

                v = flat[:Npos, :D].reshape(Bw, L1, D).astype(f32)
                c = flat[:Npos, D:].reshape(Bw, L1, D).astype(f32)
                Prows = flat[Npos:, D:].reshape(G, M, D).astype(f32)
                fposf = fetched[:Npos].reshape(Bw, L1).astype(f32)
                fpool = fetched[Npos:].reshape(G, M).astype(f32)
                # a pair is trainable only if BOTH endpoint rows arrived
                pm = pmask * fposf[..., None]
                pm = pm * jnp.stack(
                    [walk_shift_fwd(fposf, kk) for kk in offs], axis=-1)

                o = core(v, c, Prows, pm, lr,
                         table_bf16=vertex.dtype == jnp.bfloat16,
                         pool_mask=fpool)

                # ---- route gradients back to the owners ------------------
                loss = (o["loss_sum"] / jnp.maximum(o["n_active"], 1.0)
                        / (1.0 + k * negative_weight))
                stats = jnp.stack([n_drop, jnp.int32(N)])
                okf = gok.reshape(-1)
                ids_o = glid.reshape(-1)
                if n_mom == 0:
                    # SGD fused path: ship delta = lr * (dv | dc) in the
                    # TABLE dtype; the owner applies ONE [.., 2D] scatter
                    # on the fused arena. Dead/unfetched slots carry
                    # exactly-zero grads; padding slots drop by sentinel.
                    ret = jnp.concatenate(
                        [jnp.concatenate(
                            [o["dv"].reshape(Npos, D),
                             o["dc"].reshape(Npos, D)], axis=-1),
                         jnp.concatenate(
                             [jnp.zeros((G * M, D), f32),
                              o["dP"].reshape(G * M, D)], axis=-1)])
                    ret = (lr * ret).astype(st["vc"].dtype)
                    pay = jnp.where(ok[..., None], ret[src2], 0)
                    retg = a2a(pay)                            # [P, C, 2D]
                    upd_ids = jnp.where(okf, ids_o, cap)
                    new_vc = st["vc"].at[upd_ids].add(
                        -retg.reshape(-1, 2 * D), mode="drop")
                    return {"vc": new_vc}, (loss, stats)
                parts = [o["dv"].reshape(Npos, D),
                         o["dc"].reshape(Npos, D),
                         o["v_sqs"], o["c_sqs_main"],
                         o["v_counts"][:, None],
                         o["c_counts_main"][:, None]]
                pool_parts = [jnp.zeros((G * M, D), f32),
                              o["dP"].reshape(G * M, D),
                              jnp.zeros((G * M, D), f32),
                              o["p_sqs"].reshape(G * M, D),
                              jnp.zeros((G * M, 1), f32),
                              o["p_counts"].reshape(G * M, 1)]
                ret = jnp.concatenate(
                    [jnp.concatenate(parts, axis=-1),
                     jnp.concatenate(pool_parts, axis=-1)])    # [N, ret_w]
                # one fused gather into the all_to_all layout (see fetch)
                pay = jnp.where(ok[..., None], ret[src2], 0)
                retg = a2a(pay)                        # [P, C, w]
                dvr = retg[..., :D].reshape(-1, D)
                dcr = retg[..., D:2 * D].reshape(-1, D)
                v_sq = retg[..., 2 * D:3 * D].reshape(-1, D)
                c_sq = retg[..., 3 * D:4 * D].reshape(-1, D)
                v_cnt = retg[..., 4 * D].reshape(-1)
                c_cnt = retg[..., 4 * D + 1].reshape(-1)
                # zero-touch slots must not decay the owner's moments
                v_ids = jnp.where(okf & (v_cnt > 0), ids_o, cap)
                c_ids = jnp.where(okf & (c_cnt > 0), ids_o, cap)
                new_vertex, new_v_moms = apply_row_updates(
                    vertex, v_moms, v_ids, dvr, opt, lr,
                    entry_counts=v_cnt, entry_sqs=v_sq, trust=trust)
                new_context, new_c_moms = apply_row_updates(
                    context, c_moms, c_ids, dcr, opt, lr,
                    entry_counts=c_cnt, entry_sqs=c_sq, trust=trust)
                return ({"tables": (new_vertex, new_context),
                         "moments": (new_v_moms, new_c_moms)},
                        (loss, stats))

            local, (losses, stats) = jax.lax.scan(
                body, local, jnp.arange(EP, dtype=jnp.int32))
            if n_mom == 0:
                local = {"tables": (local["vc"][:, :D], local["vc"][:, D:]),
                         "moments": ((), ())}
            out = jax.tree_util.tree_map(lambda x: x[None], local)
            return out, losses[None], jnp.sum(stats, axis=0)[None]

        pspec = P(self.axis)
        rep = P()
        n_arrays = 9 if cfg.get("biased") else 8
        self._episode_fn = jax.jit(
            jax.shard_map(
                episode, mesh=self.mesh,
                in_specs=(pspec, (rep,) * n_arrays, rep, rep, rep, rep,
                          rep, rep, pspec),
                out_specs=(pspec, pspec, pspec),
                check_vma=False),
            donate_argnums=(0,))

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
        if self.sampler_mode == "walks":
            # banded engine: ONE global degree^exponent alias table,
            # replicated — pool rows are fetched from their owners like
            # chain rows, so negatives keep the flat engine's global
            # distribution (vs the edges engine's resident-partition draw)
            w = np.maximum(np.asarray(vertex_weights, np.float64),
                           1e-12) ** exponent
            t = AliasTable(w)
            rep = NamedSharding(self.mesh, P())
            return (jax.device_put(t.prob.astype(np.float32), rep),
                    jax.device_put(t.alias.astype(np.int32), rep))
        prob, alias, sizes = self.partition.negative_alias_arrays(
            vertex_weights, exponent,
            padded_uniform=self.negative_sharing)
        shard = NamedSharding(self.mesh, P(self.axis))
        return (jax.device_put(prob, shard), jax.device_put(alias, shard),
                jax.device_put(sizes, shard))

    def build_blocks(self, graph):
        tables = BlockEdgeTables(graph, self.partition)
        # window-draw fast path (see BlockEdgeTables): only sound when
        # every nonempty block holds at least one full batch (windows then
        # vary freely; smaller blocks would replay one fixed order every
        # batch of the episode). Set BEFORE the episode traces.
        sizes = np.diff(tables.offsets, axis=1).reshape(-1)
        nonempty = sizes[sizes > 0]
        self._edges_uniform = (tables.uniform and nonempty.size > 0
                               and bool((nonempty >= self.batch_size).all()))
        return tables.device_arrays(self.mesh, self.axis)

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
        # fetch capacity scales with the heaviest partition's degree share
        # (walk visitation is degree-stationary); compile the banded
        # episode now that the share is known
        deg_mass = np.bincount(self.partition.part_of,
                               weights=np.asarray(deg, np.float64),
                               minlength=self.num_partition)
        s_max = float(deg_mass.max() / max(deg_mass.sum(), 1e-12))
        self._build_banded_episode(s_max)
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
            state, losses, stats = self._episode_fn(
                state, walk_arrays, part_of, local_of, *neg_state,
                jnp.int32(batch_id0), jnp.int32(num_batch_total), keys)
            stats = np.asarray(stats).reshape(-1, 2)
            self.pair_drops += int(stats[:, 0].sum())
            self.pair_emitted += int(stats[:, 1].sum())
            if (self.pair_emitted
                    and self.pair_drops > 0.01 * self.pair_emitted
                    and not self._drop_warned):
                from graphvite_tpu.utils.common import logger
                logger.warning(
                    "row-fetch routing dropped %d of %d requests "
                    "(%.1f%%) — hub-skewed partition exceeds the "
                    "all_to_all capacity; raise walk_cfg['route_slack'] "
                    "(GRAPHVITE_WALK_ROUTE_SLACK) above %.1f",
                    self.pair_drops, self.pair_emitted,
                    100.0 * self.pair_drops / self.pair_emitted,
                    float(self.walk_cfg.get("route_slack", 2.0)))
                self._drop_warned = True
        self.rotation += 1
        return state, neg_state, losses

    @property
    def rotating(self):
        """Only the edges engine rotates the context role around the ring;
        the banded walks engine keeps both tables partition-stationary."""
        return self.sampler_mode == "edges"

    def gather_tables(self, state):
        """Bring tables back to host [V, D] in global order, undoing the
        tail-shard rotation (after e episodes device i holds tail partition
        (i + e) % P; the walks engine never rotates)."""
        part = self.partition
        v, c = (np.asarray(t) for t in state["tables"])
        e = self.rotation % self.num_partition if self.rotating else 0
        c = np.roll(c, e, axis=0)
        return part.unshard_rows(v), part.unshard_rows(c)
