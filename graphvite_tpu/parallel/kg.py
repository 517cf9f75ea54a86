"""Knowledge-graph training over a mesh: replicated (naive-parallel) and
partitioned (tied-weights sharded) modes.

The reference trains KG embeddings with tied entity weights by staging 2P
partitions under a diagonal-butterfly schedule (knowledge_graph.cuh:531-533,
solver.h:532-561); when no partitioned matrix exists it falls back to
`naive_parallel`: full replicas per GPU, independent async training within
an episode, deltas merged at write-back (solver.h:383, 526-529,
naive_sample :975-1009).

`ReplicatedKGTrainer` is that naive-parallel mode reborn as SPMD: tables
replicated across the mesh, each device runs an episode on its own sample
stream, episode table deltas psum-merged over ICI.

`ShardedKGTrainer` is the partitioned mode: entities split into 2W
partitions over W devices (two resident shards per device, the tied-weights
arena), scheduled by a round-robin TOURNAMENT rotation instead of the
reference's diagonal-butterfly order. The circle method guarantees every
partition pair co-resides exactly once per sweep of 2W-1 rounds, and its
seat rotation maps onto a FIXED ppermute pattern (one forward ring on
slot-0 shards, one backward ring on slot-1 shards, one local crossover) —
the same compiled transition every round, which is exactly what XLA wants.
Relations stay replicated with psum-delta write-back (the kGlobal
protocol's scatter_sub accumulation, solver.h:1410-1420); entity updates
are always local to the resident shards, so the schedule-level race-freedom
claim of the paper holds by construction.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graphvite_tpu.optim import Optimizer
from graphvite_tpu.ops.alias import AliasTable


class ReplicatedKGTrainer:
    """Naive-parallel KG training: replicated tables + delta all-reduce."""

    def __init__(self, mesh: Mesh, dim: int, step_fn, opt: Optimizer,
                 batch_size: int = 2048, ep_batches: int = 8, axis: str = "p"):
        self.mesh = mesh
        self.axis = axis
        self.opt = opt
        self.batch_size = int(batch_size)
        self.ep_batches = int(ep_batches)
        n_dev = mesh.devices.size
        B = self.batch_size
        EP = self.ep_batches

        def device_episode(tables, moments, edge_arrays, batch_id0,
                           num_batch_total, keys):
            # tables/edges arrive replicated; moments and keys are sharded
            # per device (leading device axis of size 1 locally)
            key0 = keys[0]
            eprob, ealias, eheads, etails, erels = edge_arrays
            start_tables = tables
            state = {"tables": tables,
                     "moments": jax.tree_util.tree_map(lambda m: m[0],
                                                       moments)}

            def body(carry, i):
                st = carry
                lr = opt.schedule_lr(batch_id0 + i, num_batch_total)
                key = jax.random.fold_in(key0, i)
                ks, kt = jax.random.split(key)
                u = jax.random.uniform(ks, (2, B))
                n_edge = eprob.shape[0]
                idx = jnp.minimum((u[0] * n_edge).astype(jnp.int32),
                                  n_edge - 1)
                eid = jnp.where(u[1] < eprob[idx], idx, ealias[idx])
                h, t, r = eheads[eid], etails[eid], erels[eid]
                new_st, loss = step_fn(st, h, t, r, kt, lr)
                return new_st, loss

            state, losses = jax.lax.scan(
                body, state, jnp.arange(EP, dtype=jnp.int32))
            # write-back: merge each replica's episode delta (the
            # scatter_sub accumulation of solver.h:1410-1420)
            merged = tuple(
                s0 + jax.lax.psum(s - s0, axis)
                for s0, s in zip(start_tables, state["tables"]))
            moments_out = jax.tree_util.tree_map(lambda m: m[None],
                                                 state["moments"])
            return merged, moments_out, losses[None]

        pspec = P(axis)
        self._episode_fn = jax.jit(
            jax.shard_map(
                device_episode, mesh=mesh,
                in_specs=(P(), pspec, P(), P(), P(), pspec),
                out_specs=(P(), pspec, pspec),
                check_vma=False),
            donate_argnums=(0, 1))
        self.n_dev = n_dev

    def init_state(self, tables_np, moment_dtype=np.float32):
        """tables_np: (entity [V,D], relation [R,D]) host arrays. Moments get
        a leading per-device axis (device-local, like per-GPU caches)."""
        rep = NamedSharding(self.mesh, P())
        shard = NamedSharding(self.mesh, P(self.axis))
        tables = tuple(jax.device_put(t, rep) for t in tables_np)
        moments = tuple(
            tuple(jax.device_put(
                np.zeros((self.n_dev,) + t.shape, moment_dtype), shard)
                for _ in range(self.opt.num_moment))
            for t in tables_np)
        return tables, moments

    def init_edges(self, graph):
        """Device-resident positive sampler arrays, replicated (each device
        draws an independent stream)."""
        t = AliasTable(graph.edge_weights)
        arrays = (
            np.asarray(t.prob, np.float32),
            np.asarray(t.alias, np.int32),
            np.asarray(graph.edge_heads, np.int32),
            np.asarray(graph.edge_tails, np.int32),
            np.asarray(graph.edge_relations, np.int32),
        )
        shard = NamedSharding(self.mesh, P())
        return tuple(jax.device_put(a, shard) for a in arrays)

    def run_episode(self, tables, moments, edge_arrays, batch_id0,
                    num_batch_total, seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), self.n_dev)
        return self._episode_fn(tables, moments, edge_arrays,
                                jnp.int32(batch_id0),
                                jnp.int32(num_batch_total), keys)


class ShardedKGTrainer:
    """Tied-weights sharded KG training (see module docstring).

    Layout: entity arena [W, 2, cap, D] sharded on the device axis — device
    d holds two partition shards in slots 0/1; relations [R, D] replicated;
    relation moments per-device (the reference's per-GPU moment caches).

    Seats: with M = 2W - 1 tournament seats plus one fixed seat F,
    device 0 holds (F, seat 0) and device t holds (seat t, seat M-t).
    Rotating every seat i -> i+1 (mod M) realizes all-pairs coverage and
    decomposes into the fixed transition permutation implemented in
    `_transition` (forward ring into slot 0, backward ring into slot 1,
    local slot0->slot1 crossover at device W-1).

    Blocks trained at a round, per device: (p0, p1) and (p1, p0); device 0
    additionally trains the resident diagonals ((p1, p1) every round — each
    partition passes through dev0 slot 1 exactly once per sweep — and
    (F, F) once per sweep), so every (head-part, tail-part) block is
    trained exactly once per sweep like the reference's full P x P
    coverage (solver.h:532-561).
    """

    def __init__(self, mesh: Mesh, partition, dim: int, model, opt: Optimizer,
                 num_negative: int = 8, margin_or_l3: float = 12.0,
                 adversarial_temperature: float = 2.0,
                 relation_lr_multiplier: float = 1.0,
                 batch_size: int = 2048, ep_batches: int = 8,
                 axis: str = "p", negative_pool: str = "global",
                 pool_size: int = None, trust: float = 0.25):
        from graphvite_tpu.ops.steps import (make_kg_train_step,
                                             make_kg_pool_step,
                                             kg_pool_groups)
        from graphvite_tpu.optim import apply_row_updates

        self.mesh = mesh
        self.partition = partition          # VertexPartition over 2W parts
        self.axis = axis
        self.dim = dim
        self.opt = opt
        self.batch_size = int(batch_size)
        self.ep_batches = int(ep_batches)
        W = mesh.devices.size
        assert partition.num_partition == 2 * W, "tied weights need 2W parts"
        self.num_worker = W
        self.M = 2 * W - 1
        cap = partition.capacity
        self.cap = cap
        B = self.batch_size
        EP = self.ep_batches
        K = int(num_negative)
        P2 = 2 * W
        # negative_pool="global": each device contributes Q uniform draws
        # from its resident entities; the pool embeddings are all_gather'd
        # so every sample corrupts against (nearly) the WHOLE entity set,
        # matching single-chip semantics instead of the reference's
        # resident-partitions-only corruption (knowledge_graph.cuh:316-319)
        # which starves small/skewed graphs of negative diversity.
        # Candidate gradients ride back to the rows' owners by a
        # reduce_scatter over pool space — pure-ICI traffic.
        # negative_pool="pooled": the TUNED shared-candidate step family
        # (make_kg_pool_step, incl. the RotatE rotation-isometry fast body)
        # runs unchanged on the local arena — each of G groups draws ONE
        # pool of M arena rows uniformly over the RESIDENT partitions (the
        # reference's resident-only corruption, knowledge_graph.cuh:316-319)
        # and candidate gradients apply locally, zero extra collectives.
        # This is the engine the multichip throughput claims rest on
        # (VERDICT r4 item 1): same kernels as the flat engine, sharded.
        self.negative_pool = negative_pool
        Q = 0
        if negative_pool == "pooled":
            import os as _os
            pool_target = int(_os.environ.get("GRAPHVITE_KG_POOL_TARGET",
                                              512))
            psize = int(pool_size) if pool_size else 0
            self.pool_groups = kg_pool_groups(B, target_group=pool_target)
            M_ = psize if psize else max(2 * K, 64)
            M_ += M_ % 2
            self.pool_size = M_
            step = make_kg_pool_step(
                model, opt, K, margin_or_l3, adversarial_temperature,
                relation_lr_multiplier, pool_size=psize,
                pool_groups=self.pool_groups, trust=trust)
        else:
            if pool_size is None:
                pool_size = max(256, min(4096, -(-B * K // W)))
            Q = int(pool_size)
            self.pool_size = Q
            step = make_kg_train_step(model, opt, K, margin_or_l3,
                                      adversarial_temperature,
                                      relation_lr_multiplier,
                                      external_pool=(negative_pool == "global"))
        sizes_np = np.bincount(partition.part_of, minlength=P2).astype(
            np.int32)
        self._sizes_np = sizes_np

        def device_episode(arena, arena_moms, rel, rel_moms,
                           trip_h, trip_t, trip_r, block_off, sizes,
                           p0s, p1s, diag_f, batch_id0, num_batch_total,
                           keys):
            my = jax.lax.axis_index(axis)
            key0 = keys[0]
            p0 = p0s[0]
            p1 = p1s[0]
            ent = arena[0].reshape(2 * cap, dim)      # flat resident arena
            e_moms = tuple(m[0].reshape(2 * cap, dim) for m in arena_moms)
            r_moms = tuple(m[0] for m in rel_moms)
            rel0 = rel

            # the four resident blocks: (hp, tp) with slot indices
            is_dev0 = my == 0
            want_diag = is_dev0
            want_f = is_dev0 & (diag_f > 0)
            bh = jnp.stack([p0, p1, p1, p0])          # block head partition
            bt_ = jnp.stack([p1, p0, p1, p0])         # block tail partition
            bsh = jnp.array([0, 1, 1, 0], jnp.int32)  # head slot per block
            bst = jnp.array([1, 0, 1, 0], jnp.int32)
            enabled = jnp.stack([
                jnp.ones((), jnp.bool_), p0 != p1,
                want_diag, want_f])
            starts = block_off[bh * P2 + bt_]
            ns = (block_off[bh * P2 + bt_ + 1] - starts) * enabled
            cum = jnp.concatenate([jnp.zeros((1,), ns.dtype),
                                   jnp.cumsum(ns)])
            total = cum[4]
            sz = jnp.stack([sizes[p0], sizes[p1]])    # resident part sizes

            state = {"tables": (ent, rel),
                     "moments": (e_moms, r_moms)}

            def body(carry, i):
                st = carry
                lr = opt.schedule_lr(batch_id0 + i * W, num_batch_total)
                key = jax.random.fold_in(key0, i)
                ks, kn, kt = jax.random.split(key, 3)
                u = jax.random.uniform(ks, (B,))
                r = jnp.minimum((u * jnp.maximum(total, 1)).astype(jnp.int32),
                                jnp.maximum(total - 1, 0))
                blk = (r >= cum[1]).astype(jnp.int32) + \
                      (r >= cum[2]).astype(jnp.int32) + \
                      (r >= cum[3]).astype(jnp.int32)
                idx = starts[blk] + (r - cum[blk])
                sh = bsh[blk]
                st_ = bst[blk]
                h_arena = sh * cap + trip_h[idx]
                t_arena = st_ * cap + trip_t[idx]
                rels = trip_r[idx]
                mask = jnp.broadcast_to((total > 0).astype(jnp.float32), (B,))
                if self.negative_pool == "pooled":
                    # shared-candidate pools over the resident span: uniform
                    # draw over sz[0]+sz[1] live rows -> arena ids; the
                    # pooled step's mixed-side split (first M/2 head-corrupt)
                    # and self-adversarial softmax run as on one chip
                    G_ = self.pool_groups
                    M_ = self.pool_size
                    un = jax.random.uniform(kn, (G_, M_))
                    span_p = jnp.maximum(sz[0] + sz[1], 1)
                    rp = jnp.minimum((un * span_p).astype(jnp.int32),
                                     span_p - 1)
                    slot_p = (rp >= sz[0]).astype(jnp.int32)
                    cand = slot_p * cap + (rp - slot_p * sz[0])
                    return step(st, h_arena, t_arena, rels, kt, lr,
                                mask=mask, negatives=cand)
                if self.negative_pool == "global":
                    # global pool: Q resident draws per device, embeddings
                    # all_gather'd, split-id corruption over 2*W*Q pool ids
                    kp, kn2 = jax.random.split(kn)
                    up = jax.random.uniform(kp, (Q,))
                    span_p = jnp.maximum(sz[0] + sz[1], 1)
                    rp = jnp.minimum((up * span_p).astype(jnp.int32),
                                     span_p - 1)
                    slot_p = (rp >= sz[0]).astype(jnp.int32)
                    pool_arena = slot_p * cap + (rp - slot_p * sz[0])  # [Q]
                    ent_now = st["tables"][0]
                    all_pool = jax.lax.all_gather(
                        ent_now[pool_arena], axis, tiled=True)  # [W*Q, D]
                    WQ = W * Q
                    nid = jax.random.randint(kn2, (B, K), 0, 2 * WQ)
                    ch = nid < WQ
                    idx = jnp.where(ch, nid, nid - WQ)
                    new_st, loss, cand_grad = step(
                        st, h_arena, t_arena, rels, kt, lr, mask=mask,
                        pool=(all_pool, idx, ch))
                    # route candidate grads to the rows' owner devices
                    fidx = idx.reshape(-1)
                    g = cand_grad.reshape(B * K, -1)
                    pool_g = jnp.zeros((WQ, g.shape[1]), g.dtype
                                       ).at[fidx].add(g)
                    act = jnp.broadcast_to(mask[:, None], (B, K)).reshape(-1)
                    pool_cnt = jnp.zeros((WQ,), jnp.float32).at[fidx].add(act)
                    my_g = jax.lax.psum_scatter(
                        pool_g, axis, scatter_dimension=0, tiled=True)
                    my_cnt = jax.lax.psum_scatter(
                        pool_cnt, axis, scatter_dimension=0, tiled=True)
                    my_sq = None
                    if opt.num_moment > 0:
                        pool_sq = jnp.zeros_like(pool_g).at[fidx].add(g * g)
                        my_sq = jax.lax.psum_scatter(
                            pool_sq, axis, scatter_dimension=0, tiled=True)
                    ent2, rel2 = new_st["tables"]
                    e_m2, r_m2 = new_st["moments"]
                    # untouched pool rows route out of range (id 2*cap) so
                    # the update drops them instead of decaying moments
                    upd_ids = jnp.where(my_cnt > 0, pool_arena,
                                        jnp.int32(2 * cap))
                    ent3, e_m3 = apply_row_updates(
                        ent2, e_m2, upd_ids, my_g, opt, lr,
                        entry_counts=my_cnt, entry_sqs=my_sq)
                    return {"tables": (ent3, rel2),
                            "moments": (e_m3, r_m2)}, loss
                # negatives: uniform over resident head+tail partition
                # entities with split-id corruption (the candidate's own
                # partition decides which side it replaces,
                # gpu/knowledge_graph.cuh:65-69 generalized to slots)
                s_h = sz[sh]                           # [B]
                s_t = sz[st_]
                un = jax.random.uniform(kn, (B, K))
                span = jnp.maximum(s_h + s_t, 1)[:, None]
                rr = jnp.minimum((un * span).astype(jnp.int32), span - 1)
                ch = rr < s_h[:, None]
                cand_slot = jnp.where(ch, sh[:, None], st_[:, None])
                cand_local = jnp.where(ch, rr, rr - s_h[:, None])
                cand = cand_slot * cap + cand_local
                new_st, loss = step(st, h_arena, t_arena, rels, kt, lr,
                                    mask=mask, negatives=(cand, ch))
                return new_st, loss

            state, losses = jax.lax.scan(
                body, state, jnp.arange(EP, dtype=jnp.int32))
            ent_f, rel_f = state["tables"]
            e_moms_f, r_moms_f = state["moments"]
            # relations: kGlobal delta accumulation over the mesh. The
            # reference sums all workers' deltas (scatter_sub,
            # solver.h:1410-1420). A/B on the math fixture (RESULTS.md,
            # round 3): at W=8 sum reaches MRR 1.00 vs mean's 0.973 and
            # sum's final loss is lower at W=4 — the default follows the
            # reference (GRAPHVITE_REL_MERGE=mean for the 1/W average).
            import os as _os
            scale = (1.0 / W if _os.environ.get("GRAPHVITE_REL_MERGE",
                                                "sum") == "mean"
                     else 1.0)
            rel_out = rel0 + scale * jax.lax.psum(rel_f - rel0, axis)
            arena_out = ent_f.reshape(2, cap, dim)
            e_moms_out = tuple(m.reshape(2, cap, dim) for m in e_moms_f)
            # tournament seat rotation as a fixed permutation
            arena_out, e_moms_out = self._transition_tree(
                my, arena_out, e_moms_out)
            return (arena_out[None],
                    tuple(m[None] for m in e_moms_out),
                    rel_out,
                    tuple(m[None] for m in r_moms_f),
                    losses[None])

        def _noop(*_):
            pass

        self._transition_tree = self._make_transition(W, cap, dim, axis)
        pspec = P(axis)
        rep = P()
        self._episode_fn = jax.jit(
            jax.shard_map(
                device_episode, mesh=mesh,
                in_specs=(pspec, pspec, rep, pspec,
                          rep, rep, rep, rep, rep,
                          pspec, pspec, rep, rep, rep, pspec),
                out_specs=(pspec, pspec, rep, pspec, pspec),
                check_vma=False),
            donate_argnums=(0, 1, 2, 3))
        self.reset_schedule()

    @staticmethod
    def _make_transition(W, cap, dim, axis):
        """Seat rotation i -> i+1 (mod M): forward ring into slot 0 (dev 0
        feeds its slot 1 into the stream), backward ring into slot 1, local
        slot0 -> slot1 crossover at device W-1."""

        def transition(my, arena, moms):
            if W == 1:
                return arena, moms
            fwd = [(d, d + 1) for d in range(W - 1)]
            bwd = [(d, d - 1) for d in range(1, W)]

            def move(x):
                # x: [2, cap, D] local
                send_fwd = jnp.where(my == 0, x[1], x[0])
                got_fwd = jax.lax.ppermute(send_fwd, axis, fwd)
                got_bwd = jax.lax.ppermute(x[1], axis, bwd)
                new0 = jnp.where(my == 0, x[0], got_fwd)
                new1 = jnp.where(my == W - 1, x[0], got_bwd)
                return jnp.stack([new0, new1])

            return move(arena), tuple(move(m) for m in moms)

        return transition

    # -- host-side schedule bookkeeping ---------------------------------
    def reset_schedule(self):
        W = self.num_worker
        self.fixed = 0                              # partition at dev0 slot0
        self.seats = list(range(1, 2 * W))          # seat i -> partition id
        self.round = 0

    def assignments(self):
        """Current (slot0, slot1) partition ids per device."""
        W, M = self.num_worker, self.M
        out = [(self.fixed, self.seats[0])]
        for t in range(1, W):
            out.append((self.seats[t], self.seats[M - t]))
        return out

    def advance_schedule(self):
        self.seats = [self.seats[-1]] + self.seats[:-1]
        self.round += 1

    # -- host-side state construction -----------------------------------
    def init_state(self, entity_np, relation_np, moments_np=None):
        """`moments_np` ((entity_moms...), (relation_moms...)) canonical
        [V, D] / [R, D] arrays seed the arena / per-device relation moment
        slabs — resume=True continues from the checkpointed moments
        (entity exactly; relations from the merged mean each device
        restarts with)."""
        W, cap = self.num_worker, self.cap
        part = self.partition
        shard = NamedSharding(self.mesh, P(self.axis))
        rep = NamedSharding(self.mesh, P())
        self.reset_schedule()

        def to_arena(x, dtype):
            a = np.zeros((W, 2, cap, x.shape[1]), dtype)
            for d, (pa, pb) in enumerate(self.assignments()):
                for s, p in enumerate((pa, pb)):
                    m = part.members[p][part.valid[p]]
                    a[d, s, : m.size] = x[m]
            return a

        arena = jax.device_put(to_arena(entity_np, entity_np.dtype), shard)
        e_moms, r_moms = (moments_np if moments_np is not None
                          else ((None,) * self.opt.num_moment,) * 2)
        # moments are ALWAYS f32 regardless of table dtype (bf16 EMA loses
        # the update signal at GraphVite's betas; solver.py _allocate)
        arena_moms = tuple(
            jax.device_put(
                np.zeros((W, 2, cap, entity_np.shape[1]), np.float32)
                if m is None else to_arena(np.asarray(m, np.float32),
                                           np.float32), shard)
            for m in e_moms)
        rel = jax.device_put(relation_np, rep)
        rel_moms = tuple(
            jax.device_put(
                np.zeros((W,) + relation_np.shape, np.float32)
                if m is None else np.broadcast_to(
                    np.asarray(m, np.float32),
                    (W,) + relation_np.shape).copy(), shard)
            for m in r_moms)
        return {"arena": arena, "arena_moms": arena_moms,
                "rel": rel, "rel_moms": rel_moms}

    def init_triplets(self, kg):
        """Replicated block-sorted triplet arrays + offsets."""
        part = self.partition
        P2 = part.num_partition
        rep = NamedSharding(self.mesh, P())
        h = np.asarray(kg.edge_heads)
        t = np.asarray(kg.edge_tails)
        r = np.asarray(kg.edge_relations)
        hp = part.part_of[h]
        tp = part.part_of[t]
        block = hp.astype(np.int64) * P2 + tp
        order = np.argsort(block, kind="stable")
        block_off = np.searchsorted(block[order],
                                    np.arange(P2 * P2 + 1)).astype(np.int32)
        arrays = (part.local_of[h][order].astype(np.int32),
                  part.local_of[t][order].astype(np.int32),
                  r[order].astype(np.int32),
                  block_off,
                  self._sizes_np)
        return tuple(jax.device_put(a, rep) for a in arrays)

    def run_episode(self, state, triplets, batch_id0, num_batch_total, seed):
        W = self.num_worker
        shard = NamedSharding(self.mesh, P(self.axis))
        asg = self.assignments()
        p0s = jax.device_put(np.asarray([a for a, _ in asg], np.int32), shard)
        p1s = jax.device_put(np.asarray([b for _, b in asg], np.int32), shard)
        diag_f = jnp.int32(1 if self.round % self.M == 0 else 0)
        keys = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(seed), self.round), W)
        arena, arena_moms, rel, rel_moms, losses = self._episode_fn(
            state["arena"], state["arena_moms"], state["rel"],
            state["rel_moms"], *triplets, p0s, p1s, diag_f,
            jnp.int32(batch_id0), jnp.int32(num_batch_total), keys)
        self.advance_schedule()
        return ({"arena": arena, "arena_moms": arena_moms, "rel": rel,
                 "rel_moms": rel_moms}, losses)

    def gather_entities(self, state):
        """[W, 2, cap, D] arena -> [V, D] host table using the seat map."""
        part = self.partition
        arena = np.asarray(state["arena"])
        out = np.empty((part.part_of.shape[0], arena.shape[-1]),
                       arena.dtype)
        for d, (a, b) in enumerate(self.assignments()):
            for s, p in enumerate((a, b)):
                m = part.members[p][part.valid[p]]
                out[m] = arena[d, s, : m.size]
        return out

    def gather_entity_moments(self, state):
        part = self.partition
        out = []
        for mom in state["arena_moms"]:
            mom = np.asarray(mom)
            o = np.zeros((part.part_of.shape[0], mom.shape[-1]), mom.dtype)
            for d, (a, b) in enumerate(self.assignments()):
                for s, p in enumerate((a, b)):
                    m = part.members[p][part.valid[p]]
                    o[m] = mom[d, s, : m.size]
            out.append(o)
        return tuple(out)
