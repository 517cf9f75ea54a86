"""Training solvers: the TPU re-design of the reference SolverMixin
(include/core/solver.h:87-888) and its per-application subclasses
(GraphSolver graph.cuh:586-813, KnowledgeGraphSolver
knowledge_graph.cuh:511-678, VisualizationSolver visualization.cuh:417-596).

Where the reference stages partition blocks between CPU RAM and GPU HBM under
an episode schedule, embedding tables here live HBM-resident for the whole
run (sharded over a device mesh when one is configured); an "episode" is one
device call scanning over a pool of batches while the host sampler prefetches
the next pool on a background thread.
"""
from __future__ import annotations

import math
import os as _os_env

import numpy as np
import jax
import jax.numpy as jnp

from graphvite_tpu.graph import Graph, KnowledgeGraph
from graphvite_tpu.models import GRAPH_MODELS, KG_MODELS, LargeVis
from graphvite_tpu.optim import Optimizer, make_optimizer
from graphvite_tpu.ops.alias import AliasTable, device_alias_arrays
from graphvite_tpu.ops import steps as _steps
from graphvite_tpu.ops import blocked as _blocked
from graphvite_tpu.ops.device_sampler import (DeviceEdgeSampler,
                                              DeviceWalkSampler)
from graphvite_tpu.sampler import (EdgeSampler, RandomWalkSampler,
                                   PrefetchingPool)
from graphvite_tpu.utils.common import auto, logger

EXPECTED_DEGREE = 1600  # graph.cuh:55, used by the augmentation auto-rule


class SolverBase:
    """Shared machinery: build/train/predict plumbing over a state pytree
    {"tables": (...), "moments": (...)}."""

    def __init__(self, dim, float_type=np.float32, index_type=np.int32,
                 device_ids=None, num_sampler_per_worker=auto,
                 gpu_memory_limit=auto, seed=1024, sampler_backend="device",
                 num_worker=1):
        # device_ids are accepted for API parity with the reference;
        # placement is managed by JAX (single chip or mesh).
        # gpu_memory_limit bounds the per-device HBM budget used by the
        # overflow auto-rules (bytes or "4G"-style; auto = query the device,
        # utils.common.hbm_budget_bytes).
        # sampler_backend: "device" generates positives inside the jitted
        # step from device-resident alias tables (zero host traffic);
        # "host" uses the numpy prefetching pipeline (oracle / fallback).
        # num_worker > 1 partitions the embedding tables over a
        # `jax.sharding.Mesh` of that many devices and trains with the
        # episode-scheduled sharded engine (parallel/mesh.py) — the
        # reference's multi-GPU mode (solver.h:519-654) as ICI collectives.
        self.sampler_backend = sampler_backend
        self.gpu_memory_limit = gpu_memory_limit
        if num_worker in (auto, None):
            num_worker = 1
        self.num_worker = int(num_worker)
        if self.num_worker > 1 and len(jax.devices()) < self.num_worker:
            raise ValueError(
                "num_worker=%d but only %d devices visible"
                % (self.num_worker, len(jax.devices())))
        self.dim = int(dim)
        if isinstance(float_type, str):
            from graphvite_tpu.base import _FLOAT_TYPES
            float_type = _FLOAT_TYPES.get(float_type, float_type)
        # bfloat16 tables (ml_dtypes): half the HBM row traffic on the
        # gather/scatter-bound steps; moments and compute stay float32
        self.float_type = np.dtype(float_type)
        self.index_type = np.dtype(index_type)
        self.seed = seed
        self.graph = None
        self.model = None
        self.state = None
        self.optimizer = None
        self.num_negative = 1
        self.batch_size = 100000
        self.episode_size = auto
        self.batch_id = 0
        self.num_batch = 0
        self.effective_batch = self.batch_size
        self._rng = np.random.default_rng(seed)

    # -- per-application hooks ---------------------------------------------
    def get_default_optimizer(self) -> Optimizer:
        raise NotImplementedError

    def get_available_models(self):
        raise NotImplementedError

    def _table_shapes(self):
        raise NotImplementedError

    def init_embeddings(self):
        raise NotImplementedError

    # -- build ---------------------------------------------------------------
    def build(self, graph, optimizer=auto, num_partition=auto, num_negative=1,
              batch_size=100000, episode_size=auto):
        """Allocate embedding/moment tables. `num_partition` is accepted for
        parity; HBM-resident tables need no partition staging."""
        self.graph = graph
        self.optimizer = make_optimizer(optimizer, self.get_default_optimizer())
        self.num_negative = int(num_negative)
        self.batch_size = int(batch_size)
        self.episode_size = episode_size
        self.num_partition = num_partition
        self._allocate()
        return self

    def _allocate(self):
        shapes = self._table_shapes()
        tables = tuple(jnp.zeros(s, dtype=self.float_type.name) for s in shapes)
        # moments are always f32: bf16 EMA accumulators lose the update
        # signal entirely at GraphVite's beta values (1 - beta ~ 1e-3 < bf16
        # epsilon 7.8e-3)
        moments = tuple(self.optimizer.init_moments(s, "float32")
                        for s in shapes)
        self.state = {"tables": tables, "moments": moments}

    # -- training loop -------------------------------------------------------
    def _episode_batches(self):
        if self.episode_size not in (auto, None):
            return max(int(self.episode_size), 1)
        # enough batches per device call to amortize dispatch; ref auto-rule
        # is kSamplePerVertex-based (solver.h:426-436). Independent of the
        # run length so one compiled episode serves every train() call.
        per_vertex = max(175 * self.graph.num_vertex // self.batch_size, 1)
        return int(min(max(per_vertex, 8), 200))

    def _get_sampler(self, key, builder):
        """Memoize device samplers per graph (the alias-table build over all
        edges is the dominant host cost on large graphs)."""
        if not hasattr(self, "_sampler_cache"):
            self._sampler_cache = {}
        full_key = (id(self.graph),) + key
        sampler = self._sampler_cache.get(full_key)
        if sampler is None:
            sampler = builder()
            # keep every sampler of the CURRENT graph (alternating edge and
            # walk training must not rebuild alias tables each switch), but
            # drop stale graphs' device arrays
            self._sampler_cache = {
                k: v for k, v in self._sampler_cache.items()
                if k[0] == id(self.graph)}
            self._sampler_cache[full_key] = sampler
        return sampler

    def _get_runner(self, cache_key, step_fn, sample_fn, ep_groups, R,
                    has_relation, bulk_sample_fn=None, state_pack=None,
                    state_unpack=None):
        """Memoize compiled runners across train() calls: a new closure would
        be a new jit cache entry and recompiling costs ~1 min through the
        remote-compile tunnel."""
        if not hasattr(self, "_runner_cache"):
            self._runner_cache = {}
        runner = self._runner_cache.get(cache_key)
        if runner is None:
            runner = _steps.make_fused_runner(
                step_fn, sample_fn, self.optimizer, ep_groups, R,
                has_relation, bulk_sample_fn=bulk_sample_fn,
                state_pack=state_pack, state_unpack=state_unpack)
            self._runner_cache[cache_key] = runner
        return runner

    def _train_loop_blocked(self, model_cls, num_epoch, num_partition,
                            negative_weight, negative_sample_exponent,
                            log_frequency):
        """Block-partitioned episodes on one chip: every episode trains one
        (head, tail) partition block so scatters touch cap x D instead of
        V x D (XLA's scatter lowering scans the whole destination table —
        77.9 ns/row at V=4M vs 15.8 at 250k, PERF.md). Blocks are scheduled
        on HOST ~ block edge weight and the shards passed by value to ONE
        compiled episode (ops/blocked.py make_block_episode_runner), so
        there is no arena copy — the round-1 runner's loss mode."""
        from graphvite_tpu.parallel.mesh import (VertexPartition,
                                                 make_sharded_graph_step)

        P_ = int(num_partition)
        num_edge = self.graph.num_edge
        self.num_batch = max(int(num_epoch * num_edge // self.batch_size), 1)
        self.effective_batch = self.batch_size
        # many short residencies: every block must be revisited often or its
        # burst gets overwritten (the same catastrophic-interference rule as
        # the mesh loop; ref auto episode_size solver.h:426-436)
        import os as _os4
        min_sweeps = int(_os4.environ.get("GRAPHVITE_MIN_SWEEPS", 16))
        sweep_cap = max(self.num_batch // (P_ * P_ * min_sweeps), 1)
        ep_batches = max(min(self._episode_batches(), sweep_cap,
                             self.num_batch), 1)

        prep_key = (id(self.graph), "blocked", P_,
                    float(negative_sample_exponent))
        if getattr(self, "_blocked_key", None) != prep_key:
            part = VertexPartition(np.asarray(self.graph.degrees), P_)
            tables = _blocked.FlatBlockTables(self.graph, part)
            nprob, nalias, nsizes = part.negative_alias_arrays(
                np.asarray(self.graph.vertex_weights),
                negative_sample_exponent)
            self._blocked_part = part
            self._blocked_tables = tables
            self._blocked_edges = tuple(jnp.asarray(a) for a in (
                tables.prob, tables.alias, tables.heads, tables.tails))
            self._blocked_neg = ([jnp.asarray(nprob[p]) for p in range(P_)],
                                 [jnp.asarray(nalias[p]) for p in range(P_)],
                                 [jnp.int32(nsizes[p]) for p in range(P_)])
            self._blocked_key = prep_key
        part = self._blocked_part
        tables = self._blocked_tables

        step = make_sharded_graph_step(
            model_cls, self.optimizer, self.num_negative,
            float(negative_weight))
        runner_key = ("blocked_ep", self.optimizer, self.num_negative,
                      float(negative_weight), self.batch_size, ep_batches,
                      part.capacity)
        if not hasattr(self, "_runner_cache"):
            self._runner_cache = {}
        runner = self._runner_cache.get(runner_key)
        if runner is None:
            runner = _blocked.make_block_episode_runner(
                step, self.optimizer, self.batch_size, ep_batches)
            self._runner_cache[runner_key] = runner

        # HBM-overflow cache mode (ref solver.h:1349-1495 load/write_back):
        # master shards live in HOST RAM as numpy; each episode stages only
        # the resident (head, tail) shard pair into HBM through a one-slot
        # device cache per side (hit: same partition -> the episode's
        # donated outputs stay resident; miss: write the evicted shard back
        # to the host master, then upload). Tables larger than device
        # memory become trainable on one chip. Auto when the estimated HBM
        # demand exceeds GRAPHVITE_HBM_BYTES; force with
        # GRAPHVITE_HOST_MASTER=1/0.
        hm_env = _os4.environ.get("GRAPHVITE_HOST_MASTER")
        itemsize = np.dtype(self.float_type.name).itemsize
        n_moms = (len(self.state["moments"][0])
                  + len(self.state["moments"][1]))
        demand = (self.graph.num_vertex * self.dim
                  * (2 * itemsize + n_moms * 4)   # f32 moments
                  + tables.heads.nbytes * 4)      # heads/tails/prob/alias
        from graphvite_tpu.utils.common import hbm_budget_bytes
        hbm_budget = hbm_budget_bytes(self.gpu_memory_limit)
        host_master = (hm_env == "1" if hm_env is not None
                       else demand > hbm_budget)
        if host_master:
            logger.info("host-master mode: shards staged per episode (%s)",
                        "forced by GRAPHVITE_HOST_MASTER" if hm_env == "1"
                        else "demand %.1f GB > budget %.1f GB"
                             % (demand / 1e9, hbm_budget / 1e9))

        # per-partition shards held as separate arrays (device-resident by
        # default; host numpy masters in host_master mode)
        def split(t):
            sh = part.shard_rows(np.asarray(t))
            if host_master:
                return [np.ascontiguousarray(sh[p]) for p in range(P_)]
            return [jnp.asarray(sh[p]) for p in range(P_)]

        vparts = split(self.state["tables"][0])
        cparts = split(self.state["tables"][1])
        vmoms = [split(m) for m in self.state["moments"][0]]
        cmoms = [split(m) for m in self.state["moments"][1]]
        nprob, nalias, nsizes = self._blocked_neg

        # one-slot device caches (reference worker keeps one head + one
        # tail partition resident, swap-hit by pointer, solver.h:1435-1495)
        vcache = {}  # pidx -> (table_dev, tuple(moment_dev))
        ccache = {}

        def stage(cache, pidx, parts_np, moms_np):
            if pidx in cache:
                return cache[pidx]
            for old, (ot, oms) in cache.items():  # write back + evict
                parts_np[old] = np.asarray(ot)
                for m_list, om in zip(moms_np, oms):
                    m_list[old] = np.asarray(om)
            cache.clear()
            dev = (jax.device_put(parts_np[pidx]),
                   tuple(jax.device_put(m[pidx]) for m in moms_np))
            cache[pidx] = dev
            return dev

        def flush(cache, parts_np, moms_np):
            for old, (ot, oms) in cache.items():
                parts_np[old] = np.asarray(ot)
                for m_list, om in zip(moms_np, oms):
                    m_list[old] = np.asarray(om)
            cache.clear()

        offsets = tables.offsets
        block_w = np.maximum(
            (offsets[1:] - offsets[:-1]).astype(np.float64), 0)
        # schedule blocks ~ edge mass (the sampler's two-level factorization
        # done on host, one block per episode)
        block_p = block_w / block_w.sum()
        rng = np.random.default_rng(self.seed ^ 0x5eed)
        key = jax.random.PRNGKey(self.seed + self.batch_id)
        num_batch_dev = jnp.int32(self.num_batch)
        logger.info("training %s: %d batches of %d "
                    "(blocked episodes of %d batches, %d^2 blocks)",
                    self.model, self.num_batch, self.batch_size, ep_batches,
                    P_)
        next_log = log_frequency
        losses_acc = []
        while self.batch_id < self.num_batch:
            blk = int(rng.choice(block_p.size, p=block_p))
            i, j = blk // P_, blk % P_
            key, sub = jax.random.split(key)
            if host_master:
                v_dev, vm_dev = stage(vcache, i, vparts, vmoms)
                c_dev, cm_dev = stage(ccache, j, cparts, cmoms)
                local = {"tables": (v_dev, c_dev),
                         "moments": (vm_dev, cm_dev)}
            else:
                local = {"tables": (vparts[i], cparts[j]),
                         "moments": (tuple(m[i] for m in vmoms),
                                     tuple(m[j] for m in cmoms))}
            local, losses = runner(
                local, jnp.int32(offsets[blk]),
                jnp.int32(offsets[blk + 1] - offsets[blk]),
                jnp.int32(self.batch_id), num_batch_dev, sub,
                *self._blocked_edges, nprob[j], nalias[j], nsizes[j])
            if host_master:
                # the donated outputs ARE the resident shard now
                vcache[i] = (local["tables"][0], local["moments"][0])
                ccache[j] = (local["tables"][1], local["moments"][1])
            else:
                vparts[i], cparts[j] = local["tables"]
                for m, nm in zip(vmoms, local["moments"][0]):
                    m[i] = nm
                for m, nm in zip(cmoms, local["moments"][1]):
                    m[j] = nm
            self.batch_id += ep_batches
            losses_acc.append(losses)
            if self.batch_id >= next_log or self.batch_id >= self.num_batch:
                mean_loss = float(jnp.mean(jnp.concatenate(losses_acc)))
                logger.info("Batch id: %d / %d, loss = %.6g",
                            min(self.batch_id, self.num_batch),
                            self.num_batch, mean_loss)
                losses_acc = []
                next_log = self.batch_id + log_frequency

        if host_master:
            flush(vcache, vparts, vmoms)
            flush(ccache, cparts, cmoms)

        def join(parts):
            joined = part.unshard_rows(
                np.stack([np.asarray(p) for p in parts]))
            # overflow mode: the full table does not fit HBM by definition;
            # keep the canonical state host-resident (save/export paths are
            # numpy; predict on an overflow-sized table must chunk)
            return joined if host_master else jnp.asarray(joined)

        self.state = {
            "tables": (join(vparts), join(cparts)),
            "moments": (tuple(join(m) for m in vmoms),
                        tuple(join(m) for m in cmoms)),
        }

    def _batch_plan(self):
        """(effective_batch, micro_batch, num_micro).

        Memory: the step materializes ~8 tensors of [B, K+1, D] f32 (the
        reference streams subsamples warp-by-warp instead), so the batch is
        capped by GRAPHVITE_STEP_BYTES (2 GB default — also the measured
        throughput optimum on v5e: at 8 GB of live intermediates XLA starts
        inserting remat/compress copies and KG steps run ~4x slower).

        Staleness: a batched step accumulates all its row updates at one
        stale parameter point, while the reference's hogwild applies them
        sequentially; quality collapses when touches-per-row-per-batch grows
        large (math fixture, RotatE dim 128: MRR 0.67 at ~20 touches/row vs
        0.13 at ~490). Instead of shrinking the batch (round 1's
        GRAPHVITE_MAX_TOUCH cap), the batch is split into `num_micro`
        SEQUENTIAL micro-steps inside the jitted step (ops.steps.
        make_micro_step): each micro-chunk stays under GRAPHVITE_MAX_TOUCH
        (default 64) touches per row, and its updates land before the next
        chunk is scored — hogwild-like freshness at the full configured
        batch size. Memory still shrinks the batch (it bounds what can be
        live at once; a scan chunk would not reduce peak footprint of the
        enclosing sampler pools), staleness no longer does."""
        import os as _os
        if getattr(self, "_pooled_step", False):
            # shared-negative pools decouple K from per-sample live bytes:
            # the [Bg, M, D] chains live one scan group at a time, and the
            # per-sample residue is ~16 stacked [B, D] output tensors
            live_bytes = 16 * self.dim * 4
        else:
            live_bytes = (self.num_negative + 2) * self.dim * 4 * 8
        budget = float(_os.environ.get("GRAPHVITE_STEP_BYTES", 2e9))
        mem_cap = max(int(budget / max(live_bytes, 1)), 512)
        # round to a multiple of 256 (small batches: 8) so the
        # shared-negative-pool step can split the batch into up to 256
        # pool groups (graph_pool_groups needs the group count to divide
        # the batch; a //8 rounding would cap usable groups at 8)
        eff = min(self.batch_size, mem_cap)
        unit = 256 if eff >= 256 else 8
        if getattr(self, "_sweep_scatter", False) and eff >= 1024:
            # the sweep-scatter path needs batches that are whole sorted
            # stream chunks (1024) — a partial chunk would force the
            # anti-truncation-bias roll, leaving 2 sorted runs
            unit = 1024
        T = int(getattr(self, "_multitail_T", 0) or 0)
        if T > 1:
            # position-major walk batches must split into T tails per head
            unit = unit * T // math.gcd(unit, T)
        s = int(getattr(self, "_walk_slot_unit", 0) or 0)
        if s > 1:
            # banded batches are whole walks of T * (L+1) slots; pool
            # groups divide the WALK count, which must keep a power-of-2
            # factor or graph_pool_groups collapses to G=1 (one shared
            # negative pool for the whole batch — measured quality cliff
            # on the quick-start clone: AUC 0.830 vs 0.874 when a 100k
            # batch produced a prime 1219-walk count)
            mult = 64
            while mult > 1 and s * mult > eff:
                mult //= 2
            unit = s * mult
        eff = max(eff // unit * unit, unit)
        tau = float(_os.environ.get("GRAPHVITE_MAX_TOUCH", 64))
        touch_cap = max(int(tau * self.graph.num_vertex
                            / (self.num_negative + 2)), 512)
        if eff <= touch_cap:
            return eff, eff, 1
        micro = min(-(-eff // touch_cap), 256)
        bm = max(eff // micro // unit * unit, unit)
        return bm * micro, bm, micro

    def _effective_batch(self):
        return self._batch_plan()[0]

    def _train_loop_device(self, step_fn, sampler, neg_state, num_epoch,
                           positive_reuse, log_frequency, has_relation,
                           cache_key=None, state_pack=None,
                           state_unpack=None):
        """Fully-fused loop: positives sampled on device inside the scan."""
        num_edge = self.graph.num_edge
        batch_size, micro_batch, num_micro = self._batch_plan()
        self.effective_batch = batch_size  # what bench/sample accounting must use
        if batch_size < self.batch_size:
            logger.info("batch_size %d -> %d to fit step intermediates",
                        self.batch_size, batch_size)
        if num_micro > 1:
            logger.info("batch of %d applied as %d sequential micro-steps "
                        "of %d (staleness bound)", batch_size, num_micro,
                        micro_batch)
            step_fn = _steps.make_micro_step(step_fn, num_micro, has_relation)
        self.num_batch = max(int(num_epoch * num_edge // batch_size), 1)
        R = max(int(positive_reuse), 1)
        # clamp so short runs don't overshoot by a whole episode
        ep_groups = max(min(self._episode_batches(), self.num_batch) // R, 1)
        sample_fn = sampler.make_sample_fn(batch_size)
        # opt-in: generate the WHOLE episode's walks in one wide call (see
        # make_episode_sample_fn). Measured +0.8% on the DeepWalk bench
        # (14.23M vs 14.11M slots/s) — the walk scan turned out to be
        # gather-ELEMENT bound, not overhead bound, so the amortization
        # buys little; kept opt-in (GRAPHVITE_BULK_WALKS=1) because one
        # long-window run with it showed an unreproduced 3x slowdown.
        bulk_fn = None
        bulk_default = "0"
        # banded batches carry ~165x fewer walk lanes per batch (whole
        # walks, T*(L+1) pair slots each), so the L-step walk scan's
        # fixed overhead is no longer amortized within one batch — bulk
        # episode generation supports the banded layout too; default is
        # set by A/B on the device (pair-major r3: +0.8%, one
        # unreproduced slowdown; banded measurement in PERF.md round 4)
        if (hasattr(sampler, "make_episode_sample_fn") and ep_groups > 1
                and not getattr(sampler, "position_major", False)
                and _os_env.environ.get("GRAPHVITE_BULK_WALKS",
                                        bulk_default) == "1"):
            bulk_fn = sampler.make_episode_sample_fn(batch_size, ep_groups)
        # what the bench's valid-fraction probe introspects
        self._active_sample_fn = sample_fn
        self._active_sampler = sampler
        if cache_key is None:
            runner = _steps.make_fused_runner(
                step_fn, sample_fn, self.optimizer, ep_groups, R,
                has_relation, bulk_sample_fn=bulk_fn,
                state_pack=state_pack, state_unpack=state_unpack)
        else:
            runner = self._get_runner(
                cache_key + (ep_groups, R, has_relation, self.batch_size,
                             num_micro, bulk_fn is not None),
                step_fn, sample_fn, ep_groups, R, has_relation,
                bulk_sample_fn=bulk_fn, state_pack=state_pack,
                state_unpack=state_unpack)
        sampler_arrays = sampler.arrays()
        key = jax.random.PRNGKey(self.seed + self.batch_id)
        logger.info("training %s: %d batches of %d "
                    "(device episodes of %d x %d batches)",
                    self.model, self.num_batch, batch_size, ep_groups, R)
        num_batch_dev = jnp.int32(self.num_batch)
        next_log = log_frequency
        losses_acc = []
        while self.batch_id < self.num_batch:
            key, sub = jax.random.split(key)
            self.state, losses = runner(self.state, jnp.int32(self.batch_id),
                                        num_batch_dev, sub, sampler_arrays,
                                        neg_state)
            self.batch_id += ep_groups * R
            losses_acc.append(losses)
            if self.batch_id >= next_log or self.batch_id >= self.num_batch:
                mean_loss = float(jnp.mean(jnp.concatenate(losses_acc)))
                logger.info("Batch id: %d / %d, loss = %.6g",
                            min(self.batch_id, self.num_batch),
                            self.num_batch, mean_loss)
                losses_acc = []
                next_log = self.batch_id + log_frequency
        jax.block_until_ready(self.state["tables"])

    def _train_loop(self, step_fn, sampler, has_relation, sampler_state,
                    num_epoch, positive_reuse, log_frequency):
        num_edge = self.graph.num_edge
        self.num_batch = int(num_epoch * num_edge // self.batch_size)
        if self.num_batch == 0:
            self.num_batch = 1
        self.effective_batch = self.batch_size
        ep_batches = self._episode_batches()
        pool_positives = ep_batches * self.batch_size
        runner = _steps.make_pool_runner(step_fn, self.num_batch,
                                         self.optimizer, has_relation)
        prefetch = PrefetchingPool(sampler, pool_positives)
        key = jax.random.PRNGKey(self.seed + self.batch_id)
        logger.info("training %s: %d batches of %d (episodes of %d batches)",
                    self.model, self.num_batch, self.batch_size, ep_batches)
        try:
            losses_acc = []
            next_log = log_frequency
            while self.batch_id < self.num_batch:
                pool = prefetch.next()
                arrays = [jnp.asarray(a.reshape(ep_batches, self.batch_size))
                          for a in pool]
                if positive_reuse > 1:
                    arrays = [jnp.repeat(a, positive_reuse, axis=0)
                              for a in arrays]
                key, sub = jax.random.split(key)
                self.state, losses = runner(self.state, tuple(arrays),
                                            jnp.int32(self.batch_id), sub,
                                            *sampler_state)
                n_run = ep_batches * positive_reuse
                self.batch_id += n_run
                losses_acc.append(losses)
                if self.batch_id >= next_log or self.batch_id >= self.num_batch:
                    mean_loss = float(jnp.mean(jnp.concatenate(losses_acc)))
                    logger.info("Batch id: %d / %d, loss = %.6g",
                                min(self.batch_id, self.num_batch),
                                self.num_batch, mean_loss)
                    losses_acc = []
                    next_log = self.batch_id + log_frequency
        finally:
            prefetch.close()
        # block until the device state is materialized
        jax.block_until_ready(self.state["tables"])

    # -- persistence ---------------------------------------------------------
    def table(self, i):
        """Host view of a table, always float32 (bf16 device tables are
        widened so downstream eval/save paths stay dtype-agnostic)."""
        t = np.asarray(self.state["tables"][i])
        return t.astype(np.float32) if t.dtype != np.float32 else t

    def save_checkpoint(self, file_name):
        """Mid-training checkpoint: tables + optimizer moments + batch
        counter (the reference can only resume from whole-table snapshots,
        solver.h:606-611; this preserves moment state too)."""
        import pickle

        state_np = jax.tree_util.tree_map(np.asarray, self.state)
        with open(file_name, "wb") as f:
            pickle.dump({"state": state_np, "batch_id": self.batch_id,
                         "num_batch": self.num_batch, "model": self.model,
                         "optimizer": self.optimizer}, f,
                        protocol=pickle.HIGHEST_PROTOCOL)
        logger.info("checkpoint saved to %s (batch %d)", file_name,
                    self.batch_id)

    def load_checkpoint(self, file_name):
        import pickle

        with open(file_name, "rb") as f:
            ckpt = pickle.load(f)
        self.state = jax.tree_util.tree_map(jnp.asarray, ckpt["state"])
        self.batch_id = ckpt["batch_id"]
        self.num_batch = ckpt["num_batch"]
        self.model = ckpt["model"]
        self.optimizer = ckpt["optimizer"]
        logger.info("checkpoint loaded from %s (batch %d)", file_name,
                    self.batch_id)
        return self

    def clear(self):
        self.state = None

    def __repr__(self):
        return "%s<dim=%d, %s>" % (type(self).__name__, self.dim,
                                   self.float_type.name)


class GraphSolver(SolverBase):
    """Node-embedding solver (ref graph.cuh:586-813)."""

    def get_default_optimizer(self):
        # ref graph.cuh:634-636
        return Optimizer(type="SGD", lr=0.025, weight_decay=5e-3, schedule="linear")

    def get_available_models(self):
        return set(GRAPH_MODELS)

    def _table_shapes(self):
        v = self.graph.num_vertex
        return ((v, self.dim), (v, self.dim))

    def init_embeddings(self):
        """vertex ~ U(-0.5/dim, 0.5/dim), context = 0 (graph.cuh:724-731).
        Generated on device — a host init would upload the whole table."""
        v = self.graph.num_vertex
        key = jax.random.PRNGKey(int(self._rng.integers(2**31)))
        vertex = jax.random.uniform(
            key, (v, self.dim), minval=-0.5 / self.dim,
            maxval=0.5 / self.dim, dtype=jnp.float32).astype(
                self.float_type.name)
        tables = (vertex,
                  jnp.zeros((v, self.dim), dtype=self.float_type.name))
        moments = tuple(self.optimizer.init_moments((v, self.dim), "float32")
                        for _ in range(2))
        self.state = {"tables": tables, "moments": moments}

    @property
    def vertex_embeddings(self):
        return self.table(0)

    @property
    def context_embeddings(self):
        return self.table(1)

    def _train_loop_mesh(self, model_name, num_epoch, augmentation_step,
                         random_walk_length, p, q, negative_weight,
                         negative_sample_exponent, log_frequency):
        """Multichip episode engine: head-partitioned vertex shards,
        ring-rotating context shards, on-device block/walk sampling
        (parallel/mesh.py; the product path for num_worker > 1)."""
        from graphvite_tpu.parallel.mesh import (VertexPartition,
                                                 ShardedGraphTrainer,
                                                 make_mesh)

        P_ = self.num_worker
        # per-device tables hold ~V/P rows: the staleness touch cap scales
        # with the resident shard, while P devices train concurrently
        import os as _os
        walks = int(augmentation_step) > 1
        # the mesh engines run the TUNED step families (VERDICT r4 item 1):
        # edges -> shared-negative pools from the resident tail partition;
        # walks -> the banded whole-walk step with distributed row
        # fetch/update (parallel/mesh.py). GRAPHVITE_NEG_SHARING=0 falls
        # the edges engine back to the classic per-draw step; the walks
        # engine is banded-only.
        negative_sharing = _os.environ.get("GRAPHVITE_NEG_SHARING",
                                           "1") != "0" or walks
        self._pooled_step = negative_sharing
        budget = float(_os.environ.get("GRAPHVITE_STEP_BYTES", 2e9))
        live_bytes = (16 * self.dim * 4 if negative_sharing
                      else (self.num_negative + 2) * self.dim * 4 * 8)
        mem_cap = max(int(budget / max(live_bytes, 1)), 512)
        tau = float(_os.environ.get("GRAPHVITE_MAX_TOUCH", 64))
        cap_rows = max(self.graph.num_vertex // P_, 1)
        touch_cap = max(int(tau * cap_rows / (self.num_negative + 2)), 512)
        batch_size = min(self.batch_size, mem_cap, touch_cap)
        pool_size = int(_os.environ.get("GRAPHVITE_POOL_SIZE",
                                        64 if walks else 128))
        trust = float(_os.environ.get("GRAPHVITE_TRUST", 0.25)) or None
        if walks:
            bidir = (bool(self.graph.as_undirected)
                     and _os.environ.get("GRAPHVITE_WALK_BIDIR",
                                         "1") != "0")
            T = int(augmentation_step) * (2 if bidir else 1)
            slot_unit = T * (int(random_walk_length) + 1)
            mult = 64
            while mult > 1 and slot_unit * mult > batch_size:
                mult //= 2
            unit = slot_unit * mult
        else:
            bidir = False
            unit = 256 if batch_size >= 256 else 8
        batch_size = max(batch_size // unit * unit, unit)
        if batch_size < self.batch_size:
            logger.info("batch_size %d -> %d per device (mesh of %d)",
                        self.batch_size, batch_size, P_)
        self.effective_batch = batch_size
        num_edge = self.graph.num_edge
        self.num_batch = max(int(num_epoch * num_edge // batch_size), 1)
        # edges engine: cap the episode length so the ring completes many
        # full sweeps — one long residency per block trains it in a single
        # burst that later episodes overwrite (catastrophic interference;
        # the reference's small auto episode_size has the same effect,
        # solver.h:426-436). The banded walks engine has no block
        # residency (any batch touches any row), so only the run length
        # caps it.
        import os as _os2
        min_sweeps = int(_os2.environ.get("GRAPHVITE_MIN_SWEEPS", 16))
        if walks:
            ep_batches = max(min(self._episode_batches(),
                                 max(self.num_batch // P_, 1)), 1)
        else:
            sweep_cap = max(self.num_batch // (P_ * P_ * min_sweeps), 1)
            ep_batches = max(min(self._episode_batches(), sweep_cap,
                                 max(self.num_batch // P_, 1)), 1)

        key = (id(self.graph), "mesh", model_name, self.optimizer,
               self.num_negative, float(negative_weight), P_, batch_size,
               ep_batches, int(augmentation_step), int(random_walk_length),
               float(p), float(q), float(negative_sample_exponent),
               negative_sharing, pool_size, bidir, trust,
               _os.environ.get("GRAPHVITE_WALK_ROUTE_SLACK", ""),
               _os.environ.get("GRAPHVITE_BF16_BAND", ""))
        if getattr(self, "_mesh_key", None) != key:
            part = VertexPartition(np.asarray(self.graph.degrees), P_)
            mesh = make_mesh(P_)
            if walks:
                walk_cfg = dict(
                    augmentation_step=int(augmentation_step),
                    walk_length=int(random_walk_length),
                    batch_walks=max(batch_size // slot_unit, 1),
                    bidir=bidir, pool_size=pool_size,
                    biased=(model_name == "node2vec"), p=float(p),
                    q=float(q))
                trainer = ShardedGraphTrainer(
                    mesh, part, self.dim, GRAPH_MODELS[model_name],
                    self.optimizer, self.num_negative,
                    float(negative_weight), batch_size, ep_batches,
                    sampler_mode="walks", walk_cfg=walk_cfg, trust=trust)
            else:
                trainer = ShardedGraphTrainer(
                    mesh, part, self.dim, GRAPH_MODELS[model_name],
                    self.optimizer, self.num_negative,
                    float(negative_weight), batch_size, ep_batches,
                    sampler_mode="edges",
                    negative_sharing=negative_sharing,
                    pool_size=pool_size, trust=trust)
            self._mesh_trainer = trainer
            self._mesh_sample_state = trainer.build_sample_state(self.graph)
            self._mesh_key = key
        trainer = self._mesh_trainer
        trainer.rotation = 0

        state = trainer.init_state(
            np.asarray(self.state["tables"][0]),
            np.asarray(self.state["tables"][1]),
            moments_np=tuple(tuple(np.asarray(m) for m in side)
                             for side in self.state["moments"]))
        neg_state = trainer.init_negative_state(
            np.asarray(self.graph.vertex_weights), negative_sample_exponent)
        sample_state = self._mesh_sample_state
        logger.info("training %s on %d devices: %d batches of %d "
                    "(episodes of %d)", model_name, P_, self.num_batch,
                    batch_size, ep_batches)
        next_log = log_frequency
        losses_acc = []
        seed = self.seed
        while self.batch_id < self.num_batch:
            state, neg_state, losses = trainer.run_episode(
                state, sample_state, neg_state, self.batch_id,
                self.num_batch, seed)
            self.batch_id += ep_batches * P_
            losses_acc.append(np.asarray(losses).reshape(-1))
            if self.batch_id >= next_log or self.batch_id >= self.num_batch:
                l = np.concatenate(losses_acc)
                l = l[l > 0]  # zero-loss episodes = empty blocks
                logger.info("Batch id: %d / %d, loss = %.6g",
                            min(self.batch_id, self.num_batch),
                            self.num_batch,
                            float(l.mean()) if l.size else 0.0)
                losses_acc = []
                next_log = self.batch_id + log_frequency
        v, c = trainer.gather_tables(state)
        moments = state["moments"]
        # moments come back partition-sharded; restore canonical [V, D]
        # (context moments travel with the rotating shard in edges mode;
        # the banded walks engine never rotates)
        part = trainer.partition
        e = (trainer.rotation % trainer.num_partition
             if trainer.rotating else 0)
        unrot = lambda x: np.roll(np.asarray(x), e, axis=0)
        self.state = {
            "tables": (jnp.asarray(v), jnp.asarray(c)),
            "moments": (
                tuple(jnp.asarray(part.unshard_rows(np.asarray(m)))
                      for m in moments[0]),
                tuple(jnp.asarray(part.unshard_rows(unrot(m)))
                      for m in moments[1])),
        }

    def train(self, model="LINE", num_epoch=2000, resume=False,
              augmentation_step=auto, random_walk_length=40,
              random_walk_batch_size=100, shuffle_base=auto, p=1.0, q=1.0,
              positive_reuse=1, negative_sample_exponent=0.75,
              negative_weight=5.0, negative_sharing=auto,
              log_frequency=1000):
        if model not in self.get_available_models():
            raise ValueError("unknown model `%s`" % model)
        self.model = model
        if not resume or self.state is None or self.batch_id == 0:
            self.init_embeddings()
            self.batch_id = 0

        num_vertex = self.graph.num_vertex
        num_edge = self.graph.num_edge
        if augmentation_step in (auto, None):
            avg_degree = max(float(num_edge) / num_vertex, 1.0 + 1e-6)
            augmentation_step = max(
                int(math.log(EXPECTED_DEGREE) / math.log(avg_degree)), 1)
        augmentation_step = int(augmentation_step)
        if shuffle_base in (auto, None):
            shuffle_base = augmentation_step
        if model in ("DeepWalk", "node2vec"):
            shuffle_base = 1  # graph.cuh:784-786
        if augmentation_step > random_walk_length:
            raise ValueError("`random_walk_length` must be >= `augmentation_step`")
        self.augmentation_step = augmentation_step

        if self.num_worker > 1:
            # mesh mode builds per-partition negative alias tables itself
            self._train_loop_mesh(model, num_epoch, augmentation_step,
                                  random_walk_length, p, q,
                                  float(negative_weight),
                                  float(negative_sample_exponent),
                                  log_frequency)
            return

        # negative sampler: tail-side, degree^exponent (solver.h:1264-1278)
        weights = np.asarray(self.graph.vertex_weights, dtype=np.float64)
        weights = np.maximum(weights, 1e-12) ** negative_sample_exponent
        neg_table = AliasTable(weights)
        neg_state = tuple(jnp.asarray(a) for a in device_alias_arrays(neg_table))

        # negative sharing (auto-on single chip): per-group shared noise
        # pools scored by MXU matmuls replace K per-sample draws — same
        # expected negative gradient mass per sample at a fraction of the
        # row traffic (see make_graph_pool_step)
        if negative_sharing in (auto, None):
            import os as _os
            negative_sharing = _os.environ.get(
                "GRAPHVITE_NEG_SHARING", "1") != "0"
        # _batch_plan's memory cap depends on the step family (pooled
        # steps keep only ~16 [B, D] output tensors live; the classic
        # step materializes [B, K+1, D] chains) — set BEFORE any
        # _batch_plan call or the first train of a solver plans with the
        # smaller classic cap (only the KG path set this until round 4)
        self._pooled_step = bool(negative_sharing)
        # SGD safety net for dense small graphs: hub rows a batch touches
        # hundreds of times otherwise diverge (optim.apply_row_updates trust
        # note; reproduced on the BlogCatalog-statistics clone)
        import os as _os3
        trust = float(_os3.environ.get("GRAPHVITE_TRUST", 0.25)) or None
        # Pallas tile-sweep scatter for the vertex side (ops/pallas_scatter):
        # needs a SORTED head stream (sorted edge stream, aug=1), an SGD
        # (0-moment) rule, and a table big enough that the XLA per-row
        # scatter beats 2 sequential table passes. Default ON where the
        # gates hold, TPU only (compiled Mosaic; interpret mode on CPU is
        # for tests): measured +9.5% end-to-end on the flagship bench
        # (15.1M vs 13.8M samples/s) and 12.2 vs 22.2 ns/row in isolation.
        from graphvite_tpu.optim import DENSE_UPDATE_ELEMS
        # gate levels: unset/default -> auto (TPU only, where the compiled
        # Mosaic kernel exists); explicit "1" -> force on any backend (the
        # kernel interprets itself off-TPU — CPU tests drive the full
        # solver path this way); "0" -> off
        sweep_env = _os3.environ.get("GRAPHVITE_SWEEP_SCATTER", "")
        sweep_enabled = (sweep_env == "1"
                         or (sweep_env != "0"
                             and jax.default_backend() == "tpu"))
        # moment rules ride the sweep too (sweep_scatter_update carries
        # gsum/gsq/count and applies the closed-form c-touch update per
        # tile row): on v5e the sweep's 1+n_mom sequential table passes
        # beat the dedup chain's argsort + per-row moment gather/scatter
        # wherever the table exceeds the dense-path threshold
        use_sweep = (sweep_enabled
                     and negative_sharing
                     and self.sampler_backend == "device"
                     and num_vertex * self.dim > DENSE_UPDATE_ELEMS)
        sort_heads = False
        if use_sweep and augmentation_step == 1:
            sampler = self._get_sampler(
                ("edge", True),
                lambda: DeviceEdgeSampler.build(self.graph,
                                                sort_stream=True))
            use_sweep = bool(sampler.sorted_stream)
        elif use_sweep:
            # walk mode: pairs arrive in emission order; the sort_heads
            # front-end (in-step argsort) can unlock the sweeps, but
            # MEASURED on v5e it loses — 8.77M vs 13.8M pair-slots/s
            # with plain scatters even with the pipelined r3 kernels
            # (the argsort's [B]-scalar permutes cost ~2 ms EACH at
            # B=162k; LINE wins only because its stream is pre-sorted
            # for free). Opt-in for future sort lowerings; the default
            # walk path instead shrinks row COUNT via the position-major
            # multi-tail step below.
            sort_heads = _os3.environ.get("GRAPHVITE_SWEEP_WALK",
                                          "0") == "1"
            use_sweep = sort_heads
        # walk-step layout (aug >= 2 batches): exact regroupings of the
        # same pair set at decreasing row traffic —
        #   "pair":      one slot per (head, tail) pair (2 rows/pair)
        #   "multitail": one sample per walk position carrying its T
        #                augmentation tails — head rows and negative
        #                scoring shrink by T (1 + 1/T rows/pair)
        #   "banded":    whole walks; BOTH roles of every chain vertex
        #                collapse to one gather + one update, positives
        #                computed as a static shifted band (~2/T rows
        #                per pair) — the default
        # Bidirectional emission additionally mines the reversed pairs
        # of each walk (stationary-start FIRST-ORDER walks on an
        # undirected graph are exactly reversible, so reversed pairs are
        # i.i.d. extra samples), halving walk-generation cost per pair.
        # For node2vec's second-order walks reversibility is only
        # approximate; the default stays ON per the recorded clone A/B
        # (RESULTS.md round 5: micro-F1@10% 39.7 bidir vs 40.7
        # forward-only — within probe noise — at 3.6x the throughput).
        # GRAPHVITE_WALK_BIDIR=0 restores reference-faithful emission.
        walk_step_mode = _os3.environ.get("GRAPHVITE_WALK_STEP", "banded")
        if _os3.environ.get("GRAPHVITE_MULTITAIL", "1") == "0":
            walk_step_mode = "pair"   # legacy kill-switch
        walk_grouped = (negative_sharing
                        and augmentation_step >= 2
                        and not sort_heads
                        and self.sampler_backend == "device"
                        and walk_step_mode in ("banded", "multitail"))
        walk_bidir = (walk_grouped and bool(self.graph.as_undirected)
                      and _os3.environ.get("GRAPHVITE_WALK_BIDIR",
                                           "1") != "0")
        banded = walk_grouped and walk_step_mode == "banded"
        multitail = walk_grouped and walk_step_mode == "multitail"
        num_tail = (augmentation_step * (2 if walk_bidir else 1)
                    if walk_grouped else 0)
        self._sweep_scatter = use_sweep
        # streaming sweep GATHER for the sorted head side (measured on v5e:
        # XLA's per-row gather pays ~11 ns/row; the tile stream + one-hot
        # select rides sequential HBM bandwidth). Needs an 8-row-aligned
        # table for the clamped last-tile DMA.
        # 256 measured fastest on v5e at the full bench length (campaign
        # r3: 15.75/15.68M vs 512's 15.40M and 1024's ~12.8M samples/s)
        gather_tile = int(_os3.environ.get("GRAPHVITE_SWEEP_GATHER_TILE",
                                           256))
        use_sweep_gather = (use_sweep
                            and _os3.environ.get("GRAPHVITE_SWEEP_GATHER",
                                                 "1") != "0"
                            and num_vertex % 8 == 0
                            and num_vertex >= gather_tile
                            and self.dim % 128 == 0)
        self._sweep_gather = use_sweep_gather
        # context-side sweep (unsorted ids, argsort front-end): same gates
        # minus the sorted stream — tails are never sorted, the kernel
        # front-end sorts. Opt-in until device-measured (the sort + row
        # permute must beat the XLA per-row scatter's margin).
        # context-side sweep: default ON where the vertex sweep engages
        # (TPU or forced) — with the round-3 pipelined kernels the
        # argsort + permute + sweep measured FASTER than the XLA scatter
        # at 120-epoch bench length (17.45M vs 17.15M samples/s, tune5)
        ctx_env = _os3.environ.get("GRAPHVITE_SWEEP_CONTEXT", "")
        ctx_enabled = (ctx_env == "1"
                       or (ctx_env != "0" and sweep_enabled))
        use_sweep_ctx = (ctx_enabled
                         and negative_sharing
                         and (augmentation_step == 1 or sort_heads)
                         and self.sampler_backend == "device"
                         and num_vertex * self.dim > DENSE_UPDATE_ELEMS)
        self._sweep_context = use_sweep_ctx
        self._multitail_T = num_tail if multitail else 0
        # banded batches come in whole-walk units of T * (L+1) slots
        self._walk_slot_unit = (num_tail * (random_walk_length + 1)
                                if banded else 0)
        if negative_sharing:
            # group count scales with the MICRO-batch (the unit the pool
            # step sees) so Bg = batch / G stays ~2k: a pool row's
            # accumulated update is O(lr * Bg * neg_w) when the group's head
            # vectors are coherent, and an unbounded Bg diverges (steps.py
            # stability note)
            pool_batch = (self._batch_plan()[1]
                          if self.sampler_backend == "device"
                          else self.batch_size)
            # M=128 default: -10% pool row traffic measured end to end
            # (19.35M vs 17.51M samples/s, tune6) at unchanged clone
            # quality (AUC 0.8739 vs 0.8743, RESULTS.md round-3 ablation);
            # per-group diversity stays >= the 64-candidate bar from the
            # KG pool study
            # walk-grouped steps default to M=64: pool row traffic and
            # the [*, M] einsums shrink with M, and on the banded aug=5
            # bench M=64 measured +8% over 128 (42.3M vs 39.1M pairs/s)
            # at clone-AUC parity (0.8745 vs 0.8739; M=32 bought only
            # +1% more and dips below the 64-candidate diversity bar).
            # The aug=1 edge path keeps its round-3-tuned 128.
            pool_size = int(_os3.environ.get(
                "GRAPHVITE_POOL_SIZE", 64 if walk_grouped else 128))
            if banded:
                # groups partition WALKS; bound coherent pair mass per
                # pool row at the same ~2048-slot target as the pair step
                slot_unit = num_tail * (random_walk_length + 1)
                b_walks = max(pool_batch // slot_unit, 1)
                pool_groups = _steps.graph_pool_groups(
                    b_walks, target_group=max(2048 // slot_unit, 1))
                # fused (vertex|context) arena: ONE gather + ONE scatter
                # per batch instead of two of each (the banded step's
                # scatters were 43% of its time, PERF.md r4). SGD only,
                # and only where the trust clip is inactive (its row-norm
                # logic is per-table); the canonical state is packed /
                # unpacked once per episode (make_fused_runner).
                from graphvite_tpu.optim import DENSE_UPDATE_ELEMS as _DUE
                self._banded_fused = (
                    self.optimizer.num_moment == 0
                    and (trust is None
                         or num_vertex * self.dim > _DUE)
                    and _os3.environ.get("GRAPHVITE_SWEEP_BANDED",
                                         "0") != "1"
                    and _os3.environ.get("GRAPHVITE_FUSED_ARENA",
                                         "1") != "0")
                if self._banded_fused:
                    step_fn = _steps.make_graph_banded_fused_step(
                        self.optimizer, self.num_negative,
                        float(negative_weight), augmentation_step,
                        walk_bidir, pool_size=pool_size,
                        pool_groups=pool_groups)
                else:
                    step_fn = _steps.make_graph_banded_walk_step(
                        self.optimizer, self.num_negative,
                        float(negative_weight), augmentation_step,
                        walk_bidir, pool_size=pool_size,
                        pool_groups=pool_groups, trust=trust)
            elif multitail:
                # groups bound coherent PAIR mass per pool row, so the
                # per-group position target shrinks by the tail count
                b_pos = pool_batch // num_tail
                pool_groups = _steps.graph_pool_groups(
                    b_pos, target_group=max(2048 // num_tail, 256))
                step_fn = _steps.make_graph_pool_multitail_step(
                    self.optimizer, self.num_negative,
                    float(negative_weight), num_tail,
                    pool_size=pool_size, pool_groups=pool_groups,
                    trust=trust)
            else:
                pool_groups = _steps.graph_pool_groups(pool_batch)
                step_fn = _steps.make_graph_pool_step(
                    self.optimizer, self.num_negative,
                    float(negative_weight),
                    pool_size=pool_size,
                    pool_groups=pool_groups, trust=trust,
                    sweep_vertex=use_sweep, sweep_context=use_sweep_ctx,
                    sweep_gather=use_sweep_gather,
                    sweep_gather_tile=gather_tile,
                    sort_heads=sort_heads,
                    sweep_tile=int(_os3.environ.get(
                        "GRAPHVITE_SWEEP_TILE", 1024)),
                    # c256 measured fastest END TO END on v5e with the
                    # pipelined kernels (round-3 tune5: 17.15M vs c128's
                    # 16.64M samples/s at 120-epoch length; the round-2
                    # isolation microbench favored c128 before pipelining)
                    sweep_chunk=int(_os3.environ.get(
                        "GRAPHVITE_SWEEP_CHUNK", 256)))
        else:
            step_fn = _steps.make_graph_train_step(
                GRAPH_MODELS[model], self.optimizer, self.num_negative,
                float(negative_weight), trust=trust)
        if self.sampler_backend == "device":
            num_partition = self.num_partition
            if num_partition in (auto, None):
                # Auto #partition (reference solver.h:366-376 reborn):
                # in-budget tables ALWAYS train flat — the blocked A/B
                # measured flat 14x faster at V=4M (PERF.md) because XLA's
                # bounded scatter never repays the block staging. Blocked
                # episodes auto-engage only for HBM OVERFLOW: smallest P
                # whose two resident shards (head + tail partition, the
                # reference worker's one-slot cache) fit the budget.
                num_partition = 1
                itemsize = np.dtype(self.float_type.name).itemsize
                n_moms = (len(self.state["moments"][0])
                          + len(self.state["moments"][1]))
                demand = (num_vertex * self.dim
                          * (2 * itemsize + n_moms * 4)
                          + 16 * num_edge)
                from graphvite_tpu.utils.common import hbm_budget_bytes
                hbm_budget = hbm_budget_bytes(self.gpu_memory_limit)
                if demand > hbm_budget and augmentation_step == 1:
                    P_auto = 2
                    while P_auto < 64 and 2 * demand / P_auto > hbm_budget:
                        P_auto *= 2
                    logger.info(
                        "HBM demand %.1f GB > budget %.1f GB: blocked "
                        "episodes with %d^2 host-staged blocks",
                        demand / 1e9, hbm_budget / 1e9, P_auto)
                    num_partition = P_auto
                elif demand > hbm_budget:
                    logger.warning(
                        "HBM demand %.1f GB > budget %.1f GB but walk "
                        "augmentation needs the flat path; set "
                        "num_partition>1 with augmentation_step=1 to "
                        "stage blocks", demand / 1e9, hbm_budget / 1e9)
            if augmentation_step == 1 and int(num_partition) > 1:
                self._train_loop_blocked(
                    GRAPH_MODELS[model], num_epoch, int(num_partition),
                    float(negative_weight), float(negative_sample_exponent),
                    log_frequency)
                return
            eff_batch = self._effective_batch()
            if augmentation_step == 1:
                sampler = self._get_sampler(
                    ("edge", use_sweep),
                    lambda: DeviceEdgeSampler.build(
                        self.graph, sort_stream=True if use_sweep else None))
            else:
                sampler = self._get_sampler(
                    ("walk", augmentation_step, random_walk_length,
                     model == "node2vec", p, q, eff_batch,
                     multitail, banded, walk_bidir,
                     # membership structure and proposal count shape the
                     # built sampler / compiled chain (node2vec only)
                     _os3.environ.get("GRAPHVITE_N2V_CUCKOO", "1"),
                     _os3.environ.get("GRAPHVITE_N2V_PROPOSALS", "")),
                    lambda: DeviceWalkSampler.build(
                        self.graph, augmentation_step, random_walk_length,
                        eff_batch, biased=(model == "node2vec"),
                        p=p, q=q, position_major=multitail,
                        banded=banded, bidir=walk_bidir))
            # EVERY knob that shapes the compiled step must key the runner
            # cache, or an env change between train() calls silently
            # reuses the stale executable
            step_shape = (use_sweep, use_sweep_ctx, use_sweep_gather,
                          gather_tile, sort_heads, multitail, banded,
                          getattr(self, "_banded_fused", False),
                          num_tail,
                          pool_size if negative_sharing else 0,
                          int(_os3.environ.get("GRAPHVITE_SWEEP_TILE",
                                               1024)),
                          int(_os3.environ.get("GRAPHVITE_SWEEP_CHUNK",
                                               256)),
                          trust,
                          _os3.environ.get("GRAPHVITE_BF16_BAND", "0"),
                          _os3.environ.get("GRAPHVITE_SWEEP_BANDED", "0"),
                          _os3.environ.get("GRAPHVITE_N2V_CUCKOO", "1"),
                          _os3.environ.get("GRAPHVITE_N2V_PROPOSALS", ""))
            cache_key = ("graph", model, self.optimizer, self.num_negative,
                         float(negative_weight), int(augmentation_step),
                         int(random_walk_length), float(p), float(q),
                         float(negative_sample_exponent),
                         bool(negative_sharing),
                         pool_groups if negative_sharing else 0,
                         step_shape)
            fused = getattr(self, "_banded_fused", False) and banded
            self._train_loop_device(
                step_fn, sampler, neg_state, num_epoch, positive_reuse,
                log_frequency, False, cache_key,
                state_pack=_steps.banded_fused_pack if fused else None,
                state_unpack=_steps.banded_fused_unpack if fused else None)
            return
        if augmentation_step == 1:
            sampler = EdgeSampler(self.graph, seed=int(self._rng.integers(2**31)))
        else:
            sampler = RandomWalkSampler(
                self.graph, augmentation_step, random_walk_length,
                random_walk_batch_size, shuffle_base,
                seed=int(self._rng.integers(2**31)),
                biased=(model == "node2vec"), p=p, q=q)
        self._train_loop(step_fn, sampler, False, neg_state, num_epoch,
                         positive_reuse, log_frequency)

    def predict(self, heads, tails=None):
        """Score (head, tail) pairs; accepts an (n, 2) array or two arrays.

        Overflow tables (HBM-overflow training keeps the canonical state
        host-resident as numpy) are scored in CHUNKS: only the touched rows
        are host-gathered and shipped per chunk, never the whole table —
        the reference's predict pools + memory-aware eval batches
        (solver.h:660-802, application.py:948-961) reborn as row streaming.
        """
        if tails is None:
            arr = np.asarray(heads)
            heads, tails = arr[:, 0], arr[:, 1]
        model = GRAPH_MODELS[self.model or "LINE"]
        vertex, context = self.state["tables"]
        if isinstance(vertex, np.ndarray):
            return self._predict_host_rows(
                model, vertex, context, np.asarray(heads), np.asarray(tails))
        # memoize the jitted scorer: a fresh lambda per call is a fresh jit
        # cache entry — repeated predict() calls (ranking loops) would
        # retrace every time (VERDICT round-1 weak item 8)
        cache = getattr(self, "_predict_cache", None)
        if cache is None or cache[0] != model.name:
            fn = jax.jit(lambda v, c, h, t: _steps.graph_predict(
                model, v, c, h, t).astype(jnp.float32))
            self._predict_cache = cache = (model.name, fn)
        fn = cache[1]
        return np.asarray(fn(vertex, context,
                             jnp.asarray(heads, jnp.int32),
                             jnp.asarray(tails, jnp.int32)))

    def _predict_host_rows(self, model, vertex, context, heads, tails,
                           chunk=1 << 18):
        """Chunked scoring against host-resident (overflow) tables: per
        chunk, numpy-gather the [chunk, D] head/tail rows, score on device.
        Fixed chunk shape (zero-padded tail) -> one compiled scorer."""
        cache = getattr(self, "_predict_rows_cache", None)
        if cache is None or cache[0] != (model.name, chunk):
            fn = jax.jit(lambda vr, cr: model.score(vr, cr)
                         .astype(jnp.float32))
            self._predict_rows_cache = cache = ((model.name, chunk), fn)
        fn = cache[1]
        n = heads.shape[0]
        out = np.empty(n, np.float32)
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            vr = np.zeros((chunk, vertex.shape[1]), np.float32)
            cr = np.zeros((chunk, context.shape[1]), np.float32)
            vr[:hi - lo] = vertex[heads[lo:hi]]
            cr[:hi - lo] = context[tails[lo:hi]]
            out[lo:hi] = np.asarray(
                fn(jnp.asarray(vr), jnp.asarray(cr)))[:hi - lo]
        return out

    def save_embeddings(self, file_name):
        """word2vec text+binary format (graph.cuh:796-805).

        Vectorized: every row becomes one bytes object ("name " + f32 row +
        "\\n") and the interleaved buffer is written in a single pass —
        the reference's C++ stream write costs one syscall-sized chunk per
        row; a per-row Python write loop on a 1M-vertex table takes minutes.
        """
        emb = np.ascontiguousarray(self.vertex_embeddings, dtype=np.float32)
        n = self.graph.num_vertex
        names = [(self.graph.id2name[i] + " ").encode() for i in range(n)]
        rows = emb.view(np.uint8).reshape(n, -1)
        with open(file_name, "wb") as f:
            f.write(("%d %d\n" % (n, self.dim)).encode())
            f.write(b"".join(
                name + row.tobytes() + b"\n"
                for name, row in zip(names, rows)))


class KnowledgeGraphSolver(SolverBase):
    """KG-embedding solver (ref knowledge_graph.cuh:511-678). The entity
    table is shared between head and tail roles (tied weights); relations are
    a separate table."""

    def get_default_optimizer(self):
        # ref knowledge_graph.cuh:556-558
        return Optimizer(type="Adam", lr=5e-5, weight_decay=0.0, schedule="linear")

    def get_available_models(self):
        return set(KG_MODELS)

    def _table_shapes(self):
        return ((self.graph.num_vertex, self.dim),
                (self.graph.num_relation, self.dim))

    @property
    def entity_embeddings(self):
        return self.table(0)

    @property
    def relation_embeddings(self):
        return self.table(1)

    def init_embeddings(self, margin=12.0):
        """Per-model init schemes (knowledge_graph.cuh:567-621), generated
        on device to avoid uploading multi-GB entity tables."""
        ne, nr, d = self.graph.num_vertex, self.graph.num_relation, self.dim
        dt = self.float_type.name
        key = jax.random.PRNGKey(int(self._rng.integers(2**31)))
        ks = jax.random.split(key, 8)
        U = lambda k, shape, lo, hi: jax.random.uniform(
            k, shape, minval=lo, maxval=hi, dtype=jnp.float32)
        if self.model == "TransE":
            ent = U(ks[0], (ne, d), -margin / d, margin / d)
            rel = U(ks[1], (nr, d), -margin / d, margin / d)
        elif self.model in ("DistMult", "ComplEx", "SimplE"):
            ent = U(ks[0], (ne, d), -0.5, 0.5)
            rel = U(ks[1], (nr, d), -0.5, 0.5)
        elif self.model == "RotatE":
            ent = U(ks[0], (ne, d), -margin * 2 / d, margin * 2 / d)
            phases = U(ks[1], (nr, d // 2), -np.pi, np.pi)
            rel = jnp.concatenate(
                [phases, jnp.zeros((nr, d - d // 2), jnp.float32)], axis=1)
        elif self.model == "QuatE":
            def quat_init(k, n):
                k1, k2, k3 = jax.random.split(k, 3)
                m = U(k1, (n, d // 4), -1 / math.sqrt(d / 2),
                      1 / math.sqrt(d / 2))
                phase = U(k2, (n, d // 4), -np.pi, np.pi)
                v = U(k3, (n, d // 4, 3), 0.0, 1.0)
                v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-15)
                out = jnp.stack(
                    [m * jnp.cos(phase),
                     m * v[..., 0] * jnp.sin(phase),
                     m * v[..., 1] * jnp.sin(phase),
                     m * v[..., 2] * jnp.sin(phase)], axis=-1)
                return out.reshape(n, d)
            ent = quat_init(ks[0], ne)
            rel = quat_init(ks[1], nr)
        else:
            raise ValueError(self.model)
        tables = (ent.astype(dt), rel.astype(dt))
        moments = (self.optimizer.init_moments((ne, d), "float32"),
                   self.optimizer.init_moments((nr, d), "float32"))
        self.state = {"tables": tables, "moments": moments}

    def train(self, model="RotatE", num_epoch=2000, resume=False,
              relation_lr_multiplier=1.0, margin=12.0, l3_regularization=2e-3,
              sample_batch_size=2000, positive_reuse=1,
              adversarial_temperature=2.0, negative_sharing=auto,
              log_frequency=100):
        if model not in self.get_available_models():
            raise ValueError("unknown model `%s`" % model)
        self.model = model
        self.margin = float(margin)
        self.l3_regularization = float(l3_regularization)
        self.adversarial_temperature = float(adversarial_temperature)
        if not resume or self.state is None or self.batch_id == 0:
            self.init_embeddings(margin=margin)
            self.batch_id = 0

        mdl = KG_MODELS[model]
        margin_or_l3 = self.margin if mdl.uses_margin else self.l3_regularization
        if self.num_worker > 1:
            self._train_loop_mesh_kg(model, num_epoch, margin_or_l3,
                                     float(relation_lr_multiplier),
                                     log_frequency)
            return
        import os as _os2
        if negative_sharing in (auto, None):
            # auto-rule: shared pools pay where the classic per-draw step
            # chokes — its [B, K+1, D] intermediates cap the micro-batch
            # at GRAPHVITE_STEP_BYTES / ((K+2)*D*32), and once that drops
            # below a few thousand samples the dense-accumulator scan and
            # fixed overheads dominate (PERF.md KG trace: 14.9k triplets/s
            # at dim 2048). Quality is at parity at the default pool size
            # (math fixture: MRR 0.6695 pooled vs 0.679 classic,
            # RESULTS.md ablation), so pooling engages for every heavy
            # dim*K regime (dim 512 x K=64 and up); light configs keep the
            # classic step's exact per-sample-negative reference semantics
            # at no cost.
            env = _os2.environ.get("GRAPHVITE_KG_NEG_SHARING")
            if env is not None:
                negative_sharing = env != "0"
            else:
                budget = float(_os2.environ.get("GRAPHVITE_STEP_BYTES",
                                                2e9))
                classic_cap = budget / ((self.num_negative + 2)
                                        * self.dim * 32)
                negative_sharing = classic_cap < 4096
        self._pooled_step = bool(negative_sharing)
        if negative_sharing:
            trust = float(_os2.environ.get("GRAPHVITE_TRUST", 0.25)) or None
            pool_batch = (self._batch_plan()[1]
                          if self.sampler_backend == "device"
                          else self.batch_size)
            pool_target = int(_os2.environ.get(
                "GRAPHVITE_KG_POOL_TARGET", 512))
            pool_size = int(_os2.environ.get("GRAPHVITE_KG_POOL_SIZE", 0))
            pool_groups = _steps.kg_pool_groups(pool_batch,
                                                target_group=pool_target)
            step_fn = _steps.make_kg_pool_step(
                mdl, self.optimizer, self.num_negative, margin_or_l3,
                self.adversarial_temperature,
                float(relation_lr_multiplier), pool_size=pool_size,
                pool_groups=pool_groups, trust=trust)
        else:
            pool_groups = 0
            pool_size = 0
            trust = None
            step_fn = _steps.make_kg_train_step(
                mdl, self.optimizer, self.num_negative, margin_or_l3,
                self.adversarial_temperature, float(relation_lr_multiplier))
        if self.sampler_backend == "device":
            sampler = self._get_sampler(
                ("kg_edge",),
                lambda: DeviceEdgeSampler.build(self.graph,
                                                with_relation=True))
            cache_key = ("kg", model, self.optimizer, self.num_negative,
                         float(margin_or_l3), self.adversarial_temperature,
                         float(relation_lr_multiplier),
                         bool(negative_sharing), pool_groups, pool_size,
                         trust,
                         # model-specialized pooled bodies are chosen at
                         # trace time — an env flip between train() calls
                         # must not reuse the stale executable
                         _os2.environ.get("GRAPHVITE_KG_FAST", "1"))
            self._train_loop_device(step_fn, sampler, (), num_epoch,
                                    positive_reuse, log_frequency, True,
                                    cache_key)
            return
        sampler = EdgeSampler(self.graph, seed=int(self._rng.integers(2**31)),
                              with_relation=True)
        self._train_loop(step_fn, sampler, True, (), num_epoch,
                         positive_reuse, log_frequency)

    def _train_loop_mesh_kg(self, model_name, num_epoch, margin_or_l3,
                            relation_lr_multiplier, log_frequency):
        """Tied-weights sharded entity tables over the mesh: 2W partitions,
        tournament rotation, relations replicated with psum-delta merge
        (parallel/kg.py ShardedKGTrainer). Entity tables W x larger than one
        device's HBM become trainable — the reference's core scale story
        (knowledge_graph.cuh:531-533)."""
        from graphvite_tpu.parallel.kg import ShardedKGTrainer
        from graphvite_tpu.parallel.mesh import VertexPartition, make_mesh

        W = self.num_worker
        import os as _os
        # engine selection mirrors the flat auto-rule (train()): the tuned
        # pooled step family engages for every heavy dim*K regime; light
        # configs keep the classic per-draw step's exact reference
        # semantics. GRAPHVITE_KG_NEG_POOL forces pooled/global/resident.
        budget = float(_os.environ.get("GRAPHVITE_STEP_BYTES", 2e9))
        neg_pool = _os.environ.get("GRAPHVITE_KG_NEG_POOL")
        if neg_pool is None:
            classic_cap = budget / ((self.num_negative + 2) * self.dim * 32)
            neg_pool = "pooled" if classic_cap < 4096 else "global"
        pooled = neg_pool == "pooled"
        self._pooled_step = pooled
        live_bytes = (16 * self.dim * 4 if pooled
                      else (self.num_negative + 2) * self.dim * 4 * 8)
        mem_cap = max(int(budget / max(live_bytes, 1)), 512)
        tau = float(_os.environ.get("GRAPHVITE_MAX_TOUCH", 64))
        rows_per_dev = max(2 * self.graph.num_vertex // (2 * W), 1)
        touch_cap = max(int(tau * rows_per_dev / (self.num_negative + 2)), 64)
        batch_size = min(self.batch_size, mem_cap, touch_cap)
        # pooled groups must divide the batch (kg_pool_groups halves until
        # it divides; keep a power-of-2 factor so it lands near its target)
        unit = 256 if batch_size >= 256 else 8
        batch_size = max(batch_size // unit * unit, unit)
        if batch_size < self.batch_size:
            logger.info("batch_size %d -> %d per device (mesh of %d)",
                        self.batch_size, batch_size, W)
        self.effective_batch = batch_size
        num_edge = self.graph.num_edge
        self.num_batch = max(int(num_epoch * num_edge // batch_size), 1)
        # many full tournament sweeps (see _train_loop_mesh): every block
        # must be revisited often or its burst gets overwritten
        min_sweeps = int(_os.environ.get("GRAPHVITE_MIN_SWEEPS", 16))
        sweep_cap = max(self.num_batch // (W * (2 * W - 1) * min_sweeps), 1)
        ep_batches = max(min(self._episode_batches(), sweep_cap,
                             max(self.num_batch // W, 1)), 1)

        key = (id(self.graph), "kgmesh", model_name, self.optimizer,
               self.num_negative, float(margin_or_l3),
               self.adversarial_temperature, float(relation_lr_multiplier),
               W, batch_size, ep_batches, neg_pool,
               _os.environ.get("GRAPHVITE_KG_FAST", "1"),
               _os.environ.get("GRAPHVITE_KG_POOL_TARGET", ""),
               _os.environ.get("GRAPHVITE_KG_POOL_SIZE", ""))
        if getattr(self, "_kgmesh_key", None) != key:
            part = VertexPartition(np.asarray(self.graph.degrees), 2 * W)
            mesh = make_mesh(W)
            trust = float(_os.environ.get("GRAPHVITE_TRUST", 0.25)) or None
            trainer = ShardedKGTrainer(
                mesh, part, self.dim, KG_MODELS[model_name], self.optimizer,
                num_negative=self.num_negative, margin_or_l3=margin_or_l3,
                adversarial_temperature=self.adversarial_temperature,
                relation_lr_multiplier=relation_lr_multiplier,
                batch_size=batch_size, ep_batches=ep_batches,
                negative_pool=neg_pool,
                pool_size=int(_os.environ.get("GRAPHVITE_KG_POOL_SIZE", 0))
                if pooled else None,
                trust=trust)
            self._kgmesh_trainer = trainer
            self._kgmesh_triplets = trainer.init_triplets(self.graph)
            self._kgmesh_key = key
        trainer = self._kgmesh_trainer
        trainer.reset_schedule()
        state = trainer.init_state(
            np.asarray(self.state["tables"][0]),
            np.asarray(self.state["tables"][1]),
            moments_np=tuple(tuple(np.asarray(m) for m in side)
                             for side in self.state["moments"]))
        logger.info("training %s on %d devices (2x%d entity partitions): "
                    "%d batches of %d (episodes of %d)", model_name, W,
                    2 * W, self.num_batch, batch_size, ep_batches)
        next_log = log_frequency
        losses_acc = []
        while self.batch_id < self.num_batch:
            state, losses = trainer.run_episode(
                state, self._kgmesh_triplets, self.batch_id, self.num_batch,
                self.seed)
            self.batch_id += ep_batches * W
            losses_acc.append(np.asarray(losses).reshape(-1))
            if self.batch_id >= next_log or self.batch_id >= self.num_batch:
                l = np.concatenate(losses_acc)
                logger.info("Batch id: %d / %d, loss = %.6g",
                            min(self.batch_id, self.num_batch),
                            self.num_batch, float(l.mean()))
                losses_acc = []
                next_log = self.batch_id + log_frequency
        ent = trainer.gather_entities(state)
        rel = np.asarray(state["rel"])
        e_moms = trainer.gather_entity_moments(state)
        # per-device relation moment caches -> canonical mean (the
        # reference keeps them per-GPU and never merges; the mean is the
        # natural single-table summary for checkpointing)
        r_moms = tuple(np.asarray(m).mean(axis=0) for m in state["rel_moms"])
        self.state = {
            "tables": (jnp.asarray(ent), jnp.asarray(rel)),
            "moments": (tuple(jnp.asarray(m) for m in e_moms),
                        tuple(jnp.asarray(m) for m in r_moms)),
        }

    def predict(self, samples):
        """samples: (n, 3) array of (head, tail, relation) ids -> logits.

        Host-resident (overflow) entity tables are scored by chunked row
        gathers — the whole table never lands in HBM (see
        GraphSolver.predict)."""
        arr = np.asarray(samples)
        mdl = KG_MODELS[self.model]
        margin_or_l3 = self.margin if mdl.uses_margin else self.l3_regularization
        entity, relation = self.state["tables"]
        if isinstance(entity, np.ndarray):
            return self._predict_host_rows(mdl, margin_or_l3, entity,
                                           np.asarray(relation), arr)
        # memoized jitted scorer (see GraphSolver.predict)
        cache = getattr(self, "_predict_cache", None)
        if cache is None or cache[0] != (mdl.name, margin_or_l3):
            fn = jax.jit(lambda e, r, h, t, rr: _steps.kg_predict(
                mdl, e, r, h, t, rr, margin_or_l3).astype(jnp.float32))
            self._predict_cache = cache = ((mdl.name, margin_or_l3), fn)
        fn = cache[1]
        out = []
        chunk = 1 << 20
        for i in range(0, arr.shape[0], chunk):
            part = arr[i:i + chunk]
            out.append(np.asarray(fn(entity, relation,
                                     jnp.asarray(part[:, 0], jnp.int32),
                                     jnp.asarray(part[:, 1], jnp.int32),
                                     jnp.asarray(part[:, 2], jnp.int32))))
        return np.concatenate(out)

    def _predict_host_rows(self, mdl, margin_or_l3, entity, relation, arr,
                           chunk=1 << 17):
        cache = getattr(self, "_predict_rows_cache", None)
        if cache is None or cache[0] != (mdl.name, margin_or_l3, chunk):
            fn = jax.jit(lambda h, t, r: mdl.score(h, t, r, margin_or_l3)
                         .astype(jnp.float32))
            self._predict_rows_cache = cache = (
                (mdl.name, margin_or_l3, chunk), fn)
        fn = cache[1]
        n = arr.shape[0]
        d = entity.shape[1]
        out = np.empty(n, np.float32)
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            hr = np.zeros((chunk, d), np.float32)
            tr = np.zeros((chunk, d), np.float32)
            rr = np.zeros((chunk, relation.shape[1]), np.float32)
            hr[:hi - lo] = entity[arr[lo:hi, 0]]
            tr[:hi - lo] = entity[arr[lo:hi, 1]]
            rr[:hi - lo] = relation[arr[lo:hi, 2]]
            out[lo:hi] = np.asarray(
                fn(jnp.asarray(hr), jnp.asarray(tr),
                   jnp.asarray(rr)))[:hi - lo]
        return out


class VisualizationSolver(SolverBase):
    """LargeVis solver (ref visualization.cuh:417-596): a single coordinate
    table serves both head and tail roles.

    Tables are padded to >= 8 columns internally so row layouts match the
    other solvers (the squared-distance math keeps zero-initialized padding
    at exactly zero, so the padded dims are inert; `coordinates` strips
    them). Note: the optimizer dedup chain still runs ~30 ms/batch on these
    narrow shapes — per-touch segment-sums are the round-2 target here.
    """

    MIN_COLS = 8

    def get_default_optimizer(self):
        # ref visualization.cuh:554-556
        return Optimizer(type="Adam", lr=0.5, weight_decay=1e-5, schedule="linear")

    def get_available_models(self):
        return {"LargeVis"}

    @property
    def _pad_dim(self):
        return max(self.dim, self.MIN_COLS)

    def _table_shapes(self):
        return ((self.graph.num_vertex, self._pad_dim),)

    def init_embeddings(self):
        """coord ~ U(-5e-5/dim, 5e-5/dim) (visualization.cuh:563-569)."""
        v = self.graph.num_vertex
        key = jax.random.PRNGKey(int(self._rng.integers(2**31)))
        coord = jax.random.uniform(
            key, (v, self.dim), minval=-5e-5 / self.dim,
            maxval=5e-5 / self.dim, dtype=jnp.float32)
        if self._pad_dim > self.dim:
            coord = jnp.concatenate(
                [coord, jnp.zeros((v, self._pad_dim - self.dim),
                                  jnp.float32)], axis=1)
        coord = coord.astype(self.float_type.name)
        self.state = {"tables": (coord,),
                      "moments": (self.optimizer.init_moments(
                          (v, self._pad_dim), "float32"),)}

    @property
    def coordinates(self):
        return self.table(0)[:, : self.dim]

    def train(self, model="LargeVis", num_epoch=50, resume=False,
              sample_batch_size=2000, positive_reuse=5,
              negative_sample_exponent=0.75, negative_weight=5.0,
              negative_sharing=auto, log_frequency=1000):
        self.model = "LargeVis"
        if not resume or self.state is None or self.batch_id == 0:
            self.init_embeddings()
            self.batch_id = 0
        weights = np.asarray(self.graph.vertex_weights, dtype=np.float64)
        weights = np.maximum(weights, 1e-12) ** negative_sample_exponent
        neg_table = AliasTable(weights)
        neg_state = tuple(jnp.asarray(a) for a in device_alias_arrays(neg_table))
        import os as _os3
        trust = float(_os3.environ.get("GRAPHVITE_TRUST", 0.25)) or None
        if negative_sharing in (auto, None):
            negative_sharing = _os3.environ.get(
                "GRAPHVITE_NEG_SHARING", "1") != "0"
        # pooled steps plan batches under the larger pooled memory cap
        # (see GraphSolver.train) — set before the _batch_plan call below
        self._pooled_step = bool(negative_sharing)
        if negative_sharing:
            pool_batch = (self._batch_plan()[1]
                          if self.sampler_backend == "device"
                          else self.batch_size)
            pool_groups = _steps.graph_pool_groups(pool_batch)
            step_fn = _steps.make_vis_pool_step(
                self.optimizer, self.num_negative, float(negative_weight),
                pool_groups=pool_groups, trust=trust)
        else:
            pool_groups = 0
            step_fn = _steps.make_vis_train_step(
                LargeVis, self.optimizer, self.num_negative,
                float(negative_weight), trust=trust)
        if self.num_worker > 1:
            self._train_loop_mesh_vis(step_fn, neg_state, num_epoch,
                                      log_frequency,
                                      positive_reuse=positive_reuse)
            return
        if self.sampler_backend == "device":
            sampler = self._get_sampler(
                ("edge",), lambda: DeviceEdgeSampler.build(self.graph))
            cache_key = ("vis", self.optimizer, self.num_negative,
                         float(negative_weight),
                         float(negative_sample_exponent),
                         bool(negative_sharing), pool_groups)
            self._train_loop_device(step_fn, sampler, neg_state, num_epoch,
                                    positive_reuse, log_frequency, False,
                                    cache_key)
            return
        sampler = EdgeSampler(self.graph, seed=int(self._rng.integers(2**31)))
        self._train_loop(step_fn, sampler, False, neg_state, num_epoch,
                         positive_reuse, log_frequency)

    def _train_loop_mesh_vis(self, step_fn, neg_state, num_epoch,
                             log_frequency, positive_reuse=1):
        """Multi-device LargeVis (ref visualization.cuh:417-596 trains over
        4 GPUs through the same solver core): the single shared coordinate
        table is SMALL at visualization scale, so the TPU-native mode is
        the reference's naive_parallel — replicas per device, independent
        positive streams, psum-merged episode deltas
        (parallel.mesh.ReplicatedEdgeTrainer)."""
        from graphvite_tpu.parallel.mesh import (ReplicatedEdgeTrainer,
                                                 make_mesh)

        W = self.num_worker
        batch_size, _, _ = self._batch_plan()
        self.effective_batch = batch_size
        num_edge = self.graph.num_edge
        self.num_batch = max(int(num_epoch * num_edge // batch_size), 1)
        # SHORT episodes: a LargeVis layout is rotation/reflection
        # symmetric, so replicas that drift independently for long
        # converge toward differently-oriented layouts whose summed deltas
        # cancel. Frequent merges keep the replicas coherent (the
        # reference's write-back cadence is likewise per-episode-block,
        # solver.h:629-654).
        import os as _osv
        ep_cap = int(_osv.environ.get("GRAPHVITE_VIS_MESH_EP", 4))
        ep_batches = max(min(self._episode_batches(), ep_cap,
                             max(self.num_batch // W, 1)), 1)

        R = max(int(positive_reuse), 1)
        key = (id(self.graph), "vismesh", self.optimizer,
               self.num_negative, W, batch_size, ep_batches, R)
        if getattr(self, "_vismesh_key", None) != key:
            mesh = make_mesh(W)
            self._vismesh_trainer = ReplicatedEdgeTrainer(
                mesh, step_fn, self.optimizer, batch_size, ep_batches,
                positive_reuse=R)
            self._vismesh_edges = self._vismesh_trainer.init_edges(
                self.graph)
            self._vismesh_key = key
        trainer = self._vismesh_trainer
        tables, moments = trainer.init_state(
            tuple(np.asarray(t) for t in self.state["tables"]),
            moments_np=tuple(tuple(np.asarray(m) for m in side)
                             for side in self.state["moments"]))
        neg_dev = tuple(jax.device_put(
            np.asarray(a), jax.sharding.NamedSharding(
                trainer.mesh, jax.sharding.PartitionSpec()))
            for a in neg_state)
        logger.info("training LargeVis on %d devices: %d batches of %d "
                    "(episodes of %d)", W, self.num_batch, batch_size,
                    ep_batches)
        next_log = log_frequency
        losses_acc = []
        seed = self.seed
        while self.batch_id < self.num_batch:
            tables, moments, losses = trainer.run_episode(
                tables, moments, self._vismesh_edges, neg_dev,
                self.batch_id, self.num_batch, seed + self.batch_id)
            self.batch_id += ep_batches * R * W
            losses_acc.append(np.asarray(losses).reshape(-1))
            if self.batch_id >= next_log or self.batch_id >= self.num_batch:
                l = np.concatenate(losses_acc)
                logger.info("Batch id: %d / %d, loss = %.6g",
                            min(self.batch_id, self.num_batch),
                            self.num_batch,
                            float(l.mean()) if l.size else 0.0)
                losses_acc = []
                next_log = self.batch_id + log_frequency
        # per-device moments: keep device 0's slab as the canonical state
        # (the reference's per-GPU moment caches are likewise never merged)
        self.state = {
            "tables": tuple(jnp.asarray(np.asarray(t)) for t in tables),
            "moments": (tuple(jnp.asarray(np.asarray(m)[0])
                              for m in moments[0]),),
        }
