"""Data-parallel knowledge-graph training over a mesh.

The reference trains KG embeddings with tied entity weights by staging 2P
partitions under a diagonal schedule (knowledge_graph.cuh:531-533,
solver.h:532-561); when no partitioned matrix exists it falls back to
`naive_parallel`: full replicas per GPU, independent async training within
an episode, deltas merged at write-back (solver.h:383, 526-529,
naive_sample :975-1009). This module is that naive-parallel mode reborn as
SPMD: tables replicated across the mesh, each device runs an episode of
batches on its own sample stream (positives from a device-resident edge
alias table, negatives uniform over entities — the split-id corruption of
gpu/knowledge_graph.cuh:65-69), then the episode's table deltas are
psum-merged over ICI. Optimizer moments stay device-local, mirroring the
reference's per-GPU moment caches.

Partitioned (HBM-sharded) KG entity tables via a tournament schedule are
the planned follow-up for graphs whose tables exceed replicated HBM.
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
