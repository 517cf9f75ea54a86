"""Run the sharded (mesh) episode engines on the REAL TPU chip (W=1 mesh).

Every prior mesh-engine execution was on the virtual CPU mesh (VERDICT r3
weak #6); this validates that the shard_map episode engines — ring
ppermute rotation, all_to_all walk-pair routing, psum relation merge —
lower and execute on actual TPU hardware, and times steady-state episodes
so PERF.md's ICI scaling model has a measured compute-side denominator.

A 1-device mesh runs the full collective code paths (self-permute /
degenerate all_to_all); real multi-chip ICI is unavailable in this
environment, so 8-chip efficiency is MODELED: per-episode ICI bytes
(shard rotation + walk-pair routing) against measured episode compute,
at v5e ICI link bandwidth.

Usage: python tools/mesh_on_chip.py [V] [B] [EP]
Prints one JSON line for PERF.md/RESULTS.md.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e ICI: 4 links x ~45 GB/s effective per direction (public v5e specs
# quote 1600 Gbps aggregate); a P-ring rotation uses one link pair per
# neighbor, so one hop moves at ~LINK_GBS
LINK_GBS = 45e9


def main():
    V = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 32_768
    EP = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    D = 128

    import jax
    from graphvite_tpu.graph import Graph, KnowledgeGraph
    from graphvite_tpu.models import GRAPH_MODELS, KG_MODELS
    from graphvite_tpu.optim import Optimizer
    from graphvite_tpu.parallel.mesh import (VertexPartition,
                                             ShardedGraphTrainer, make_mesh)
    from graphvite_tpu.parallel.kg import ShardedKGTrainer

    assert jax.devices()[0].platform == "tpu", "run on the TPU chip"
    mesh = make_mesh(1)
    rng = np.random.default_rng(0)
    E = V * 5
    g = Graph()
    g.num_vertex = V
    g.num_edge = 2 * E
    g.id2name = None
    g.name2id = None
    g.as_undirected = True
    u = rng.integers(0, V, E)
    v = rng.integers(0, V, E)
    g.edge_heads = np.concatenate([u, v])
    g.edge_tails = np.concatenate([v, u])
    g.edge_weights = np.ones(2 * E, np.float32)
    g._finalize(normalization=False)

    out = {"devices": 1, "platform": "tpu", "V": V, "B": B, "EP": EP}

    part = VertexPartition(np.asarray(g.degrees), 1)
    opt = Optimizer(type="SGD", lr=0.025, weight_decay=5e-3)
    for mode in ("edges", "walks"):
        kw = {}
        if mode == "walks":
            kw = dict(sampler_mode="walks",
                      walk_cfg=dict(augmentation_step=2, walk_length=40,
                                    pool_walks=max(B * EP // 79, 1)))
        tr = ShardedGraphTrainer(mesh, part, D, GRAPH_MODELS["LINE"], opt,
                                 num_negative=1, negative_weight=5.0,
                                 batch_size=B, ep_batches=EP, **kw)
        state = tr.init_state(
            rng.uniform(-0.5 / D, 0.5 / D, (V, D)).astype(np.float32),
            np.zeros((V, D), np.float32))
        neg = tr.init_negative_state(g.vertex_weights)
        sample_state = (tr.build_blocks(g) if mode == "edges"
                        else tr.build_sample_state(g))
        state, neg, losses = tr.run_episode(state, sample_state, neg, 0,
                                            10**6, seed=0)  # compile
        jax.block_until_ready(losses)
        t0 = time.time()
        n_ep = 5
        for e in range(n_ep):
            state, neg, losses = tr.run_episode(state, sample_state, neg,
                                                (e + 1) * EP, 10**6,
                                                seed=e + 1)
        l = np.asarray(losses)  # forced readback
        dt = (time.time() - t0) / n_ep
        assert np.isfinite(l).all()
        out["graph_%s_episode_s" % mode] = round(dt, 4)
        out["graph_%s_samples_per_s" % mode] = round(B * EP / dt, 1)

    # sharded KG on the chip (2 entity partitions on 1 device)
    trips = np.stack([rng.integers(0, 2000, 40000),
                      rng.integers(0, 50, 40000),
                      rng.integers(0, 2000, 40000)], axis=1)
    kg = KnowledgeGraph()
    kg.num_vertex = 2000
    kg.num_relation = 50
    kg.num_edge = 40000
    kg.id2entity = None
    kg.entity2id = None
    kg.id2relation = None
    kg.relation2id = None
    kg.edge_heads = trips[:, 0]
    kg.edge_tails = trips[:, 2]
    kg.edge_relations = trips[:, 1]
    kg.edge_weights = np.ones(40000, np.float32)
    kpart = VertexPartition(np.asarray(kg.degrees), 2)
    ktr = ShardedKGTrainer(mesh, kpart, D, KG_MODELS["RotatE"],
                           Optimizer(type="Adam", lr=5e-3), num_negative=4,
                           margin_or_l3=6.0, adversarial_temperature=2.0,
                           batch_size=4096, ep_batches=EP)
    kstate = ktr.init_state(
        rng.uniform(-0.1, 0.1, (kg.num_vertex, D)).astype(np.float32),
        rng.uniform(-np.pi, np.pi, (kg.num_relation, D)).astype(np.float32))
    ktrip = ktr.init_triplets(kg)
    kstate, kl = ktr.run_episode(kstate, ktrip, 0, 10**6, seed=0)  # compile
    jax.block_until_ready(kl)
    t0 = time.time()
    for e in range(5):
        kstate, kl = ktr.run_episode(kstate, ktrip, (e + 1) * EP, 10**6,
                                     seed=e + 1)
    kl = np.asarray(kl)
    kdt = (time.time() - t0) / 5
    assert np.isfinite(kl).all()
    out["kg_episode_s"] = round(kdt, 4)

    # ---- ICI scaling model at the BENCH shapes, 8 chips -----------------
    # per episode per device: ONE ring rotation moves the tail shard
    # (context rows + moments + per-partition alias arrays); walk mode
    # additionally routes the episode's pair pool via all_to_all.
    Vb, Db, Bb, EPb, P = 1_000_000, 128, 162_560, 50, 8
    itemsize = 2  # bf16 tables
    shard_bytes = (Vb // P) * (Db * itemsize + 12)  # rows + packed alias
    pool_bytes = 2.0 * Bb * EPb / P * 12            # slack*[h,t,ok] i32
    rot_s = shard_bytes / LINK_GBS
    a2a_s = pool_bytes / LINK_GBS
    per_chip_rate = 19.0e6  # measured single-chip LINE samples/s at the
    #                         aug=1 EDGE shape the mesh engine runs
    #                         (BENCH_r04 line_aug1; the banded aug=5 flat
    #                         path hits 42M but the mesh walk engine
    #                         routes pairs, so edges-mode is the
    #                         conservative compute denominator)
    compute_s = Bb * EPb / per_chip_rate
    eff_edges = compute_s / (compute_s + rot_s)
    eff_walks = compute_s / (compute_s + rot_s + a2a_s)
    out["ici_model"] = {
        "assumed_link_GBs": LINK_GBS / 1e9,
        "rotation_bytes_per_episode": int(shard_bytes),
        "walk_pool_bytes_per_episode": int(pool_bytes),
        "episode_compute_s": round(compute_s, 4),
        "predicted_8chip_efficiency_edges": round(eff_edges, 4),
        "predicted_8chip_efficiency_walks": round(eff_walks, 4),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
