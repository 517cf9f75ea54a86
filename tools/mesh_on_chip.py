"""Run the sharded (mesh) episode engines on the REAL TPU chip (W=1 mesh)
at PROTOCOL shapes (VERDICT r4 item 1b).

Round 5: the mesh engines run the TUNED step families — pooled negatives
for edges/KG (incl. the RotatE rotation-isometry body) and the banded
whole-walk step with distributed row fetch/update for walks — so the W=1
per-device rate is directly comparable to the flat engine's bench numbers
(BENCH_r04: LINE 40.9M pairs/s, DeepWalk 39.6M, KG 234.8k triplets/s).
A 1-device mesh runs the full collective code paths (self-permute /
degenerate all_to_all); real multi-chip ICI is unavailable here, so
8-chip efficiency is MODELED from per-episode collective bytes against
the MEASURED episode compute of these engines (item 1d).

Usage: python tools/mesh_on_chip.py [--quick]
Prints one JSON line for PERF.md/RESULTS.md.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e ICI: 4 links x ~45 GB/s effective per direction (public v5e specs
# quote 1600 Gbps aggregate); a ring hop or ring all_to_all step moves at
# ~LINK_GBS per direction, both directions usable.
LINK_GBS = 45e9


def timed_episodes(run, n_ep, readback):
    run(0)  # compile + warm
    readback()
    t0 = time.time()
    for e in range(n_ep):
        run(e + 1)
    readback()
    return (time.time() - t0) / n_ep


def main():
    quick = "--quick" in sys.argv
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

    # ---- protocol-shape graph (Youtube scale: V=1M, E~9.9M directed) ----
    V = 200_000 if quick else 1_000_000
    D = 128
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

    out = {"devices": 1, "platform": "tpu", "V": V, "D": D,
           "float_type": "bfloat16"}
    opt = Optimizer(type="SGD", lr=0.025, weight_decay=5e-3)
    part = VertexPartition(np.asarray(g.degrees), 1)
    bf16 = jax.numpy.bfloat16
    vert0 = np.asarray(jax.numpy.asarray(
        rng.uniform(-0.5 / D, 0.5 / D, (V, D)).astype(np.float32), bf16))
    ctx0 = np.zeros((V, D), vert0.dtype)
    n_ep = 2 if quick else 5

    # -- walks mode: banded distributed-row engine at the DeepWalk
    #    protocol shape (aug=5, L=40, bidir, 576 walks = 236,160 slots) --
    aug, L, T = 5, 40, 10
    slot_unit = T * (L + 1)
    Bw = 128 if quick else 576
    B_slots = Bw * slot_unit
    EP = 10 if quick else 50
    walk_cfg = dict(augmentation_step=aug, walk_length=L, batch_walks=Bw,
                    bidir=True, pool_size=64, biased=False)
    tr = ShardedGraphTrainer(mesh, part, D, GRAPH_MODELS["DeepWalk"], opt,
                             num_negative=1, negative_weight=5.0,
                             batch_size=B_slots, ep_batches=EP,
                             sampler_mode="walks", walk_cfg=walk_cfg)
    sample_state = tr.build_sample_state(g)
    state = tr.init_state(vert0, ctx0)
    neg = tr.init_negative_state(g.vertex_weights)
    holder = {}

    def run_w(e):
        holder["state"], _, holder["l"] = tr.run_episode(
            holder.get("state", state), sample_state, neg, e * EP, 10**7,
            seed=e)

    dt = timed_episodes(run_w, n_ep,
                        lambda: np.asarray(holder["l"]))
    assert np.isfinite(np.asarray(holder["l"])).all()
    # valid-pair fraction at this shape ~0.927 (bench.py); report slots
    # and the 0.927-scaled valid rate for comparability
    slots_rate = B_slots * EP / dt
    out["banded_walks"] = {
        "episode_s": round(dt, 4), "B_slots": B_slots, "EP": EP,
        "slots_per_s": round(slots_rate, 1),
        "fetch_capacity": tr._banded_capacity,
        "drop_rate": (tr.pair_drops / max(tr.pair_emitted, 1)),
    }

    # -- edges mode: pooled shared-negative step (LINE aug=1 protocol) ----
    B_e = 65_536 if quick else 249_856  # ~flat bench eff batch, /256
    EPe = 10 if quick else 50
    tre = ShardedGraphTrainer(mesh, part, D, GRAPH_MODELS["LINE"], opt,
                              num_negative=1, negative_weight=5.0,
                              batch_size=B_e, ep_batches=EPe,
                              sampler_mode="edges", pool_size=128)
    estate = tre.init_state(vert0, ctx0)
    eneg = tre.init_negative_state(g.vertex_weights)
    eblocks = tre.build_sample_state(g)
    eh = {"state": estate, "neg": eneg}

    def run_e(e):
        eh["state"], eh["neg"], eh["l"] = tre.run_episode(
            eh["state"], eblocks, eh["neg"], e * EPe, 10**7, seed=e)

    dte = timed_episodes(run_e, n_ep, lambda: np.asarray(eh["l"]))
    assert np.isfinite(np.asarray(eh["l"])).all()
    out["pooled_edges"] = {
        "episode_s": round(dte, 4), "B": B_e, "EP": EPe,
        "samples_per_s": round(B_e * EPe / dte, 1),
    }

    # ---- pooled sharded KG at the FB15k protocol shape ------------------
    NE, NR, DK, K = 14951, 1345, 2048, 64
    if quick:
        NE, DK = 4000, 512
    n_trip = 200_000
    trips = np.stack([rng.integers(0, NE, n_trip),
                      rng.integers(0, NR, n_trip),
                      rng.integers(0, NE, n_trip)], axis=1)
    kg = KnowledgeGraph()
    kg.num_vertex = NE
    kg.num_relation = NR
    kg.num_edge = n_trip
    kg.id2entity = None
    kg.entity2id = None
    kg.id2relation = None
    kg.relation2id = None
    kg.edge_heads = trips[:, 0]
    kg.edge_tails = trips[:, 2]
    kg.edge_relations = trips[:, 1]
    kg.edge_weights = np.ones(n_trip, np.float32)
    kpart = VertexPartition(np.asarray(kg.degrees), 2)
    B_k = 4096 if quick else 14848  # flat bench batch at this shape
    EPk = 8 if quick else 32
    ktr = ShardedKGTrainer(mesh, kpart, DK, KG_MODELS["RotatE"],
                           Optimizer(type="Adam", lr=5e-5), num_negative=K,
                           margin_or_l3=24.0, adversarial_temperature=2.0,
                           batch_size=B_k, ep_batches=EPk,
                           negative_pool="pooled")
    kstate = ktr.init_state(
        np.asarray(jax.numpy.asarray(
            rng.uniform(-0.1, 0.1, (NE, DK)).astype(np.float32), bf16)),
        np.concatenate([rng.uniform(-np.pi, np.pi, (NR, DK // 2)),
                        np.zeros((NR, DK // 2))], axis=1).astype(np.float32))
    ktrip = ktr.init_triplets(kg)
    kh = {"state": kstate}

    def run_k(e):
        kh["state"], kh["l"] = ktr.run_episode(kh["state"], ktrip, e * EPk,
                                               10**7, seed=e)

    kdt = timed_episodes(run_k, n_ep, lambda: np.asarray(kh["l"]))
    assert np.isfinite(np.asarray(kh["l"])).all()
    out["pooled_kg"] = {
        "episode_s": round(kdt, 4), "B": B_k, "EP": EPk, "dim": DK, "K": K,
        "triplets_per_s": round(B_k * EPk / kdt, 1),
    }

    # ---- ICI scaling model at 8 chips, derived from the rates ABOVE -----
    P = 8
    # walks: per batch per device, the distributed row fetch/return moves
    #   requests  P*C * 8 B  (ids + flags, i32)
    #   rows      P*C * 2D * 2 B  (bf16 both-table rows)
    #   deltas    P*C * 2D * 2 B  (SGD ships lr-scaled TABLE-dtype deltas)
    # with C ~= ceil(slack*N/P), slack=2 (zigzag-balanced partitions).
    N = Bw * (L + 1) + 64 * 64
    C8 = int(np.ceil(2.0 * N / P))
    bytes_walk = P * C8 * (8 + 2 * D * 2 + 2 * D * 2)
    t_batch_w = dt / EP
    # ring all_to_all: each device ships (P-1)/P of its payload, both
    # directions usable -> effective 2*LINK per device
    t_ici_w = bytes_walk * (P - 1) / P / (2 * LINK_GBS)
    eff_walks = t_batch_w / (t_batch_w + t_ici_w)
    # edges: ONE ring rotation per episode moves the context shard (bf16)
    # + its alias arrays; no per-batch traffic
    rot_bytes = (V // P) * (D * 2 + 8)
    t_ici_e = rot_bytes / LINK_GBS
    eff_edges = dte / (dte + t_ici_e)
    # KG pooled: per episode, relation delta psum (2 hops' worth on a
    # ring ~ 2x payload) + the tournament arena transition (2 shards of
    # entity rows + 2 Adam moment slabs each, one hop)
    rel_bytes = 2 * NR * DK * 4
    cap_k = kpart.capacity
    arena_bytes = 2 * cap_k * DK * (2 + 2 * 4)
    t_ici_k = (rel_bytes + arena_bytes) / LINK_GBS
    eff_kg = kdt / (kdt + t_ici_k)
    out["ici_model_8chip"] = {
        "assumed_link_GBs": LINK_GBS / 1e9,
        "walks_bytes_per_batch": int(bytes_walk),
        "walks_eff": round(eff_walks, 4),
        "edges_rotation_bytes": int(rot_bytes),
        "edges_eff": round(eff_edges, 4),
        "kg_bytes_per_episode": int(rel_bytes + arena_bytes),
        "kg_eff": round(eff_kg, 4),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
