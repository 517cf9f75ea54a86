"""Multi-chip sharded trainer tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphvite_tpu.graph import Graph
from graphvite_tpu.models import GRAPH_MODELS
from graphvite_tpu.optim import Optimizer
from graphvite_tpu.parallel import (VertexPartition, ShardedGraphTrainer,
                                    make_mesh)
from graphvite_tpu.parallel.mesh import BlockEdgeTables


def two_blocks(n=60, seed=0):
    """Two dense blocks with sparse cross edges."""
    rng = np.random.default_rng(seed)
    half = n // 2
    edges = []
    for _ in range(n * 12):
        blk = rng.integers(2)
        u = rng.integers(half) + blk * half
        v = rng.integers(half) + blk * half
        if u != v:
            edges.append((str(u), str(v)))
    for _ in range(n // 4):
        edges.append((str(rng.integers(half)),
                      str(rng.integers(half) + half)))
    return Graph().load_edge_list(edges)


def test_sharded_step_loss_stable_at_saturation():
    """The episode loss must use the stable softplus forms: for a confident
    wrong negative (logit z >> 0) the loss term is softplus(z) ~= z, not the
    -log(1 - sigmoid(z) + eps) form that XLA simplifies into log(0)."""
    from graphvite_tpu.parallel.mesh import make_sharded_graph_step

    dim = 8
    opt = Optimizer(type="SGD", lr=0.0, weight_decay=0.0)
    step = jax.jit(make_sharded_graph_step(GRAPH_MODELS["LINE"], opt,
                                           num_negative=1,
                                           negative_weight=1.0))
    # one vertex, two contexts, all rows = 10 => every logit = 10*10*8 = 800
    z = 800.0
    vertex = jnp.full((2, dim), 10.0)
    context = jnp.full((2, dim), 10.0)
    state = {"tables": (vertex, context), "moments": ((), ())}
    heads = jnp.zeros((4,), jnp.int32)
    tails = jnp.ones((4,), jnp.int32)
    mask = jnp.ones((4,), jnp.float32)
    neg_prob = jnp.ones((2,), jnp.float32)
    neg_alias = jnp.zeros((2,), jnp.int32)
    _, loss = step(state, (heads, tails, mask), jax.random.PRNGKey(0),
                   jnp.float32(0.0), neg_prob, neg_alias, jnp.int32(2))
    # positive: softplus(-z) ~ 0; negative: softplus(z) ~ z; /(1 + k*w) = /2
    expected = z / 2.0
    assert np.isfinite(float(loss))
    assert abs(float(loss) - expected) / expected < 1e-3


def test_vertex_partition_roundtrip():
    rng = np.random.default_rng(0)
    deg = rng.integers(1, 100, 37)
    part = VertexPartition(deg, 4)
    table = rng.standard_normal((37, 8)).astype(np.float32)
    assert np.array_equal(part.unshard_rows(part.shard_rows(table)), table)
    # zigzag balance: partition sizes differ by at most 1
    sizes = np.bincount(part.part_of, minlength=4)
    assert sizes.max() - sizes.min() <= 1


def test_block_tables_cover_all_edges():
    g = two_blocks()
    part = VertexPartition(np.asarray(g.degrees), 4)
    bt = BlockEdgeTables(g, part)
    # every directed edge appears exactly once across all blocks
    total = sum(int(bt.offsets[i, -1]) for i in range(4))
    assert total == g.num_directed_edge
    # edges in block (i, j) have head partition i and tail partition j
    for i in range(4):
        for j in range(4):
            lo, hi = bt.offsets[i, j], bt.offsets[i, j + 1]
            h_local = bt.heads[i, lo:hi]
            t_local = bt.tails[i, lo:hi]
            # local ids must be within the partition capacities
            assert (h_local < part.capacity).all()
            assert (t_local < part.capacity).all()


def _train_sharded(g, num_epoch=800, dim=16, P=4, batch=256, seed=0):
    mesh = make_mesh(P)
    part = VertexPartition(np.asarray(g.degrees), P)
    opt = Optimizer(type="SGD", lr=0.025, weight_decay=5e-3)
    ep_batches = 4
    num_batch = max(num_epoch * g.num_edge // batch, 1)
    trainer = ShardedGraphTrainer(
        mesh, part, dim, GRAPH_MODELS["LINE"], opt, num_negative=2,
        negative_weight=1.0, batch_size=batch, ep_batches=ep_batches)
    rng = np.random.default_rng(seed)
    vertex = rng.uniform(-0.5 / dim, 0.5 / dim,
                         (g.num_vertex, dim)).astype(np.float32)
    context = np.zeros((g.num_vertex, dim), np.float32)
    state = trainer.init_state(vertex, context)
    neg_state = trainer.init_negative_state(g.vertex_weights)
    blocks = trainer.build_blocks(g)
    batch_id = 0
    first_loss = last_loss = None
    while batch_id < num_batch:
        state, neg_state, losses = trainer.run_episode(
            state, blocks, neg_state, batch_id, num_batch, seed=batch_id)
        l = np.asarray(losses)
        # stable softplus loss must never go inf/NaN (regression for the
        # naive -log(1-sigmoid+eps) form XLA simplifies into log(0))
        assert np.isfinite(l).all()
        l = l[l > 0]  # zero-loss episodes come only from empty blocks
        if l.size:
            if first_loss is None:
                first_loss = float(l.mean())
            last_loss = float(l.mean())
        batch_id += ep_batches
    v, c = trainer.gather_tables(state)
    return v, c, first_loss, last_loss


def test_sharded_training_learns():
    g = two_blocks(100)
    v, c, first_loss, last_loss = _train_sharded(g)
    assert np.isfinite(v).all() and np.isfinite(c).all()
    assert last_loss < first_loss  # training reduces the loss
    # AUC of true edges vs random cross-block pairs (cross edges are rare),
    # matching the quality bar of the single-device LINE test
    rng = np.random.default_rng(1)
    half = g.num_vertex // 2
    k = 300
    sel = rng.choice(g.num_directed_edge, size=k, replace=False)
    pos = np.stack([g.edge_heads[sel], g.edge_tails[sel]], axis=1)
    neg = np.stack([rng.integers(half, size=k),
                    rng.integers(half, size=k) + half], axis=1)
    pairs = np.concatenate([pos, neg])
    labels = np.array([1] * k + [0] * k)
    scores = np.einsum("ij,ij->i", v[pairs[:, 0]], c[pairs[:, 1]])
    order = np.argsort(-scores, kind="stable")
    y = labels[order]
    hit = np.cumsum(y)
    auc = hit[y == 0].sum() / float((y == 0).sum() * (y == 1).sum())
    assert auc > 0.8


def test_rotation_bookkeeping():
    """After e episodes gather_tables must return partition-correct rows
    regardless of e (the ppermute rotation must be undone)."""
    g = two_blocks(32)
    P = 4
    mesh = make_mesh(P)
    part = VertexPartition(np.asarray(g.degrees), P)
    opt = Optimizer(type="SGD", lr=0.0)  # lr=0: tables must be unchanged
    trainer = ShardedGraphTrainer(
        mesh, part, 8, GRAPH_MODELS["LINE"], opt, num_negative=1,
        negative_weight=1.0, batch_size=32, ep_batches=2)
    rng = np.random.default_rng(0)
    vertex = rng.standard_normal((g.num_vertex, 8)).astype(np.float32)
    context = rng.standard_normal((g.num_vertex, 8)).astype(np.float32)
    state = trainer.init_state(vertex, context)
    neg_state = trainer.init_negative_state(g.vertex_weights)
    blocks = trainer.build_blocks(g)
    for e in range(3):  # 3 episodes: rotation not a multiple of P
        state, neg_state, _ = trainer.run_episode(
            state, blocks, neg_state, 0, 100, seed=e)
    v, c = trainer.gather_tables(state)
    np.testing.assert_allclose(v, vertex, rtol=1e-6)
    np.testing.assert_allclose(c, context, rtol=1e-6)


def math_kg(n=300, seed=0):
    from graphvite_tpu.graph import KnowledgeGraph
    rng = np.random.default_rng(seed)
    trips = [(str(rng.integers(40)), "r%d" % rng.integers(4),
              str(rng.integers(40))) for _ in range(n)]
    return KnowledgeGraph().load_triplet_list(trips)


def test_replicated_kg_trainer():
    from graphvite_tpu.parallel import ReplicatedKGTrainer
    from graphvite_tpu.models import KG_MODELS
    from graphvite_tpu.ops import steps as _steps

    kg = math_kg()
    dim, P_ = 16, 8
    mesh = make_mesh(P_)
    opt = Optimizer(type="Adam", lr=1e-3)
    step = _steps.make_kg_train_step(KG_MODELS["RotatE"], opt, 4, 6.0, 2.0,
                                     1.0)
    trainer = ReplicatedKGTrainer(mesh, dim, step, opt, batch_size=128,
                                  ep_batches=4)
    rng = np.random.default_rng(0)
    ent = rng.uniform(-0.1, 0.1, (kg.num_vertex, dim)).astype(np.float32)
    rel = rng.uniform(-np.pi, np.pi, (kg.num_relation, dim)).astype(np.float32)
    tables, moments = trainer.init_state((ent, rel))
    edges = trainer.init_edges(kg)
    losses_all = []
    for e in range(10):
        tables, moments, losses = trainer.run_episode(
            tables, moments, edges, e * 4, 200, seed=e)
        losses_all.append(np.asarray(losses).mean())
    ent_out = np.asarray(tables[0])
    assert np.isfinite(ent_out).all()
    assert np.mean(losses_all[-3:]) < np.mean(losses_all[:3])
    # tables must be identical across devices (replicated after psum)
    assert not np.allclose(ent_out, ent)  # actually trained


# -- product path: solver.train() routes to the mesh engine ------------------

def _auc_vc(g, v, c, seed=1):
    rng = np.random.default_rng(seed)
    half = g.num_vertex // 2
    k = 300
    sel = rng.choice(g.num_directed_edge, size=k, replace=False)
    pos = np.stack([g.edge_heads[sel], g.edge_tails[sel]], axis=1)
    neg = np.stack([rng.integers(half, size=k),
                    rng.integers(half, size=k) + half], axis=1)
    ps = np.einsum("ij,ij->i", v[pos[:, 0]], c[pos[:, 1]])
    ns = np.einsum("ij,ij->i", v[neg[:, 0]], c[neg[:, 1]])
    return (ps[:, None] > ns[None, :]).mean()


def test_solver_mesh_line():
    """GraphSolver.train with num_worker > 1 trains LINE through the sharded
    episode engine and reaches the same quality bar as single-chip."""
    from graphvite_tpu.solver import GraphSolver

    g = two_blocks(100)
    solver = GraphSolver(dim=16, num_worker=4)
    solver.build(g, num_negative=2, batch_size=256, episode_size=4)
    solver.train(model="LINE", num_epoch=2400, augmentation_step=1,
                 negative_weight=1.0, log_frequency=10**9)
    v, c = solver.vertex_embeddings, solver.context_embeddings
    assert np.isfinite(v).all() and np.isfinite(c).all()
    assert _auc_vc(g, v, c) > 0.9


def test_solver_mesh_deepwalk():
    """DeepWalk (walk-augmented sampling) through the mesh engine: walks are
    generated on every device over the replicated graph, pairs routed to the
    head-partition owner via all_to_all."""
    from graphvite_tpu.solver import GraphSolver

    g = two_blocks(100)
    solver = GraphSolver(dim=16, num_worker=4)
    solver.build(g, num_negative=2, batch_size=256, episode_size=4)
    solver.train(model="DeepWalk", num_epoch=1200, augmentation_step=2,
                 random_walk_length=6, negative_weight=1.0,
                 log_frequency=10**9)
    v, c = solver.vertex_embeddings, solver.context_embeddings
    assert np.isfinite(v).all() and np.isfinite(c).all()
    assert _auc_vc(g, v, c) > 0.85


def test_solver_mesh_matches_single_chip_loss():
    """Final mesh-mode loss is within noise of the single-chip loss for the
    same hyperparameters (VERDICT round-1 item 2 acceptance)."""
    from graphvite_tpu.solver import GraphSolver

    g = two_blocks(100)

    def final_loss(num_worker):
        import logging
        records = []

        class Grab(logging.Handler):
            def emit(self, r):
                records.append(r.getMessage())

        from graphvite_tpu.utils.common import logger as glog
        h = Grab()
        glog.addHandler(h)
        try:
            solver = GraphSolver(dim=16, num_worker=num_worker, seed=7)
            solver.build(g, num_negative=2, batch_size=256, episode_size=4)
            solver.train(model="LINE", num_epoch=1200, augmentation_step=1,
                         negative_weight=1.0, log_frequency=10**9)
        finally:
            glog.removeHandler(h)
        losses = [float(m.rsplit("=", 1)[1]) for m in records
                  if "loss =" in m]
        return losses[-1]

    single = final_loss(1)
    mesh = final_loss(4)
    assert abs(single - mesh) / max(single, 1e-9) < 0.25, (single, mesh)


def test_solver_mesh_deepwalk_matches_single_chip_loss():
    """The banded walks mesh engine (distributed row fetch/update) trains
    the SAME step family as the flat engine (VERDICT r4 item 1); its final
    loss must be within noise of single-chip DeepWalk at matched
    hyperparameters."""
    from graphvite_tpu.solver import GraphSolver

    g = two_blocks(100)

    def final_loss(num_worker):
        import logging
        records = []

        class Grab(logging.Handler):
            def emit(self, r):
                records.append(r.getMessage())

        from graphvite_tpu.utils.common import logger as glog
        h = Grab()
        glog.addHandler(h)
        try:
            solver = GraphSolver(dim=16, num_worker=num_worker, seed=7)
            solver.build(g, num_negative=2, batch_size=512, episode_size=4)
            solver.train(model="DeepWalk", num_epoch=1200,
                         augmentation_step=2, random_walk_length=6,
                         negative_weight=1.0, log_frequency=10**9)
        finally:
            glog.removeHandler(h)
        losses = [float(m.rsplit("=", 1)[1]) for m in records
                  if "loss =" in m]
        return losses[-1]

    single = final_loss(1)
    mesh = final_loss(4)
    assert abs(single - mesh) / max(single, 1e-9) < 0.25, (single, mesh)


def test_banded_mesh_lr0_roundtrip():
    """lr=0 banded episodes must leave both sharded tables exactly
    unchanged: the distributed fetch -> core -> gradient-return path may
    not corrupt rows it touches (wiring correctness for the all_to_all
    route and the owner-side scatter)."""
    from graphvite_tpu.parallel.mesh import (VertexPartition,
                                             ShardedGraphTrainer, make_mesh)
    from graphvite_tpu.models import GRAPH_MODELS

    g = two_blocks(80)
    W = 4
    mesh = make_mesh(W)
    part = VertexPartition(np.asarray(g.degrees), W)
    opt = Optimizer(type="SGD", lr=0.0, weight_decay=0.0)
    walk_cfg = dict(augmentation_step=2, walk_length=6, batch_walks=16,
                    bidir=True, pool_size=16, biased=False)
    tr = ShardedGraphTrainer(mesh, part, 16, GRAPH_MODELS["DeepWalk"], opt,
                             num_negative=1, negative_weight=1.0,
                             batch_size=16 * 4 * 7, ep_batches=3,
                             sampler_mode="walks", walk_cfg=walk_cfg)
    sample_state = tr.build_sample_state(g)
    rng = np.random.default_rng(0)
    v0 = rng.standard_normal((g.num_vertex, 16)).astype(np.float32)
    c0 = rng.standard_normal((g.num_vertex, 16)).astype(np.float32)
    state = tr.init_state(v0, c0)
    neg = tr.init_negative_state(np.asarray(g.vertex_weights))
    for e in range(3):
        state, neg, losses = tr.run_episode(state, sample_state, neg,
                                            e * 3, 100, seed=e)
        assert np.isfinite(np.asarray(losses)).all()
    v, c = tr.gather_tables(state)
    np.testing.assert_allclose(v, v0, rtol=1e-6)
    np.testing.assert_allclose(c, c0, rtol=1e-6)


def test_banded_mesh_node2vec_finite():
    """Biased (second-order) walks through the banded mesh engine: the
    rejection sampler + membership search compile inside the shard_map
    episode and produce finite tables."""
    from graphvite_tpu.solver import GraphSolver

    g = two_blocks(80)
    s = GraphSolver(dim=8, seed=5, num_worker=4)
    s.build(g, num_negative=1, batch_size=512, episode_size=2)
    s.train(model="node2vec", num_epoch=30, augmentation_step=2,
            random_walk_length=6, p=4.0, q=2.0, log_frequency=10**9)
    assert np.isfinite(s.vertex_embeddings).all()
    assert not np.allclose(s.vertex_embeddings, 0)


def test_banded_mesh_adam_moments_finite():
    """The moments return path (counts + squared sums routed to owners)
    must produce finite tables and learn under Adam."""
    from graphvite_tpu.solver import GraphSolver

    g = two_blocks(100)
    s = GraphSolver(dim=16, seed=3, num_worker=4)
    s.build(g, optimizer=dict(type="Adam", lr=1e-3), num_negative=2,
            batch_size=512, episode_size=4)
    s.train(model="DeepWalk", num_epoch=200, augmentation_step=2,
            random_walk_length=6, log_frequency=10**9)
    assert np.isfinite(s.vertex_embeddings).all()
    assert np.isfinite(s.context_embeddings).all()
    assert not np.allclose(s.vertex_embeddings, 0)


# -- sharded (tied-weights) KG trainer ---------------------------------------

def test_kg_tournament_schedule_all_pairs():
    """Every partition pair must co-reside exactly once per sweep of
    2W-1 rounds (the circle-method guarantee the schedule relies on)."""
    from graphvite_tpu.parallel.kg import ShardedKGTrainer

    class Dummy(ShardedKGTrainer):
        def __init__(self, W):
            self.num_worker = W
            self.M = 2 * W - 1
            self.reset_schedule()

    for W in (1, 2, 3, 4):
        t = Dummy(W)
        seen = set()
        for _ in range(t.M):
            for a, b in t.assignments():
                pair = frozenset((a, b))
                assert pair not in seen, (W, pair)
                seen.add(pair)
            t.advance_schedule()
        import itertools
        expect = {frozenset(p) for p in
                  itertools.combinations(range(2 * W), 2)}
        assert seen == expect


def _sharded_kg_trainer(kg, dim=16, W=4, batch=128, **kw):
    from graphvite_tpu.parallel.kg import ShardedKGTrainer
    from graphvite_tpu.models import KG_MODELS

    mesh = make_mesh(W)
    part = VertexPartition(np.asarray(kg.degrees), 2 * W)
    opt = kw.pop("opt", Optimizer(type="Adam", lr=5e-3))
    return ShardedKGTrainer(
        mesh, part, dim, KG_MODELS["RotatE"], opt, num_negative=4,
        margin_or_l3=6.0, adversarial_temperature=2.0, batch_size=batch,
        ep_batches=2, **kw)


def test_sharded_kg_transition_roundtrip():
    """lr=0 episodes must leave the entity table exactly unchanged through
    the tournament rotation (shard movement correctness)."""
    kg = math_kg(400)
    trainer = _sharded_kg_trainer(kg, opt=Optimizer(type="SGD", lr=0.0))
    rng = np.random.default_rng(0)
    ent = rng.standard_normal((kg.num_vertex, 16)).astype(np.float32)
    rel = rng.standard_normal((kg.num_relation, 16)).astype(np.float32)
    state = trainer.init_state(ent, rel)
    triplets = trainer.init_triplets(kg)
    for e in range(5):  # rotation not a multiple of the sweep length
        state, _ = trainer.run_episode(state, triplets, e * 2, 100, seed=e)
    np.testing.assert_allclose(trainer.gather_entities(state), ent,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(state["rel"]), rel, rtol=1e-6)


def test_sharded_kg_learns():
    kg = math_kg(600)
    trainer = _sharded_kg_trainer(kg)
    rng = np.random.default_rng(0)
    dim = 16
    ent = rng.uniform(-0.5, 0.5, (kg.num_vertex, dim)).astype(np.float32)
    phases = rng.uniform(-np.pi, np.pi, (kg.num_relation, dim // 2))
    rel = np.concatenate([phases, np.zeros((kg.num_relation, dim - dim // 2))],
                         axis=1).astype(np.float32)
    state = trainer.init_state(ent, rel)
    triplets = trainer.init_triplets(kg)
    num_batch = 400
    losses = []
    bid = 0
    e = 0
    while bid < num_batch:
        state, l = trainer.run_episode(state, triplets, bid, num_batch,
                                       seed=e)
        l = np.asarray(l).reshape(-1)
        assert np.isfinite(l).all()
        losses.append(l.mean())
        bid += 2 * 4  # ep_batches * W
        e += 1
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    ent_out = trainer.gather_entities(state)
    assert np.isfinite(ent_out).all()
    assert not np.allclose(ent_out, ent)


def test_sharded_kg_pooled_learns():
    """negative_pool="pooled" runs the TUNED shared-candidate step family
    (make_kg_pool_step incl. the RotatE isometry body) on the local arena —
    the engine the multichip throughput claims rest on (VERDICT r4 item 1).
    Gate: trains to the same math-fixture quality as the classic engine."""
    import os
    from collections import defaultdict
    from graphvite_tpu.graph import KnowledgeGraph
    from graphvite_tpu.solver import KnowledgeGraphSolver
    from graphvite_tpu.application import evaluate as ev

    rng = np.random.default_rng(0)
    trips = []
    for _ in range(2000):
        x = int(rng.integers(50))
        c = int(rng.integers(1, 6))
        trips.append((str(x), "+%d" % c, str((x + c) % 50)))
    kg = KnowledgeGraph().load_triplet_list(trips)
    os.environ["GRAPHVITE_KG_NEG_POOL"] = "pooled"
    try:
        s = KnowledgeGraphSolver(dim=32, seed=0, num_worker=4)
        s.build(kg, optimizer=dict(type="Adam", lr=5e-3), num_negative=8,
                batch_size=256, episode_size=4)
        s.train(model="RotatE", num_epoch=600, margin=6.0,
                log_frequency=10**9)
    finally:
        del os.environ["GRAPHVITE_KG_NEG_POOL"]
    test = []
    for _ in range(100):
        x = int(rng.integers(50))
        c = int(rng.integers(1, 6))
        test.append((str(x), "+%d" % c, str((x + c) % 50)))
    e2i, r2i = kg.entity2id, kg.relation2id
    rows = [(e2i[h], r2i[r], e2i[t]) for h, r, t in test
            if h in e2i and r in r2i and t in e2i]
    H, R, T = (np.asarray(x) for x in zip(*rows))
    rk = ev.filtered_rankings("RotatE", s.entity_embeddings,
                              s.relation_embeddings, H, R, T,
                              defaultdict(set), defaultdict(set), 6.0,
                              "tail")
    m = ev.ranking_metrics(rk)
    assert m["MRR"] > 0.85, m


def test_solver_mesh_kg_quality():
    """KnowledgeGraphSolver.train with num_worker > 1 routes through the
    sharded tied-weights engine and matches the single-chip quality gate on
    the math fixture."""
    import os
    from collections import defaultdict
    from graphvite_tpu.graph import KnowledgeGraph
    from graphvite_tpu.solver import KnowledgeGraphSolver
    from graphvite_tpu.application import evaluate as ev

    rng = np.random.default_rng(0)
    trips = []
    for _ in range(2000):
        x = int(rng.integers(50))
        c = int(rng.integers(1, 6))
        trips.append((str(x), "+%d" % c, str((x + c) % 50)))
    kg = KnowledgeGraph().load_triplet_list(trips)
    s = KnowledgeGraphSolver(dim=32, seed=0, num_worker=4)
    s.build(kg, optimizer=dict(type="Adam", lr=5e-3), num_negative=8,
            batch_size=256, episode_size=4)
    s.train(model="RotatE", num_epoch=600, margin=6.0, log_frequency=10**9)

    test = []
    for _ in range(100):
        x = int(rng.integers(50))
        c = int(rng.integers(1, 6))
        test.append((str(x), "+%d" % c, str((x + c) % 50)))
    e2i, r2i = kg.entity2id, kg.relation2id
    rows = [(e2i[h], r2i[r], e2i[t]) for h, r, t in test
            if h in e2i and r in r2i and t in e2i]
    H, R, T = (np.asarray(x) for x in zip(*rows))
    rk = ev.filtered_rankings("RotatE", s.entity_embeddings,
                              s.relation_embeddings, H, R, T,
                              defaultdict(set), defaultdict(set), 6.0,
                              "tail")
    m = ev.ranking_metrics(rk)
    # single-chip saturates this fixture at MRR 1.00 (round-3 A/B,
    # RESULTS.md); the mesh engine must stay within 15% of it
    assert m["MRR"] > 0.85, m


@pytest.mark.skipif("GRAPHVITE_BIG_TESTS" not in __import__("os").environ,
                    reason="multi-GB capability test (GRAPHVITE_BIG_TESTS=1)")
def test_solver_mesh_kg_5m_entities():
    """VERDICT round-1 item 3 acceptance: a 5M-entity dim-512 synthetic KG
    trains on the 8-device CPU mesh — impossible under table replication."""
    from graphvite_tpu.graph import KnowledgeGraph
    from graphvite_tpu.solver import KnowledgeGraphSolver

    rng = np.random.default_rng(0)
    V, E = 5_000_000, 500_000
    kg = KnowledgeGraph()
    kg.num_vertex = V
    kg.num_relation = 100
    kg.num_edge = E
    kg.id2entity = None
    kg.entity2id = None
    kg.id2relation = None
    kg.relation2id = None
    kg.edge_heads = rng.integers(V, size=E)
    kg.edge_tails = rng.integers(V, size=E)
    kg.edge_relations = rng.integers(100, size=E)
    kg.edge_weights = np.ones(E, np.float32)
    s = KnowledgeGraphSolver(dim=512, seed=0, num_worker=8)
    s.build(kg, optimizer=dict(type="Adam", lr=5e-3), num_negative=4,
            batch_size=1024, episode_size=1)
    # a fraction of an epoch: a few full episodes through the engine is the
    # capability proof; a full epoch at this scale is a benchmark, not a test
    s.train(model="RotatE", num_epoch=0.05, margin=9.0, log_frequency=10**9)
    assert np.isfinite(np.asarray(s.state["tables"][0][:100])).all()


def test_walk_pair_drop_accounting():
    """Mesh walk mode must account for all_to_all capacity overflow
    (VERDICT round-2 weak #4): on a hub-star graph all pairs route to the
    hub's partition owner; the trainer either delivers everything or
    reports an explicit drop count — never silent loss."""
    from graphvite_tpu.solver import GraphSolver

    rng = np.random.default_rng(0)
    # star: one hub connected to everyone, plus a few random spokes so
    # every vertex has degree >= 1
    n = 120
    edges = [("hub", str(i)) for i in range(n)]
    edges += [(str(rng.integers(n)), str(rng.integers(n)))
              for _ in range(40)]
    g = Graph().load_edge_list(edges, as_undirected=True)

    solver = GraphSolver(dim=8, num_worker=4)
    solver.build(g, num_negative=1, batch_size=128, episode_size=2)
    solver.train(model="DeepWalk", num_epoch=40, augmentation_step=2,
                 random_walk_length=6, negative_weight=1.0,
                 log_frequency=10**9)
    tr = solver._mesh_trainer
    assert tr.pair_emitted > 0
    # the accounting is the contract: drops are visible, and the default
    # 2x slack must lose at most a bounded fraction even on a pure star
    drop_rate = tr.pair_drops / tr.pair_emitted
    assert drop_rate <= 0.5, drop_rate
    if tr.pair_drops > 0.01 * tr.pair_emitted:
        assert tr._drop_warned

    # raising route_slack must eliminate (or strictly reduce) the drops
    import os
    os.environ["GRAPHVITE_WALK_ROUTE_SLACK"] = "8"
    try:
        solver2 = GraphSolver(dim=8, num_worker=4)
        solver2.build(g, num_negative=1, batch_size=128, episode_size=2)
        solver2.train(model="DeepWalk", num_epoch=40, augmentation_step=2,
                      random_walk_length=6, negative_weight=1.0,
                      log_frequency=10**9)
        tr2 = solver2._mesh_trainer
        assert tr2.pair_emitted > 0
        rate2 = tr2.pair_drops / tr2.pair_emitted
        assert rate2 <= drop_rate
    finally:
        del os.environ["GRAPHVITE_WALK_ROUTE_SLACK"]


def test_solver_mesh_visualization():
    """VisualizationSolver with num_worker > 1 routes through the
    replicated-table mesh engine (VERDICT r2 missing #4: the reference
    trains LargeVis on 4 GPUs through the same solver core,
    visualization.cuh:417-596): cluster separation must match the
    single-chip layout quality."""
    from graphvite_tpu.solver import VisualizationSolver

    g = two_blocks(100)
    half = 50

    def separation(num_worker):
        s = VisualizationSolver(dim=2, seed=3, num_worker=num_worker)
        s.build(g, num_negative=5, batch_size=512, episode_size=4)
        s.train(num_epoch=400, log_frequency=10**9)
        coords = s.coordinates
        assert np.isfinite(coords).all()
        names = np.asarray([g.name2id[str(i)] for i in range(2 * half)])
        a, b = coords[names[:half]], coords[names[half:]]
        within = (np.linalg.norm(a - a.mean(0), axis=1).mean()
                  + np.linalg.norm(b - b.mean(0), axis=1).mean()) / 2
        between = np.linalg.norm(a.mean(0) - b.mean(0))
        return between / max(within, 1e-9)

    single = separation(1)
    mesh = separation(4)
    # both layouts must separate the two communities clearly, and the
    # mesh layout must be at least half as separated as single-chip
    assert single > 1.5, single
    assert mesh > max(1.5, 0.5 * single), (single, mesh)


def test_mesh_moment_resume_carrythrough():
    """resume=True across mesh runs must continue from the gathered
    moments, not zeros: seeding init_state with the canonical moments a
    previous run returned reproduces that run's device state exactly
    (VERDICT r3 weak 7)."""
    g = two_block_graph(60) if "two_block_graph" in globals() else None
    if g is None:
        import numpy as _np
        from graphvite_tpu.graph import Graph
        rng = _np.random.default_rng(3)
        e = rng.integers(0, 60, (600, 2))
        e = e[e[:, 0] != e[:, 1]]
        g = Graph()
        g.load_edge_list([tuple(x) for x in e], as_undirected=True,
                         normalization=False)
    from graphvite_tpu.models import GRAPH_MODELS
    from graphvite_tpu.optim import Optimizer
    from graphvite_tpu.parallel.mesh import (VertexPartition,
                                             ShardedGraphTrainer, make_mesh)

    W, dim = 4, 8
    mesh = make_mesh(W)
    part = VertexPartition(np.asarray(g.degrees), W)
    opt = Optimizer(type="Adam", lr=1e-3)
    tr = ShardedGraphTrainer(mesh, part, dim, GRAPH_MODELS["LINE"], opt,
                             num_negative=2, negative_weight=1.0,
                             batch_size=128, ep_batches=2)
    rng = np.random.default_rng(0)
    v0 = rng.normal(size=(g.num_vertex, dim)).astype(np.float32)
    c0 = np.zeros((g.num_vertex, dim), np.float32)
    st = tr.init_state(v0, c0)
    neg = tr.init_negative_state(np.asarray(g.vertex_weights))
    blocks = tr.build_blocks(g)
    st, neg, _ = tr.run_episode(st, blocks, neg, 0, 1000, seed=1)
    # canonical gather (what the solver checkpoints)
    v1, c1 = tr.gather_tables(st)
    e = tr.rotation % tr.num_partition
    unrot = lambda x: np.roll(np.asarray(x), e, axis=0)
    moms = (tuple(part.unshard_rows(np.asarray(m))
                  for m in st["moments"][0]),
            tuple(part.unshard_rows(unrot(m))
                  for m in st["moments"][1]))
    assert any(float(np.abs(m).sum()) > 0 for m in moms[0] + moms[1])
    # re-entry with the canonical moments must reproduce the device state
    st2 = tr.init_state(np.asarray(v1), np.asarray(c1), moments_np=moms)
    for a, b in zip(st["moments"][0], st2["moments"][0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    # context side re-enters at rotation 0 (canonical order)
    for m_can, b in zip(moms[1], st2["moments"][1]):
        np.testing.assert_allclose(part.shard_rows(m_can), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    # zero-seeded init (the old behavior) must NOT match
    st3 = tr.init_state(np.asarray(v1), np.asarray(c1))
    assert any(float(np.abs(np.asarray(m)).sum()) > 0
               for m in st2["moments"][0])
    assert all(float(np.abs(np.asarray(m)).sum()) == 0
               for m in st3["moments"][0])
