"""Correctness of the Pallas tile-sweep scatter-add (interpret mode on CPU).

The kernel must reproduce XLA's `table.at[ids].add(upd)` semantics exactly:
duplicates sum, order-independent, zero-pad rows are no-ops. Hub-heavy id
distributions exercise multi-chunk tiles and tile-spanning runs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphvite_tpu.ops.pallas_scatter import sweep_scatter_add


def _pad_sorted(ids, upd, chunk, v):
    n = ids.shape[0]
    pad = (-n) % chunk
    if pad:
        ids = np.concatenate([ids, np.full((pad,), v - 1, ids.dtype)])
        upd = np.concatenate([upd, np.zeros((pad, upd.shape[1]), upd.dtype)])
    order = np.argsort(ids, kind="stable")
    return ids[order], upd[order]


@pytest.mark.parametrize("v,d,n,tile,chunk", [
    (4096, 128, 2048, 512, 256),
    (4000, 128, 1024, 512, 128),     # ragged last tile
    (2048, 256, 4096, 256, 512),     # chunk > tile, wide rows
])
def test_sweep_matches_xla_scatter(v, d, n, tile, chunk):
    rng = np.random.default_rng(0)
    # power-law-ish ids: heavy duplicates on low ids (hub rows)
    ids = (rng.random(n) ** 3 * v).astype(np.int32)
    upd = rng.normal(size=(n, d)).astype(np.float32)
    table = rng.normal(size=(v, d)).astype(np.float32)

    want = jnp.asarray(table).at[jnp.asarray(ids)].add(jnp.asarray(upd))
    sid, supd = _pad_sorted(ids, upd, chunk, v)
    got = sweep_scatter_add(jnp.asarray(table), jnp.asarray(sid),
                            jnp.asarray(supd), tile_rows=tile, chunk=chunk,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_sweep_single_hub_row():
    """One id repeated across many chunks (a hub vertex in a power-law
    batch) must accumulate every update."""
    v, d, n = 1024, 128, 2048
    ids = np.zeros((n,), np.int32)
    ids[:7] = 3
    upd = np.ones((n, d), np.float32)
    table = np.zeros((v, d), np.float32)
    sid, supd = _pad_sorted(ids, upd, 256, v)
    got = np.asarray(sweep_scatter_add(
        jnp.asarray(table), jnp.asarray(sid), jnp.asarray(supd),
        tile_rows=256, chunk=256, interpret=True))
    assert got[0, 0] == pytest.approx(n - 7)
    assert got[3, 0] == pytest.approx(7)
    assert np.all(got[4:] == 0)


def test_sweep_bf16_table():
    v, d, n = 2048, 128, 1024
    rng = np.random.default_rng(1)
    ids = rng.integers(0, v, n).astype(np.int32)
    upd = rng.normal(size=(n, d)).astype(np.float32)
    table = rng.normal(size=(v, d)).astype(np.float32)
    want = (jnp.asarray(table).astype(jnp.bfloat16)
            .at[jnp.asarray(ids)].add(jnp.asarray(upd).astype(jnp.bfloat16)))
    sid, supd = _pad_sorted(ids, upd, 256, v)
    got = sweep_scatter_add(
        jnp.asarray(table).astype(jnp.bfloat16), jnp.asarray(sid),
        jnp.asarray(supd), tile_rows=512, chunk=256, interpret=True)
    # bf16 accumulation orders differ (XLA per-touch vs f32 acc + one cast);
    # agreement within a couple of bf16 ulps of the f32 reference
    ref = np.asarray(want, np.float32)
    np.testing.assert_allclose(np.asarray(got, np.float32), ref,
                               rtol=0.05, atol=0.05)


@pytest.mark.parametrize("n,permute_dtype", [
    (1500, None),               # non-chunk-multiple N exercises padding
    (2048, jnp.bfloat16),       # permute-dtype rounding path
])
def test_sweep_unsorted_matches_xla(n, permute_dtype):
    from graphvite_tpu.ops.pallas_scatter import sweep_scatter_add_unsorted
    v, d = 4096, 128
    rng = np.random.default_rng(7)
    ids = (rng.random(n) ** 3 * v).astype(np.int32)
    upd = rng.normal(size=(n, d)).astype(np.float32)
    table = rng.normal(size=(v, d)).astype(np.float32)
    ref_upd = (np.asarray(jnp.asarray(upd).astype(permute_dtype),
                          np.float32)
               if permute_dtype is not None else upd)
    want = jnp.asarray(table).at[jnp.asarray(ids)].add(jnp.asarray(ref_upd))
    got = sweep_scatter_add_unsorted(
        jnp.asarray(table), jnp.asarray(ids), jnp.asarray(upd),
        tile_rows=512, chunk=256, interpret=True,
        permute_dtype=permute_dtype)
    tol = 0.02 if permute_dtype is not None else 1e-4
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=tol, atol=tol)


def test_pool_step_sweep_context_matches_xla():
    """make_graph_pool_step(sweep_context=True) must produce the same
    context table as the XLA scatter path (SGD, unsorted tails)."""
    from graphvite_tpu.optim import Optimizer
    from graphvite_tpu.ops.steps import make_graph_pool_step

    v, d, b = 4096, 32, 1024
    rng = np.random.default_rng(11)
    opt = Optimizer(type="SGD", lr=0.025, weight_decay=5e-3)
    heads = rng.integers(0, v, b).astype(np.int32)
    tails = (rng.random(b) ** 2 * v).astype(np.int32)  # hub-heavy dups
    state = {
        "tables": (jnp.asarray(rng.normal(0, 0.1, (v, d)), jnp.float32),
                   jnp.asarray(rng.normal(0, 0.1, (v, d)), jnp.float32)),
        "moments": ((), ()),
    }
    neg_prob = jnp.ones((v,), jnp.float32)
    neg_alias = jnp.arange(v, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)

    ref_step = make_graph_pool_step(opt, 1, 5.0, pool_groups=4, trust=None)
    new_ref, loss_ref = ref_step(state, jnp.asarray(heads),
                                 jnp.asarray(tails), key,
                                 jnp.float32(0.025), neg_prob, neg_alias)
    sw_step = make_graph_pool_step(opt, 1, 5.0, pool_groups=4, trust=None,
                                   sweep_context=True, sweep_tile=512,
                                   sweep_chunk=256)
    new_sw, loss_sw = sw_step(state, jnp.asarray(heads),
                              jnp.asarray(tails), key,
                              jnp.float32(0.025), neg_prob, neg_alias)
    assert float(loss_ref) == pytest.approx(float(loss_sw), rel=1e-6)
    np.testing.assert_allclose(np.asarray(new_sw["tables"][1]),
                               np.asarray(new_ref["tables"][1]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_sw["tables"][0]),
                               np.asarray(new_ref["tables"][0]),
                               rtol=1e-5, atol=1e-5)


def test_pool_step_sweep_matches_xla():
    """make_graph_pool_step(sweep_vertex=True) must produce the same vertex
    table as the XLA scatter path when heads are sorted and SGD is used."""
    from graphvite_tpu.optim import Optimizer
    from graphvite_tpu.ops.steps import make_graph_pool_step

    v, d, b = 4096, 32, 1024
    rng = np.random.default_rng(2)
    opt = Optimizer(type="SGD", lr=0.025, weight_decay=5e-3)
    heads = np.sort((rng.random(b) ** 2 * v).astype(np.int32))
    tails = rng.integers(0, v, b).astype(np.int32)
    state = {
        "tables": (jnp.asarray(rng.normal(0, 0.1, (v, d)), jnp.float32),
                   jnp.asarray(rng.normal(0, 0.1, (v, d)), jnp.float32)),
        "moments": ((), ()),
    }
    neg_prob = jnp.ones((v,), jnp.float32)
    neg_alias = jnp.arange(v, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)
    lr = jnp.float32(0.025)

    # trust=None so both paths use the plain scatter rule
    ref_step = make_graph_pool_step(opt, 1, 5.0, pool_groups=4, trust=None)
    new_ref, loss_ref = ref_step(state, jnp.asarray(heads),
                                 jnp.asarray(tails), key, lr,
                                 neg_prob, neg_alias)
    sweep_step = make_graph_pool_step(opt, 1, 5.0, pool_groups=4, trust=None,
                                      sweep_vertex=True, sweep_tile=512,
                                      sweep_chunk=256)
    new_sw, loss_sw = sweep_step(state, jnp.asarray(heads),
                                 jnp.asarray(tails), key, lr,
                                 neg_prob, neg_alias)
    assert float(loss_ref) == pytest.approx(float(loss_sw), rel=1e-6)
    np.testing.assert_allclose(np.asarray(new_sw["tables"][0]),
                               np.asarray(new_ref["tables"][0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_sw["tables"][1]),
                               np.asarray(new_ref["tables"][1]),
                               rtol=1e-5, atol=1e-5)


def test_solver_sweep_gate_end_to_end(monkeypatch, tmp_path):
    """GRAPHVITE_SWEEP_SCATTER=1 engages the sorted stream + sweep path
    through GraphSolver.train (thresholds shrunk to test scale)."""
    import graphvite_tpu.optim as optim_mod
    from graphvite_tpu.ops.device_sampler import DeviceEdgeSampler
    from graphvite_tpu.solver import GraphSolver
    from graphvite_tpu.graph import Graph

    monkeypatch.setenv("GRAPHVITE_SWEEP_SCATTER", "1")
    monkeypatch.setattr(optim_mod, "DENSE_UPDATE_ELEMS", 1000)
    monkeypatch.setattr(DeviceEdgeSampler, "MIN_STREAM_BLOCKS", 1)

    rng = np.random.default_rng(3)
    v, e = 512, 4096
    lines = ["%d\t%d" % (rng.integers(0, v), rng.integers(0, v))
             for _ in range(e)]
    f = tmp_path / "edges.txt"
    f.write_text("\n".join(lines))
    g = Graph()
    g.load_file(str(f), normalization=False)

    solver = GraphSolver(dim=16)
    solver.build(g, optimizer={"type": "SGD", "lr": 0.025},
                 num_negative=1, batch_size=2048, episode_size=2)
    solver.train(model="LINE", num_epoch=4, augmentation_step=1,
                 log_frequency=10**9)
    assert solver._sweep_scatter is True
    emb = np.asarray(solver.state["tables"][0])
    assert np.all(np.isfinite(emb))


@pytest.mark.parametrize("opt_type", ["Adam", "AdaGrad", "Momentum",
                                      "RMSprop"])
def test_sweep_moment_update_matches_dedup(opt_type):
    """sweep_scatter_update must reproduce apply_row_updates' moment
    semantics exactly: per unique row, summed gsum/gsq/count then ONE
    closed-form c-touch update; untouched rows pass through undecayed."""
    from graphvite_tpu.optim import Optimizer, apply_row_updates
    from graphvite_tpu.ops.pallas_scatter import sweep_scatter_update

    v, d, n = 2048, 64, 1024
    rng = np.random.default_rng(5)
    opt = Optimizer(type=opt_type, lr=0.01, weight_decay=0.0)
    ids = np.sort((rng.random(n) ** 2 * v).astype(np.int32))
    grads = rng.normal(size=(n, d)).astype(np.float32)
    counts = rng.integers(1, 4, n).astype(np.float32)
    sqs = np.abs(rng.normal(size=(n, d))).astype(np.float32)
    table = rng.normal(size=(v, d)).astype(np.float32)
    moms = tuple(np.abs(rng.normal(size=(v, d))).astype(np.float32)
                 for _ in range(opt.num_moment))
    lr = 0.01

    want_t, want_m = apply_row_updates(
        jnp.asarray(table), tuple(jnp.asarray(m) for m in moms),
        jnp.asarray(ids), jnp.asarray(grads), opt, jnp.float32(lr),
        entry_counts=jnp.asarray(counts), entry_sqs=jnp.asarray(sqs))
    got_t, got_m = sweep_scatter_update(
        jnp.asarray(table), tuple(jnp.asarray(m) for m in moms),
        jnp.asarray(ids), jnp.asarray(grads), opt, jnp.float32(lr),
        entry_counts=jnp.asarray(counts), entry_sqs=jnp.asarray(sqs),
        tile_rows=512, chunk=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               rtol=2e-5, atol=2e-5)
    for gm, wm in zip(got_m, want_m):
        np.testing.assert_allclose(np.asarray(gm), np.asarray(wm),
                                   rtol=2e-5, atol=2e-5)


def test_sweep_moment_update_unsorted_and_padding():
    """Unsorted front-end: argsort + zero-count pads must register no touch
    (id V-1's row unchanged unless genuinely touched)."""
    from graphvite_tpu.optim import Optimizer, apply_row_updates
    from graphvite_tpu.ops.pallas_scatter import (
        sweep_scatter_update_unsorted)

    v, d, n = 1024, 32, 700    # n not a chunk multiple -> pads
    rng = np.random.default_rng(9)
    opt = Optimizer(type="Adam", lr=0.02, weight_decay=0.0)
    ids = (rng.random(n) ** 2 * (v - 1)).astype(np.int32)  # never V-1
    grads = rng.normal(size=(n, d)).astype(np.float32)
    table = rng.normal(size=(v, d)).astype(np.float32)
    moms = tuple(np.zeros((v, d), np.float32) for _ in range(2))
    lr = 0.02

    want_t, want_m = apply_row_updates(
        jnp.asarray(table), tuple(jnp.asarray(m) for m in moms),
        jnp.asarray(ids), jnp.asarray(grads), opt, jnp.float32(lr))
    got_t, got_m = sweep_scatter_update_unsorted(
        jnp.asarray(table), tuple(jnp.asarray(m) for m in moms),
        jnp.asarray(ids), jnp.asarray(grads), opt, jnp.float32(lr),
        tile_rows=512, chunk=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               rtol=2e-5, atol=2e-5)
    for gm, wm in zip(got_m, want_m):
        np.testing.assert_allclose(np.asarray(gm), np.asarray(wm),
                                   rtol=2e-5, atol=2e-5)
    # V-1 row untouched: pads must not have decayed its moments or moved it
    assert np.array_equal(np.asarray(got_t)[v - 1], table[v - 1])


def test_solver_sweep_gate_moment_optimizer(monkeypatch, tmp_path):
    """The sweep gate now admits moment rules: Adam + GRAPHVITE_SWEEP_SCATTER=1
    routes the vertex side through sweep_scatter_update end to end."""
    import graphvite_tpu.optim as optim_mod
    from graphvite_tpu.ops.device_sampler import DeviceEdgeSampler
    from graphvite_tpu.solver import GraphSolver
    from graphvite_tpu.graph import Graph

    monkeypatch.setenv("GRAPHVITE_SWEEP_SCATTER", "1")
    monkeypatch.setenv("GRAPHVITE_SWEEP_CONTEXT", "1")
    monkeypatch.setattr(optim_mod, "DENSE_UPDATE_ELEMS", 1000)
    monkeypatch.setattr(DeviceEdgeSampler, "MIN_STREAM_BLOCKS", 1)

    rng = np.random.default_rng(4)
    v, e = 512, 4096
    lines = ["%d\t%d" % (rng.integers(0, v), rng.integers(0, v))
             for _ in range(e)]
    f = tmp_path / "edges.txt"
    f.write_text("\n".join(lines))
    g = Graph()
    g.load_file(str(f), normalization=False)

    solver = GraphSolver(dim=16)
    solver.build(g, optimizer={"type": "Adam", "lr": 1e-3},
                 num_negative=1, batch_size=2048, episode_size=2)
    solver.train(model="LINE", num_epoch=4, augmentation_step=1,
                 log_frequency=10**9)
    assert solver._sweep_scatter is True
    assert solver._sweep_context is True
    emb = np.asarray(solver.state["tables"][0])
    assert np.all(np.isfinite(emb))
    # moments actually updated (the sweep wrote them back)
    m1 = np.asarray(solver.state["moments"][0][0])
    assert np.any(m1 != 0)


@pytest.mark.parametrize("v,d,n,tile,chunk", [
    (4096, 128, 2048, 512, 256),
    (4000, 128, 1024, 256, 128),    # ragged last tile (4000 % 256 != 0)
    (1024, 64, 4096, 1024, 512),    # v == tile; hub dups
])
def test_sweep_gather_matches_xla(v, d, n, tile, chunk):
    from graphvite_tpu.ops.pallas_scatter import sweep_gather_sorted

    rng = np.random.default_rng(6)
    ids = np.sort((rng.random(n) ** 3 * v).astype(np.int32))
    table = rng.normal(size=(v, d)).astype(np.float32)
    want = np.asarray(jnp.asarray(table)[jnp.asarray(ids)])
    got = sweep_gather_sorted(jnp.asarray(table), jnp.asarray(ids),
                              tile_rows=tile, chunk=chunk, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def test_sweep_gather_sparse_spans_and_last_rows():
    """Chunks spanning MANY tiles (sparse tail ids) and ids in the ragged
    final rows must both resolve (the clamped last-tile base)."""
    from graphvite_tpu.ops.pallas_scatter import sweep_gather_sorted

    v, d = 8192, 32
    ids = np.asarray(sorted([0, 1, 511, 1024, 3000, 5000, 7000, 8191] * 16),
                     np.int32)
    table = np.arange(v * d, dtype=np.float32).reshape(v, d)
    got = sweep_gather_sorted(jnp.asarray(table), jnp.asarray(ids),
                              tile_rows=256, chunk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), table[ids])


def test_sweep_gather_bf16():
    from graphvite_tpu.ops.pallas_scatter import sweep_gather_sorted

    v, d, n = 2048, 128, 1024
    rng = np.random.default_rng(8)
    ids = np.sort(rng.integers(0, v, n).astype(np.int32))
    table = rng.normal(size=(v, d)).astype(np.float32)
    tb = jnp.asarray(table).astype(jnp.bfloat16)
    got = sweep_gather_sorted(tb, jnp.asarray(ids), tile_rows=512,
                              chunk=256, interpret=True)
    want = np.asarray(tb)[ids]
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("opt_type", ["SGD", "Adam"])
def test_pool_step_sort_heads_masked_matches_xla(opt_type):
    """Walk-mode sweep front-end: unsorted heads + dead-walk mask through
    sort_heads + sweeps must reproduce the plain scatter path exactly
    (masked slots park at row V-1 with zero updates and zero touches)."""
    from graphvite_tpu.optim import Optimizer
    from graphvite_tpu.ops.steps import make_graph_pool_step

    v, d, b = 4096, 32, 1024
    rng = np.random.default_rng(13)
    lr_v = 0.01 if opt_type == "Adam" else 0.025
    opt = Optimizer(type=opt_type, lr=lr_v, weight_decay=5e-3)
    heads = rng.integers(0, v, b).astype(np.int32)       # unsorted
    tails = (rng.random(b) ** 2 * v).astype(np.int32)
    # live samples MUST also hit row v-1 (the dead-slot parking row):
    # regression for the wd/sq residue leak into v-1's moments
    tails[:8] = v - 1
    heads[:4] = v - 1
    mask = (rng.random(b) > 0.2).astype(np.float32)      # dead-walk slots
    mask[:8] = 1.0
    n_mom = opt.num_moment
    vert0 = rng.normal(0, 0.1, (v, d)).astype(np.float32)
    ctx0 = rng.normal(0, 0.1, (v, d)).astype(np.float32)

    def state():
        return {
            "tables": (jnp.asarray(vert0), jnp.asarray(ctx0)),
            "moments": (tuple(jnp.zeros((v, d)) for _ in range(n_mom)),
                        tuple(jnp.zeros((v, d)) for _ in range(n_mom))),
        }
    neg_prob = jnp.ones((v,), jnp.float32)
    neg_alias = jnp.arange(v, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)
    lr = jnp.float32(lr_v)

    ref_step = make_graph_pool_step(opt, 1, 5.0, pool_groups=4, trust=None)
    new_ref, loss_ref = ref_step(state(), jnp.asarray(heads),
                                 jnp.asarray(tails), key, lr,
                                 neg_prob, neg_alias,
                                 mask=jnp.asarray(mask))
    sw_step = make_graph_pool_step(opt, 1, 5.0, pool_groups=4, trust=None,
                                   sweep_vertex=True, sweep_context=True,
                                   sweep_gather=True, sweep_tile=512,
                                   sweep_chunk=256, sort_heads=True)
    new_sw, loss_sw = sw_step(state(), jnp.asarray(heads),
                              jnp.asarray(tails), key, lr,
                              neg_prob, neg_alias, mask=jnp.asarray(mask))
    # NOTE the sorted batch consumes the same per-slot randomness in a
    # different slot order, so per-sample losses differ — but the POOLS
    # are drawn before the sort from the same key, and the update math is
    # slot-permutation-invariant only if the pool GROUP assignment is too.
    # With G groups the sort changes which group a sample lands in, so
    # exact table equality holds only at G=1... use group-insensitive
    # checks: finite, masked rows untouched, and the total update mass of
    # the vertex table matches within tolerance.
    v_ref = np.asarray(new_ref["tables"][0])
    v_sw = np.asarray(new_sw["tables"][0])
    assert np.isfinite(v_sw).all()
    assert np.isfinite(float(loss_sw))
    # rows untouched by any live sample must be identical (never updated)
    live_heads = set(heads[mask > 0].tolist())
    untouched = [r for r in range(256) if r not in live_heads]
    for r in untouched[:50]:
        np.testing.assert_array_equal(v_sw[r], vert0[r])

    # at G=1 the sort cannot change group membership, so the sweep path
    # must match the plain scatter path exactly (accumulation-order
    # tolerance only)
    ref1 = make_graph_pool_step(opt, 1, 5.0, pool_groups=1, trust=None)
    new_r1, _ = ref1(state(), jnp.asarray(heads), jnp.asarray(tails), key,
                     lr, neg_prob, neg_alias, mask=jnp.asarray(mask))
    sw1 = make_graph_pool_step(opt, 1, 5.0, pool_groups=1, trust=None,
                               sweep_vertex=True, sweep_context=True,
                               sweep_gather=True, sweep_tile=512,
                               sweep_chunk=256, sort_heads=True)
    new_s1, _ = sw1(state(), jnp.asarray(heads), jnp.asarray(tails), key,
                    lr, neg_prob, neg_alias, mask=jnp.asarray(mask))
    for i in range(2):
        np.testing.assert_allclose(np.asarray(new_s1["tables"][i]),
                                   np.asarray(new_r1["tables"][i]),
                                   rtol=5e-4, atol=5e-5)
