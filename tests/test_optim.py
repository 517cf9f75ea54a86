"""Optimizer rules vs scalar reference formulas (optimizer.h:161-210) and
duplicate-row accumulation semantics."""
import numpy as np
import jax.numpy as jnp
import pytest

from graphvite_tpu.optim import (Optimizer, apply_row_updates, dedup_rows,
                                 make_optimizer)


def np_reference_update(opt, p, g, m1=None, m2=None, lr=None, weight=1.0):
    """Scalar update mirroring the reference's rules; returns (delta, m1, m2)."""
    reg = weight * (g + opt.weight_decay * p)
    if opt.type == "SGD":
        return lr * reg, m1, m2
    if opt.type == "Momentum":
        m1 = opt.momentum * m1 + (1 - opt.momentum) * reg
        return lr * m1, m1, m2
    if opt.type == "AdaGrad":
        m1 = m1 + reg * reg
        return lr * reg / (np.sqrt(m1) + opt.epsilon), m1, m2
    if opt.type == "RMSprop":
        m1 = opt.alpha * m1 + (1 - opt.alpha) * reg * reg
        return lr * reg / np.sqrt(m1 + opt.epsilon), m1, m2
    if opt.type == "Adam":
        m1 = opt.beta1 * m1 + (1 - opt.beta1) * reg
        m2 = opt.beta2 * m2 + (1 - opt.beta2) * reg * reg
        return lr * m1 / (np.sqrt(m2) + opt.epsilon), m1, m2
    raise ValueError


@pytest.mark.parametrize("otype", ["SGD", "Momentum", "AdaGrad", "RMSprop", "Adam"])
def test_single_row_update_matches_reference(otype):
    rng = np.random.default_rng(3)
    opt = Optimizer(type=otype, lr=0.1, weight_decay=0.01)
    V, D = 5, 8
    table = rng.normal(size=(V, D)).astype(np.float32)
    m = tuple(np.abs(rng.normal(size=(V, D))).astype(np.float32)
              for _ in range(opt.num_moment))
    ids = np.array([1, 3], dtype=np.int32)
    grads = rng.normal(size=(2, D)).astype(np.float32)
    lr = 0.05

    # expected: reg grads are pre-weighted by caller => weight=1 here
    exp = table.copy()
    exp_m = [x.copy() for x in m]
    for i, row in zip(ids, grads):
        d, m1, m2 = np_reference_update(
            opt, 0.0, row, exp_m[0][i] if exp_m else None,
            exp_m[1][i] if len(exp_m) > 1 else None, lr=lr)
        exp[i] -= d
        if exp_m:
            exp_m[0][i] = m1
        if len(exp_m) > 1:
            exp_m[1][i] = m2

    new_table, new_m = apply_row_updates(
        jnp.asarray(table), tuple(jnp.asarray(x) for x in m),
        jnp.asarray(ids), jnp.asarray(grads), opt, lr)
    np.testing.assert_allclose(np.asarray(new_table), exp, rtol=2e-5, atol=1e-6)
    for a, b in zip(new_m, exp_m):
        np.testing.assert_allclose(np.asarray(a), b, rtol=2e-5, atol=1e-6)


def test_duplicate_rows_accumulate_sgd():
    opt = Optimizer(type="SGD", lr=1.0, weight_decay=0.0)
    table = jnp.zeros((3, 4))
    ids = jnp.array([1, 1, 2], dtype=jnp.int32)
    grads = jnp.ones((3, 4))
    new_table, _ = apply_row_updates(table, (), ids, grads, opt, 1.0)
    np.testing.assert_allclose(np.asarray(new_table[1]), -2.0 * np.ones(4))
    np.testing.assert_allclose(np.asarray(new_table[2]), -1.0 * np.ones(4))


def test_duplicate_rows_single_moment_update():
    """Duplicate touches apply c sequential per-touch moment updates in
    closed form (the reference updates moments once per hogwild touch)."""
    opt = Optimizer(type="Adam", lr=0.1, weight_decay=0.0)
    V, D = 4, 2
    table = jnp.ones((V, D))
    m = (jnp.zeros((V, D)), jnp.zeros((V, D)))
    ids = jnp.array([2, 2, 2], dtype=jnp.int32)
    grads = jnp.ones((3, D)) * 0.5
    new_table, new_m = apply_row_updates(table, m, ids, grads, opt, 0.1)
    c, ghat = 3.0, 0.5
    m1 = -np.expm1(c * np.log(opt.beta1)) * ghat
    m2 = -np.expm1(c * np.log(opt.beta2)) * ghat * ghat
    d = 0.1 * c * m1 / (np.sqrt(m2) + opt.epsilon)
    # beta**c evaluates in f32 on device -> ~1e-4 relative tolerance
    np.testing.assert_allclose(np.asarray(new_table[2]), 1 - d, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(new_m[0][2]), m1, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(new_m[1][2]), m2, rtol=1e-3)
    # untouched rows unchanged
    np.testing.assert_allclose(np.asarray(new_table[0]), 1.0)
    np.testing.assert_allclose(np.asarray(new_m[0][0]), 0.0)


def test_dedup_rows():
    ids = jnp.array([5, 3, 5, 1, 3], dtype=jnp.int32)
    grads = jnp.arange(5, dtype=jnp.float32)[:, None] * jnp.ones((5, 2))
    uids, gsum, counts, gsq = dedup_rows(ids, grads)
    uids = np.asarray(uids)
    gsum = np.asarray(gsum)
    gsq = np.asarray(gsq)
    counts = np.asarray(counts)
    got = {int(u): gsum[i, 0] for i, u in enumerate(uids)
           if u != np.iinfo(np.int32).max}
    assert got == {1: 3.0, 3: 1.0 + 4.0, 5: 0.0 + 2.0}
    got_c = {int(u): counts[i] for i, u in enumerate(uids)
             if u != np.iinfo(np.int32).max}
    assert got_c == {1: 1.0, 3: 2.0, 5: 2.0}
    got_sq = {int(u): gsq[i, 0] for i, u in enumerate(uids)
              if u != np.iinfo(np.int32).max}
    assert got_sq == {1: 9.0, 3: 1.0 + 16.0, 5: 0.0 + 4.0}


def test_relation_lr_scale_scales_delta_not_moments():
    opt = Optimizer(type="Adam", lr=0.1, weight_decay=0.0)
    table = jnp.ones((2, 2))
    m = (jnp.zeros((2, 2)), jnp.zeros((2, 2)))
    ids = jnp.array([0], dtype=jnp.int32)
    grads = jnp.ones((1, 2))
    t1, m1 = apply_row_updates(table, m, ids, grads, opt, 0.1, lr_scale=1.0)
    t2, m2 = apply_row_updates(table, m, ids, grads, opt, 0.1, lr_scale=0.5)
    d1 = 1 - np.asarray(t1[0])
    d2 = 1 - np.asarray(t2[0])
    np.testing.assert_allclose(d2, 0.5 * d1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m1[0]), np.asarray(m2[0]))


def test_make_optimizer():
    default = Optimizer(type="SGD", lr=0.025, weight_decay=5e-3)
    assert make_optimizer(0, default) == default
    assert make_optimizer(0.1, default).lr == 0.1
    assert make_optimizer("Adam", default).type == "Adam"
    o = make_optimizer({"type": "RMSprop", "lr": 0.2, "alpha": 0.9}, default)
    assert o.type == "RMSprop" and o.lr == 0.2 and o.alpha == 0.9


def test_schedule():
    opt = Optimizer(type="SGD", lr=1.0, schedule="linear")
    assert float(opt.schedule_lr(0, 100)) == 1.0
    np.testing.assert_allclose(float(opt.schedule_lr(50, 100)), 0.5)
    np.testing.assert_allclose(float(opt.schedule_lr(1000, 100)), 1e-4)


def test_sgd_trust_clip_bounds_accumulated_row():
    """trust clips a row's ACCUMULATED per-batch displacement to
    trust * (|row| + 1e-2); lightly-touched rows are exact (clip inactive).
    This is the hub safety net for dense small graphs (a power-law batch
    touches a hub row hundreds of times at one stale point — reproduced as
    NaN divergence on the BlogCatalog-statistics clone)."""
    import jax.numpy as jnp
    from graphvite_tpu.optim import apply_row_updates

    rng = np.random.default_rng(0)
    V, D = 32, 8
    table = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    opt = Optimizer(type="SGD", lr=1.0, weight_decay=0.0)
    hub, cold = 3, 7
    ids = jnp.asarray([hub] * 100 + [cold], jnp.int32)
    grads = jnp.concatenate(
        [jnp.tile(jnp.ones((1, D)), (100, 1)),           # coherent pile-up
         jnp.full((1, D), 1e-3)]).astype(jnp.float32)
    lr = jnp.float32(1.0)
    trust = 0.25

    clipped, _ = apply_row_updates(table, (), ids, grads, opt, lr,
                                   trust=trust)
    free, _ = apply_row_updates(table, (), ids, grads, opt, lr, trust=None)
    moved = np.linalg.norm(np.asarray(clipped[hub] - table[hub]))
    bound = trust * (np.linalg.norm(np.asarray(table[hub])) + 1e-2)
    assert moved <= bound * (1 + 1e-5), (moved, bound)
    # unclipped accumulation would have moved |sum g| = 100*sqrt(D)
    assert np.linalg.norm(np.asarray(free[hub] - table[hub])) > 100
    # cold row: tiny update far below its limit -> exact in both
    np.testing.assert_allclose(np.asarray(clipped[cold]),
                               np.asarray(free[cold]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(free[cold]),
                               np.asarray(table[cold] - 1e-3), rtol=1e-5)
