"""Correctness of the shared-negative-pool steps.

- make_graph_pool_step's hand gradients must equal jax.grad of the explicit
  pooled logistic loss (wd=0), including duplicate-id accumulation.
- make_kg_train_step(external_pool=True) must reproduce the standard step's
  update exactly when the pool IS the entity table (same candidates), with
  the returned cand_grad applying the candidate-row part.
"""
import numpy as np
import jax
import jax.numpy as jnp

from graphvite_tpu.optim import Optimizer, apply_row_updates
from graphvite_tpu.ops import steps as _steps
from graphvite_tpu.models import KG_MODELS


def _uniform_alias_state(n):
    # prob == 1 everywhere -> sampled id is always floor(u1 * n)
    packed = np.stack([np.ones(n, np.float32),
                       np.arange(n, dtype=np.float32)], axis=1)
    return (jnp.asarray(packed),)


def test_graph_pool_step_matches_autodiff():
    rng = np.random.default_rng(0)
    V, D, B, K = 50, 8, 16, 2
    M, G = 4, 2
    neg_weight = 5.0
    opt = Optimizer(type="SGD", lr=0.1, weight_decay=0.0)
    step = _steps.make_graph_pool_step(opt, K, neg_weight,
                                       pool_size=M, pool_groups=G,
                                       trust=None)
    vertex = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    context = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    heads = jnp.asarray(rng.integers(0, V, B), jnp.int32)
    tails = jnp.asarray(rng.integers(0, V, B), jnp.int32)
    neg_state = _uniform_alias_state(V)
    key = jax.random.PRNGKey(7)
    lr = jnp.float32(0.1)

    state = {"tables": (vertex, context), "moments": ((), ())}
    new_state, loss = step(state, heads, tails, key, lr, *neg_state)

    # reproduce the pool draw (same RNG path as the step)
    from graphvite_tpu.ops.alias import device_sample
    k1, _k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, (G, M))
    u2 = jax.random.uniform(jax.random.split(key)[1], (G, M))
    pool_ids = device_sample(*neg_state, u1, u2)
    neg_w = neg_weight * K / M

    def explicit_loss(tables):
        vx, cx = tables
        v = vx[heads].reshape(G, B // G, D)
        c = cx[tails].reshape(G, B // G, D)
        P = cx[pool_ids]
        pos = jnp.sum(v * c, axis=-1)
        neg = jnp.einsum("gbd,gmd->gbm", v, P)
        return (jnp.sum(jax.nn.softplus(-pos))
                + neg_w * jnp.sum(jax.nn.softplus(neg)))

    gv, gc = jax.grad(explicit_loss)((vertex, context))
    np.testing.assert_allclose(np.asarray(new_state["tables"][0]),
                               np.asarray(vertex - lr * gv),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["tables"][1]),
                               np.asarray(context - lr * gc),
                               rtol=1e-4, atol=1e-5)
    assert np.isfinite(float(loss))


def test_graph_pool_step_mask_drops_slots():
    rng = np.random.default_rng(1)
    V, D, B, K = 30, 8, 16, 1
    opt = Optimizer(type="SGD", lr=0.1, weight_decay=0.0)
    step = _steps.make_graph_pool_step(opt, K, 5.0, pool_size=4,
                                       pool_groups=2)
    vertex = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    context = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    heads = jnp.asarray(rng.integers(0, V, B), jnp.int32)
    tails = jnp.asarray(rng.integers(0, V, B), jnp.int32)
    mask = jnp.asarray(([1.0] * (B // 2)) + ([0.0] * (B // 2)), jnp.float32)
    neg_state = _uniform_alias_state(V)
    state = {"tables": (vertex, context), "moments": ((), ())}
    new_state, _ = step(state, heads, tails, jax.random.PRNGKey(3),
                        jnp.float32(0.1), *neg_state, mask=mask)
    # masked heads whose id appears ONLY in masked slots must be untouched
    masked_only = (set(np.asarray(heads[B // 2:]).tolist())
                   - set(np.asarray(heads[: B // 2]).tolist()))
    for h in masked_only:
        np.testing.assert_allclose(
            np.asarray(new_state["tables"][0][h]),
            np.asarray(vertex[h]), rtol=1e-6)


def test_graph_pool_groups_bounds_group_size():
    for b in (8, 256, 2048, 100_000, 162_560, 200_192, 1_000_000):
        g = _steps.graph_pool_groups(b)
        assert b % g == 0, (b, g)
        assert g <= 256
        # group size bounded unless the divisibility walk-down forced it
        if b % 256 == 0:
            assert b // g <= 2048 or g == 256, (b, g)


def test_graph_pool_step_trust_clip_bounds_update():
    """With a pathologically coherent group (all heads identical and huge),
    the clip must bound each pool row's displacement to
    trust * (|row| + 1e-2); without it the row would blow up."""
    rng = np.random.default_rng(3)
    V, D, B, K = 20, 8, 16, 2
    M, G = 4, 2
    trust = 0.25
    opt = Optimizer(type="SGD", lr=0.1, weight_decay=0.0)
    step = _steps.make_graph_pool_step(opt, K, 5.0, pool_size=M,
                                       pool_groups=G, trust=trust)
    # one giant direction shared by every head -> coherent negative grads
    vertex = jnp.asarray(np.tile(rng.normal(size=(1, D)) * 50.0, (V, 1)),
                         jnp.float32)
    context = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    heads = jnp.asarray(rng.integers(0, V, B), jnp.int32)
    tails = jnp.asarray(rng.integers(0, V, B), jnp.int32)
    state = {"tables": (vertex, context), "moments": ((), ())}
    lr = jnp.float32(0.1)
    new_state, loss = step(state, heads, tails, jax.random.PRNGKey(11), lr,
                           *_uniform_alias_state(V))
    assert np.isfinite(float(loss))
    moved = np.asarray(new_state["tables"][1]) - np.asarray(context)
    # rows updated only as pool rows obey the bound; rows also updated as
    # positives (tails) get the unclipped dc on top, so exclude them
    tail_set = set(np.asarray(tails).tolist())
    for r in range(V):
        if r in tail_set:
            continue
        bound = trust * (np.linalg.norm(np.asarray(context[r])) + 1e-2)
        # pool rows can be drawn by both groups -> at most 2x the bound
        assert np.linalg.norm(moved[r]) <= 2 * bound + 1e-5


def test_kg_external_pool_matches_standard_step():
    """pool == whole entity table -> identical update to the standard step
    given the same candidates, after applying the returned cand_grad."""
    rng = np.random.default_rng(2)
    V, R, D, B, K = 40, 6, 16, 12, 3
    # SGD: the split application (positives in the step, candidates after)
    # is exactly linear, so the comparison is exact; moment optimizers
    # compose the two applications differently when a row is both a
    # positive and a candidate
    opt = Optimizer(type="SGD", lr=1e-2, weight_decay=0.0)
    model = KG_MODELS["RotatE"]
    margin, at = 6.0, 2.0
    mk = lambda ext: _steps.make_kg_train_step(model, opt, K, margin, at,
                                               1.0, external_pool=ext)
    std_step, pool_step = mk(False), mk(True)

    entity = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    relation = jnp.asarray(rng.normal(size=(R, D)), jnp.float32)
    heads = jnp.asarray(rng.integers(0, V, B), jnp.int32)
    tails = jnp.asarray(rng.integers(0, V, B), jnp.int32)
    rels = jnp.asarray(rng.integers(0, R, B), jnp.int32)
    cand = jnp.asarray(rng.integers(0, V, (B, K)), jnp.int32)
    ch = jnp.asarray(rng.integers(0, 2, (B, K)) > 0)
    key = jax.random.PRNGKey(0)
    lr = jnp.float32(1e-2)

    def init_state():
        moms = lambda s: tuple(jnp.zeros(s, jnp.float32)
                               for _ in range(opt.num_moment))
        return {"tables": (entity, relation),
                "moments": (moms((V, D)), moms((R, D)))}

    want_state, want_loss = std_step(init_state(), heads, tails, rels, key,
                                     lr, negatives=(cand, ch))

    got_state, got_loss, cand_grad = pool_step(
        init_state(), heads, tails, rels, key, lr,
        pool=(entity, cand, ch))
    # apply the candidate gradients the way the sharded trainer does
    ent2, rel2 = got_state["tables"]
    e_m2, r_m2 = got_state["moments"]
    flat_ids = cand.reshape(-1)
    flat_g = cand_grad.reshape(B * K, D)
    ent3, e_m3 = apply_row_updates(ent2, e_m2, flat_ids, flat_g, opt, lr)

    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rel2),
                               np.asarray(want_state["tables"][1]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ent3),
                               np.asarray(want_state["tables"][0]),
                               rtol=1e-4, atol=1e-6)


def test_vis_pool_step_gradients_match_autodiff():
    """make_vis_pool_step's hand gradients must equal jax.grad of the
    explicit pooled LargeVis loss surrogate (wd=0, SGD so moment stats are
    out of the picture)."""
    rng = np.random.default_rng(3)
    V, D, B, K = 40, 8, 16, 5
    M, G = 4, 2
    neg_weight = 3.0
    opt = Optimizer(type="SGD", lr=0.1, weight_decay=0.0)
    step = _steps.make_vis_pool_step(opt, K, neg_weight, pool_size=M,
                                     pool_groups=G, trust=None)
    coord = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    heads = jnp.asarray(rng.integers(0, V, B), jnp.int32)
    tails = jnp.asarray(rng.integers(0, V, B), jnp.int32)
    neg_state = _uniform_alias_state(V)
    key = jax.random.PRNGKey(5)
    lr = jnp.float32(0.1)
    state = {"tables": (coord,), "moments": ((),)}
    new_state, loss = step(state, heads, tails, key, lr, *neg_state)

    from graphvite_tpu.ops.alias import device_sample
    k1, _ = jax.random.split(key)
    u1 = jax.random.uniform(k1, (G, M))
    u2 = jax.random.uniform(jax.random.split(key)[1], (G, M))
    pool_ids = device_sample(*neg_state, u1, u2)

    SMOOTH = 0.1
    neg_w = neg_weight * K / M

    def surrogate(table):
        # gradient-equivalent objective: d/dx of log1p(x) = prob for the
        # positive term; the negative per-pool-entry gradient is
        # -2 prob/(x+SMOOTH) whose primitive is prob-free; integrate by
        # construction: use stop-gradient factors
        h = table[heads].reshape(G, B // G, D)
        t = table[tails].reshape(G, B // G, D)
        P = table[pool_ids]
        d = h - t
        x_pos = jnp.sum(d * d, axis=-1)
        pos = jnp.log1p(x_pos)
        x = jnp.sum((h[:, :, None, :] - P[:, None, :, :]) ** 2, axis=-1)
        prob = 1.0 / (1.0 + x)
        # term with gradient -2 prob/(x+SMOOTH): integrate via
        # stop_gradient on the non-x factor is wrong; instead build the
        # loss whose derivative matches: use f(x) with f'(x) =
        # -2/( (1+x)(x+SMOOTH) ); implement via custom surrogate
        # g*x with g = stop_gradient of the true gradient
        # the kernel convention applies gradient * (h - P) = g * dx/2, so
        # the surrogate integrates g * x / 2
        gfac = jax.lax.stop_gradient(-2.0 * prob / (x + SMOOTH))
        neg = 0.5 * gfac * x
        return jnp.sum(pos) + neg_w * jnp.sum(neg)

    want = jax.grad(surrogate)(coord)
    got = (coord - new_state["tables"][0]) / lr
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_vis_pool_step_adam_counts_stay_stable():
    """With Adam (the vis default), repeated pooled steps must not diverge:
    the emulated K-draw touch counts bound per-batch displacement to the
    classic kernel's lr*(K+1) scale (regression for the count=M+1 NaN)."""
    rng = np.random.default_rng(0)
    V, D, B, K = 200, 8, 128, 5
    opt = Optimizer(type="Adam", lr=0.5, weight_decay=1e-5)
    step = _steps.make_vis_pool_step(opt, K, 5.0, pool_size=32,
                                     pool_groups=4)
    coord = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32) * 1e-4)
    moms = tuple(jnp.zeros((V, D), jnp.float32) for _ in range(2))
    state = {"tables": (coord,), "moments": (moms,)}
    heads = jnp.asarray(rng.integers(0, V, B), jnp.int32)
    tails = jnp.asarray(rng.integers(0, V, B), jnp.int32)
    neg_state = _uniform_alias_state(V)
    jstep = jax.jit(step)
    for i in range(40):
        state, loss = jstep(state, heads, tails, jax.random.PRNGKey(i),
                            jnp.float32(0.5), *neg_state)
    assert np.isfinite(float(loss))
    final = np.asarray(state["tables"][0])
    assert np.all(np.isfinite(final))


def test_kg_pool_step_gradients_match_autodiff():
    """make_kg_pool_step's hand gradients must equal jax.grad of the
    explicit mixed-side pooled loss (positive softplus + stop-gradient-
    weighted negative softplus), for a margin model and an l3 model."""
    rng = np.random.default_rng(11)
    V, R, D, B, K = 40, 5, 8, 16, 3
    M, G = 4, 4
    for name, hyper in (("RotatE", 6.0), ("DistMult", 1e-3)):
        mdl = KG_MODELS[name]
        opt = Optimizer(type="SGD", lr=0.1, weight_decay=1e-3)
        step = _steps.make_kg_pool_step(mdl, opt, K, hyper, 2.0, 1.0,
                                        pool_size=M, pool_groups=G,
                                        trust=None)
        ent = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
        rel = jnp.asarray(rng.normal(size=(R, D)), jnp.float32)
        heads = jnp.asarray(rng.integers(0, V, B), jnp.int32)
        tails = jnp.asarray(rng.integers(0, V, B), jnp.int32)
        rels = jnp.asarray(rng.integers(0, R, B), jnp.int32)
        key = jax.random.PRNGKey(3)
        lr = jnp.float32(0.1)
        state = {"tables": (ent, rel), "moments": ((), ())}
        new_state, _ = step(state, heads, tails, rels, key, lr)

        cand_ids = jax.random.randint(key, (G, M), 0, V)
        bg, M2 = B // G, M // 2
        wd = opt.weight_decay
        l3 = 0.0 if mdl.uses_margin else hyper

        def surrogate(tables):
            e, r = tables
            h_pos, t_pos, r_pos = e[heads], e[tails], r[rels]
            pos = jax.nn.softplus(-mdl.score(h_pos, t_pos, r_pos, hyper))
            total = jnp.sum(pos)
            reg = lambda p: (0.5 * wd * jnp.sum(p * p)
                             + l3 * jnp.sum(jnp.abs(p) ** 3))
            total = total + reg(h_pos) + reg(t_pos) + reg(r_pos)
            h2 = e[heads].reshape(G, bg, D)
            t2 = e[tails].reshape(G, bg, D)
            r2 = r[rels].reshape(G, bg, D)
            cand = e[cand_ids]                       # [G, M, D]
            lg_h = mdl.score(cand[:, None, :M2, :], t2[:, :, None, :],
                             r2[:, :, None, :], hyper)
            lg_t = mdl.score(h2[:, :, None, :], cand[:, None, M2:, :],
                             r2[:, :, None, :], hyper)
            logits = jnp.concatenate([lg_h, lg_t], axis=-1)  # [G, bg, M]
            w = jax.lax.stop_gradient(
                jnp.minimum(jax.nn.softmax(logits / 2.0, axis=-1), 1.0))
            total = total + jnp.sum(w * jax.nn.softplus(logits))
            # per-touch weighted regularization on every touched row
            wsum_cand = jnp.concatenate(
                [jnp.sum(w[..., :M2], axis=1),
                 jnp.sum(w[..., M2:], axis=1)], axis=-1)     # [G, M]
            regw = lambda p, ww: (0.5 * wd * jnp.sum(ww[..., None] * p * p)
                                  + l3 * jnp.sum(ww[..., None]
                                                 * jnp.abs(p) ** 3))
            total = total + regw(cand, wsum_cand)
            total = total + regw(t2, jnp.sum(w[..., :M2], axis=2))
            total = total + regw(h2, jnp.sum(w[..., M2:], axis=2))
            total = total + regw(r2, jnp.sum(w, axis=2))
            return total

        want_e, want_r = jax.grad(surrogate)((ent, rel))
        got_e = (ent - new_state["tables"][0]) / lr
        got_r = (rel - new_state["tables"][1]) / lr
        np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                                   rtol=3e-4, atol=3e-5,
                                   err_msg="entity grads (%s)" % name)
        np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                                   rtol=3e-4, atol=3e-5,
                                   err_msg="relation grads (%s)" % name)


def test_kg_fast_rotate_body_matches_generic(monkeypatch):
    """The RotatE-specialized pooled body (rotation-isometry rewrite,
    steps.py fast_rotate_body) must produce the same updated tables,
    moments, and loss as the generic body — same RNG key, so the same
    candidate draws — for both SGD and Adam (sq slabs), with and without
    a mask."""
    rng = np.random.default_rng(3)
    V, R_, D, B, K = 40, 6, 16, 12, 4
    M, G = 8, 2
    heads = jnp.asarray(rng.integers(0, V, B), jnp.int32)
    tails = jnp.asarray(rng.integers(0, V, B), jnp.int32)
    rels = jnp.asarray(rng.integers(0, R_, B), jnp.int32)
    entity = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    relation = jnp.asarray(rng.normal(size=(R_, D)), jnp.float32)
    key = jax.random.PRNGKey(11)
    mdl = KG_MODELS["RotatE"]

    for opt in (Optimizer(type="SGD", lr=0.05, weight_decay=0.0),
                Optimizer(type="Adam", lr=1e-3, weight_decay=0.0)):
        for mask in (None,
                     jnp.asarray(rng.integers(0, 2, B), jnp.float32)):
            moms = tuple(jnp.zeros((V, D), jnp.float32)
                         for _ in range(opt.num_moment))
            rmoms = tuple(jnp.zeros((R_, D), jnp.float32)
                          for _ in range(opt.num_moment))
            state = {"tables": (entity, relation),
                     "moments": (moms, rmoms)}
            outs = {}
            for fast in ("0", "1"):
                monkeypatch.setenv("GRAPHVITE_KG_FAST", fast)
                step = _steps.make_kg_pool_step(
                    mdl, opt, K, 9.0, 2.0, 1.0, pool_size=M,
                    pool_groups=G, trust=None)
                outs[fast] = step(state, heads, tails, rels, key,
                                  jnp.float32(opt.lr), mask=mask)
            (st0, loss0), (st1, loss1) = outs["0"], outs["1"]
            np.testing.assert_allclose(float(loss0), float(loss1),
                                       rtol=2e-5)
            for a, b in zip(jax.tree_util.tree_leaves(st0),
                            jax.tree_util.tree_leaves(st1)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=2e-4, atol=2e-5)


def test_graph_multitail_step_matches_pair_step():
    """make_graph_pool_multitail_step is an exact regrouping of
    make_graph_pool_step over the expanded (head, tail) pairs: same key
    (same pool draws, same G), position p's T pairs land contiguously in
    the pair batch, so tables/moments/loss must match to fp tolerance."""
    rng = np.random.default_rng(5)
    V, D, Bp, T, K = 60, 8, 8, 2, 3
    M, G = 4, 2
    nw = 5.0
    heads = jnp.asarray(rng.integers(0, V, Bp), jnp.int32)
    tails = jnp.asarray(rng.integers(0, V, (Bp, T)), jnp.int32)
    tmask = jnp.asarray(rng.integers(0, 2, (Bp, T)), jnp.float32)
    tmask = tmask.at[0].set(1.0)  # ensure some fully-active heads
    vertex = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    context = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    neg_state = _uniform_alias_state(V)
    key = jax.random.PRNGKey(3)

    for opt in (Optimizer(type="SGD", lr=0.05, weight_decay=1e-3),
                Optimizer(type="Adam", lr=1e-3, weight_decay=1e-3)):
        for trust in (None, 0.25):
            moms = tuple(
                (jnp.zeros((V, D), jnp.float32),) * opt.num_moment
                for _ in range(2))
            state = {"tables": (vertex, context),
                     "moments": (moms[0], moms[1])}
            multi = _steps.make_graph_pool_multitail_step(
                opt, K, nw, T, pool_size=M, pool_groups=G, trust=trust)
            pair = _steps.make_graph_pool_step(
                opt, K, nw, pool_size=M, pool_groups=G, trust=trust)
            st_m, loss_m = multi(state, heads, tails, key,
                                 jnp.float32(opt.lr), *neg_state,
                                 mask=tmask)
            st_p, loss_p = pair(state, jnp.repeat(heads, T),
                                tails.reshape(-1), key,
                                jnp.float32(opt.lr), *neg_state,
                                mask=tmask.reshape(-1))
            np.testing.assert_allclose(float(loss_m), float(loss_p),
                                       rtol=2e-5)
            for a, b in zip(jax.tree_util.tree_leaves(st_m),
                            jax.tree_util.tree_leaves(st_p)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=3e-4, atol=3e-6)


def test_graph_banded_step_matches_multitail_step():
    """make_graph_banded_walk_step is an exact regrouping of the
    position-major multitail step over the same walk chains: feeding the
    multitail step the emit_walk_positions view of the same chain (same
    key, same G, walk-major position order) must produce identical
    tables/moments/loss — both sides of every pair collapse to walk-
    granular entries, which dedup_rows merges additively."""
    from graphvite_tpu.ops.device_sampler import (emit_walk_banded,
                                                  emit_walk_positions)
    rng = np.random.default_rng(11)
    V, D, W, L, aug = 70, 8, 6, 9, 2
    M, G = 4, 2
    nw = 5.0
    L1 = L + 1
    chain = jnp.asarray(rng.integers(0, V, (L1, W)), jnp.int32)
    # dead-walk tails: some walks die early (cumulative validity)
    alive = rng.random((L1, W)) > 0.15
    alive[:2] = True
    valid = jnp.asarray(np.cumprod(alive, axis=0) > 0)
    key = jax.random.PRNGKey(5)

    for bidir in (False, True):
        T = aug * (2 if bidir else 1)
        ct, pm = emit_walk_banded(chain, valid, aug, bidir=bidir)
        h, t, m = emit_walk_positions(chain, valid, aug, bidir=bidir)
        np.testing.assert_array_equal(np.asarray(ct).reshape(-1),
                                      np.asarray(h))
        np.testing.assert_array_equal(np.asarray(pm).reshape(-1, T),
                                      np.asarray(m))
        for opt in (Optimizer(type="SGD", lr=0.05, weight_decay=1e-3),
                    Optimizer(type="Adam", lr=1e-3, weight_decay=1e-3)):
            for trust in (None, 0.25):
                vertex = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
                context = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
                moms = tuple(
                    (jnp.zeros((V, D), jnp.float32),) * opt.num_moment
                    for _ in range(2))
                state = {"tables": (vertex, context),
                         "moments": (moms[0], moms[1])}
                neg_state = _uniform_alias_state(V)
                banded = _steps.make_graph_banded_walk_step(
                    opt, 3, nw, aug, bidir, pool_size=M, pool_groups=G,
                    trust=trust)
                multi = _steps.make_graph_pool_multitail_step(
                    opt, 3, nw, T, pool_size=M, pool_groups=G, trust=trust)
                st_b, loss_b = banded(state, ct, ct, key,
                                      jnp.float32(opt.lr), *neg_state,
                                      mask=pm)
                st_m, loss_m = multi(state, h, t, key,
                                     jnp.float32(opt.lr), *neg_state,
                                     mask=m.astype(jnp.float32))
                np.testing.assert_allclose(float(loss_b), float(loss_m),
                                           rtol=2e-5)
                for a, b in zip(jax.tree_util.tree_leaves(st_b),
                                jax.tree_util.tree_leaves(st_m)):
                    np.testing.assert_allclose(np.asarray(a),
                                               np.asarray(b),
                                               rtol=3e-4, atol=3e-6)


def test_banded_fused_arena_matches_unfused():
    """The fused (vertex|context)-arena SGD step must produce EXACTLY the
    unfused banded step's tables (same RNG stream, zero-grad dead slots,
    same per-row deltas) — the flat-engine fusion that mirrors the mesh
    engine's W=1 parity trick."""
    import os
    import numpy as np
    from graphvite_tpu.graph import Graph
    from graphvite_tpu.solver import GraphSolver

    rng = np.random.default_rng(0)
    edges = [(str(rng.integers(300)), str(rng.integers(300)))
             for _ in range(4000)]
    g = Graph().load_edge_list(edges)

    def train(fused):
        os.environ["GRAPHVITE_TRUST"] = "0"       # trust off -> fused legal
        os.environ["GRAPHVITE_FUSED_ARENA"] = "1" if fused else "0"
        try:
            s = GraphSolver(dim=16, seed=11)
            s.build(g, num_negative=2, batch_size=2048, episode_size=3)
            s.train(model="DeepWalk", num_epoch=30, augmentation_step=2,
                    random_walk_length=6, log_frequency=10**9)
            assert getattr(s, "_banded_fused", False) == fused
            return s.vertex_embeddings, s.context_embeddings
        finally:
            del os.environ["GRAPHVITE_TRUST"]
            del os.environ["GRAPHVITE_FUSED_ARENA"]

    v1, c1 = train(True)
    v0, c0 = train(False)
    np.testing.assert_allclose(v1, v0, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(c1, c0, rtol=1e-5, atol=1e-7)
