"""Golden tests: model scores vs the numpy oracle, hand-derived backward vs
jax.grad of the stated forward (where the reference's gradients ARE the exact
gradient), and explicit checks of the documented intentional deviations
(QuatE's frozen normalizer, l3 terms)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphvite_tpu.models import (LINE, TransE, DistMult, ComplEx, SimplE,
                                  RotatE, QuatE, LargeVis)
import oracle

# x64 is needed for the tight golden tolerances here, but enabling it at
# import time leaked into every test module that ran AFTER this one (f32
# RNG draws change under x64 and the mesh quality gates saw different
# trajectories) — scope it to this module and restore on teardown
@pytest.fixture(autouse=True, scope="module")
def _x64_scope():
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", old)


DIM = 16
B = 7
RNG = np.random.default_rng(0)


def rand(*shape):
    return RNG.normal(size=shape)


# ---------------------------------------------------------------------------
# score vs oracle
# ---------------------------------------------------------------------------

def test_line_score():
    h, t = rand(B, DIM), rand(B, DIM)
    np.testing.assert_allclose(LINE.score(h, t), oracle.line(h, t), rtol=1e-10)


@pytest.mark.parametrize("model,fn,hyper", [
    (TransE, oracle.transe, 12.0),
    (RotatE, oracle.rotate, 12.0),
])
def test_margin_scores(model, fn, hyper):
    h, r, t = rand(B, DIM), rand(B, DIM), rand(B, DIM)
    np.testing.assert_allclose(model.score(h, t, r, hyper), fn(h, r, t, hyper),
                               rtol=1e-10)


@pytest.mark.parametrize("model,fn", [
    (DistMult, oracle.distmult),
    (ComplEx, oracle.complex_),
    (SimplE, oracle.simple),
    (QuatE, oracle.quate),
])
def test_l3_scores(model, fn):
    h, r, t = rand(B, DIM), rand(B, DIM), rand(B, DIM)
    np.testing.assert_allclose(model.score(h, t, r, 0.0), fn(h, r, t),
                               rtol=1e-9)


def test_largevis_score():
    h, t = rand(B, DIM), rand(B, DIM)
    np.testing.assert_allclose(LargeVis.score(h, t), oracle.largevis(h, t),
                               rtol=1e-10)


# ---------------------------------------------------------------------------
# backward vs jax.grad (models whose reference grads are exact)
# ---------------------------------------------------------------------------

def _check_grads(model, hyper, check_rel=True, atol=1e-8):
    h, r, t = rand(B, DIM), rand(B, DIM), rand(B, DIM)
    g = rand(B)

    def total(hh, tt, rr):
        return jnp.sum(model.score(hh, tt, rr, hyper) * g)

    gh_auto, gt_auto, gr_auto = jax.grad(total, argnums=(0, 1, 2))(h, t, r)
    gh, gt, gr = model.backward(h, t, r, g, hyper)
    np.testing.assert_allclose(gh, gh_auto, atol=atol)
    np.testing.assert_allclose(gt, gt_auto, atol=atol)
    if check_rel:
        np.testing.assert_allclose(gr, gr_auto, atol=atol)


def test_line_backward():
    h, t = rand(B, DIM), rand(B, DIM)
    g = rand(B)
    gh, gt = LINE.backward(h, t, g)
    def total(hh, tt):
        return jnp.sum(LINE.score(hh, tt) * g)
    gh_a, gt_a = jax.grad(total, argnums=(0, 1))(h, t)
    np.testing.assert_allclose(gh, gh_a, atol=1e-10)
    np.testing.assert_allclose(gt, gt_a, atol=1e-10)


def test_transe_backward():
    _check_grads(TransE, 12.0)


def test_distmult_backward():
    _check_grads(DistMult, 0.0)


def test_complex_backward():
    _check_grads(ComplEx, 0.0)


def test_simple_backward():
    _check_grads(SimplE, 0.0)


def test_rotate_backward():
    # epsilon smoothing in the denominator => slightly looser tolerance
    _check_grads(RotatE, 12.0, atol=1e-6)


def test_quate_backward_head_tail():
    # the reference treats the relation normalizer as constant, so only
    # head/tail grads match autodiff exactly
    h, r, t = rand(B, DIM), rand(B, DIM), rand(B, DIM)
    g = rand(B)
    def total(hh, tt):
        return jnp.sum(QuatE.score(hh, tt, r, 0.0) * g)
    gh_a, gt_a = jax.grad(total, argnums=(0, 1))(h, t)
    gh, gt, gr = QuatE.backward(h, t, r, g, 0.0)
    np.testing.assert_allclose(gh, gh_a, atol=1e-8)
    np.testing.assert_allclose(gt, gt_a, atol=1e-8)


def test_l3_term():
    # l3 adds 3 * l3 * |p| * p to every grad (model/knowledge_graph.h:134)
    h, r, t = rand(B, DIM), rand(B, DIM), rand(B, DIM)
    g = rand(B)
    l3 = 0.123
    gh0, gt0, gr0 = DistMult.backward(h, t, r, g, 0.0)
    gh1, gt1, gr1 = DistMult.backward(h, t, r, g, l3)
    np.testing.assert_allclose(gh1 - gh0, 3 * l3 * np.abs(h) * h, atol=1e-10)
    np.testing.assert_allclose(gt1 - gt0, 3 * l3 * np.abs(t) * t, atol=1e-10)
    np.testing.assert_allclose(gr1 - gr0, 3 * l3 * np.abs(r) * r, atol=1e-10)


def test_largevis_backward():
    # the reference's backward is g*(h-t) — HALF the true gradient of
    # ||h-t||^2; the factor 2 is folded into the caller's `gradient`
    # (gpu/visualization.cuh:105-110 passes 2*prob / -2*prob/(x+0.1))
    h, t = rand(B, DIM), rand(B, DIM)
    g = rand(B)
    gh, gt = LargeVis.backward(h, t, g)
    def total(hh, tt):
        return jnp.sum(LargeVis.score(hh, tt) * g)
    gh_a, gt_a = jax.grad(total, argnums=(0, 1))(h, t)
    np.testing.assert_allclose(gh, 0.5 * gh_a, atol=1e-10)
    np.testing.assert_allclose(gt, 0.5 * gt_a, atol=1e-10)


def test_rotate_relation_layout():
    """Phases live in the first dim/2 slots; second half gets zero grad."""
    h, r, t = rand(B, DIM), rand(B, DIM), rand(B, DIM)
    g = rand(B)
    _, _, gr = RotatE.backward(h, t, r, g, 12.0)
    assert np.all(np.asarray(gr[..., DIM // 2:]) == 0)


def test_kg_step_matches_autodiff():
    """The restructured K+2-row KG step must produce exactly the SGD update
    -lr * dL/d(tables) for L = sum_b [softplus(-z_pos) + sum_k w_k *
    softplus(z_k)] with stop-gradient adversarial weights (wd = 0)."""
    import jax
    import jax.numpy as jnp
    from graphvite_tpu.ops import steps as _steps
    from graphvite_tpu.optim import Optimizer
    from graphvite_tpu.models import KG_MODELS

    rng = np.random.default_rng(0)
    V, R, D, B, K = 12, 3, 8, 16, 4
    ent = jnp.asarray(rng.standard_normal((V, D), dtype=np.float32))
    rel = jnp.asarray(rng.standard_normal((R, D), dtype=np.float32))
    heads = jnp.asarray(rng.integers(0, V, B), jnp.int32)
    tails = jnp.asarray(rng.integers(0, V, B), jnp.int32)
    rels = jnp.asarray(rng.integers(0, R, B), jnp.int32)
    key = jax.random.PRNGKey(7)
    lr, margin, at = 0.1, 4.0, 2.0
    model = KG_MODELS["RotatE"]
    opt = Optimizer(type="SGD", lr=lr, weight_decay=0.0)
    step = _steps.make_kg_train_step(model, opt, K, margin, at, 1.0)
    state = {"tables": (ent, rel), "moments": ((), ())}
    new_state, _ = step(state, heads, tails, rels, key, lr)

    # replicate the negative draw deterministically
    neg_ids = jax.random.randint(key, (B, K), 0, 2 * V)
    corrupt_head = neg_ids < V
    cand = jnp.where(corrupt_head, neg_ids, neg_ids - V)

    def total_loss(ent, rel):
        h_pos = ent[heads][:, None, :]
        t_pos = ent[tails][:, None, :]
        c = ent[cand]
        ch = corrupt_head[..., None]
        h = jnp.concatenate([jnp.where(ch, c, h_pos), h_pos], axis=1)
        t = jnp.concatenate([jnp.where(ch, t_pos, c), t_pos], axis=1)
        r = rel[rels][:, None, :]
        z = model.score(h, t, r, margin)
        w = jax.lax.stop_gradient(
            jnp.minimum(jax.nn.softmax(z[:, :K] / at, axis=-1), 1.0))
        return jnp.sum(jax.nn.softplus(-z[:, K])
                       + jnp.sum(w * jax.nn.softplus(z[:, :K]), axis=-1))

    ge, gr = jax.grad(total_loss, argnums=(0, 1))(ent, rel)
    np.testing.assert_allclose(np.asarray(new_state["tables"][0]),
                               np.asarray(ent - lr * ge), rtol=2e-4,
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(new_state["tables"][1]),
                               np.asarray(rel - lr * gr), rtol=2e-4,
                               atol=2e-6)


@pytest.mark.parametrize("model", ["DistMult", "ComplEx", "SimplE", "QuatE"])
def test_kg_score_all_mxu_path_matches_broadcast(model):
    """The MXU one-vs-all path (q @ entity^T) must equal direct scoring."""
    from graphvite_tpu.application import evaluate as ev
    from graphvite_tpu.models import KG_MODELS

    rng = np.random.default_rng(0)
    V, R, D, B = 20, 4, 8, 6
    ent = rng.standard_normal((V, D)).astype(np.float32)
    rel = rng.standard_normal((R, D)).astype(np.float32)
    h = rng.integers(0, V, B)
    r = rng.integers(0, R, B)
    t = rng.integers(0, V, B)
    for target in ("head", "tail"):
        fast = ev.kg_score_all(model, ent, rel, h, r, t, target, 0.0)
        # direct: score every candidate with the plain score function
        mdl = KG_MODELS[model]
        import jax.numpy as jnp
        if target == "head":
            ref = mdl.score(jnp.asarray(ent)[None, :, :],
                            jnp.asarray(ent[t])[:, None, :],
                            jnp.asarray(rel[r])[:, None, :], 0.0)
        else:
            ref = mdl.score(jnp.asarray(ent[h])[:, None, :],
                            jnp.asarray(ent)[None, :, :],
                            jnp.asarray(rel[r])[:, None, :], 0.0)
        np.testing.assert_allclose(fast, np.asarray(ref), rtol=2e-4,
                                   atol=1e-4)
