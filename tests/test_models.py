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

jax.config.update("jax_enable_x64", True)

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
