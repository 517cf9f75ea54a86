"""Knowledge-graph embedding models.

Each model exposes:

* ``score(head, tail, relation, hyper)`` — the logit, vectorized over any
  leading batch dims; `hyper` is margin (TransE/RotatE) or l3_regularization
  (DistMult/ComplEx/SimplE/QuatE), matching the reference's single
  `margin_or_l3` scalar.
* ``backward(head, tail, relation, gradient, hyper)`` — hand-derived
  d(score)/d(row) * dL/dscore for each of the three rows, INCLUDING the l3
  regularization term ``3 * l3 * |p| * p`` where the reference adds it
  (model/knowledge_graph.h). The sign conventions match the reference's
  update argument exactly (the optimizer then computes
  ``param -= lr * weight * (grad + wd * param)``).

Complex/quaternion layouts are interleaved exactly like the reference
(re,im,re,im,... / r,i,j,k,...), so embeddings round-trip with GraphVite's
on-disk format. RotatE stores phases in the first dim/2 slots of the relation
row (knowledge_graph.cuh:595-599); the unused second half receives zero
gradient.

Reference: include/instance/model/knowledge_graph.h (TransE :34-103,
DistMult :112-190, ComplEx :199-341, SimplE :350-434, RotatE :445-575,
QuatE :584-814).
"""
from __future__ import annotations

import jax.numpy as jnp

from graphvite_tpu.utils.common import EPSILON


def _l3_term(p, l3):
    # backward multiplies l3_regularization by 3 (d/dp of l3 * |p|^3)
    return (3.0 * l3) * jnp.abs(p) * p


def _split2(x):
    """Interleaved (..., 2i)=re, (..., 2i+1)=im -> (re, im) halves."""
    return x[..., 0::2], x[..., 1::2]


def _merge2(re, im):
    out = jnp.stack([re, im], axis=-1)
    return out.reshape(out.shape[:-2] + (-1,))


class TransE:
    """score = margin - ||h + r - t||_1  (model/knowledge_graph.h:41-47)."""

    name = "TransE"
    uses_margin = True

    @staticmethod
    def score(head, tail, relation, margin):
        return margin - jnp.sum(jnp.abs(head + relation - tail), axis=-1)

    @staticmethod
    def backward(head, tail, relation, gradient, margin):
        # s = +1 where h + r - t > 0 else -1 (zero maps to -1, matching
        # the reference ternary at model/knowledge_graph.h:59)
        s = jnp.where(head + relation - tail > 0, 1.0, -1.0)
        g = gradient[..., None] * s
        return -g, g, -g


class DistMult:
    """score = sum(h * r * t)  (model/knowledge_graph.h:119-126)."""

    name = "DistMult"
    uses_margin = False

    @staticmethod
    def score(head, tail, relation, l3):
        return jnp.sum(head * relation * tail, axis=-1)

    @staticmethod
    def backward(head, tail, relation, gradient, l3):
        g = gradient[..., None]
        gh = g * relation * tail + _l3_term(head, l3)
        gt = g * head * relation + _l3_term(tail, l3)
        gr = g * head * tail + _l3_term(relation, l3)
        return gh, gt, gr


class ComplEx:
    """score = Re(<h * r, conj(t)>)  (model/knowledge_graph.h:207-223)."""

    name = "ComplEx"
    uses_margin = False

    @staticmethod
    def score(head, tail, relation, l3):
        h_re, h_im = _split2(head)
        t_re, t_im = _split2(tail)
        r_re, r_im = _split2(relation)
        p_re = h_re * r_re - h_im * r_im
        p_im = h_re * r_im + h_im * r_re
        return jnp.sum(p_re * t_re + p_im * t_im, axis=-1)

    @staticmethod
    def backward(head, tail, relation, gradient, l3):
        h_re, h_im = _split2(head)
        t_re, t_im = _split2(tail)
        r_re, r_im = _split2(relation)
        g = gradient[..., None]
        gh = _merge2(g * (r_re * t_re + r_im * t_im),
                     g * (-r_im * t_re + r_re * t_im)) + _l3_term(head, l3)
        gt = _merge2(g * (h_re * r_re - h_im * r_im),
                     g * (h_re * r_im + h_im * r_re)) + _l3_term(tail, l3)
        gr = _merge2(g * (h_re * t_re + h_im * t_im),
                     g * (-h_im * t_re + h_re * t_im)) + _l3_term(relation, l3)
        return gh, gt, gr


class SimplE:
    """score = sum(h * r * flip_pairs(t)) where dim 2i <-> 2i+1 are swapped
    (model/knowledge_graph.h:358-367, j = i ^ 1)."""

    name = "SimplE"
    uses_margin = False

    @staticmethod
    def _flip(x):
        a, b = _split2(x)
        return _merge2(b, a)

    @staticmethod
    def score(head, tail, relation, l3):
        return jnp.sum(head * relation * SimplE._flip(tail), axis=-1)

    @staticmethod
    def backward(head, tail, relation, gradient, l3):
        g = gradient[..., None]
        t_flip = SimplE._flip(tail)
        gh = g * relation * t_flip + _l3_term(head, l3)
        # d(score)/d(t[j]) with j = i^1 lands back at position j after flip
        gt = SimplE._flip(g * head * relation) + _l3_term(tail, l3)
        gr = g * head * t_flip + _l3_term(relation, l3)
        return gh, gt, gr


class RotatE:
    """score = margin - sum_i |h_i * e^{i phase_i} - t_i|_2 over complex dims
    (model/knowledge_graph.h:453-469). Relation row stores dim/2 phases in its
    first half."""

    name = "RotatE"
    uses_margin = True

    @staticmethod
    def score(head, tail, relation, margin):
        h_re, h_im = _split2(head)
        t_re, t_im = _split2(tail)
        phase = relation[..., : head.shape[-1] // 2]
        r_re, r_im = jnp.cos(phase), jnp.sin(phase)
        d_re = h_re * r_re - h_im * r_im - t_re
        d_im = h_re * r_im + h_im * r_re - t_im
        return margin - jnp.sum(jnp.sqrt(d_re * d_re + d_im * d_im), axis=-1)

    @staticmethod
    def backward(head, tail, relation, gradient, margin):
        dim = head.shape[-1]
        h_re, h_im = _split2(head)
        t_re, t_im = _split2(tail)
        phase = relation[..., : dim // 2]
        r_re, r_im = jnp.cos(phase), jnp.sin(phase)
        d_re = h_re * r_re - h_im * r_im - t_re
        d_im = h_re * r_im + h_im * r_re - t_im
        dist = jnp.sqrt(d_re * d_re + d_im * d_im)
        g = gradient[..., None] / (dist + EPSILON)
        gh = _merge2(-g * (d_re * r_re + d_im * r_im),
                     -g * (-d_re * r_im + d_im * r_re))
        gt = _merge2(g * d_re, g * d_im)
        # model/knowledge_graph.h:497-498
        gphase = -g * (d_re * (h_re * -r_im + h_im * -r_re)
                       + d_im * (h_re * r_re + h_im * -r_im))
        gr = jnp.concatenate([gphase, jnp.zeros_like(gphase)], axis=-1)
        return gh, gt, gr


class QuatE:
    """score = sum(hamilton(h, r/|r|) . t) per quaternion group
    (model/knowledge_graph.h:593-618)."""

    name = "QuatE"
    uses_margin = False

    @staticmethod
    def _split4(x):
        return x[..., 0::4], x[..., 1::4], x[..., 2::4], x[..., 3::4]

    @staticmethod
    def _merge4(r, i, j, k):
        out = jnp.stack([r, i, j, k], axis=-1)
        return out.reshape(out.shape[:-2] + (-1,))

    @staticmethod
    def score(head, tail, relation, l3):
        h_r, h_i, h_j, h_k = QuatE._split4(head)
        r_r, r_i, r_j, r_k = QuatE._split4(relation)
        t_r, t_i, t_j, t_k = QuatE._split4(tail)
        r_norm = jnp.sqrt(r_r * r_r + r_i * r_i + r_j * r_j + r_k * r_k)
        p_r = h_r * r_r - h_i * r_i - h_j * r_j - h_k * r_k
        p_i = h_r * r_i + h_i * r_r + h_j * r_k - h_k * r_j
        p_j = h_r * r_j - h_i * r_k + h_j * r_r + h_k * r_i
        p_k = h_r * r_k + h_i * r_j - h_j * r_i + h_k * r_r
        return jnp.sum((p_r * t_r + p_i * t_i + p_j * t_j + p_k * t_k)
                       / (r_norm + EPSILON), axis=-1)

    @staticmethod
    def backward(head, tail, relation, gradient, l3):
        h_r, h_i, h_j, h_k = QuatE._split4(head)
        r_r, r_i, r_j, r_k = QuatE._split4(relation)
        t_r, t_i, t_j, t_k = QuatE._split4(tail)
        r_norm = jnp.sqrt(r_r * r_r + r_i * r_i + r_j * r_j + r_k * r_k)
        g = gradient[..., None] / (r_norm + EPSILON)
        # head grads (model/knowledge_graph.h:643-646); note the reference
        # treats r_norm as a constant here (no grad through the normalizer)
        gh = QuatE._merge4(
            g * (r_r * t_r + r_i * t_i + r_j * t_j + r_k * t_k),
            g * (-r_i * t_r + r_r * t_i - r_k * t_j + r_j * t_k),
            g * (-r_j * t_r + r_k * t_i + r_r * t_j - r_i * t_k),
            g * (-r_k * t_r - r_j * t_i + r_i * t_j + r_r * t_k),
        ) + _l3_term(head, l3)
        gt = QuatE._merge4(
            g * (h_r * r_r - h_i * r_i - h_j * r_j - h_k * r_k),
            g * (h_r * r_i + h_i * r_r + h_j * r_k - h_k * r_j),
            g * (h_r * r_j - h_i * r_k + h_j * r_r + h_k * r_i),
            g * (h_r * r_k + h_i * r_j - h_j * r_i + h_k * r_r),
        ) + _l3_term(tail, l3)
        gr = QuatE._merge4(
            g * (h_r * t_r + h_i * t_i + h_j * t_j + h_k * t_k),
            g * (-h_i * t_r + h_r * t_i + h_k * t_j - h_j * t_k),
            g * (-h_j * t_r - h_k * t_i + h_r * t_j + h_i * t_k),
            g * (-h_k * t_r + h_j * t_i - h_i * t_j + h_r * t_k),
        ) + _l3_term(relation, l3)
        return gh, gt, gr


KG_MODELS = {m.name: m for m in (TransE, DistMult, ComplEx, SimplE, RotatE, QuatE)}
