"""Independent numpy reimplementation of every score function, mirroring the
reference's PyTorch cross-check (python/graphvite/application/network.py:69-143).
Used as the golden oracle for the JAX models."""
import numpy as np


def line(h, t):
    return np.sum(h * t, axis=-1)


def transe(h, r, t, margin=12.0):
    return margin - np.abs(h + r - t).sum(-1)


def rotate(h, r, t, margin=12.0):
    d = h.shape[-1] // 2
    h_re, h_im = h[..., 0::2], h[..., 1::2]
    t_re, t_im = t[..., 0::2], t[..., 1::2]
    phase = r[..., :d]
    r_re, r_im = np.cos(phase), np.sin(phase)
    x_re = h_re * r_re - h_im * r_im - t_re
    x_im = h_re * r_im + h_im * r_re - t_im
    return margin - np.sqrt(x_re ** 2 + x_im ** 2).sum(-1)


def distmult(h, r, t):
    return (h * r * t).sum(-1)


def complex_(h, r, t):
    h_re, h_im = h[..., 0::2], h[..., 1::2]
    t_re, t_im = t[..., 0::2], t[..., 1::2]
    r_re, r_im = r[..., 0::2], r[..., 1::2]
    x_re = h_re * r_re - h_im * r_im
    x_im = h_re * r_im + h_im * r_re
    return (x_re * t_re + x_im * t_im).sum(-1)


def simple(h, r, t):
    flip = t.copy()
    flip[..., 0::2], flip[..., 1::2] = t[..., 1::2], t[..., 0::2]
    return (h * r * flip).sum(-1)


def quate(h, r, t):
    h_r, h_i, h_j, h_k = (h[..., i::4] for i in range(4))
    r_r, r_i, r_j, r_k = (r[..., i::4] for i in range(4))
    t_r, t_i, t_j, t_k = (t[..., i::4] for i in range(4))
    norm = np.sqrt(r_r ** 2 + r_i ** 2 + r_j ** 2 + r_k ** 2)
    x_r = h_r * r_r - h_i * r_i - h_j * r_j - h_k * r_k
    x_i = h_r * r_i + h_i * r_r + h_j * r_k - h_k * r_j
    x_j = h_r * r_j - h_i * r_k + h_j * r_r + h_k * r_i
    x_k = h_r * r_k + h_i * r_j - h_j * r_i + h_k * r_r
    return ((x_r * t_r + x_i * t_i + x_j * t_j + x_k * t_k)
            / (norm + 1e-15)).sum(-1)


def largevis(h, t):
    return ((h - t) ** 2).sum(-1)
