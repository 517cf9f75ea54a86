"""LargeVis visualization model (ref include/instance/model/visualization.h).

score x = ||head - tail||^2 ; training uses student-t prob 1/(1+x) with the
reference's smoothed negative gradient (gpu/visualization.cuh:29,85).
"""
from __future__ import annotations

import jax.numpy as jnp

SMOOTH_TERM = 0.1  # gpu/visualization.cuh:29


class LargeVis:
    name = "LargeVis"

    @staticmethod
    def score(head, tail):
        d = head - tail
        return jnp.sum(d * d, axis=-1)

    @staticmethod
    def backward(head, tail, gradient):
        """grad_head = g * (h - t), grad_tail = g * (t - h)
        (model/visualization.h:48-57)."""
        g = gradient[..., None]
        d = head - tail
        return g * d, -g * d
