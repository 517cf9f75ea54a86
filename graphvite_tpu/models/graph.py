"""Node-embedding models (ref include/instance/model/graph.h:33-107).

LINE / DeepWalk / node2vec all share the same score: dot(vertex, context);
they differ only in how positive samples are generated (sampler side).
"""
from __future__ import annotations

import jax.numpy as jnp


class LINE:
    """score = <vertex, context>  (model/graph.h:40-45)."""

    name = "LINE"

    @staticmethod
    def score(vertex, context):
        return jnp.sum(vertex * context, axis=-1)

    @staticmethod
    def backward(vertex, context, gradient):
        """d(score)/d(vertex), d(score)/d(context) scaled by dL/dscore.

        Matches model/graph.h:49-58: grad_vertex = g * context,
        grad_context = g * vertex.
        """
        g = gradient[..., None]
        return g * context, g * vertex


class DeepWalk(LINE):
    name = "DeepWalk"


class Node2Vec(LINE):
    name = "node2vec"


GRAPH_MODELS = {"LINE": LINE, "DeepWalk": DeepWalk, "node2vec": Node2Vec}
