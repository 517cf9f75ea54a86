"""Embedding model zoo: score functions + hand-derived row gradients.

Node embedding (ref include/instance/model/graph.h): LINE, DeepWalk, node2vec.
Knowledge graphs (ref include/instance/model/knowledge_graph.h): TransE,
DistMult, ComplEx, SimplE, RotatE, QuatE.
Visualization (ref include/instance/model/visualization.h): LargeVis.
"""
from graphvite_tpu.models.graph import LINE, GRAPH_MODELS
from graphvite_tpu.models.knowledge_graph import (
    TransE, DistMult, ComplEx, SimplE, RotatE, QuatE, KG_MODELS,
)
from graphvite_tpu.models.visualization import LargeVis

__all__ = [
    "LINE", "TransE", "DistMult", "ComplEx", "SimplE", "RotatE", "QuatE",
    "LargeVis", "GRAPH_MODELS", "KG_MODELS",
]
