"""graphvite_tpu: a TPU-native graph embedding framework.

Brand-new JAX/XLA/Pallas re-design with the capabilities of GraphVite
(DeepGraphLearning/graphvite): node embedding (DeepWalk/LINE/node2vec),
knowledge-graph embedding (TransE/DistMult/ComplEx/SimplE/RotatE/QuatE) and
LargeVis high-dimensional visualization, with host alias-table samplers
feeding HBM-resident sharded embedding tables.
"""

__version__ = "0.1.0"

from graphvite_tpu.utils.common import auto
from graphvite_tpu.graph import Graph, KnowledgeGraph
from graphvite_tpu.optim import Optimizer, make_optimizer
from graphvite_tpu.solver import (GraphSolver, KnowledgeGraphSolver,
                                  VisualizationSolver)

# dtype shorthands, mirroring the reference's graphvite.float32 / .uint32
import numpy as _np
float32 = _np.float32
float64 = _np.float64
uint32 = _np.uint32
uint64 = _np.uint64

__all__ = [
    "auto", "Graph", "KnowledgeGraph", "Optimizer", "make_optimizer",
    "GraphSolver", "KnowledgeGraphSolver", "VisualizationSolver",
    "float32", "float64", "uint32", "uint64",
]
