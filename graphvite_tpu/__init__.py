"""graphvite_tpu: a TPU-native graph embedding framework.

Brand-new JAX/XLA/Pallas re-design with the capabilities of GraphVite
(DeepGraphLearning/graphvite): node embedding (DeepWalk/LINE/node2vec),
knowledge-graph embedding (TransE/DistMult/ComplEx/SimplE/RotatE/QuatE) and
LargeVis high-dimensional visualization, with host alias-table samplers
feeding HBM-resident sharded embedding tables.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compile_cache():
    """Persistent XLA compilation cache: episode executables take ~1 min to
    compile through a remote-compile TPU tunnel; caching makes every run
    after the first start instantly. Opt out with GRAPHVITE_TPU_NO_CACHE=1."""
    if _os.environ.get("GRAPHVITE_TPU_NO_CACHE"):
        return
    try:
        import jax
        platforms = str(jax.config.jax_platforms or "")
        suffix = platforms.replace(",", "-")
        if platforms.strip() in ("cpu", ""):
            # CPU executables are AOT-compiled for the exact host CPU; a
            # cache shared across machines (NFS homes, container images)
            # can produce SIGILL binaries. Key the cache directory by the
            # host CPU identity (arch + flags hash) so it is only ever hit
            # on an identical CPU — big CPU-mesh test programs take many
            # minutes to compile otherwise.
            import hashlib
            import platform as _plat
            flags = ""
            try:
                with open("/proc/cpuinfo") as f:
                    for line in f:
                        if line.startswith("flags"):
                            flags = line
                            break
            except OSError:
                pass
            cpu_id = hashlib.sha1(
                (_plat.machine() + flags).encode()).hexdigest()[:12]
            suffix = "cpu-%s" % cpu_id
        path = _os.environ.get(
            "GRAPHVITE_TPU_CACHE_DIR",
            _os.path.expanduser("~/.cache/graphvite_tpu/jax-%s" % suffix))
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compile_cache()

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
