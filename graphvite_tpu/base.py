"""Global user configuration (ref python/graphvite/base.py:29-84).

Reads ``~/.graphvite_tpu/config.yaml`` once at import:

    dataset_path: ~/my_datasets
    float_type: float32
    index_type: int32
    backend: graphvite        # evaluation backend name, kept for parity

Values are exposed as module attributes and used as defaults by
`graphvite_tpu.dataset` (dataset_path) and the solvers (dtypes).
Environment variables (GRAPHVITE_DATASET_PATH) win over the file.
"""
from __future__ import annotations

import os

import numpy as np

from graphvite_tpu.utils.common import logger

CONFIG_FILE = os.path.expanduser("~/.graphvite_tpu/config.yaml")

dataset_path = os.path.expanduser("~/.graphvite_tpu/dataset")
float_type = np.float32
index_type = np.int32
backend = "graphvite"

# bfloat16 (via ml_dtypes, numpy-compatible) is the TPU-native embedding
# dtype: tables at half the HBM traffic, compute and moments stay f32
try:
    import ml_dtypes as _ml_dtypes
    _BF16 = _ml_dtypes.bfloat16
except ImportError:  # pragma: no cover
    _BF16 = np.float32
_FLOAT_TYPES = {"float32": np.float32, "float64": np.float64,
                "bfloat16": _BF16}
_INDEX_TYPES = {"uint32": np.int32, "int32": np.int32,
                "uint64": np.int64, "int64": np.int64}


def load_global_config():
    global dataset_path, float_type, index_type, backend
    if not os.path.isfile(CONFIG_FILE):
        return
    try:
        import yaml
        with open(CONFIG_FILE) as f:
            cfg = yaml.safe_load(f) or {}
    except Exception as e:  # pragma: no cover
        logger.warning("cannot read %s: %s", CONFIG_FILE, e)
        return
    if "dataset_path" in cfg:
        dataset_path = os.path.expanduser(str(cfg["dataset_path"]))
    if "float_type" in cfg:
        float_type = _FLOAT_TYPES.get(str(cfg["float_type"]), float_type)
    if "index_type" in cfg:
        index_type = _INDEX_TYPES.get(str(cfg["index_type"]), index_type)
    if "backend" in cfg:
        backend = str(cfg["backend"])


load_global_config()
if "GRAPHVITE_DATASET_PATH" in os.environ:
    dataset_path = os.environ["GRAPHVITE_DATASET_PATH"]
