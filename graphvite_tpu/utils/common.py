"""Common constants and small helpers.

Mirrors the role of the reference's include/util/common.h and util/math.h
(kEpsilon, kAuto sentinel, safe numerics) without copying its code.
"""
from __future__ import annotations

import contextlib
import logging
import os
import time

import numpy as np

# Sentinel meaning "deduce this hyperparameter automatically".
# The reference uses kAuto = 0 (include/util/common.h:38); we keep the same
# convention so YAML configs with `auto` behave identically.
auto = 0

EPSILON = 1e-15

KiB = 1 << 10
MiB = 1 << 20
GiB = 1 << 30

logger = logging.getLogger("graphvite_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(asctime)s %(levelname).1s %(message)s",
                                      datefmt="%H:%M:%S"))
    logger.addHandler(_h)
    logger.setLevel(os.environ.get("GRAPHVITE_LOG_LEVEL", "INFO"))


def parse_bytes(value):
    """Parse a byte count: int/float bytes or a "4G"/"512M"/"12GiB" string."""
    if isinstance(value, (int, float)):
        return float(value)
    s = str(value).strip().upper().replace("IB", "").rstrip("B")
    for suffix, mult in (("K", KiB), ("M", MiB), ("G", GiB), ("T", GiB * 1024)):
        if s.endswith(suffix):
            return float(s[:-1]) * mult
    return float(s)


def hbm_budget_bytes(limit=auto):
    """Per-device HBM budget in bytes, the analog of the reference's
    cudaMemGetInfo-driven resource discovery (solver.h:186-213,
    gpu_memory_demand :827-860).

    Priority: GRAPHVITE_HBM_BYTES env override > an explicit `limit`
    (the solver's gpu_memory_limit; bytes or "4G"-style) > the live
    device's memory_stats()['bytes_limit'] > a platform default (16 GB
    for TPU — the v4/v5e floor — else 12 GB)."""
    env = os.environ.get("GRAPHVITE_HBM_BYTES")
    if env is not None:
        return parse_bytes(env)
    if limit not in (auto, None):
        return parse_bytes(limit)
    import jax

    try:
        dev = jax.local_devices()[0]
        stats = dev.memory_stats()
        if stats and stats.get("bytes_limit"):
            return float(stats["bytes_limit"])
        platform = dev.platform
    except Exception:  # backend without local devices (init failures)
        platform = None
    return 16e9 if platform == "tpu" else 12e9


def sigmoid(x):
    """Numerically-safe sigmoid on numpy arrays (ref util/math.h:30-33)."""
    out = np.empty_like(x, dtype=np.float64)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    ex = np.exp(x[~pos])
    out[~pos] = ex / (1.0 + ex)
    return out


class Monitor:
    """Wall-clock stage timer, the analog of the reference's Timer RAII profiler
    (util/time.h:28-60) and Python Monitor decorators (util.py:126-208)."""

    def __init__(self):
        self.records = {}

    @contextlib.contextmanager
    def stage(self, name):
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            total, count = self.records.get(name, (0.0, 0))
            self.records[name] = (total + elapsed, count + 1)
            logger.info("%s: %.3f s", name, elapsed)

    def summary(self):
        return {k: {"total_s": t, "calls": c} for k, (t, c) in self.records.items()}


@contextlib.contextmanager
def device_profile(trace_dir):
    """Capture a device profile for the enclosed block (the TPU-era analog
    of the reference's USE_TIMER RAII stages, util/time.h:28-60). View with
    tensorboard's profile plugin."""
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("device trace written to %s", trace_dir)


def recursive_map(obj, fn):
    """Apply fn to every leaf of a nested dict/list structure (ref util.py)."""
    if isinstance(obj, dict):
        return {k: recursive_map(v, fn) for k, v in obj.items()}
    if isinstance(obj, list):
        return [recursive_map(v, fn) for v in obj]
    return fn(obj)


def assert_in(name, value, candidates):
    if value not in candidates:
        raise ValueError("Unknown %s `%s`; expected one of %s" % (name, value, sorted(candidates)))
