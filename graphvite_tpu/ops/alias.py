"""Walker alias tables for O(1) discrete sampling.

TPU-native replacement for the reference's AliasTable
(include/base/alias_table.cuh:33-185): the table is built on the host
(numpy / native extension) and consumed in two ways:

* host-side vectorized sampling for the positive-edge / random-walk stream;
* device-resident (prob, alias) arrays sampled inside the jitted train step
  for negatives (two uniforms -> gather -> select, the same decision rule as
  alias_table.cuh:148-152).
"""
from __future__ import annotations

import numpy as np

from graphvite_tpu.utils.common import logger

try:  # native builder (graphvite_tpu/native/sampler.cpp via ctypes);
    # pure-python fallback below
    from graphvite_tpu import native as _native
    if _native.lib is None:  # pragma: no cover
        _native = None
except Exception:  # pragma: no cover
    _native = None


def build_alias(weights: np.ndarray):
    """Build an alias table. Returns (prob, alias) float64/int64 arrays.

    prob[i] is the probability of keeping column i when it is hit by the
    uniform first draw; alias[i] is the donor column otherwise.
    """
    weights = np.ascontiguousarray(weights, dtype=np.float64)
    n = weights.size
    if n == 0:
        return np.zeros(0), np.zeros(0, dtype=np.int64)
    total = weights.sum()
    if not np.isfinite(total) or total <= 0:
        raise ValueError("alias table requires positive finite weights")
    if _native is not None:
        return _native.build_alias(weights)
    return _build_alias_numpy(weights * (n / total))


def _build_alias_numpy(scaled: np.ndarray):
    """Queue-based alias construction (host fallback)."""
    n = scaled.size
    prob = np.ones(n, dtype=np.float64)
    alias = np.arange(n, dtype=np.int64)
    small = [i for i in range(n) if scaled[i] < 1.0]
    large = [i for i in range(n) if scaled[i] >= 1.0]
    scaled = scaled.copy()
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = scaled[s]
        alias[s] = l
        scaled[l] = scaled[l] - (1.0 - scaled[s])
        if scaled[l] < 1.0:
            small.append(l)
        else:
            large.append(l)
    # leftovers are 1 within float error
    for i in small + large:
        prob[i] = 1.0
    return prob, alias


class AliasTable:
    """Host alias table with vectorized batch sampling."""

    def __init__(self, weights: np.ndarray):
        self.count = int(np.asarray(weights).size)
        self.prob, self.alias = build_alias(np.asarray(weights))

    def sample(self, rng: np.random.Generator, size) -> np.ndarray:
        u1 = rng.random(size)
        u2 = rng.random(size)
        return self.sample_with(u1, u2)

    def sample_with(self, u1: np.ndarray, u2: np.ndarray) -> np.ndarray:
        idx = (u1 * self.count).astype(np.int64)
        np.clip(idx, 0, self.count - 1, out=idx)
        keep = u2 < self.prob[idx]
        return np.where(keep, idx, self.alias[idx])


class PackedAliasTables:
    """Many small alias tables packed into flat arrays (per-vertex /
    per-edge neighbor tables for random walks; ref graph.cuh:644-721).

    offsets[i]:offsets[i+1] delimits table i. Sampling is fully vectorized
    across a batch of table ids.
    """

    def __init__(self, weights_flat: np.ndarray, offsets: np.ndarray, uniform: bool = False):
        self.offsets = np.ascontiguousarray(offsets, dtype=np.int64)
        self.sizes = np.diff(self.offsets)
        self.uniform = uniform
        if uniform:
            self.prob = None
            self.alias = None
            return
        weights_flat = np.ascontiguousarray(weights_flat, dtype=np.float64)
        if _native is not None and weights_flat.size:
            self.prob, self.alias = _native.build_alias_packed(weights_flat, self.offsets)
            return
        prob = np.empty_like(weights_flat)
        alias = np.empty(weights_flat.size, dtype=np.int64)
        for i in range(self.sizes.size):
            lo, hi = self.offsets[i], self.offsets[i + 1]
            if hi > lo:
                p, a = build_alias(weights_flat[lo:hi])
                prob[lo:hi] = p
                alias[lo:hi] = a
        self.prob = prob
        self.alias = alias

    @classmethod
    def uniform_tables(cls, offsets: np.ndarray):
        return cls(np.zeros(0), offsets, uniform=True)

    def sample(self, table_ids: np.ndarray, u1: np.ndarray, u2: np.ndarray) -> np.ndarray:
        """Return the *local* index sampled within each table id."""
        sizes = self.sizes[table_ids]
        idx = (u1 * sizes).astype(np.int64)
        np.clip(idx, 0, np.maximum(sizes - 1, 0), out=idx)
        if self.uniform:
            return idx
        base = self.offsets[table_ids]
        flat = base + idx
        keep = u2 < self.prob[flat]
        return np.where(keep, idx, self.alias[flat])


def device_alias_arrays(table: AliasTable, dtype=np.float32):
    """(prob, alias) ready for upload as device negative-sampler state.

    When the table fits (n < 2^24, where int32 survives an f32 round-trip),
    prob and alias are PACKED into one [n, 2] f32 array so the per-sample
    alias decision costs ONE row gather instead of two 1-element gathers —
    scalar gathers run at ~11.5ns/row on v5e regardless of row width, so
    halving the gather count halves the sampling cost (tools/microbench.py
    sample_packed).
    """
    n = table.prob.shape[0]
    if 0 < n < (1 << 24):
        packed = np.stack([table.prob.astype(dtype),
                           table.alias.astype(dtype)], axis=1)
        return (packed,)
    return table.prob.astype(dtype), table.alias.astype(np.int32)


def device_sample(*args):
    """Sample from device-resident alias arrays inside jit.

    Accepts either (packed[n,2], u1, u2) or (prob[n], alias[n], u1, u2);
    u1/u2 uniform in [0,1) with the sample shape. Decision rule mirrors
    alias_table.cuh:148-152.
    """
    import jax.numpy as jnp

    if len(args) == 3:
        packed, u1, u2 = args
        n = packed.shape[0]
        idx = jnp.minimum((u1 * n).astype(jnp.int32), n - 1)
        rows = packed[idx]                       # one gather of [.., 2]
        keep = u2 < rows[..., 0]
        return jnp.where(keep, idx, rows[..., 1].astype(jnp.int32))
    prob, alias, u1, u2 = args
    n = prob.shape[0]
    idx = jnp.minimum((u1 * n).astype(jnp.int32), n - 1)
    keep = u2 < prob[idx]
    return jnp.where(keep, idx, alias[idx])
