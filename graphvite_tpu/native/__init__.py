"""ctypes loader for the native host-sampling library (sampler.cpp).

Compiles on first import with g++ into a per-user cache directory (no
pybind11 in the image; the C ABI + ctypes keeps the binding dependency-free).
Falls back silently — callers must handle `lib is None`.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "sampler.cpp")


def _build() -> str:
    import platform

    with open(_SRC, "rb") as f:
        src_digest = hashlib.sha256(f.read()).hexdigest()[:16]
    # -march=native output is host-CPU specific; a cache dir shared across
    # heterogeneous machines (NFS home, container images) must not serve a
    # .so built for another CPU (SIGILL). Key the artifact by the host's
    # CPU flags as well as the source.
    try:
        with open("/proc/cpuinfo") as f:
            cpu_flags = "".join(l for l in f if l.startswith("flags"))[:4096]
    except OSError:
        cpu_flags = ""
    host = "%s-%s" % (platform.machine(),
                      hashlib.sha256(cpu_flags.encode()).hexdigest()[:8])
    digest = "%s-%s" % (src_digest, host)
    cache_dir = os.environ.get(
        "GRAPHVITE_TPU_CACHE_DIR",
        os.path.expanduser("~/.cache/graphvite_tpu"))
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "libgvsampler-%s.so" % digest)
    if os.path.exists(so_path):
        return so_path
    with tempfile.TemporaryDirectory() as tmp:
        tmp_so = os.path.join(tmp, "libgvsampler.so")
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
             "-pthread", _SRC, "-o", tmp_so],
            check=True, capture_output=True)
        os.replace(tmp_so, so_path)
    return so_path


def _load():
    try:
        lib = ctypes.CDLL(_build())
    except Exception:  # pragma: no cover - fallback to numpy paths
        return None
    i64 = ctypes.c_int64
    u64 = ctypes.c_uint64
    pd = ctypes.POINTER(ctypes.c_double)
    pi = ctypes.POINTER(i64)
    lib.gv_build_alias.argtypes = [pd, i64, pd, pi]
    lib.gv_build_alias.restype = ctypes.c_int
    lib.gv_build_alias_packed.argtypes = [pd, pi, i64, pd, pi]
    lib.gv_build_alias_packed.restype = ctypes.c_int
    lib.gv_alias_sample.argtypes = [pd, pi, i64, pd, pd, i64, pi]
    lib.gv_alias_sample.restype = None
    lib.gv_random_walks.argtypes = [pi, pi, pd, pi, pi, pi, i64, i64, u64,
                                    pi, pi]
    lib.gv_random_walks.restype = None
    p32 = ctypes.POINTER(ctypes.c_int32)
    lib.gv_build_cuckoo.argtypes = [p32, p32, i64, p32, i64]
    lib.gv_build_cuckoo.restype = ctypes.c_int
    return lib


lib = _load()


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def build_alias(weights):
    """Exact drop-in for ops.alias.build_alias on contiguous float64."""
    import numpy as np

    n = weights.shape[0]
    prob = np.empty(n, dtype=np.float64)
    alias = np.empty(n, dtype=np.int64)
    rc = lib.gv_build_alias(_ptr(weights, ctypes.c_double), n,
                            _ptr(prob, ctypes.c_double),
                            _ptr(alias, ctypes.c_int64))
    if rc != 0:
        raise ValueError("alias table requires positive finite weights")
    return prob, alias


def build_cuckoo(us, vs, num_buckets):
    """Bucketized cuckoo table over directed edges; returns the
    [num_buckets, 4] int32 table or None if insertion failed at this
    size (caller doubles and retries). Hash matches the device probe
    (ops.device_sampler._cuckoo_hashes)."""
    import numpy as np

    table = np.full((num_buckets, 4), -1, dtype=np.int32)
    rc = lib.gv_build_cuckoo(
        _ptr(us, ctypes.c_int32), _ptr(vs, ctypes.c_int32), us.shape[0],
        _ptr(table, ctypes.c_int32), num_buckets)
    return table if rc == 0 else None


def build_alias_packed(weights, offsets):
    import numpy as np

    m = offsets.shape[0] - 1
    prob = np.empty(weights.shape[0], dtype=np.float64)
    alias = np.empty(weights.shape[0], dtype=np.int64)
    rc = lib.gv_build_alias_packed(
        _ptr(weights, ctypes.c_double), _ptr(offsets, ctypes.c_int64), m,
        _ptr(prob, ctypes.c_double), _ptr(alias, ctypes.c_int64))
    if rc != 0:
        raise ValueError("alias table requires positive finite weights")
    return prob, alias
