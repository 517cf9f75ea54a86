"""Single-chip LINE step microbenchmarks (run on the real TPU).

Decomposes the fused train step's cost (sampling scalar gathers, row
gathers, compute, scatter updates) and measures optimization variants:
packed sampler arrays, self-sorted scatter, scatter-inversion (turn the
update into a gather), bf16 tables.

Usage: python tools/microbench.py [variant ...]
Prints one JSON line per variant: {"variant", "ms_per_batch", "samples_per_s"}.

Timing through the axon tunnel: jax.block_until_ready is unreliable, so
every timed call chain ends in a 1-element slice readback that depends on
the final table state (PERF.md infrastructure notes).
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax
import jax.numpy as jnp

from graphvite_tpu.models import GRAPH_MODELS
from graphvite_tpu.optim import Optimizer
from graphvite_tpu.ops.alias import AliasTable, device_alias_arrays
from graphvite_tpu.ops import steps as _steps
from graphvite_tpu.ops.device_sampler import DeviceEdgeSampler

V = 1_000_000
D = 128
K = 1
B = 162_760          # the solver's effective batch at these shapes
EP = 20              # batches per device call
NEG_W = 5.0
LINE = GRAPH_MODELS["LINE"]
OPT = Optimizer(type="SGD", lr=0.025, weight_decay=5e-3)


def synthetic_edges(num_edge=5_000_000, seed=0):
    rng = np.random.default_rng(seed)
    u = (rng.random(num_edge) ** 2.5 * V).astype(np.int64)
    v = (rng.random(num_edge) ** 2.5 * V).astype(np.int64)
    keep = u != v
    u, v = u[keep], v[keep]
    heads = np.concatenate([u, v]).astype(np.int32)
    tails = np.concatenate([v, u]).astype(np.int32)
    return heads, tails


_EDGES = None


def edges():
    global _EDGES
    if _EDGES is None:
        h, t = synthetic_edges()
        deg = np.bincount(h, minlength=V).astype(np.float64)
        w = np.maximum(deg, 1e-12) ** 0.75
        neg = AliasTable(w)
        arrs = device_alias_arrays(neg)
        if len(arrs) == 1:  # packed [n, 2] form (alias.py:146-151)
            packed = np.asarray(arrs[0])
            nprob, nalias = packed[:, 0], packed[:, 1].astype(np.int32)
        else:
            nprob, nalias = arrs
        _EDGES = (jnp.asarray(h), jnp.asarray(t),
                  jnp.asarray(nprob), jnp.asarray(nalias))
    return _EDGES


def make_state(key):
    vertex = jax.random.uniform(key, (V, D), minval=-1.0 / D, maxval=1.0 / D,
                                dtype=jnp.float32)
    return {"tables": (vertex, jnp.zeros((V, D), jnp.float32)),
            "moments": ((), ())}


def _force(state):
    """Force completion with a 1-element readback (a full-table np.asarray
    would drag 512MB through the ~25MB/s tunnel and dominate the timing)."""
    leaf = jax.tree_util.tree_leaves(state)[0]
    probe = leaf.reshape(-1)[:1]
    float(np.asarray(probe)[0])


def chain_time(fn, state, args, n_warm=2, n_time=5):
    """fn(state, i, *args) -> state_like; chained with donation."""
    for i in range(n_warm):
        state = fn(state, jnp.int32(i), *args)
    _force(state)
    t0 = time.time()
    for i in range(n_time):
        state = fn(state, jnp.int32(i), *args)
    _force(state)
    dt = (time.time() - t0) / n_time
    return dt, state


def report(name, dt_call, batches_per_call=EP, samples=B):
    ms = dt_call / batches_per_call * 1e3
    print(json.dumps({"variant": name, "ms_per_batch": round(ms, 3),
                      "samples_per_s": round(samples / (ms / 1e3))}),
          flush=True)


# -- component pieces --------------------------------------------------------

def sample_uniform(key, heads, tails):
    eid = jax.random.randint(key, (B,), 0, heads.shape[0])
    return heads[eid], tails[eid]


def sample_negs(key, nprob, nalias):
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, (B, K))
    u2 = jax.random.uniform(k2, (B, K))
    n = nprob.shape[0]
    idx = jnp.minimum((u1 * n).astype(jnp.int32), n - 1)
    return jnp.where(u2 < nprob[idx], idx, nalias[idx])


# -- variants ---------------------------------------------------------------

def v_roofline():
    a = jax.random.normal(jax.random.PRNGKey(0), (8192, 8192), jnp.bfloat16)

    @jax.jit
    def mm(x):
        for _ in range(8):
            x = jnp.dot(x, x, preferred_element_type=jnp.bfloat16)
        return x

    o = mm(a); float(np.asarray(o[0, 0], np.float32))
    t0 = time.time(); o = mm(a); float(np.asarray(o[0, 0], np.float32))
    dt = (time.time() - t0) / 8
    print(json.dumps({"variant": "roofline_mm8192_bf16",
                      "tflops": round(2 * 8192**3 / dt / 1e12, 1)}), flush=True)

    big = jnp.zeros((V, D), jnp.float32)

    @functools.partial(jax.jit, donate_argnums=0)
    def addc(x, i):
        for _ in range(8):
            x = x + 1.0
        return x

    big = addc(big, jnp.int32(0)); float(np.asarray(big[0, 0]))
    t0 = time.time(); big = addc(big, jnp.int32(1)); float(np.asarray(big[0, 0]))
    dt = (time.time() - t0) / 8
    print(json.dumps({"variant": "roofline_add512MB",
                      "GBps_rw": round(2 * V * D * 4 / dt / 1e9, 1)}), flush=True)


def _scan_runner(body, n=EP):
    @functools.partial(jax.jit, donate_argnums=0)
    def run(state, salt, *args):
        def f(st, i):
            key = jax.random.fold_in(jax.random.fold_in(
                jax.random.PRNGKey(7), salt), i)
            return body(st, key, *args)
        state, _ = jax.lax.scan(f, state, jnp.arange(n, dtype=jnp.int32))
        return state
    return run


def v_baseline():
    h, t, nprob, nalias = edges()
    step = _steps.make_graph_train_step(LINE, OPT, K, NEG_W)

    def body(st, key, h, t, nprob, nalias):
        ks, kt = jax.random.split(key)
        heads, tails = sample_uniform(ks, h, t)
        st, loss = step(st, heads, tails, kt, jnp.float32(0.02), nprob, nalias)
        return st, loss

    run = _scan_runner(body)
    dt, _ = chain_time(run, make_state(jax.random.PRNGKey(0)),
                       (h, t, nprob, nalias))
    report("baseline_full_step", dt)


def v_sample_only():
    h, t, nprob, nalias = edges()

    def body(st, key, h, t, nprob, nalias):
        ks, kt = jax.random.split(key)
        heads, tails = sample_uniform(ks, h, t)
        negs = sample_negs(kt, nprob, nalias)
        acc = (jnp.sum(heads) + jnp.sum(tails)
               + jnp.sum(negs)).astype(jnp.float32)
        return {"acc": st["acc"] + acc}, 0.0

    run = _scan_runner(body)
    dt, _ = chain_time(run, {"acc": jnp.float32(0)}, (h, t, nprob, nalias))
    report("sample_only", dt)


def v_sample_packed():
    """Pack (head, tail) into one [E, 2] row and (prob, alias) into one
    [V, 2] f32 row (alias exact in f32 below 2^24) - halves the number of
    1-element gathers."""
    h, t, nprob, nalias = edges()
    ht = jnp.stack([h, t], axis=1)                     # [E, 2] i32
    pa = jnp.stack([nprob, nalias.astype(jnp.float32)], axis=1)  # [V, 2]

    def body(st, key, ht, pa):
        ks, kt = jax.random.split(key)
        eid = jax.random.randint(ks, (B,), 0, ht.shape[0])
        pair = ht[eid]                                 # [B, 2]
        heads, tails = pair[:, 0], pair[:, 1]
        k1, k2 = jax.random.split(kt)
        u1 = jax.random.uniform(k1, (B, K))
        u2 = jax.random.uniform(k2, (B, K))
        n = pa.shape[0]
        idx = jnp.minimum((u1 * n).astype(jnp.int32), n - 1)
        par = pa[idx]                                  # [B, K, 2]
        negs = jnp.where(u2 < par[..., 0], idx, par[..., 1].astype(jnp.int32))
        acc = (jnp.sum(heads) + jnp.sum(tails)
               + jnp.sum(negs)).astype(jnp.float32)
        return {"acc": st["acc"] + acc}, 0.0

    run = _scan_runner(body)
    dt, _ = chain_time(run, {"acc": jnp.float32(0)}, (ht, pa))
    report("sample_packed", dt)


def v_gather_rows():
    """sampling + the [B, D] / [B, K+1, D] row gathers, no compute/update."""
    h, t, nprob, nalias = edges()

    def body(st, key, h, t, nprob, nalias):
        ks, kt = jax.random.split(key)
        heads, tails = sample_uniform(ks, h, t)
        negs = sample_negs(kt, nprob, nalias)
        vertex, context = st["tables"]
        v = vertex[heads]
        ctx_ids = jnp.concatenate([negs, tails[:, None]], axis=1)
        c = context[ctx_ids]
        acc = jnp.sum(v[:, 0]) + jnp.sum(c[:, :, 0])
        return {"tables": st["tables"], "acc": st["acc"] + acc}, 0.0

    run = _scan_runner(body)
    st = make_state(jax.random.PRNGKey(0))
    dt, _ = chain_time(run, {"tables": st["tables"],
                             "acc": jnp.float32(0)}, (h, t, nprob, nalias))
    report("sample_plus_row_gathers", dt)


def v_no_scatter():
    """everything except the two scatter-adds."""
    h, t, nprob, nalias = edges()

    def body(st, key, h, t, nprob, nalias):
        ks, kt = jax.random.split(key)
        heads, tails = sample_uniform(ks, h, t)
        negs = sample_negs(kt, nprob, nalias)
        vertex, context = st["tables"]
        v = vertex[heads]
        ctx_ids = jnp.concatenate([negs, tails[:, None]], axis=1)
        c = context[ctx_ids]
        logits = LINE.score(v[:, None, :], c)
        gradient, weight, sample_loss = _steps._logistic_terms(logits, K, NEG_W)
        gv, gc = LINE.backward(v[:, None, :], c, gradient)
        w = weight[..., None]
        reg_v = jnp.sum(w * gv, axis=1)
        reg_c = w * gc
        acc = jnp.sum(reg_v[:, 0]) + jnp.sum(reg_c[:, :, 0]) + jnp.mean(sample_loss)
        return {"tables": st["tables"], "acc": st["acc"] + acc}, 0.0

    run = _scan_runner(body)
    st = make_state(jax.random.PRNGKey(0))
    dt, _ = chain_time(run, {"tables": st["tables"],
                             "acc": jnp.float32(0)}, (h, t, nprob, nalias))
    report("no_scatter", dt)


def v_scatter_only():
    """the two scatter-adds alone (ids random, grads constant)."""
    def body(st, key, _unused):
        vertex, context = st["tables"]
        k1, k2 = jax.random.split(key)
        ids_v = jax.random.randint(k1, (B,), 0, V)
        ids_c = jax.random.randint(k2, (B * (K + 1),), 0, V)
        gv = jnp.full((B, D), 1e-6, jnp.float32)
        gc = jnp.full((B * (K + 1), D), 1e-6, jnp.float32)
        vertex = vertex.at[ids_v].add(gv)
        context = context.at[ids_c].add(gc)
        return {"tables": (vertex, context)}, 0.0

    run = _scan_runner(body)
    st = make_state(jax.random.PRNGKey(0))
    dt, _ = chain_time(run, {"tables": st["tables"]}, (jnp.int32(0),))
    report("scatter_only", dt)


def v_sort_cost():
    """argsort of the context scatter's ids alone."""
    def body(st, key, _unused):
        ids = jax.random.randint(key, (B * (K + 1),), 0, V)
        order = jnp.argsort(ids)
        return {"acc": st["acc"] + jnp.sum(order[:8])}, 0.0

    run = _scan_runner(body)
    dt, _ = chain_time(run, {"acc": jnp.int32(0)}, (jnp.int32(0),))
    report("argsort_325k", dt)


def v_scatter_sorted():
    """scatter after our own sort with indices_are_sorted=True."""
    def body(st, key, _unused):
        (context,) = st["tables"]
        ids = jax.random.randint(key, (B * (K + 1),), 0, V)
        g = jnp.full((B * (K + 1), D), 1e-6, jnp.float32)
        order = jnp.argsort(ids)
        sid = ids[order]
        sg = g[order]
        context = context.at[sid].add(sg, indices_are_sorted=True)
        return {"tables": (context,)}, 0.0

    run = _scan_runner(body)
    st = make_state(jax.random.PRNGKey(0))
    dt, _ = chain_time(run, {"tables": (st["tables"][1],)}, (jnp.int32(0),))
    report("scatter_self_sorted", dt)


def v_scatter_invert():
    """scatter-add reformulated as sort + segment-sum + searchsorted +
    full-table gather-add (no scatter op at all)."""
    def body(st, key, _unused):
        (context,) = st["tables"]
        n = B * (K + 1)
        ids = jax.random.randint(key, (n,), 0, V)
        g = jnp.full((n, D), 1e-6, jnp.float32)
        order = jnp.argsort(ids)
        sid = ids[order]
        sg = g[order]
        head = jnp.concatenate([jnp.ones((1,), jnp.bool_), sid[1:] != sid[:-1]])
        seg = jnp.cumsum(head) - 1
        gsum = jax.ops.segment_sum(sg, seg, num_segments=n)
        uids = jnp.full((n,), V, sid.dtype).at[seg].set(
            sid, indices_are_sorted=True, unique_indices=True)
        pos = jnp.searchsorted(uids, jnp.arange(V, dtype=sid.dtype))
        cpos = jnp.minimum(pos, n - 1)
        hit = (uids[cpos] == jnp.arange(V, dtype=sid.dtype))[:, None]
        context = context + jnp.where(hit, gsum[cpos], 0.0)
        return {"tables": (context,)}, 0.0

    run = _scan_runner(body)
    st = make_state(jax.random.PRNGKey(0))
    dt, _ = chain_time(run, {"tables": (st["tables"][1],)}, (jnp.int32(0),))
    report("scatter_invert", dt)


def v_baseline_bf16():
    h, t, nprob, nalias = edges()
    step = _steps.make_graph_train_step(LINE, OPT, K, NEG_W)

    def body(st, key, h, t, nprob, nalias):
        ks, kt = jax.random.split(key)
        heads, tails = sample_uniform(ks, h, t)
        st, loss = step(st, heads, tails, kt, jnp.float32(0.02), nprob, nalias)
        return st, loss

    run = _scan_runner(body)
    st = make_state(jax.random.PRNGKey(0))
    st = {"tables": tuple(x.astype(jnp.bfloat16) for x in st["tables"]),
          "moments": ((), ())}
    dt, _ = chain_time(run, st, (h, t, nprob, nalias))
    report("baseline_bf16_tables", dt)


VARIANTS = {
    "roofline": v_roofline,
    "baseline": v_baseline,
    "sample_only": v_sample_only,
    "sample_packed": v_sample_packed,
    "gather_rows": v_gather_rows,
    "no_scatter": v_no_scatter,
    "scatter_only": v_scatter_only,
    "sort_cost": v_sort_cost,
    "scatter_sorted": v_scatter_sorted,
    "scatter_invert": v_scatter_invert,
    "baseline_bf16": v_baseline_bf16,
}




# -- round 3: access-pattern characterization -------------------------------

def v_hbm_copy():
    """True HBM bandwidth: y = x * c + y (not constant-foldable)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (V, D), jnp.float32)

    @functools.partial(jax.jit, donate_argnums=0)
    def axpy(y, i, x):
        return y + x * (1.0 + 1e-6 * i)

    y = jnp.zeros((V, D), jnp.float32)
    dt, _ = chain_time(axpy, y, (x,), n_warm=2, n_time=8)
    print(json.dumps({"variant": "hbm_axpy",
                      "GBps": round(3 * V * D * 4 / dt / 1e9, 1)}), flush=True)


def _gather_bench(name, rows, width, n_idx):
    table = jax.random.normal(jax.random.PRNGKey(0), (rows, width),
                              jnp.float32)

    def body(st, key, table):
        ids = jax.random.randint(key, (n_idx,), 0, rows)
        g = table[ids]
        return {"acc": st["acc"] + jnp.sum(g[:, 0])}, 0.0

    run = _scan_runner(body)
    dt, _ = chain_time(run, {"acc": jnp.float32(0)}, (table,))
    ms = dt / EP * 1e3
    print(json.dumps({"variant": name, "ms": round(ms, 3),
                      "ns_per_row": round(ms * 1e6 / n_idx, 2),
                      "GBps": round(n_idx * width * 4 / (ms / 1e3) / 1e9, 1)}),
          flush=True)


def v_gather_shapes():
    _gather_bench("gather_512B_rows", V, 128, 325_520)
    _gather_bench("gather_1KB_rows", V // 2, 256, 325_520)
    _gather_bench("gather_128B_rows", V, 32, 325_520)
    _gather_bench("gather_512B_2x_count", V, 128, 651_040)


def _scatter_bench(name, rows, n_idx, sorted_ids=False):
    def body(st, key, _unused):
        (table,) = st["tables"]
        ids = jax.random.randint(key, (n_idx,), 0, rows)
        g = jnp.full((n_idx, D), 1e-6, jnp.float32)
        if sorted_ids:
            ids = jnp.sort(ids)
            table = table.at[ids].add(g, indices_are_sorted=True)
        else:
            table = table.at[ids].add(g)
        return {"tables": (table,)}, 0.0

    run = _scan_runner(body)
    table = jnp.zeros((rows, D), jnp.float32)
    dt, _ = chain_time(run, {"tables": (table,)}, (jnp.int32(0),))
    ms = dt / EP * 1e3
    print(json.dumps({"variant": name, "ms": round(ms, 3),
                      "ns_per_row": round(ms * 1e6 / n_idx, 2)}), flush=True)


def v_scatter_scaling():
    N = 325_520
    _scatter_bench("scatter_V1M", V, N)
    _scatter_bench("scatter_V250k", V // 4, N)
    _scatter_bench("scatter_V4M", 4 * V, N)
    _scatter_bench("scatter_V1M_presorted", V, N, sorted_ids=True)
    _scatter_bench("scatter_V1M_2x_updates", V, 2 * N)


def v_blocked_scatter():
    """Does a [P, cap, D] arena with per-batch dynamic block indexing beat a
    flat scatter at V=4M? (The ops/blocked.py keep-or-delete measurement:
    in-place DUS => scatter cost drops to the block size.)"""
    N = 325_520
    V4 = 4 * V
    for P_ in (8, 32):
        cap = V4 // P_

        def body(st, key, _unused):
            arena = st["arena"]
            kb, ki = jax.random.split(key)
            blk = jax.random.randint(kb, (), 0, P_)
            ids = jax.random.randint(ki, (N,), 0, cap)
            g = jnp.full((N, D), 1e-6, jnp.float32)
            block = jax.lax.dynamic_index_in_dim(arena, blk, 0,
                                                 keepdims=False)
            block = block.at[ids].add(g)
            arena = jax.lax.dynamic_update_index_in_dim(arena, block, blk, 0)
            return {"arena": arena}, 0.0

        run = _scan_runner(body)
        arena = jnp.zeros((P_, cap, D), jnp.float32)
        dt, _ = chain_time(run, {"arena": arena}, (jnp.int32(0),))
        ms = dt / EP * 1e3
        print(json.dumps({"variant": "blocked_scatter_V4M_P%d" % P_,
                          "ms": round(ms, 3),
                          "ns_per_row": round(ms * 1e6 / N, 2)}), flush=True)


def v_rng_cost():
    """threefry vs rbg generator cost inside the sampling path."""
    h, t, nprob, nalias = edges()
    ht = jnp.stack([h, t], axis=1)
    pa = jnp.stack([nprob, nalias.astype(jnp.float32)], axis=1)

    def body(st, key, ht, pa):
        ks, kt = jax.random.split(key)
        eid = jax.random.randint(ks, (B,), 0, ht.shape[0])
        pair = ht[eid]
        k1, k2 = jax.random.split(kt)
        u1 = jax.random.uniform(k1, (B, K))
        u2 = jax.random.uniform(k2, (B, K))
        n = pa.shape[0]
        idx = jnp.minimum((u1 * n).astype(jnp.int32), n - 1)
        par = pa[idx]
        negs = jnp.where(u2 < par[..., 0], idx, par[..., 1].astype(jnp.int32))
        acc = (jnp.sum(pair) + jnp.sum(negs)).astype(jnp.float32)
        return {"acc": st["acc"] + acc}, 0.0

    import jax as _jax
    for impl in ("threefry2x32", "rbg"):
        with _jax.default_prng_impl(impl):
            def run_body(st, key, ht, pa):
                return body(st, key, ht, pa)
            run = _scan_runner(run_body)
            dt, _ = chain_time(run, {"acc": jnp.float32(0)}, (ht, pa))
            report("sample_packed_%s" % impl, dt)


def v_pool_step():
    """Shared-negative-pool LINE step (make_graph_pool_step) at the solver's
    effective batch: negatives via MXU matmuls against per-group pools."""
    h, t, nprob, nalias = edges()
    step = _steps.make_graph_pool_step(OPT, K, NEG_W)

    def body(st, key, h, t, nprob, nalias):
        ks, kt = jax.random.split(key)
        heads, tails = sample_uniform(ks, h, t)
        st, loss = step(st, heads, tails, kt, jnp.float32(0.02), nprob,
                        nalias)
        return st, loss

    run = _scan_runner(body)
    dt, _ = chain_time(run, make_state(jax.random.PRNGKey(0)),
                       (h, t, nprob, nalias))
    report("pool_step", dt)


def v_pool_step_bf16():
    h, t, nprob, nalias = edges()
    step = _steps.make_graph_pool_step(OPT, K, NEG_W)

    def body(st, key, h, t, nprob, nalias):
        ks, kt = jax.random.split(key)
        heads, tails = sample_uniform(ks, h, t)
        st, loss = step(st, heads, tails, kt, jnp.float32(0.02), nprob,
                        nalias)
        return st, loss

    run = _scan_runner(body)
    st = make_state(jax.random.PRNGKey(0))
    st = {"tables": tuple(x.astype(jnp.bfloat16) for x in st["tables"]),
          "moments": ((), ())}
    dt, _ = chain_time(run, st, (h, t, nprob, nalias))
    report("pool_step_bf16", dt)


def v_scatter_sorted_unique():
    """scatter-add with pre-sorted UNIQUE ids (the post-dedup_rows shape):
    both indices_are_sorted and unique_indices set."""
    def body(st, key, _unused):
        (context,) = st["tables"]
        n = B * (K + 1)
        # unique sorted by construction: stride-3 ids with jitter, sorted
        base = jnp.arange(n, dtype=jnp.int32) * 3
        jit_ = jax.random.randint(key, (n,), 0, 3)
        sid = jnp.minimum(base + jit_, V - 1)
        g = jnp.full((n, D), 1e-6, jnp.float32)
        context = context.at[sid].add(g, indices_are_sorted=True,
                                      unique_indices=True)
        return {"tables": (context,)}, 0.0

    run = _scan_runner(body)
    st = make_state(jax.random.PRNGKey(0))
    dt, _ = chain_time(run, {"tables": (st["tables"][1],)}, (jnp.int32(0),))
    report("scatter_sorted_unique", dt)


def v_pool_step_stream():
    """Pool step with STREAMED positives: a pre-shuffled edge array read as
    a contiguous dynamic slice per batch (the reference's pseudo-shuffle,
    graph.cuh:376-450) instead of B random 8-byte gathers."""
    h, t, nprob, nalias = edges()
    ht = jnp.stack([h, t], axis=1)                 # [E, 2] pre-shuffled
    n_slices = int(ht.shape[0]) // B
    step = _steps.make_graph_pool_step(OPT, K, NEG_W)

    def body(st, key, ht, nprob, nalias):
        ks, kt = jax.random.split(key)
        off = jax.random.randint(ks, (), 0, n_slices) * B
        pair = jax.lax.dynamic_slice_in_dim(ht, off, B, axis=0)
        st, loss = step(st, pair[:, 0], pair[:, 1], kt, jnp.float32(0.02),
                        nprob, nalias)
        return st, loss

    run = _scan_runner(body)
    dt, _ = chain_time(run, make_state(jax.random.PRNGKey(0)),
                       (ht, nprob, nalias))
    report("pool_step_stream", dt)


def v_pool_step_stream_bf16():
    h, t, nprob, nalias = edges()
    ht = jnp.stack([h, t], axis=1)
    n_slices = int(ht.shape[0]) // B
    step = _steps.make_graph_pool_step(OPT, K, NEG_W)

    def body(st, key, ht, nprob, nalias):
        ks, kt = jax.random.split(key)
        off = jax.random.randint(ks, (), 0, n_slices) * B
        pair = jax.lax.dynamic_slice_in_dim(ht, off, B, axis=0)
        st, loss = step(st, pair[:, 0], pair[:, 1], kt, jnp.float32(0.02),
                        nprob, nalias)
        return st, loss

    run = _scan_runner(body)
    st = make_state(jax.random.PRNGKey(0))
    st = {"tables": tuple(x.astype(jnp.bfloat16) for x in st["tables"]),
          "moments": ((), ())}
    dt, _ = chain_time(run, st, (ht, nprob, nalias))
    report("pool_step_stream_bf16", dt)


def v_pool_step_stream_sorted():
    """Streamed positives + batch sorted by head id: sorted vertex
    gather/scatter (scatter_V1M_presorted showed 19.7 -> 13.2 ns/row)."""
    h, t, nprob, nalias = edges()
    ht = jnp.stack([h, t], axis=1)
    n_slices = int(ht.shape[0]) // B
    step = _steps.make_graph_pool_step(OPT, K, NEG_W)

    def body(st, key, ht, nprob, nalias):
        ks, kt = jax.random.split(key)
        off = jax.random.randint(ks, (), 0, n_slices) * B
        pair = jax.lax.dynamic_slice_in_dim(ht, off, B, axis=0)
        order = jnp.argsort(pair[:, 0])
        pair = pair[order]
        st, loss = step(st, pair[:, 0], pair[:, 1], kt, jnp.float32(0.02),
                        nprob, nalias)
        return st, loss

    run = _scan_runner(body)
    dt, _ = chain_time(run, make_state(jax.random.PRNGKey(0)),
                       (ht, nprob, nalias))
    report("pool_step_stream_sorted", dt)


def v_pool_step_solver_sweep():
    """SOLVER-MATCHED pool step (graph_pool_groups(B) groups, not the
    default 8) over a batch-size sweep: the scatter's table-scan component
    (cost ~ V*D per scatter regardless of row count) amortizes with B, so
    bigger batches may beat the 2 GB-derived default. bf16 tables too."""
    h, t, nprob, nalias = edges()
    ht = jnp.stack([h, t], axis=1)
    for mult in (1, 2, 3, 4):
        Bx = 162_560 * mult
        n_slices = int(ht.shape[0]) // Bx
        if n_slices < 1:
            break
        G = _steps.graph_pool_groups(Bx)
        step = _steps.make_graph_pool_step(OPT, K, NEG_W, pool_groups=G)

        def body(st, key, ht, nprob, nalias, Bx=Bx, n_slices=n_slices,
                 step=step):
            ks, kt = jax.random.split(key)
            off = jax.random.randint(ks, (), 0, n_slices) * Bx
            pair = jax.lax.dynamic_slice_in_dim(ht, off, Bx, axis=0)
            st, loss = step(st, pair[:, 0], pair[:, 1], kt,
                            jnp.float32(0.02), nprob, nalias)
            return st, loss

        ep = max(EP // mult, 4)
        run = _scan_runner(body, n=ep)
        for tag, cast in (("f32", None), ("bf16", jnp.bfloat16)):
            st = make_state(jax.random.PRNGKey(0))
            if cast is not None:
                st = {"tables": tuple(x.astype(cast)
                                      for x in st["tables"]),
                      "moments": ((), ())}
            dt, _ = chain_time(run, st, (ht, nprob, nalias))
            report("pool_solver_%s_B%dk_G%d" % (tag, Bx // 1000, G), dt,
                   batches_per_call=ep, samples=Bx)


def v_pool_step_stacked():
    """ONE stacked [2V, D] table (vertex rows [0,V), context rows [V,2V)):
    the two table gathers fuse into one 2B-row gather and the two scatters
    into one (2B + GM)-row scatter — tests whether XLA's per-scatter fixed
    cost (sort setup + table scan scheduling) is worth recovering."""
    h, t, nprob, nalias = edges()
    ht = jnp.stack([h, t], axis=1)
    n_slices = int(ht.shape[0]) // B
    G = _steps.graph_pool_groups(B)
    M = 256
    neg_w = NEG_W * K / M

    def step(table, pair, key, lr, nprob, nalias):
        heads = pair[:, 0]
        tails = pair[:, 1] + V
        bg = B // G
        k1, k2 = jax.random.split(key)
        u1 = jax.random.uniform(k1, (G, M))
        u2 = jax.random.uniform(k2, (G, M))
        n = nprob.shape[0]
        idx = jnp.minimum((u1 * n).astype(jnp.int32), n - 1)
        pool = jnp.where(u2 < nprob[idx], idx, nalias[idx]) + V

        ids_all = jnp.concatenate([heads, tails, pool.reshape(-1)])
        rows = table[ids_all].astype(jnp.float32)            # ONE gather
        v = rows[:B].reshape(G, bg, -1)
        c = rows[B:2 * B].reshape(G, bg, -1)
        P = rows[2 * B:].reshape(G, M, -1)

        pos = jnp.sum(v * c, axis=-1)
        neg = jnp.einsum("gbd,gmd->gbm", v, P,
                         preferred_element_type=jnp.float32)
        gpos = jax.nn.sigmoid(pos) - 1.0
        gneg = jax.nn.sigmoid(neg) * neg_w
        dv = (gpos[..., None] * c
              + jnp.einsum("gbm,gmd->gbd", gneg, P,
                           preferred_element_type=jnp.float32))
        dc = gpos[..., None] * v
        dP = jnp.einsum("gbm,gbd->gmd", gneg, v,
                        preferred_element_type=jnp.float32)
        grads = jnp.concatenate([dv.reshape(B, -1), dc.reshape(B, -1),
                                 dP.reshape(G * M, -1)])
        loss = jnp.mean(jax.nn.softplus(-pos))
        # ONE scatter
        return table.at[ids_all].add(
            (-0.02 * grads).astype(table.dtype), mode="drop"), loss

    def body(st, key, ht, nprob, nalias):
        ks, kt = jax.random.split(key)
        off = jax.random.randint(ks, (), 0, n_slices) * B
        pair = jax.lax.dynamic_slice_in_dim(ht, off, B, axis=0)
        return step(st, pair, kt, 0.02, nprob, nalias)

    run = _scan_runner(body)
    for tag, dt_ in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        key = jax.random.PRNGKey(0)
        table = jax.random.uniform(key, (2 * V, D), minval=-1.0 / D,
                                   maxval=1.0 / D,
                                   dtype=jnp.float32).astype(dt_)
        dt, _ = chain_time(run, table, (ht, nprob, nalias))
        report("pool_step_stacked_%s" % tag, dt)


VARIANTS.update({
    "blocked_scatter": v_blocked_scatter,
    "rng_cost": v_rng_cost,
    "pool_step": v_pool_step,
    "pool_step_bf16": v_pool_step_bf16,
    "scatter_sorted_unique": v_scatter_sorted_unique,
    "pool_step_stream": v_pool_step_stream,
    "pool_step_stream_bf16": v_pool_step_stream_bf16,
    "pool_step_stream_sorted": v_pool_step_stream_sorted,
    "pool_step_solver_sweep": v_pool_step_solver_sweep,
    "pool_step_stacked": v_pool_step_stacked,
})


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        t0 = time.time()
        try:
            VARIANTS[name]()
        except Exception as e:  # keep going; compiles can be flaky
            print(json.dumps({"variant": name, "error": repr(e)[:300]}),
                  flush=True)
        sys.stderr.write("%s done in %.0fs\n" % (name, time.time() - t0))
        sys.stderr.flush()
