"""Pallas random-row-access experiments (run on the real TPU).

The fused LINE step is random-row-access bound: XLA's gather costs
~11.5 ns/row and scatter ~13.8 ns/update + a ~1.6 ns/row full-table pass
(tools/microbench.py, PERF.md). These experiments ask whether hand-rolled
Pallas DMA pipelines can beat those floors:

  xla_gather       — baseline: jnp.take of N rows from [V, D]
  pallas_gather    — per-row async DMA HBM->VMEM, S-deep pipeline
  xla_scatter      — baseline: table.at[ids].add(g)
  pallas_rmw       — per-row DMA in + VPU add + DMA out (unique ids)
  pallas_sweep     — full-table tile sweep: auto-pipelined table tiles in
                     VMEM + manual DMA of the tile's (sorted) update slab,
                     scalar-loop scatter within VMEM

Usage: python tools/pallas_bench.py [experiment ...]
Prints one JSON line per experiment.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os
V = int(_os.environ.get("PB_V", 1_000_000))
D = int(_os.environ.get("PB_D", 128))
N = int(_os.environ.get("PB_N", 325_520))           # context-update count at the solver's effective batch
EP = 10               # calls per timed chain


def _force(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    float(np.asarray(leaf.reshape(-1)[:1])[0])


def chain_time(fn, state, args, n_warm=2, n_time=5):
    for i in range(n_warm):
        state = fn(state, jnp.int32(i), *args)
    _force(state)
    t0 = time.time()
    for i in range(n_time):
        state = fn(state, jnp.int32(i + 7), *args)
    _force(state)
    return (time.time() - t0) / n_time, state


def report(name, dt_call, n_rows=N, calls=EP):
    ms = dt_call / calls * 1e3
    print(json.dumps({"experiment": name, "ms": round(ms, 3),
                      "ns_per_row": round(ms * 1e6 / n_rows, 2)}), flush=True)


def table_like(key):
    return jax.random.normal(key, (V, D), jnp.float32)


# -- gathers ----------------------------------------------------------------

def e_xla_gather():
    table = table_like(jax.random.PRNGKey(0))

    @functools.partial(jax.jit, donate_argnums=0)
    def run(acc, salt, table):
        def body(a, i):
            key = jax.random.fold_in(jax.random.PRNGKey(3), salt * 131 + i)
            ids = jax.random.randint(key, (N,), 0, V)
            g = table[ids]
            return a + jnp.sum(g[:, 0]), 0.0
        acc, _ = jax.lax.scan(body, acc, jnp.arange(EP, dtype=jnp.int32))
        return acc

    dt, _ = chain_time(run, jnp.float32(0), (table,))
    report("xla_gather", dt)


def make_pallas_gather(chunk=512, depth=16):
    """Gather N rows from an HBM-resident table via per-row DMAs, `depth`
    outstanding."""

    def kernel(ids_ref, table_ref, out_ref, sem):
        def get(i, slot):
            return pltpu.make_async_copy(
                table_ref.at[ids_ref[i, 0]], out_ref.at[i], sem.at[slot])

        # prologue: fill the pipeline
        for s in range(depth):
            get(s, s).start()

        def body(i, _):
            get(i, i % depth).wait()

            @pl.when(i + depth < chunk)
            def _():
                get(i + depth, (i + depth) % depth).start()
            return 0

        jax.lax.fori_loop(0, chunk, body, 0)

    def gather(table, ids):
        return pl.pallas_call(
            kernel,
            grid=(N // chunk,),
            in_specs=[
                pl.BlockSpec((chunk, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((chunk, D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, D), table.dtype),
            scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
        )(ids.reshape(N, 1), table)

    return gather


def e_pallas_gather():
    table = table_like(jax.random.PRNGKey(0))
    for chunk, depth in ((512, 8), (512, 16), (1024, 32)):
        gather = make_pallas_gather(chunk, depth)

        @functools.partial(jax.jit, donate_argnums=0)
        def run(acc, salt, table):
            def body(a, i):
                key = jax.random.fold_in(jax.random.PRNGKey(3),
                                         salt * 131 + i)
                ids = jax.random.randint(key, (N,), 0, V)
                g = gather(table, ids)
                return a + jnp.sum(g[:, 0]), 0.0
            acc, _ = jax.lax.scan(body, acc, jnp.arange(EP, dtype=jnp.int32))
            return acc

        try:
            dt, _ = chain_time(run, jnp.float32(0), (table,))
            report("pallas_gather_c%d_d%d" % (chunk, depth), dt)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(json.dumps({"experiment": "pallas_gather_c%d_d%d"
                              % (chunk, depth),
                              "error": repr(e)[:200]}), flush=True)


# -- scatters ---------------------------------------------------------------

def e_xla_scatter():
    @functools.partial(jax.jit, donate_argnums=0)
    def run(table, salt):
        def body(t, i):
            key = jax.random.fold_in(jax.random.PRNGKey(3), salt * 131 + i)
            ids = jax.random.randint(key, (N,), 0, V)
            g = jnp.full((N, D), 1e-6, jnp.float32)
            return t.at[ids].add(g), 0.0
        table, _ = jax.lax.scan(body, table,
                                jnp.arange(EP, dtype=jnp.int32))
        return table

    dt, _ = chain_time(run, jnp.zeros((V, D), jnp.float32), ())
    report("xla_scatter", dt)


def make_pallas_rmw(chunk=512, depth=8):
    """Read-modify-write N unique rows: DMA row in, add update, DMA out.
    ids must be unique within the call (collisions lose updates)."""

    def kernel(ids_ref, upd_ref, table_ref, _out_ref, buf, in_sem, out_sem):
        def rd(i, slot):
            return pltpu.make_async_copy(
                table_ref.at[ids_ref[i, 0]], buf.at[slot], in_sem.at[slot])

        def wr(i, slot):
            return pltpu.make_async_copy(
                buf.at[slot], table_ref.at[ids_ref[i, 0]], out_sem.at[slot])

        for s in range(depth):
            rd(s, s).start()

        def body(i, _):
            slot = i % depth
            rd(i, slot).wait()
            # the previous write using this slot must have drained before
            # we overwrite the buffer — handled because rd(i) reuses the
            # slot only after wr(i - depth) completed (waited below)
            buf[slot] = buf[slot] + upd_ref[i]

            wr(i, slot).start()

            @pl.when(i + depth < chunk)
            def _():
                wr(i, slot).wait()          # free the slot for the next read
                rd(i + depth, slot).start()

            @pl.when(i + depth >= chunk)
            def _():
                wr(i, slot).wait()
            return 0

        jax.lax.fori_loop(0, chunk, body, 0)

    def rmw(table, ids, upd):
        return pl.pallas_call(
            kernel,
            grid=(N // chunk,),
            in_specs=[
                pl.BlockSpec((chunk, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((V, D), table.dtype),
            scratch_shapes=[
                pltpu.VMEM((depth, D), jnp.float32),
                pltpu.SemaphoreType.DMA((depth,)),
                pltpu.SemaphoreType.DMA((depth,)),
            ],
            input_output_aliases={2: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(ids.reshape(N, 1), upd, table)

    return rmw


def e_pallas_rmw():
    # unique ids: a random permutation slice (spacing V // N apart)
    for chunk, depth in ((512, 8), (1024, 16)):
        rmw = make_pallas_rmw(chunk, depth)

        @functools.partial(jax.jit, donate_argnums=0)
        def run(table, salt):
            def body(t, i):
                key = jax.random.fold_in(jax.random.PRNGKey(3),
                                         salt * 131 + i)
                # unique-by-construction: id[j] = j * 3 + small jitter,
                # mod V (stride 3 > jitter range)
                base = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)[:, 0]
                jit_ = jax.random.randint(key, (N,), 0, 3)
                ids = (base * 3 + jit_) % V
                upd = jnp.full((N, D), 1e-6, jnp.float32)
                return rmw(t, ids, upd), 0.0
            table, _ = jax.lax.scan(body, table,
                                    jnp.arange(EP, dtype=jnp.int32))
            return table

        try:
            dt, _ = chain_time(run, jnp.zeros((V, D), jnp.float32), ())
            report("pallas_rmw_c%d_d%d" % (chunk, depth), dt)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"experiment": "pallas_rmw_c%d_d%d"
                              % (chunk, depth),
                              "error": repr(e)[:200]}), flush=True)


# -- tile-sweep scatter ------------------------------------------------------

def make_pallas_sweep(tile_rows=8192, cap=8192):
    """Scatter-add sorted updates into the table by sweeping table tiles
    through VMEM. Updates pre-sorted by id; per-tile [lo, cnt) ranges are
    computed outside. The tile's update slab (cap rows) is DMA'd manually
    with a dynamic start; a scalar loop applies rows < cnt."""
    T = V // tile_rows

    def kernel(lo_ref, cnt_ref, lid_ref, upd_ref, tile_ref, out_ref,
               slab, lids, sem, sem2):
        t = pl.program_id(0)
        lo = lo_ref[t]
        cnt = cnt_ref[t]
        out_ref[:] = tile_ref[:]

        @pl.when(cnt > 0)
        def _():
            cp = pltpu.make_async_copy(
                upd_ref.at[pl.ds(lo, cap), :], slab, sem)
            cp.start()
            cp2 = pltpu.make_async_copy(
                lid_ref.at[pl.ds(lo, cap), :], lids, sem2)
            cp2.start()
            cp.wait()
            cp2.wait()

            def body(j, _):
                row = lids[j, 0]
                out_ref[pl.ds(row, 1), :] = (
                    out_ref[pl.ds(row, 1), :] + slab[pl.ds(j, 1), :])
                return 0

            jax.lax.fori_loop(0, cnt, body, 0)

    # index maps receive (grid indices..., *scalar_prefetch_refs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,            # lo, cnt
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # local ids [Npad, 1]
            pl.BlockSpec(memory_space=pl.ANY),       # sorted updates [Npad, D]
            pl.BlockSpec((tile_rows, D), lambda i, lo, cnt: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_rows, D), lambda i, lo, cnt: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((cap, D), jnp.float32),
            pltpu.VMEM((cap, 1), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    def sweep(table, sorted_ids, sorted_upd):
        npad = sorted_ids.shape[0]
        tile_of = sorted_ids // tile_rows
        lo = jnp.searchsorted(tile_of, jnp.arange(T, dtype=sorted_ids.dtype))
        hi = jnp.searchsorted(tile_of,
                              jnp.arange(1, T + 1, dtype=sorted_ids.dtype))
        cnt = (hi - lo).astype(jnp.int32)
        lid = (sorted_ids - tile_of * tile_rows).astype(jnp.int32)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((V, D), table.dtype),
            input_output_aliases={4: 0},
        )(lo.astype(jnp.int32), cnt, lid.reshape(npad, 1), sorted_upd,
          table)

    return sweep


def e_pallas_sweep():
    cap = 1 << 14          # max updates per 8192-row tile (mean ~2667)
    sweep = make_pallas_sweep(8192, cap)

    @functools.partial(jax.jit, donate_argnums=0)
    def run(table, salt):
        def body(t, i):
            key = jax.random.fold_in(jax.random.PRNGKey(3), salt * 131 + i)
            ids = jax.random.randint(key, (N,), 0, V)
            g = jnp.full((N, D), 1e-6, jnp.float32)
            order = jnp.argsort(ids)
            pad = cap  # guarantee slab DMA stays in bounds at the tail
            sid = jnp.concatenate([ids[order],
                                   jnp.full((pad,), V - 1, ids.dtype)])
            sg = jnp.concatenate([g[order], jnp.zeros((pad, D), g.dtype)])
            return sweep(t, sid, sg), 0.0
        table, _ = jax.lax.scan(body, table, jnp.arange(EP, dtype=jnp.int32))
        return table

    try:
        dt, _ = chain_time(run, jnp.zeros((V, D), jnp.float32), ())
        report("pallas_sweep_8192", dt)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"experiment": "pallas_sweep_8192",
                          "error": repr(e)[:300]}), flush=True)


EXPERIMENTS = {
    "xla_gather": e_xla_gather,
    "pallas_gather": e_pallas_gather,
    "xla_scatter": e_xla_scatter,
    "pallas_rmw": e_pallas_rmw,
    "pallas_sweep": e_pallas_sweep,
}


def e_pallas_sweep_mxu():
    """Tile-sweep scatter with MXU one-hot accumulate
    (ops/pallas_scatter.sweep_scatter_add): the structural alternative to
    per-row scatter — 2 full-table passes + N*T*D MACs, duplicate-agnostic."""
    from graphvite_tpu.ops.pallas_scatter import sweep_scatter_add

    # matmul cost ~ 2*D*(N*T + V*C) once per-tile counts fall below C:
    # small chunks should win at bench touch densities (N/V ~ 0.16)
    for tile, chunk, dtype in ((1024, 512, jnp.float32),
                               (2048, 512, jnp.float32),
                               (1024, 256, jnp.float32),
                               (1024, 128, jnp.float32),
                               (512, 128, jnp.float32),
                               (2048, 512, jnp.bfloat16),
                               (1024, 256, jnp.bfloat16),
                               (1024, 128, jnp.bfloat16),
                               (512, 128, jnp.bfloat16)):
        npad = N + (-N) % chunk

        @functools.partial(jax.jit, donate_argnums=0,
                           static_argnames=("tile", "chunk"))
        def run(table, salt, tile=tile, chunk=chunk):
            def body(t, i):
                key = jax.random.fold_in(jax.random.PRNGKey(3),
                                         salt * 131 + i)
                ids = jax.random.randint(key, (N,), 0, V)
                g = jnp.full((N, D), 1e-6, t.dtype)
                ids = jnp.sort(jnp.concatenate(
                    [ids, jnp.full(((-N) % chunk,), V - 1, ids.dtype)]))
                g = jnp.concatenate(
                    [g, jnp.zeros(((-N) % chunk, D), g.dtype)])
                return sweep_scatter_add(t, ids, g, tile_rows=tile,
                                         chunk=chunk), 0.0
            table, _ = jax.lax.scan(body, table,
                                    jnp.arange(EP, dtype=jnp.int32))
            return table

        name = "pallas_sweep_mxu_t%d_c%d_%s" % (tile, chunk, dtype.__name__)
        try:
            dt, _ = chain_time(run, jnp.zeros((V, D), dtype), ())
            report(name, dt)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"experiment": name, "error": repr(e)[:300]}),
                  flush=True)


def e_sweep_mxu_presorted():
    """Same kernel fed PRE-SORTED ids (the sorted-edge-stream case: no sort
    and no gradient permute in the measured path)."""
    from graphvite_tpu.ops.pallas_scatter import sweep_scatter_add

    for tile, chunk, dtype in ((1024, 512, jnp.float32),
                               (1024, 128, jnp.float32),
                               (2048, 512, jnp.bfloat16),
                               (1024, 128, jnp.bfloat16)):
        npad = N + (-N) % chunk

        @functools.partial(jax.jit, donate_argnums=0,
                           static_argnames=("tile", "chunk"))
        def run(table, salt, tile=tile, chunk=chunk):
            def body(t, i):
                key = jax.random.fold_in(jax.random.PRNGKey(3),
                                         salt * 131 + i)
                # sorted-by-construction (cumsum of gaps): no sort in the
                # measured path — models the sorted-edge-stream case
                gaps = jax.random.randint(key, (npad,), 0,
                                          2 * V // npad + 1)
                ids = jnp.minimum(jnp.cumsum(gaps), V - 1).astype(jnp.int32)
                g = jnp.full((npad, D), 1e-6, t.dtype)
                return sweep_scatter_add(t, ids, g, tile_rows=tile,
                                         chunk=chunk), 0.0
            table, _ = jax.lax.scan(body, table,
                                    jnp.arange(EP, dtype=jnp.int32))
            return table

        name = "sweep_mxu_presorted_t%d_c%d_%s" % (tile, chunk,
                                                   dtype.__name__)
        try:
            dt, _ = chain_time(run, jnp.zeros((V, D), dtype), ())
            report(name, dt)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"experiment": name, "error": repr(e)[:300]}),
                  flush=True)


EXPERIMENTS["pallas_sweep_mxu"] = e_pallas_sweep_mxu
EXPERIMENTS["sweep_mxu_presorted"] = e_sweep_mxu_presorted


def e_sweep_verify():
    """Compiled-mode correctness of sweep_scatter_add vs XLA scatter on the
    device (interpret-mode tests cannot catch Mosaic lowering bugs)."""
    from graphvite_tpu.ops.pallas_scatter import sweep_scatter_add

    rng = np.random.default_rng(0)
    n = (N // 512) * 512
    ids = np.sort((rng.random(n) ** 2.5 * V).astype(np.int32))
    upd = rng.normal(size=(n, D)).astype(np.float32) * 1e-3
    table = rng.normal(size=(V, D)).astype(np.float32)
    want = np.asarray(jnp.asarray(table).at[jnp.asarray(ids)].add(
        jnp.asarray(upd)))
    got = np.asarray(sweep_scatter_add(
        jnp.asarray(table), jnp.asarray(ids), jnp.asarray(upd)))
    err = np.max(np.abs(got - want))
    print(json.dumps({"experiment": "sweep_verify",
                      "max_abs_err": float(err),
                      "ok": bool(err < 1e-3)}), flush=True)


EXPERIMENTS["sweep_verify"] = e_sweep_verify


def e_sweep_unsorted():
    """Unsorted-id front-end (argsort + row permute + sweep) — models the
    CONTEXT/tail side of the pool step, where ids never arrive sorted.
    Compare against xla_scatter at the same N to decide the
    GRAPHVITE_SWEEP_CONTEXT auto-rule."""
    from graphvite_tpu.ops.pallas_scatter import sweep_scatter_add_unsorted

    for tile, tdtype, pdtype in ((1024, jnp.float32, None),
                                 (1024, jnp.bfloat16, jnp.bfloat16),
                                 (2048, jnp.bfloat16, jnp.bfloat16)):
        @functools.partial(jax.jit, donate_argnums=0,
                           static_argnames=("tile", "pdtype"))
        def run(table, salt, tile=tile, pdtype=pdtype):
            def body(t, i):
                key = jax.random.fold_in(jax.random.PRNGKey(5),
                                         salt * 131 + i)
                ids = jax.random.randint(key, (N,), 0, V)
                g = jnp.full((N, D), 1e-6, jnp.float32)
                return sweep_scatter_add_unsorted(
                    t, ids, g, tile_rows=tile, chunk=512,
                    permute_dtype=pdtype), 0.0
            table, _ = jax.lax.scan(body, table,
                                    jnp.arange(EP, dtype=jnp.int32))
            return table

        name = "sweep_unsorted_t%d_%s%s" % (
            tile, tdtype.__name__, "_bf16perm" if pdtype is not None else "")
        try:
            dt, _ = chain_time(run, jnp.zeros((V, D), tdtype), ())
            report(name, dt)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"experiment": name, "error": repr(e)[:300]}),
                  flush=True)


def e_sweep_unsorted_verify():
    """Compiled-mode correctness of the unsorted front-end on device."""
    from graphvite_tpu.ops.pallas_scatter import sweep_scatter_add_unsorted

    rng = np.random.default_rng(3)
    n = N - 137                    # non-chunk-multiple: exercises padding
    ids = (rng.random(n) ** 2.5 * V).astype(np.int32)
    upd = rng.normal(size=(n, D)).astype(np.float32) * 1e-3
    table = rng.normal(size=(V, D)).astype(np.float32)
    want = np.asarray(jnp.asarray(table).at[jnp.asarray(ids)].add(
        jnp.asarray(upd)))
    got = np.asarray(sweep_scatter_add_unsorted(
        jnp.asarray(table), jnp.asarray(ids), jnp.asarray(upd)))
    err = np.max(np.abs(got - want))
    print(json.dumps({"experiment": "sweep_unsorted_verify",
                      "max_abs_err": float(err),
                      "ok": bool(err < 1e-3)}), flush=True)


EXPERIMENTS["sweep_unsorted"] = e_sweep_unsorted
EXPERIMENTS["sweep_unsorted_verify"] = e_sweep_unsorted_verify


if __name__ == "__main__":
    names = sys.argv[1:] or list(EXPERIMENTS)
    for name in names:
        t0 = time.time()
        try:
            EXPERIMENTS[name]()
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"experiment": name, "error": repr(e)[:300]}),
                  flush=True)
        sys.stderr.write("%s done in %.0fs\n" % (name, time.time() - t0))
        sys.stderr.flush()
