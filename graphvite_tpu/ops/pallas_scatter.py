"""Pallas TPU scatter-add: full-table tile sweep with MXU one-hot accumulate.

The row-update half of the reference's fused hogwild kernels
(include/instance/gpu/graph.cuh:36-95 scatters each sample's rows in place)
maps on TPU to a scatter-add into the [V, D] embedding table. XLA lowers
scatter-add to a per-update-row loop measured at ~20 ns/row on v5e
(PERF.md access-pattern floors) — the single largest cost of the fused
LINE step. Per-row Pallas DMA pipelines are WORSE (~77-345 ns/row: DMA
issue overhead dominates 512-byte rows, tools/pallas_bench.py).

This kernel takes the third road: stream the whole table through VMEM
once (sequential HBM traffic at full bandwidth), and for each table tile
accumulate its slice of the id-sorted update list with a ONE-HOT MATMUL
on the MXU:

    tile[r] += sum_j [lid[j] == r] * upd[j]      (S @ slab, S one-hot)

Cost model per scatter of N updates into [V, D]:
    table read+write:  2 * V * D * bytes   (sequential, ~819 GB/s)
    slab stream:       N * D * bytes
    one-hot build:     V/T * ceil(N_t/C) * T * C VPU compares
    matmuls:           N * T * D MACs      (MXU)
independent of duplicate structure — duplicates sum natively in the
matmul, so no dedup / segment machinery is needed; only a SORT of the
ids (and the updates must be laid out in that order).

Intended regime: N large relative to V (touch density where the
~20 ns/row XLA scatter exceeds the 2-table-pass cost). The solver uses
it when the batch's update stream is already sorted (sorted edge
streams make head ids sorted for free).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _make_kernel(tile_rows: int, chunk: int, dim: int, out_dtype, acc_dtype):
    T, C, D = tile_rows, chunk, dim

    def kernel(lo_ref, cnt_ref, lid_ref, upd_ref, tile_ref, out_ref,
               acc, slab, lids, sem_u, sem_i):
        t = pl.program_id(0)
        lo = lo_ref[t]
        cnt = cnt_ref[t]
        acc[:] = tile_ref[:].astype(acc_dtype)

        rows = jax.lax.broadcasted_iota(jnp.int32, (T, C), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (T, C), 1)

        # chunks are C-ALIGNED in the global update stream (the TPU DMA
        # engine rejects a lane-dim-1 [C, 1] id copy — the ids therefore
        # live as [n/C, C] rows, one aligned chunk per row); boundary rows
        # belonging to neighbor tiles are masked out of the one-hot below.
        # Dynamic-start DMAs additionally need 8-ALIGNED sublane starts, so
        # the id fetch copies the aligned 8-row group containing the chunk
        # and reads the chunk's row by dynamic sublane index.
        first = lo // C

        def chunk_body(c, _):
            ch = first + c
            g = (ch // 8) * 8
            cp_u = pltpu.make_async_copy(
                upd_ref.at[pl.ds(ch * C, C), :], slab, sem_u)
            cp_i = pltpu.make_async_copy(
                lid_ref.at[pl.ds(g, 8), :], lids, sem_i)
            cp_u.start()
            cp_i.start()
            cp_i.wait()
            cp_u.wait()
            lid_row = lids[pl.ds(ch - g, 1), :]
            pos = ch * C + cols
            valid = (pos >= lo) & (pos < lo + cnt)
            one_hot = jnp.where((rows == lid_row) & valid, 1.0, 0.0)
            one_hot = one_hot.astype(slab.dtype)
            acc[:] = acc[:] + jnp.dot(one_hot, slab[:],
                                      preferred_element_type=acc_dtype)
            return 0

        @pl.when(cnt > 0)
        def _():
            jax.lax.fori_loop(0, _cdiv(lo + cnt, C) - first, chunk_body, 0)

        out_ref[:] = acc[:].astype(out_dtype)

    return kernel


def sweep_scatter_add(table, sorted_ids, sorted_upd, *, tile_rows: int = 1024,
                      chunk: int = 512, interpret: bool = None):
    """table[sorted_ids[j]] += sorted_upd[j] for all j, duplicates summed.

    table:      [V, D]
    sorted_ids: [N] int32, ascending, all in [0, V). Padding convention:
                append id = V-1 entries with ZERO update rows.
    sorted_upd: [N, D], same dtype family as the accumulation (cast to
                table dtype on the final write).

    The update list is streamed in chunks of `chunk` rows per table tile
    of `tile_rows` rows; both should be multiples of the dtype's sublane
    tile (8 for f32, 16 for bf16). N must be a multiple of `chunk` —
    callers pad (zero rows sort anywhere; id V-1 keeps them in the last
    tile).
    """
    if interpret is None:
        # Mosaic kernels only run interpreted off-TPU (CPU mesh tests)
        interpret = jax.default_backend() == "cpu"
    v, d = table.shape
    n = sorted_ids.shape[0]
    T, C = int(tile_rows), int(chunk)
    if n % C:
        raise ValueError("update count %d must be a multiple of chunk %d"
                         % (n, C))
    n_tiles = _cdiv(v, T)

    tile_of = (sorted_ids // T).astype(jnp.int32)
    r = jnp.arange(n_tiles + 1, dtype=tile_of.dtype)
    lo_hi = jnp.searchsorted(tile_of, r)  # [n_tiles+1]
    lo = lo_hi[:-1].astype(jnp.int32)
    cnt = (lo_hi[1:] - lo_hi[:-1]).astype(jnp.int32)
    lid = (sorted_ids - tile_of * T).astype(jnp.int32)
    # one C-aligned chunk per ROW (lane dim C); padded to a multiple of 8
    # rows so the kernel's aligned 8-row group DMA stays in bounds
    n_chunks = n // C
    lid2d = lid.reshape(n_chunks, C)
    pad_rows = (-n_chunks) % 8
    if pad_rows:
        lid2d = jnp.concatenate(
            [lid2d, jnp.zeros((pad_rows, C), jnp.int32)])

    acc_dtype = jnp.float32
    kernel = _make_kernel(T, C, d, table.dtype, acc_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # lo, cnt
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      #lid [N/C, C]
            pl.BlockSpec(memory_space=pl.ANY),      #upd [N, D]
            pl.BlockSpec((T, d), lambda i, lo, cnt: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, d), lambda i, lo, cnt: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((T, d), acc_dtype),
            pltpu.VMEM((C, d), sorted_upd.dtype),
            pltpu.VMEM((8, C), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v, d), table.dtype),
        input_output_aliases={4: 0},
        interpret=interpret,
    )(lo, cnt, lid2d, sorted_upd, table)


def sweep_scatter_add_unsorted(table, ids, upd, *, tile_rows: int = 1024,
                               chunk: int = 512, interpret: bool = None,
                               permute_dtype=None):
    """table[ids[j]] += upd[j] for UNSORTED ids: argsort front-end + sweep.

    For random-order update streams (the context/tail side of an edge
    batch, where heads may arrive pre-sorted but tails never do). Costs
    an argsort of N i32 ids (~0.7 ms at N=325k on v5e) plus one [N, D]
    row permute on top of the sweep itself; worth it only where the XLA
    per-row scatter (~20 ns/row) exceeds sort + permute + 2 table passes.
    Pass permute_dtype=jnp.bfloat16 to halve the permute traffic — the
    delta is then rounded to bf16 BEFORE accumulation, which matches the
    precision of a bf16 table write anyway.
    """
    v, d = table.shape
    n = ids.shape[0]
    pad = (-n) % chunk
    if pad:
        # id v-1 zero rows sort to the end of the last tile and are no-ops
        ids = jnp.concatenate(
            [ids.astype(jnp.int32), jnp.full((pad,), v - 1, jnp.int32)])
        upd = jnp.concatenate([upd, jnp.zeros((pad, d), upd.dtype)])
    order = jnp.argsort(ids)
    if permute_dtype is not None:
        upd = upd.astype(permute_dtype)
    return sweep_scatter_add(
        table, jnp.take(ids, order), jnp.take(upd, order, axis=0),
        tile_rows=tile_rows, chunk=chunk, interpret=interpret)
