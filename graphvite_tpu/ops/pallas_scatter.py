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


def _prec(dtype):
    """Matmul precision for the one-hot select/accumulate: f32 operands
    need HIGHEST or the MXU's default bf16 operand rounding silently
    corrupts what must be exact row copies/sums; bf16 operands are exact
    at default (one-hot entries are 1.0)."""
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _make_kernel(tile_rows: int, chunk: int, dim: int, out_dtype, acc_dtype):
    T, C, D = tile_rows, chunk, dim

    def kernel(lo_ref, cnt_ref, lid_ref, upd_ref, tile_ref, out_ref,
               acc, slab0, slab1, lids0, lids1,
               sem_u0, sem_u1, sem_i0, sem_i1):
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
        # The slab/id fetches are DOUBLE-BUFFERED across the chunk loop so
        # chunk c+1's DMAs overlap chunk c's matmul.
        first = lo // C

        def copies(c, slab, lids, sem_u, sem_i):
            ch = first + c
            g = (ch // 8) * 8
            return (pltpu.make_async_copy(
                        upd_ref.at[pl.ds(ch * C, C), :], slab, sem_u),
                    pltpu.make_async_copy(
                        lid_ref.at[pl.ds(g, 8), :], lids, sem_i))

        def start(c, slab, lids, sem_u, sem_i):
            cp_u, cp_i = copies(c, slab, lids, sem_u, sem_i)
            cp_u.start()
            cp_i.start()

        @pl.when(cnt > 0)
        def _():
            n_here = _cdiv(lo + cnt, C) - first
            start(0, slab0, lids0, sem_u0, sem_i0)

            def chunk_body(c, _):
                ch = first + c
                g = (ch // 8) * 8

                def step_with(slab, lids, sem_u, sem_i, nslab, nlids,
                              nsem_u, nsem_i):
                    cp_u, cp_i = copies(c, slab, lids, sem_u, sem_i)
                    cp_i.wait()
                    cp_u.wait()

                    @pl.when(c + 1 < n_here)
                    def _():
                        start(c + 1, nslab, nlids, nsem_u, nsem_i)

                    lid_row = lids[pl.ds(ch - g, 1), :]
                    pos = ch * C + cols
                    valid = (pos >= lo) & (pos < lo + cnt)
                    one_hot = jnp.where((rows == lid_row) & valid, 1.0, 0.0)
                    one_hot = one_hot.astype(slab.dtype)
                    # exactness keyed to the DESTINATION dtype: a bf16
                    # table rounds the write anyway, so default (bf16
                    # operand) precision loses nothing there, while an
                    # f32 table needs HIGHEST or the MXU rounds the f32
                    # updates (measured 12% end-to-end cost of HIGHEST
                    # on the bf16 bench — only pay it where it matters)
                    acc[:] = acc[:] + jnp.dot(
                        one_hot, slab[:], preferred_element_type=acc_dtype,
                        precision=_prec(out_dtype))

                @pl.when(c % 2 == 0)
                def _():
                    step_with(slab0, lids0, sem_u0, sem_i0,
                              slab1, lids1, sem_u1, sem_i1)

                @pl.when(c % 2 == 1)
                def _():
                    step_with(slab1, lids1, sem_u1, sem_i1,
                              slab0, lids0, sem_u0, sem_i0)

                return 0

            jax.lax.fori_loop(0, n_here, chunk_body, 0)

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
        # Mosaic kernels only exist on TPU; interpret on ANY other
        # backend (CPU test meshes, GPU) so a forced enable cannot
        # crash at lowering
        interpret = jax.default_backend() != "tpu"
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
            pltpu.VMEM((C, d), sorted_upd.dtype),
            pltpu.VMEM((8, C), jnp.int32),
            pltpu.VMEM((8, C), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
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


def _make_gather_kernel(tile_rows: int, chunk: int, dim: int, v: int,
                        out_dtype):
    """Kernel for sweep_gather_sorted: grid over id CHUNKS; per chunk,
    stream the table tiles its ids span (double-buffered manual DMA,
    dynamic trip count) and assemble the C output rows with one-hot
    matmuls: out[j] = sum_t [lid_t[j] == r] * tile_t[r]."""
    T, C, D = tile_rows, chunk, dim
    last_base = v - T  # 8-aligned clamp for the ragged last tile (v % 8 == 0)

    def kernel(t0_ref, span_ref, id_ref, table_ref, out_ref,
               acc, pre0, pre1, ext0, ext1, idbuf,
               sem_p0, sem_p1, sem_e0, sem_e1, sem_i):
        i = pl.program_id(0)
        t0 = t0_ref[i]
        span = span_ref[i]
        # ids arrive as [n_chunks, C] rows in ANY memory; dynamic-start
        # DMAs need 8-aligned sublane starts, so fetch the aligned 8-row
        # group and read this chunk's row by dynamic sublane index
        g = (i // 8) * 8
        cp_i = pltpu.make_async_copy(id_ref.at[pl.ds(g, 8), :], idbuf,
                                     sem_i)
        cp_i.start()

        def base_at(tile_idx):
            # both min() operands are 8-aligned (T % 8 == 0, v % 8 == 0)
            # but Mosaic cannot prove it through the min — assert the
            # alignment for the dynamic-start DMA
            return pl.multiple_of(
                jnp.minimum(tile_idx * T, last_base), 8)

        def copy_tile(tile_idx, buf, sem):
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(base_at(tile_idx), T), :], buf, sem)

        # CROSS-GRID-STEP PIPELINE: scratch persists across grid steps, so
        # step i-1 prefetched OUR first tile into pre[i % 2]; we prefetch
        # step i+1's first tile into the other buffer before computing.
        # Spans > 1 (tile-crossing chunks, the minority) stream the extra
        # tiles through a second double-buffered pair inside the loop.
        @pl.when(i == 0)
        def _():
            copy_tile(t0, pre0, sem_p0).start()

        @pl.when(i + 1 < pl.num_programs(0))
        def _():
            nxt = t0_ref[i + 1]

            @pl.when(i % 2 == 0)
            def _():
                copy_tile(nxt, pre1, sem_p1).start()

            @pl.when(i % 2 == 1)
            def _():
                copy_tile(nxt, pre0, sem_p0).start()

        acc[:] = jnp.zeros((C, D), jnp.float32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (T, C), 0)
        cp_i.wait()
        id_row = idbuf[pl.ds(i - g, 1), :]                # [1, C]
        tile_of_row = id_row // T

        def accumulate(k, buf):
            lid_row = id_row - base_at(t0 + k)
            # match on the LOGICAL tile: the clamped last-tile fetch window
            # overlaps the previous tile's rows, so a bare range check
            # would double-count ids in the overlap
            mine = tile_of_row == (t0 + k)
            one_hot = jnp.where((rows == lid_row) & mine, 1.0, 0.0)
            # acc[C, D] += one_hot^T [C, T] @ tile [T, D] via a dim-0/dim-0
            # contraction (no explicit transpose)
            acc[:] = acc[:] + jax.lax.dot_general(
                one_hot.astype(buf.dtype), buf[:],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_prec(buf.dtype))

        @pl.when(i % 2 == 0)
        def _():
            copy_tile(t0, pre0, sem_p0).wait()
            accumulate(0, pre0)

        @pl.when(i % 2 == 1)
        def _():
            copy_tile(t0, pre1, sem_p1).wait()
            accumulate(0, pre1)

        @pl.when(span > 1)
        def _():
            copy_tile(t0 + 1, ext0, sem_e0).start()

            def body(k, _):
                def step_with(buf, sem, nbuf, nsem):
                    copy_tile(t0 + k, buf, sem).wait()

                    @pl.when(k + 1 < span)
                    def _():
                        copy_tile(t0 + k + 1, nbuf, nsem).start()

                    accumulate(k, buf)

                @pl.when(k % 2 == 1)
                def _():
                    step_with(ext0, sem_e0, ext1, sem_e1)

                @pl.when(k % 2 == 0)
                def _():
                    step_with(ext1, sem_e1, ext0, sem_e0)

                return 0

            jax.lax.fori_loop(1, span, body, 0)

        out_ref[0] = acc[:].astype(out_dtype)

    return kernel


def sweep_gather_sorted(table, sorted_ids, *, tile_rows: int = 256,
                        chunk: int = 128, interpret: bool = None,
                        out_dtype=None):
    """out[j] = table[sorted_ids[j]] for ASCENDING ids — a streaming gather.

    XLA's row gather is per-row-op bound (~11 ns/row on v5e for 256-byte
    rows); for a SORTED id stream the rows live in a narrow moving window
    of the table, so streaming whole tiles sequentially (~819 GB/s) and
    selecting rows with one-hot matmuls on the MXU is faster wherever the
    stream is dense (touched tiles ~ N * T / V rows apart). The id stream
    the solver feeds this (sorted edge-stream heads) qualifies.

    Requirements: ids ascending in [0, V), V % 8 == 0, V >= tile_rows,
    N % chunk == 0 (pad with any in-range id; slice the output).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    v, d = table.shape
    n = sorted_ids.shape[0]
    T, C = int(tile_rows), int(chunk)
    if n % C:
        raise ValueError("id count %d must be a multiple of chunk %d"
                         % (n, C))
    if v % 8 or v < T:
        raise ValueError("table rows %d must be 8-aligned and >= tile %d"
                         % (v, T))
    if d % 128 and not interpret:
        # the manual table-tile DMA slices full lanes; Mosaic rejects the
        # memref_slice for non-128-multiple widths (measured: d=128/256
        # compile, d=16/32/64 fail) — callers gate on dim; interpret mode
        # (tests, non-TPU backends) has no such constraint
        raise ValueError("sweep_gather_sorted needs dim %% 128 == 0 on "
                         "TPU, got %d" % d)
    n_chunks = n // C
    ids2d = sorted_ids.astype(jnp.int32).reshape(n_chunks, C)
    t0 = ids2d[:, 0] // T
    # the ragged last tile is fetched from the clamped base v - T, which
    # covers every id >= (v // T) * T as well
    span = (jnp.minimum(ids2d[:, -1] // T, _cdiv(v, T) - 1) - t0 + 1)
    # pad the id rows to a multiple of 8 so the kernel's aligned 8-row
    # group DMA stays in bounds
    pad_rows = (-n_chunks) % 8
    ids2d_pad = (jnp.concatenate([ids2d,
                                  jnp.zeros((pad_rows, C), jnp.int32)])
                 if pad_rows else ids2d)
    out_dtype = out_dtype or table.dtype
    kernel = _make_gather_kernel(T, C, d, v, out_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # t0, span
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # ids [N/C, C]
            pl.BlockSpec(memory_space=pl.ANY),            # table
        ],
        out_specs=pl.BlockSpec((1, C, d), lambda i, t0, span: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((C, d), jnp.float32),
            pltpu.VMEM((T, d), table.dtype),
            pltpu.VMEM((T, d), table.dtype),
            pltpu.VMEM((T, d), table.dtype),
            pltpu.VMEM((T, d), table.dtype),
            pltpu.VMEM((8, C), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_chunks, C, d), out_dtype),
        interpret=interpret,
    )(t0.astype(jnp.int32), span.astype(jnp.int32), ids2d_pad, table)
    return out.reshape(n, d)


def _make_moment_kernel(tile_rows: int, chunk: int, dim: int, out_dtype,
                        opt, lr_scale: float):
    """Kernel for sweep_scatter_update: accumulate [gsum | gsq | count] per
    tile row with one-hot matmuls, then apply ONE closed-form moment update
    per touched row (the optim.moment_delta math inlined over VMEM tiles —
    the reference's fused in-kernel Momentum/AdaGrad/RMSprop/Adam updates,
    gpu/graph.cuh:104-242, rebuilt as a table sweep)."""
    from graphvite_tpu.optim import moment_delta

    T, C, D = tile_rows, chunk, dim
    # the count column is padded to a full 128-lane block: Mosaic rejects
    # width-1 lane slices (`acc[:, 2D]`), so the slab carries
    # [gsum | gsq | count, 0...] and the kernel reduces the last block
    Wd = 2 * D + 128
    n_mom = opt.num_moment

    def kernel(*refs):
        # refs: lo, cnt, lr, lid, slab_src, tile, moms..., out, out_moms...,
        #       acc, slab0, slab1, lids0, lids1, sems x4
        lo_ref, cnt_ref, lr_ref, lid_ref, upd_ref, tile_ref = refs[:6]
        mom_refs = refs[6:6 + n_mom]
        out_ref = refs[6 + n_mom]
        out_mom_refs = refs[7 + n_mom:7 + 2 * n_mom]
        (acc, slab0, slab1, lids0, lids1,
         sem_u0, sem_u1, sem_i0, sem_i1) = refs[7 + 2 * n_mom:]
        t = pl.program_id(0)
        lo = lo_ref[t]
        cnt = cnt_ref[t]
        lr = lr_ref[0]
        acc[:] = jnp.zeros((T, Wd), jnp.float32)

        rows = jax.lax.broadcasted_iota(jnp.int32, (T, C), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (T, C), 1)
        first = lo // C

        def copies(c, slab, lids, sem_u, sem_i):
            ch = first + c
            g = (ch // 8) * 8
            return (pltpu.make_async_copy(
                        upd_ref.at[pl.ds(ch * C, C), :], slab, sem_u),
                    pltpu.make_async_copy(
                        lid_ref.at[pl.ds(g, 8), :], lids, sem_i))

        def start(c, slab, lids, sem_u, sem_i):
            cp_u, cp_i = copies(c, slab, lids, sem_u, sem_i)
            cp_u.start()
            cp_i.start()

        @pl.when(cnt > 0)
        def _():
            n_here = _cdiv(lo + cnt, C) - first
            start(0, slab0, lids0, sem_u0, sem_i0)

            def chunk_body(c, _):
                ch = first + c
                g = (ch // 8) * 8

                def step_with(slab, lids, sem_u, sem_i, nslab, nlids,
                              nsem_u, nsem_i):
                    cp_u, cp_i = copies(c, slab, lids, sem_u, sem_i)
                    cp_i.wait()
                    cp_u.wait()

                    @pl.when(c + 1 < n_here)
                    def _():
                        start(c + 1, nslab, nlids, nsem_u, nsem_i)

                    lid_row = lids[pl.ds(ch - g, 1), :]
                    pos = ch * C + cols
                    valid = (pos >= lo) & (pos < lo + cnt)
                    one_hot = jnp.where((rows == lid_row) & valid, 1.0,
                                        0.0)
                    one_hot = one_hot.astype(slab.dtype)
                    acc[:] = acc[:] + jnp.dot(
                        one_hot, slab[:],
                        preferred_element_type=jnp.float32,
                        precision=_prec(slab.dtype))

                @pl.when(c % 2 == 0)
                def _():
                    step_with(slab0, lids0, sem_u0, sem_i0,
                              slab1, lids1, sem_u1, sem_i1)

                @pl.when(c % 2 == 1)
                def _():
                    step_with(slab1, lids1, sem_u1, sem_i1,
                              slab0, lids0, sem_u0, sem_i0)

                return 0

            jax.lax.fori_loop(0, n_here, chunk_body, 0)

        gsum = acc[:, :D]
        gsq = acc[:, D:2 * D]
        counts = jnp.sum(acc[:, 2 * D:], axis=1)  # single live column
        touched = (counts > 0)[:, None]
        c = jnp.maximum(counts, 1.0)[:, None]
        moms = tuple(m[:].astype(jnp.float32) for m in mom_refs)
        delta, new_moms = moment_delta(opt, lr, gsum, moms, c, gsq)
        tile = tile_ref[:]
        out_ref[:] = jnp.where(
            touched, tile - (lr_scale * delta).astype(out_dtype), tile)
        for mr, omr, nm in zip(mom_refs, out_mom_refs, new_moms):
            omr[:] = jnp.where(touched, nm.astype(mr.dtype), mr[:])

    return kernel


def sweep_scatter_update(table, moments, sorted_ids, sorted_grads, opt, lr,
                         *, entry_counts=None, entry_sqs=None,
                         lr_scale: float = 1.0, tile_rows: int = 1024,
                         chunk: int = 512, interpret: bool = None):
    """Moment-optimizer row update as ONE table sweep: the Pallas analog of
    optim._apply_row_updates_dense for tables too big for the dense path.

    table:        [V, D]; moments: tuple of [V, D] f32 (len opt.num_moment)
    sorted_ids:   [N] int32 ascending (pad with id V-1, zero grads/sq and
                  ZERO entry_counts so pads register no touch)
    sorted_grads: [N, D] per-entry summed regularized gradients
    entry_counts: [N] per-entry touch counts (default 1 per live entry —
                  callers who pad MUST pass explicit counts with 0 pads)
    entry_sqs:    [N, D] per-entry summed squared per-touch gradients
                  (default grad**2)

    Semantics match apply_row_updates' dedup path: per unique row, gsum /
    gsq / count accumulate and one closed-form c-touch moment update is
    applied; untouched rows (count 0) pass through, moments undecayed.
    """
    if opt.num_moment == 0:
        return (sweep_scatter_add(table, sorted_ids, -(lr * lr_scale)
                                  * sorted_grads, tile_rows=tile_rows,
                                  chunk=chunk, interpret=interpret),
                moments)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    v, d = table.shape
    n = sorted_ids.shape[0]
    T, C = int(tile_rows), int(chunk)
    if n % C:
        raise ValueError("update count %d must be a multiple of chunk %d"
                         % (n, C))
    n_tiles = _cdiv(v, T)
    n_mom = opt.num_moment
    assert len(moments) == n_mom

    g32 = sorted_grads.astype(jnp.float32)
    sq = g32 * g32 if entry_sqs is None else entry_sqs.astype(jnp.float32)
    cnt = (jnp.ones((n,), jnp.float32) if entry_counts is None
           else entry_counts.astype(jnp.float32))
    slab_src = jnp.concatenate(
        [g32, sq, cnt[:, None],
         jnp.zeros((n, 127), jnp.float32)], axis=1)   # [N, 2D+128]

    tile_of = (sorted_ids // T).astype(jnp.int32)
    r = jnp.arange(n_tiles + 1, dtype=tile_of.dtype)
    lo_hi = jnp.searchsorted(tile_of, r)
    lo = lo_hi[:-1].astype(jnp.int32)
    cnt_t = (lo_hi[1:] - lo_hi[:-1]).astype(jnp.int32)
    lid = (sorted_ids - tile_of * T).astype(jnp.int32)
    n_chunks = n // C
    lid2d = lid.reshape(n_chunks, C)
    pad_rows = (-n_chunks) % 8
    if pad_rows:
        lid2d = jnp.concatenate(
            [lid2d, jnp.zeros((pad_rows, C), jnp.int32)])
    lr_arr = jnp.asarray(lr, jnp.float32).reshape(1)

    Wd = 2 * d + 128
    kernel = _make_moment_kernel(T, C, d, table.dtype, opt, float(lr_scale))

    tspec = pl.BlockSpec((T, d), lambda i, lo, cnt, lr: (i, 0),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # lo, cnt, lr
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # lid [N/C, C]
            pl.BlockSpec(memory_space=pl.ANY),      # slab [N, 2D+1]
            tspec,                                  # table tile
        ] + [tspec] * n_mom,                        # moment tiles
        out_specs=[tspec] * (1 + n_mom),
        scratch_shapes=[
            pltpu.VMEM((T, Wd), jnp.float32),
            pltpu.VMEM((C, Wd), jnp.float32),
            pltpu.VMEM((C, Wd), jnp.float32),
            pltpu.VMEM((8, C), jnp.int32),
            pltpu.VMEM((8, C), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((v, d), table.dtype)]
        + [jax.ShapeDtypeStruct((v, d), m.dtype) for m in moments],
        input_output_aliases={5: 0,
                              **{6 + i: 1 + i for i in range(n_mom)}},
        interpret=interpret,
    )(lo, cnt_t, lr_arr, lid2d, slab_src, table, *moments)
    return outs[0], tuple(outs[1:])


def sweep_scatter_update_unsorted(table, moments, ids, grads, opt, lr, *,
                                  entry_counts=None, entry_sqs=None,
                                  lr_scale: float = 1.0,
                                  tile_rows: int = 1024, chunk: int = 512,
                                  interpret: bool = None):
    """sweep_scatter_update over UNSORTED ids (argsort front-end; the
    context/tail side). Pads to a chunk multiple with id V-1 zero entries
    whose counts are 0 (no touch)."""
    v, d = table.shape
    n = ids.shape[0]
    cnt = (jnp.ones((n,), jnp.float32) if entry_counts is None
           else entry_counts.astype(jnp.float32))
    sq = (grads.astype(jnp.float32) ** 2 if entry_sqs is None
          else entry_sqs.astype(jnp.float32))
    pad = (-n) % chunk
    if pad:
        ids = jnp.concatenate(
            [ids.astype(jnp.int32), jnp.full((pad,), v - 1, jnp.int32)])
        grads = jnp.concatenate([grads, jnp.zeros((pad, d), grads.dtype)])
        sq = jnp.concatenate([sq, jnp.zeros((pad, d), sq.dtype)])
        cnt = jnp.concatenate([cnt, jnp.zeros((pad,), cnt.dtype)])
    order = jnp.argsort(ids)
    return sweep_scatter_update(
        table, moments, jnp.take(ids, order),
        jnp.take(grads, order, axis=0), opt, lr,
        entry_counts=jnp.take(cnt, order),
        entry_sqs=jnp.take(sq, order, axis=0), lr_scale=lr_scale,
        tile_rows=tile_rows, chunk=chunk, interpret=interpret)


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
