"""On-device positive-sample generation (the TPU-native sampler).

The reference burns CPU threads on alias-table walks because its GPUs are
saturated by training kernels (include/core/solver.h:903-1146,
instance/graph.cuh:283-451). On TPU the roles invert: sampling is a handful
of tiny gathers, so positives are generated INSIDE the jitted train step
from device-resident alias tables — zero host->device sample traffic, no
host hot loop, and the whole episode (sample -> score -> update) is one
fused XLA program.

Statistical behavior preserved from the reference:
* positive edges ~ alias table over global edge weights
  (alias_table.cuh:148-152 decision rule);
* DeepWalk/LINE walk augmentation: per-vertex alias tables over out-edge
  weights, walks truncated at dead ends, every pair within
  `augmentation_step` hops emitted (graph.cuh:376-450);
* node2vec second-order bias via on-device rejection sampling (an exact
  alternative to the reference's per-edge alias tables, graph.cuh:298-373,
  which cost O(E * avg_degree) memory — the reason the reference OOMs on
  large graphs, doc/source/benchmark.rst:59-61).

All samplers return fixed-shape (heads, tails[, rels], mask) so the step
stays statically shaped; dead-walk slots carry mask=0.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from graphvite_tpu.ops.alias import AliasTable, PackedAliasTables


def _alias_pick(prob, alias, u1, u2):
    """Walker alias decision (alias_table.cuh:148-152) on device arrays."""
    n = prob.shape[0]
    idx = jnp.minimum((u1 * n).astype(jnp.int32), n - 1)
    return jnp.where(u2 < prob[idx], idx, alias[idx])


@dataclasses.dataclass
class DeviceEdgeSampler:
    """Positive edges ~ alias(edge_weights); device-resident arrays.

    Endpoint ids are PACKED into one [E, 2] (or [E, 3] with relations) i32
    array so each sample costs a single row gather — scalar gathers run at
    ~11.5 ns/row on v5e regardless of row width, so packing halves the
    endpoint-gather cost. The alias (prob, alias) pair is likewise packed
    into [E, 2] f32 when E < 2^24 (exact int32-in-f32 range).

    Unweighted graphs with enough edges use a STREAM instead: the edge
    array is host-shuffled once into random [STREAM_CHUNK, 2|3] blocks and
    each batch gathers B/STREAM_CHUNK random whole blocks — the reference's
    pseudo-shuffle (include/core/solver.h pool refill order) reborn as
    block-granular DMA. A block gather moves 8KB per access instead of
    8 bytes, so the per-batch edge-draw cost drops from ~2-3 ms (B random
    8-byte gathers at ~13 ns each, tools/microbench.py sample_packed) to
    noise (pool_step_stream vs pool_step: 12.0 vs 15.3 ms/batch).

    SORTED stream (opt-in via GRAPHVITE_SORTED_STREAM=1): the
    shuffled-and-padded stream is additionally stable-sorted by head id
    before chunking, so every chunk is a contiguous slice of a globally
    head-sorted array; sorting the sampled chunk ids (a ~160-element
    sort) then yields a batch whose heads are globally sorted. In raw
    microbenchmarks a pre-sorted scatter-add runs ~33% faster (PERF.md
    access-pattern floors: 19.7 -> 13.2 ns/row), but measured END TO END
    the full step got ~3% SLOWER (13.42M vs 13.83M samples/s, bf16
    B=162k): inside the fused step the vertex scatter overlaps other
    work, and the id sort + rotation eat the residue — so this stays
    opt-in, kept for future scatter lowerings. Batch-level semantics are
    unchanged either way: uniform chunks = uniform edges, the
    within-step update is order-invariant, within-head tail order stays
    random from the pre-sort shuffle.
    """

    STREAM_CHUNK = 1024
    MIN_STREAM_BLOCKS = 64   # need enough blocks for batch diversity

    edges: jax.Array         # [E, 2|3] i32, or [nblocks, C, 2|3] streamed
    alias_arrays: tuple      # () uniform | (packed,) | (prob, alias)
    num_edge: int
    uniform: bool
    with_rel: bool = False
    streamed: bool = False
    sorted_stream: bool = False

    @classmethod
    def build(cls, graph, with_relation=False, sort_stream=None):
        w = np.asarray(graph.edge_weights)
        uniform = bool(w.size == 0 or np.all(w == w[0]))
        if uniform:
            alias_arrays = ()
        else:
            t = AliasTable(w)
            from graphvite_tpu.ops.alias import device_alias_arrays
            alias_arrays = tuple(jnp.asarray(a)
                                 for a in device_alias_arrays(t))
        cols = [np.asarray(graph.edge_heads, np.int32),
                np.asarray(graph.edge_tails, np.int32)]
        if with_relation:
            cols.append(np.asarray(graph.edge_relations, np.int32))
        packed = np.stack(cols, axis=1)
        n_edge = int(packed.shape[0])
        C = cls.STREAM_CHUNK
        streamed = uniform and n_edge >= C * cls.MIN_STREAM_BLOCKS
        if sort_stream is None:
            import os
            sort_stream = os.environ.get(
                "GRAPHVITE_SORTED_STREAM", "0") != "0"
        sorted_stream = bool(streamed and sort_stream)
        if streamed:
            rng = np.random.default_rng(0x5eed ^ n_edge)
            packed = packed[rng.permutation(n_edge)]
            pad = (-n_edge) % C
            if pad:
                # pad with uniformly re-drawn edges; the ~C/E over-weight on
                # the padded edges is negligible
                packed = np.concatenate(
                    [packed, packed[rng.integers(0, n_edge, pad)]])
            if sorted_stream:
                # stable: within-head order stays randomly shuffled
                packed = packed[np.argsort(packed[:, 0], kind="stable")]
            packed = packed.reshape(-1, C, packed.shape[1])
        return cls(
            edges=jnp.asarray(packed),
            alias_arrays=alias_arrays,
            num_edge=n_edge,
            uniform=uniform,
            with_rel=with_relation,
            streamed=streamed,
            sorted_stream=sorted_stream,
        )

    def arrays(self):
        return (self.edges,) + self.alias_arrays

    def make_sample_fn(self, batch_size: int):
        with_rel = self.with_rel
        uniform = self.uniform
        streamed = self.streamed
        sorted_stream = self.sorted_stream
        n_edge = self.num_edge
        C = self.STREAM_CHUNK

        def sample(key, edges, *alias_arrays):
            if streamed:
                nb = -(-batch_size // C)
                bid = jax.random.randint(key, (nb,), 0, edges.shape[0])
                if sorted_stream:
                    # chunks are disjoint slices of a head-sorted array, so
                    # chunk-id order == globally head-sorted batch
                    bid = jnp.sort(bid)
                row = edges[bid].reshape(nb * C, -1)
                if sorted_stream and batch_size % C:
                    # truncating a sorted batch would always drop the
                    # highest head ids (the walk-sampler truncation bias of
                    # ADVICE round 1); rotate by a uniform offset so every
                    # row is dropped with equal probability. Leaves two
                    # sorted runs — scatter keeps most of the benefit.
                    shift = jax.random.randint(
                        jax.random.fold_in(key, 1), (), 0, nb * C)
                    row = jnp.roll(row, -shift, axis=0)
                row = row[:batch_size]
            elif uniform:
                eid = jax.random.randint(key, (batch_size,), 0, n_edge)
                row = edges[eid]                 # one gather of [B, 2|3]
            else:
                k1, k2 = jax.random.split(key)
                u1 = jax.random.uniform(k1, (batch_size,))
                u2 = jax.random.uniform(k2, (batch_size,))
                from graphvite_tpu.ops.alias import device_sample
                eid = device_sample(*alias_arrays, u1, u2)
                row = edges[eid]
            h = row[:, 0]
            t = row[:, 1]
            mask = jnp.ones((batch_size,), jnp.float32)
            if with_rel:
                return h, t, row[:, 2], mask
            return h, t, mask

        return sample


def _cuckoo_mix(x):
    """uint32 avalanche; MUST match native/sampler.cpp gv_mix32 bit for
    bit (the table is built host-side, probed on device)."""
    x = x ^ (x >> 16)
    x = x * np.uint32(0x7feb352d)
    x = x ^ (x >> 15)
    x = x * np.uint32(0x846ca68b)
    x = x ^ (x >> 16)
    return x


def _cuckoo_buckets(u, v, mask):
    """Bucket ids (h1, h2) for directed edge (u, v); mirrors gv_h1/gv_h2."""
    uu = u.astype(jnp.uint32)
    vv = v.astype(jnp.uint32)
    b1 = _cuckoo_mix(uu * np.uint32(0x9E3779B9) ^ _cuckoo_mix(vv)) & mask
    b2 = _cuckoo_mix(vv * np.uint32(0x85EBCA6B)
                     ^ _cuckoo_mix(uu ^ np.uint32(0x5bd1e995))) & mask
    return b1, b2


def make_walk_chain_fn(uniform, walk_length, num_walk, biased=False,
                       p=1.0, q=1.0, bs_iters=32, membership="search"):
    """Build the on-device walk generator shared by the single-chip
    DeviceWalkSampler and the multichip walk-pool path (parallel/mesh.py).

    Returned fn(key, edge_prob, edge_alias, heads, tails, vdeg, indices,
    nbr_prob, nbr_alias, [sorted_indices]) -> (chain [L+1, W], valid [L+1, W])
    where vdeg is the packed [V, 2] (CSR row start, degree) array
    where `valid[j]` means all steps up to position j were alive
    (graph.cuh:399-449 semantics: walks truncate at dead ends).

    `bs_iters` bounds the neighbor-membership binary search (node2vec
    rejection test); pass ceil(log2(max_degree)) + 1 — the blanket 32
    costs ~2x on low-degree graphs.
    """
    L, W = int(walk_length), int(num_walk)

    def step_neighbor(vdeg, indices, nbr_prob, nbr_alias, v, u1, u2):
        """First-order alias step from vertices v; returns (next, alive).

        `vdeg` packs (row start, degree) as one [V, 2] i32 array so the
        CSR lookup costs ONE row gather instead of two scalar gathers —
        random row gathers cost ~11.5 ns/row on v5e REGARDLESS of row
        width (PERF.md), and the L-step walk scan is gather-count bound."""
        row = vdeg[v]
        start = row[..., 0]
        deg = row[..., 1]
        alive = deg > 0
        safe_deg = jnp.maximum(deg, 1)
        idx = jnp.minimum((u1 * safe_deg).astype(jnp.int32), safe_deg - 1)
        flat = start + idx
        if not uniform:
            local = jnp.where(u2 < nbr_prob[flat], idx, nbr_alias[flat])
            flat = start + local
        nxt = indices[flat]
        return jnp.where(alive, nxt, v), alive

    def chain_fn(key, edge_prob, edge_alias, heads, tails, vdeg, indices,
                 nbr_prob, nbr_alias, *rest):
        kk = jax.random.split(key, 3)
        u1 = jax.random.uniform(kk[0], (W,))
        u2 = jax.random.uniform(kk[1], (W,))
        eid = _alias_pick(edge_prob, edge_alias, u1, u2)
        v0 = heads[eid]
        v1 = tails[eid]

        if not biased:
            def walk_body(carry, xs):
                v, alive = carry
                w1, w2 = xs
                nxt, step_alive = step_neighbor(
                    vdeg, indices, nbr_prob, nbr_alias, v, w1, w2)
                alive = alive & step_alive
                nxt = jnp.where(alive, nxt, v)
                return (nxt, alive), (nxt, alive)

            ks = jax.random.split(kk[2], 2)
            w1s = jax.random.uniform(ks[0], (L - 1, W))
            w2s = jax.random.uniform(ks[1], (L - 1, W))
            (_, _), (chain_rest, alive_rest) = jax.lax.scan(
                walk_body, (v1, jnp.ones_like(v1, jnp.bool_)),
                (w1s, w2s))
        else:
            (memb_array,) = rest
            max_bias = max(1.0, 1.0 / p, 1.0 / q)

            if membership == "cuckoo":
                ctable = memb_array                       # [M, 4] i32
                cmask = np.uint32(ctable.shape[0] - 1)

                def in_neighbors(x, u):
                    """Edge x -> u via the bucketized cuckoo table: TWO
                    [4]-i32 row gathers, lockstep-friendly (no per-lane
                    variable-depth search; native/sampler.cpp build)."""
                    b1, b2 = _cuckoo_buckets(x, u, cmask)
                    r1 = ctable[b1]
                    r2 = ctable[b2]
                    hit = jnp.zeros(x.shape, jnp.bool_)
                    for r in (r1, r2):
                        hit = (hit
                               | ((r[..., 0] == x) & (r[..., 1] == u))
                               | ((r[..., 2] == x) & (r[..., 3] == u)))
                    return hit
            else:
                sorted_idx = memb_array

                def in_neighbors(x, u):
                    """u in N(x) via binary search on the row-sorted CSR
                    (int32-safe; the u*V+t key trick overflows int32)."""
                    row = vdeg[x]
                    lo = row[..., 0]
                    hi0 = lo + row[..., 1]
                    hi = hi0
                    n_edge = sorted_idx.shape[0]

                    def bs_body(_, state):
                        lo, hi = state
                        mid = (lo + hi) // 2
                        v = sorted_idx[jnp.minimum(mid, n_edge - 1)]
                        go_right = (v < u) & (lo < hi)
                        new_lo = jnp.where(go_right, mid + 1, lo)
                        new_hi = jnp.where((~go_right) & (lo < hi), mid, hi)
                        return new_lo, new_hi

                    lo, hi = jax.lax.fori_loop(0, bs_iters, bs_body,
                                               (lo, hi))
                    found = sorted_idx[jnp.minimum(lo, n_edge - 1)] == u
                    return found & (lo < hi0)

            # R parallel proposals per rejection round keeps the sampler
            # exact (first-accepted-of-an-ordered-stream). The right R
            # depends on the ACCEPTANCE RATE, not a fixed best: the
            # while_loop is lockstep across W lanes, so rounds-to-all-
            # accept ~ log(W)/log(1/(1-a)^R). At p=q=0.25 acceptance ~1
            # (max_bias=4 puts return/else at 1.0) and R=1 wins (R=8
            # measured 1.43M vs 2.11M slots/s, r3). At the Youtube
            # protocol p=4 q=2, max_bias=1 and the dominant "else" class
            # accepts at 0.5 — R=1 pays ~11 lockstep rounds and node2vec
            # measured 0.11x; batching proposals trades elements for
            # rounds. Auto-rule: R = 2^ceil(log2(1/a_est)) capped at 8,
            # where a_est = (1/q)/max_bias is the dominant-class
            # acceptance (GRAPHVITE_N2V_PROPOSALS overrides).
            # LIMITATION: a_est models only the distance-2 ("else") class;
            # on clustered graphs many proposals land in N(prev) and accept
            # at 1/max_bias < a_est, or p may be the binding bias — R is
            # then underestimated and the lockstep loop pays extra rounds
            # (perf only, never correctness: the rejection test itself is
            # exact). Tune GRAPHVITE_N2V_PROPOSALS upward on such graphs.
            import os as _os
            _env_R = _os.environ.get("GRAPHVITE_N2V_PROPOSALS", "")
            if _env_R:
                R = max(int(_env_R), 1)
            else:
                # dominant-class ("else") acceptance: bias 1/q over
                # max_bias — already <= 1 since max_bias >= 1/q (no
                # extra clamp: min(1, 1/q)/max_bias would underestimate
                # acceptance for q < 1 and batch proposals where R=1
                # wins, e.g. p=q=0.25 -> true a=1.0, clamped 0.25)
                a_est = (1.0 / q) / max_bias
                if a_est >= 0.8:
                    R = 1
                elif membership == "cuckoo":
                    # cheap proposals (2-gather membership): buy the
                    # all-lanes tail down aggressively (R=8 measured
                    # 5.90M vs R=4's 5.56M vs R=2's 5.47M pairs/s at
                    # the p=4 q=2 protocol)
                    R = 8
                else:
                    R = min(8, 2 ** int(math.ceil(math.log2(1.0 / a_est))))

            def walk_body(carry, step_key):
                v, prev, alive = carry

                # exact node2vec transition by rejection sampling:
                # propose a first-order alias step, accept with
                # bias(prev, x) / max_bias where bias is 1/p for the
                # return step, 1 for common neighbors, 1/q otherwise
                # (the reweighting of graph.cuh:663-672) — statistically
                # identical to the per-edge second-order alias tables
                # without their O(E * avg_degree) memory.
                vb = jnp.broadcast_to(v, (R, W))

                def propose(state):
                    nxt, accepted, k = state
                    pk = jax.random.fold_in(step_key, k)
                    w1, w2, racc = jax.random.uniform(pk, (3, R, W))
                    cand, _ = step_neighbor(
                        vdeg, indices, nbr_prob, nbr_alias, vb, w1, w2)
                    # reference tests neighbors[x].find(u), i.e. edge
                    # x -> u with x = candidate, u = previous vertex
                    # (graph.cuh:668)
                    is_common = in_neighbors(cand, prev[None, :])
                    is_return = cand == prev[None, :]
                    bias = jnp.where(is_return, 1.0 / p,
                                     jnp.where(is_common, 1.0, 1.0 / q))
                    ok = racc < bias / max_bias                 # [R, W]
                    any_ok = jnp.any(ok, axis=0)
                    first = jnp.argmax(ok, axis=0)              # first True
                    chosen = jnp.take_along_axis(cand, first[None],
                                                 axis=0)[0]
                    nxt = jnp.where(accepted, nxt,
                                    jnp.where(any_ok, chosen, nxt))
                    accepted = accepted | any_ok
                    return nxt, accepted, k + 1

                def not_done(state):
                    _, accepted, k = state
                    return (~jnp.all(accepted)) & (k < 64 // R)

                step_alive = vdeg[v][..., 1] > 0
                init = (v, ~step_alive, jnp.int32(0))  # dead lanes skip
                nxt, _, _ = jax.lax.while_loop(not_done, propose, init)
                alive = alive & step_alive
                new_prev = jnp.where(alive, v, prev)
                nxt = jnp.where(alive, nxt, v)
                return (nxt, new_prev, alive), (nxt, alive)

            step_keys = jax.random.split(kk[2], L - 1)
            (_, _, _), (chain_rest, alive_rest) = jax.lax.scan(
                walk_body, (v1, v0, jnp.ones_like(v1, jnp.bool_)),
                step_keys)

        chain = jnp.concatenate([v0[None], v1[None], chain_rest], axis=0)
        alive = jnp.concatenate(
            [jnp.ones((2, W), jnp.bool_), alive_rest], axis=0)
        # cumulative validity: position j valid iff all steps up to j alive
        valid = jnp.cumprod(alive.astype(jnp.int32), axis=0) > 0
        return chain, valid

    return chain_fn


def walk_offsets(aug, bidir=False):
    """Augmentation tail offsets shared by the position-major and banded
    emitters AND their consuming steps (order is part of the contract:
    pmask[..., t] refers to offsets[t])."""
    offs = list(range(1, aug + 1))
    if bidir:
        offs += [-k for k in range(1, aug + 1)]
    return offs


def emit_walk_banded(chain, valid, aug, bidir=False):
    """Banded emission: whole walks, one pair-validity mask per (position,
    offset). Returns (chainT [W, L+1] i32, pmask [W, L+1, T] f32) covering
    the exact pair set of emit_walk_positions (same offset order):
    pmask[w, i, t] flags pair (chain[i], chain[i + offsets[t]]).

    The banded pool step consumes walks whole: each chain vertex is
    gathered and updated ONCE for all pairs it participates in — as head
    of T pairs AND tail of up to T pairs — via static shifts along the
    walk axis, so per-pair row traffic drops to ~2/(T·L) rows instead of
    the pair step's 2 or the position-major step's 1 + 1/T."""
    L1, W = chain.shape
    ms = []
    for k in walk_offsets(aug, bidir):
        if k > 0:
            m = jnp.concatenate([valid[k:] & valid[: L1 - k],
                                 jnp.zeros((k, W), jnp.bool_)])
        else:
            m = jnp.concatenate([jnp.zeros((-k, W), jnp.bool_),
                                 valid[:k] & valid[-k:]])
        ms.append(m)
    pmask = jnp.stack(ms, axis=-1).transpose(1, 0, 2)        # [W, L1, T]
    return chain.T, pmask.astype(jnp.float32)


def emit_walk_positions(chain, valid, aug, bidir=False):
    """Position-major emission: one SAMPLE per walk position, carrying all
    its augmentation tails. Returns (heads [P], tails [P, T], tmask [P, T])
    with P = W * (L+1) and T = aug (or 2*aug with `bidir`).

    This is the exact regrouping of emit_walk_pairs' (v_j, v_{j+k}) pairs
    by their head position: the multi-tail pool step scores/updates each
    head row ONCE for all its tails, dividing head row traffic and
    negative scoring by T (walk heads are unsorted, so unlike LINE's
    sorted stream they cannot ride the sweep kernels — shrinking the row
    count is the lever that remains). With `bidir`, reversed pairs
    (v_{j+k}, v_j) are also emitted as tails at negative offsets: on an
    undirected graph the reversed trajectory of an edge-stationary walk
    has the same law (alias-sampled start edges ARE stationary), so this
    doubles pairs per walk at zero extra walk cost."""
    L = chain.shape[0] - 1
    W = chain.shape[1]
    offsets = walk_offsets(aug, bidir)  # order shared with the consumers
    ts, ms = [], []
    for k in offsets:
        if k > 0:
            t = jnp.concatenate([chain[k:], jnp.zeros((k, W), chain.dtype)])
            m = jnp.concatenate([valid[k:] & valid[: L + 1 - k],
                                 jnp.zeros((k, W), jnp.bool_)])
        else:
            t = jnp.concatenate([jnp.zeros((-k, W), chain.dtype),
                                 chain[:k]])
            m = jnp.concatenate([jnp.zeros((-k, W), jnp.bool_),
                                 valid[:k] & valid[-k:]])
        ts.append(t)
        ms.append(m)
    heads = chain.T.reshape(-1)                              # [W*(L+1)]
    tails = jnp.stack(ts, axis=-1).transpose(1, 0, 2).reshape(
        W * (L + 1), -1)
    tmask = jnp.stack(ms, axis=-1).transpose(1, 0, 2).reshape(
        W * (L + 1), -1)
    return heads, tails, tmask


def emit_walk_pairs(chain, valid, aug):
    """Emit all (v_j, v_{j+k}) pairs for k = 1..aug, interleaved walk-major
    ([W, pairs_per_walk] flattened) so truncation drops whole trailing walks
    instead of deterministically undersampling the largest-hop class.
    Returns (heads, tails, mask) each [W * pairs_per_walk]."""
    L = chain.shape[0] - 1
    hs, ts, ms = [], [], []
    for k in range(1, aug + 1):
        hs.append(chain[: L + 1 - k].T)              # [W, L+1-k]
        ts.append(chain[k:].T)
        ms.append((valid[: L + 1 - k] & valid[k:]).T)
    h = jnp.concatenate(hs, axis=1).reshape(-1)
    t = jnp.concatenate(ts, axis=1).reshape(-1)
    m = jnp.concatenate(ms, axis=1).reshape(-1)
    return h, t, m


@dataclasses.dataclass
class DeviceWalkSampler:
    """Random-walk augmented pairs, generated on device.

    One batch: W walks of length L from alias-sampled start edges; emit all
    pairs (v_j, v_{j+k}) for k = 1..aug with validity masks. W is chosen so
    the emitted slot count >= batch_size; slots are truncated to exactly
    batch_size (masked slots participate with weight 0, preserving the
    effective batch statistics of graph.cuh:399-449).
    """

    edge_prob: jax.Array     # [E] f32   (walk start edges)
    edge_alias: jax.Array    # [E] i32
    heads: jax.Array         # [E] i32
    tails: jax.Array         # [E] i32
    vdeg: jax.Array          # [V, 2] i32: packed (CSR row start, degree)
    indices: jax.Array       # [Ed] i32
    nbr_prob: jax.Array      # [Ed] f32  per-vertex packed alias (or empty)
    nbr_alias: jax.Array     # [Ed] i32
    uniform: bool
    walk_length: int
    augmentation_step: int
    batch_size: int
    num_walk: int
    # node2vec rejection-sampling state (None => first-order walks)
    p: float = 1.0
    q: float = 1.0
    biased: bool = False
    bs_iters: int = 32
    sorted_indices: Optional[jax.Array] = None  # [Ed] i32: CSR indices, each
    #                                             vertex's row sorted (for
    #                                             int32-safe membership search)
    #                                             OR a [M, 4] cuckoo table
    membership: str = "search"  # "search" | "cuckoo" (node2vec rejection)
    # position-major mode (emit_walk_positions): one sample per walk
    # position carrying num_tail tails; W sized so (L+1) positions per
    # walk cover batch_size // num_tail samples
    position_major: bool = False
    bidir: bool = False
    num_tail: int = 0
    # banded mode (emit_walk_banded): whole walks as samples; each chain
    # vertex gathered/updated once for all its head- and tail-role pairs
    banded: bool = False

    @classmethod
    def build(cls, graph, augmentation_step, walk_length, batch_size,
              biased=False, p=1.0, q=1.0, position_major=False,
              bidir=False, banded=False):
        t = AliasTable(graph.edge_weights)
        w = np.asarray(graph.csr_weights, np.float64)
        uniform = bool(w.size == 0 or np.all(w == w[0]))
        if uniform:
            nbr_prob = np.zeros(0, np.float32)
            nbr_alias = np.zeros(0, np.int32)
        else:
            packed = PackedAliasTables(w, graph.indptr)
            nbr_prob = packed.prob.astype(np.float32)
            nbr_alias = packed.alias.astype(np.int32)
        L, aug = int(walk_length), int(augmentation_step)
        kw = {}
        if banded:
            T = aug * (2 if bidir else 1)
            slot_unit = T * (L + 1)
            if batch_size % slot_unit:
                raise ValueError(
                    "batch_size %d must be a multiple of the per-walk slot "
                    "count %d (= tails %d x positions %d)"
                    % (batch_size, slot_unit, T, L + 1))
            num_walk = max(batch_size // slot_unit, 1)
            kw.update(banded=True, bidir=bool(bidir), num_tail=T)
        elif position_major:
            T = aug * (2 if bidir else 1)
            if batch_size % T:
                raise ValueError("batch_size %d must be a multiple of the "
                                 "tail count %d" % (batch_size, T))
            num_walk = max(int(math.ceil(batch_size // T / (L + 1))), 1)
            kw.update(position_major=True, bidir=bool(bidir), num_tail=T)
        else:
            pairs_per_walk = sum(L + 1 - k for k in range(1, aug + 1))
            num_walk = max(int(math.ceil(batch_size / pairs_per_walk)), 1)
        if biased:
            deg = np.diff(graph.indptr)
            max_deg = int(deg.max()) if deg.size else 1
            kw.update(biased=True, p=float(p), q=float(q),
                      bs_iters=max(int(math.ceil(math.log2(max_deg + 1)))
                                   + 1, 1))
            # membership structure for the rejection test "edge cand->prev
            # exists": prefer the bucketized cuckoo table (2 row gathers
            # per test, lockstep-exact) over the binary search
            # (ceil(log2(max_deg)) sequential gathers); falls back when
            # the native builder is unavailable or the table would
            # exceed the byte cap (huge graphs)
            import os as _os
            ctable = None
            if _os.environ.get("GRAPHVITE_N2V_CUCKOO", "1") != "0":
                ctable = cls._build_cuckoo(graph)
            if ctable is not None:
                kw.update(membership="cuckoo",
                          sorted_indices=jnp.asarray(ctable))
            else:
                # row-sorted CSR indices: lexsort by (source, neighbor)
                # keeps rows contiguous, neighbors ascending within a row
                order = np.lexsort(
                    (graph.indices,
                     np.repeat(np.arange(graph.indptr.size - 1), deg)))
                kw.update(sorted_indices=jnp.asarray(graph.indices[order],
                                                     jnp.int32))
        return cls(
            edge_prob=jnp.asarray(t.prob, jnp.float32),
            edge_alias=jnp.asarray(t.alias, jnp.int32),
            heads=jnp.asarray(graph.edge_heads, jnp.int32),
            tails=jnp.asarray(graph.edge_tails, jnp.int32),
            vdeg=jnp.asarray(np.stack(
                [graph.indptr[:-1], np.diff(graph.indptr)],
                axis=1), jnp.int32),
            indices=jnp.asarray(graph.indices, jnp.int32),
            nbr_prob=jnp.asarray(nbr_prob),
            nbr_alias=jnp.asarray(nbr_alias),
            uniform=uniform,
            walk_length=L, augmentation_step=aug,
            batch_size=int(batch_size), num_walk=num_walk, **kw)

    @staticmethod
    def _build_cuckoo(graph, max_bytes=None):
        """Host-build the [M, 4] cuckoo table over directed CSR edges
        (native/sampler.cpp); None when unavailable or over budget."""
        import os as _os
        from graphvite_tpu import native as _native
        if _native.lib is None:
            return None
        if max_bytes is None:
            max_bytes = float(_os.environ.get("GRAPHVITE_CUCKOO_MAX_BYTES",
                                              2e9))
        ed = int(graph.indices.size)
        if ed == 0:
            return None
        m = 1 << max(int(math.ceil(math.log2(max(ed / 1.2, 2)))), 1)
        us = np.repeat(np.arange(graph.indptr.size - 1),
                       np.diff(graph.indptr)).astype(np.int32)
        vs = np.ascontiguousarray(graph.indices, np.int32)
        for _ in range(3):
            if 16 * m > max_bytes:
                return None
            table = _native.build_cuckoo(us, vs, m)
            if table is not None:
                return table
            m *= 2
        return None

    def arrays(self):
        out = [self.edge_prob, self.edge_alias, self.heads, self.tails,
               self.vdeg, self.indices, self.nbr_prob, self.nbr_alias]
        if self.biased:
            out.append(self.sorted_indices)
        return tuple(out)

    def make_sample_fn(self, batch_size: int):
        assert batch_size == self.batch_size
        aug = self.augmentation_step
        chain_fn = make_walk_chain_fn(self.uniform, self.walk_length,
                                      self.num_walk, biased=self.biased,
                                      p=self.p, q=self.q,
                                      bs_iters=self.bs_iters,
                                      membership=self.membership)
        if self.banded:
            bidir = self.bidir

            def sample(key, *arrays):
                chain, valid = chain_fn(key, *arrays)
                ct, pm = emit_walk_banded(chain, valid, aug, bidir=bidir)
                # (chain, chain, pair-mask): the banded step reads ids once
                # for both roles; mean(pm) IS the valid-pair fraction
                return (ct, ct, pm)

            return sample
        if self.position_major:
            T = self.num_tail
            bp = batch_size // T
            bidir = self.bidir

            def sample(key, *arrays):
                chain, valid = chain_fn(key, *arrays)
                h, t, m = emit_walk_positions(chain, valid, aug,
                                              bidir=bidir)
                return (h[:bp], t[:bp], m[:bp].astype(jnp.float32))

            return sample

        def sample(key, *arrays):
            chain, valid = chain_fn(key, *arrays)
            h, t, m = emit_walk_pairs(chain, valid, aug)
            return (h[:batch_size], t[:batch_size],
                    m[:batch_size].astype(jnp.float32))

        return sample

    def make_episode_sample_fn(self, batch_size: int, n_batches: int):
        """All `n_batches` batches' walks in ONE chain call (W * n lanes).

        The L-step walk scan is FIXED-OVERHEAD bound at per-batch lane
        counts (a 39-iteration lax.scan of ~2k-lane gathers spends ~10x
        more on per-iteration overhead than on gather elements — device
        trace, PERF.md round 4), so generating the whole episode's walks
        in one wide call amortizes the scan overhead n_batches-fold.
        Returns fn(key, *arrays) -> (heads, tails, mask) each
        [n_batches, batch_size]; batch g gets walks g*W..(g+1)*W-1,
        matching the per-batch sampler's semantics."""
        assert batch_size == self.batch_size
        if self.position_major:
            raise NotImplementedError(
                "episode-bulk generation supports pair-major and banded "
                "layouts; the position-major (multitail) sampler has no "
                "bulk emitter")
        aug = self.augmentation_step
        W, n = self.num_walk, int(n_batches)
        chain_fn = make_walk_chain_fn(self.uniform, self.walk_length,
                                      W * n, biased=self.biased,
                                      p=self.p, q=self.q,
                                      bs_iters=self.bs_iters,
                                      membership=self.membership)
        if self.banded:
            bidir = self.bidir

            def sample(key, *arrays):
                chain, valid = chain_fn(key, *arrays)   # [L+1, W*n]
                ct, pm = emit_walk_banded(chain, valid, aug, bidir=bidir)
                L1 = ct.shape[1]
                # walk-major: batch g gets walks g*W..(g+1)*W-1
                return (ct.reshape(n, W, L1), ct.reshape(n, W, L1),
                        pm.reshape(n, W, L1, -1))

            return sample

        def sample(key, *arrays):
            chain, valid = chain_fn(key, *arrays)   # [L+1, W*n]
            h, t, m = emit_walk_pairs(chain, valid, aug)
            # emit_walk_pairs is walk-major, so reshaping to [n, W*ppw]
            # gives each batch its own W consecutive walks
            h = h.reshape(n, -1)[:, :batch_size]
            t = t.reshape(n, -1)[:, :batch_size]
            m = m.reshape(n, -1)[:, :batch_size].astype(jnp.float32)
            return h, t, m

        return sample
