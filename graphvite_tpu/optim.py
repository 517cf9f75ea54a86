"""Row-sparse first-order optimizers.

Functional re-design of the reference Optimizer class
(include/core/optimizer.h:102-217). The reference applies updates per
(sample, row)-touch inside hogwild CUDA kernels; here a jitted batched step
computes per-touch regularized gradients

    reg = weight * (model_grad + weight_decay * param)

and applies them row-wise:

* 0-moment (SGD): scatter-add of ``-lr * reg`` — duplicate row touches within
  a batch accumulate (the "gradient accumulation" semantics the reference
  adopted in v0.2.0, CHANGELOG.md:27-28).
* 1/2-moment (Momentum/AdaGrad/RMSprop/Adam): duplicate touches are summed per
  unique row (sort + segment-sum with static shapes), then ONE moment update
  is applied per touched row — moments update only on touch, exactly like the
  reference's sparse per-row moments (solver.h moment buffers).

Update rules mirror optimizer.h:161-210 exactly, including GraphVite's
unusual Adam defaults (beta1=0.999, beta2=0.99999, no bias correction).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from graphvite_tpu.utils.common import auto

OPTIMIZER_MOMENTS = {
    "SGD": 0,
    "Momentum": 1,
    "AdaGrad": 1,
    "RMSprop": 1,
    "Adam": 2,
}


def linear_schedule(batch_id, num_batch):
    """lr multiplier; ref optimizer.h:77-79."""
    return jnp.maximum(1.0 - batch_id / num_batch, 1e-4)


def constant_schedule(batch_id, num_batch):
    return jnp.ones_like(jnp.asarray(batch_id, dtype=jnp.float32))


SCHEDULES = {"linear": linear_schedule, "constant": constant_schedule}


@dataclasses.dataclass(frozen=True)
class Optimizer:
    """Static optimizer hyperparameters (hashable => usable as jit static arg)."""

    type: str = "SGD"
    lr: float = 0.025
    weight_decay: float = 0.0
    schedule: str = "linear"
    # per-type extras (union-style, like the reference's anonymous union)
    momentum: float = 0.999
    alpha: float = 0.999  # RMSprop
    beta1: float = 0.999  # Adam (GraphVite default, optimizer.h:312)
    beta2: float = 0.99999
    epsilon: float = 1e-8

    def __post_init__(self):
        if self.type not in OPTIMIZER_MOMENTS:
            raise ValueError("Unknown optimizer `%s`" % self.type)
        if self.schedule not in SCHEDULES:
            raise ValueError("Invalid schedule `%s`" % self.schedule)

    @property
    def num_moment(self) -> int:
        return OPTIMIZER_MOMENTS[self.type]

    def schedule_lr(self, batch_id, num_batch):
        return self.lr * SCHEDULES[self.schedule](batch_id, num_batch)

    def init_moments(self, shape, dtype=jnp.float32):
        """Allocate zero moment tables for a parameter table of `shape`."""
        return tuple(jnp.zeros(shape, dtype) for _ in range(self.num_moment))

    def info(self):
        s = "optimizer: %s\nlearning rate: %g, lr schedule: %s\nweight decay: %g" % (
            self.type, self.lr, self.schedule, self.weight_decay)
        if self.type == "Momentum":
            s += "\nmomentum: %g" % self.momentum
        if self.type in ("AdaGrad", "RMSprop"):
            s += "\nepsilon: %g" % self.epsilon
        if self.type == "RMSprop":
            s += "\nalpha: %g" % self.alpha
        if self.type == "Adam":
            s += "\nbeta1: %g, beta2: %g, epsilon: %g" % (self.beta1, self.beta2, self.epsilon)
        return s


def make_optimizer(spec, default: Optional[Optimizer] = None, **kwargs) -> Optimizer:
    """Resolve user input (auto | float lr | name | Optimizer) to an Optimizer."""
    if isinstance(spec, Optimizer):
        return spec
    if spec is None or (isinstance(spec, (int, float)) and spec == auto and not isinstance(spec, bool)):
        if default is None:
            raise ValueError("no default optimizer available")
        return default
    if isinstance(spec, (int, float)):
        base = default if default is not None else Optimizer()
        return dataclasses.replace(base, lr=float(spec), **kwargs)
    if isinstance(spec, str):
        base = default if default is not None else Optimizer()
        lr = kwargs.pop("lr", base.lr)
        wd = kwargs.pop("weight_decay", base.weight_decay)
        return Optimizer(type=spec, lr=lr, weight_decay=wd, **kwargs)
    if isinstance(spec, dict):
        spec = dict(spec)
        name = spec.pop("type", default.type if default else "SGD")
        base = default if default is not None else Optimizer()
        merged = {"lr": base.lr, "weight_decay": base.weight_decay, "schedule": base.schedule}
        merged.update(spec)
        merged.update(kwargs)
        merged = {k: v for k, v in merged.items() if v != auto or k == "weight_decay"}
        return Optimizer(type=name, **merged)
    raise TypeError("cannot build an optimizer from %r" % (spec,))


# ---------------------------------------------------------------------------
# moment update rules (per unique row)
#
# The reference applies one moment update PER SAMPLE TOUCH inside its hogwild
# kernels; a batched step sees each touched row once with the summed gradient
# g and a touch count c. To preserve the reference's moment dynamics (with
# beta1 = 0.999 a per-batch update would take ~1000x longer to warm up), each
# rule applies c sequential touch-updates in closed form, treating the c
# per-touch gradients as equal to the mean ghat = g / c:
#     m' = beta^c m + (1 - beta^c) ghat        (EMA rules)
#     delta_total ~= c * per_touch_delta(ghat, m')
# ---------------------------------------------------------------------------

def _sgd_delta(opt, lr, g, c):
    return lr * g, ()


def _one_minus_pow(beta, c):
    """1 - beta**c without the f32 cancellation (beta ~ 1).

    -expm1(x) for x = c*log(beta), written WITHOUT jnp.expm1 (Mosaic has
    no expm1 lowering, and this function is inlined into the Pallas
    moment-sweep kernel): the |x| < 1e-4 regime where the cancellation
    bites uses the series -x(1 + x/2 + x^2/6) (error O(x^4) ~ 1e-16),
    larger |x| uses the direct form where f32 is fine."""
    import math
    x = c * math.log(beta)
    return jnp.where(x > -1e-4,
                     -x * (1.0 + x / 2.0 + x * x / 6.0),
                     1.0 - jnp.exp(x))


def _momentum_delta(opt, lr, g, c, m1):
    ghat = g / c
    w = _one_minus_pow(opt.momentum, c)
    new_m1 = (1 - w) * m1 + w * ghat
    return lr * c * new_m1, (new_m1,)


def _adagrad_delta(opt, lr, g, c, gsq, m1):
    ghat = g / c
    new_m1 = m1 + gsq  # exact: sum of per-touch squared gradients
    return lr * c * ghat / (jnp.sqrt(new_m1) + opt.epsilon), (new_m1,)


def _rmsprop_delta(opt, lr, g, c, gsq, m1):
    ghat = g / c
    w = _one_minus_pow(opt.alpha, c)
    new_m1 = (1 - w) * m1 + w * gsq / c
    return lr * c * ghat / jnp.sqrt(new_m1 + opt.epsilon), (new_m1,)


def _adam_delta(opt, lr, g, c, gsq, m1, m2):
    ghat = g / c
    w1 = _one_minus_pow(opt.beta1, c)
    w2 = _one_minus_pow(opt.beta2, c)
    new_m1 = (1 - w1) * m1 + w1 * ghat
    new_m2 = (1 - w2) * m2 + w2 * gsq / c  # mean of per-touch squares
    return lr * c * new_m1 / (jnp.sqrt(new_m2) + opt.epsilon), (new_m1, new_m2)


def moment_delta(opt: Optimizer, lr, g, moments, c=1.0, gsq=None):
    """delta such that param_new = param - lr_scale * delta; also new moments.

    g:   summed regularized gradient over the row's touches
    c:   touch count
    gsq: summed per-touch SQUARED gradients (second-moment rules need the
         mean of squares; the square of the mean systematically
         underestimates it when per-touch gradients fluctuate)."""
    if opt.type == "SGD":
        return _sgd_delta(opt, lr, g, c)
    if opt.type == "Momentum":
        return _momentum_delta(opt, lr, g, c, *moments)
    if gsq is None:
        gsq = g * g / c
    if opt.type == "AdaGrad":
        return _adagrad_delta(opt, lr, g, c, gsq, *moments)
    if opt.type == "RMSprop":
        return _rmsprop_delta(opt, lr, g, c, gsq, *moments)
    if opt.type == "Adam":
        return _adam_delta(opt, lr, g, c, gsq, *moments)
    raise ValueError(opt.type)


# ---------------------------------------------------------------------------
# row-sparse application with duplicate accumulation
# ---------------------------------------------------------------------------

def dedup_rows(ids, grads, entry_counts=None, entry_sqs=None):
    """Sum `grads` over duplicate `ids` with static shapes.

    An entry may itself stand for several sequential reference touches (a
    step that pre-accumulates a row's subsample gradients before the
    scatter): `entry_counts` [N] gives each entry's touch count and
    `entry_sqs` [N, D] the sum of its per-touch SQUARED gradients, so the
    collapsed entry preserves the per-touch moment semantics. Defaults:
    count 1, sq = grad**2.

    Returns (uids, gsum, counts, gsq) each of length len(ids); slots beyond
    the number of unique ids carry a huge sentinel uid, zero grads and count
    1, and are dropped by scatter mode='drop'.
    """
    n = ids.shape[0]
    order = jnp.argsort(ids)
    sid = ids[order]
    sg = grads[order]
    head = jnp.concatenate([jnp.ones((1,), jnp.bool_), sid[1:] != sid[:-1]])
    seg = jnp.cumsum(head) - 1  # segment index of each touch
    gsum = jax.ops.segment_sum(sg, seg, num_segments=n)
    sq = sg * sg if entry_sqs is None else entry_sqs[order]
    gsq = jax.ops.segment_sum(sq, seg, num_segments=n)
    cnt = (jnp.ones((n,), grads.dtype) if entry_counts is None
           else entry_counts[order].astype(grads.dtype))
    counts = jax.ops.segment_sum(cnt, seg, num_segments=n)
    counts = jnp.maximum(counts, 1.0)
    sentinel = jnp.iinfo(jnp.int32).max
    uids = jnp.full((n,), sentinel, dtype=sid.dtype).at[seg].set(sid)
    return uids, gsum, counts, gsq


# tables up to this many elements use the dense accumulate path for moment
# optimizers: ONE fused wide scatter-add + a dense moment pass beat the
# sort-based dedup chain, whose argsort + row-permute + segment-sums price
# narrow rows (LargeVis dim 2-8) at ~30ms/batch and wide rows (FB15k dim
# 2048: permuting [33k, 2048] grads is 270MB of row traffic) at ~46ms on
# v5e. The dense pass costs ~3 table read-writes, trivial up to a few
# hundred MB; beyond that (e.g. 1M-vertex graphs, 5M-entity KGs) touch
# densities are sparse and the dedup chain wins.
DENSE_UPDATE_ELEMS = 1 << 26


def _apply_row_updates_dense(table, moments, ids, reg_grads, opt: Optimizer,
                             lr, lr_scale, entry_counts, entry_sqs):
    """Accumulate gsum/gsq/counts densely over the whole table, then apply
    ONE vectorized moment update on touched rows. No sort, no permute —
    the [V, D] passes are trivial for small tables, and scatter-adds are
    update-count-bound."""
    v, d = table.shape
    f32 = jnp.float32
    g32 = reg_grads.astype(f32)
    sq = g32 * g32 if entry_sqs is None else entry_sqs.astype(f32)
    cnt = (jnp.ones(ids.shape, f32) if entry_counts is None
           else entry_counts.astype(f32))
    # ONE wide scatter for gsum|gsq|count: scatter-add cost on v5e is
    # per-row-op bound, not byte bound (PERF.md access-pattern floors), so
    # three N-row scatters fuse into one N-row scatter at 2D+1 width.
    # The width is padded to a multiple of 128 lanes: a narrow (e.g.
    # 17-col LargeVis) destination gets a strided (8,128)-tile layout and
    # the scatter serializes per tile fragment — measured 26.1 ms vs the
    # padded 6.4 ms at [216k -> 1.33M, 17] (round-5 ImageNet trace: that
    # one scatter was 85% of the whole step). Padding bytes are free next
    # to the 4x tile-alignment win.
    w = 2 * d + 1
    # ... but ONLY for narrow rows on big tables: at [70k, 17] the
    # unpadded scatter is already ~1 ms and the padded zeros cost more
    # (bench largevis regressed 14.6 -> 8.9M), and for wide rows (KG
    # dim 2048 -> w=4097) padding copies the whole update matrix
    # (KG regressed 3.2x -> 2.0x). Measured crossover: narrow w, v >= 5e5.
    wpad = (-w) % 128 if (w < 128 and v >= 500_000) else 0
    upd = jnp.concatenate([g32, sq, cnt[:, None]], axis=1)
    if wpad:
        upd = jnp.pad(upd, ((0, 0), (0, wpad)))
    acc = jnp.zeros((v, w + wpad), f32).at[ids].add(upd, mode="drop")
    gsum = acc[:, :d]
    gsq = acc[:, d:2 * d]
    counts = acc[:, 2 * d]
    touched = counts > 0
    c = jnp.maximum(counts, 1.0)[:, None]
    delta, new_moments = moment_delta(opt, lr, gsum, moments, c, gsq)
    new_table = jnp.where(touched[:, None],
                          table - (lr_scale * delta).astype(table.dtype),
                          table)
    out_moments = tuple(
        jnp.where(touched[:, None], nm.astype(m.dtype), m)
        for m, nm in zip(moments, new_moments))
    return new_table, out_moments


def apply_row_updates(table, moments, ids, reg_grads, opt: Optimizer, lr,
                      lr_scale=1.0, entry_counts=None, entry_sqs=None,
                      trust=None):
    """Apply optimizer updates for per-touch regularized gradients.

    table:      [V, D] parameter table
    moments:    tuple of [V, D] moment tables (len == opt.num_moment)
    ids:        [N] int32 row ids (duplicates allowed; out-of-range ids are
                dropped — steps route masked/padded slots to a sentinel so
                they register no touch)
    reg_grads:  [N, D] per-touch regularized gradients (weight already applied)
    lr:         scheduled learning rate (traced scalar)
    lr_scale:   extra multiplier on the applied delta only (relation_lr_multiplier;
                moments integrate the unscaled gradient, matching the reference
                `relation -= relation_lr_multiplier * update(...)`).
    entry_counts / entry_sqs: see dedup_rows — per-entry touch counts and
                summed squared per-touch gradients for pre-accumulated entries.
    trust:      optional trust-ratio clip for the UNNORMALIZED (SGD) rule:
                a row's accumulated per-batch displacement is clipped to
                trust * (|row| + 1e-2). A hub row a power-law batch touches
                hundreds of times accumulates all of them at one stale point
                (the reference's hogwild applies each fresh,
                gpu/graph.cuh:36-95) — on dense small graphs the
                hub<->context feedback diverges to NaN (BlogCatalog-scale
                clone). Inactive for healthy updates; applied via the dense
                accumulate path, so only for tables <= DENSE_UPDATE_ELEMS
                (larger tables have proportionally sparser touch densities).
                Moment rules need no clip: their updates are
                magnitude-normalized per touch.
    """
    if opt.num_moment == 0:
        delta = (lr * lr_scale) * reg_grads
        if (trust is not None
                and table.shape[0] * table.shape[1] <= DENSE_UPDATE_ELEMS):
            acc = jnp.zeros(table.shape, jnp.float32).at[ids].add(
                delta.astype(jnp.float32), mode="drop")
            dnorm = jnp.linalg.norm(acc, axis=-1, keepdims=True)
            limit = trust * (jnp.linalg.norm(table.astype(jnp.float32),
                                             axis=-1, keepdims=True) + 1e-2)
            acc = acc * jnp.minimum(
                1.0, limit / jnp.maximum(dnorm, 1e-30))
            return (table - acc.astype(table.dtype)), moments
        # pure scatter-add; duplicates accumulate natively, out-of-range drops
        return (table.at[ids].add(-delta.astype(table.dtype), mode="drop"),
                moments)

    if table.shape[0] * table.shape[1] <= DENSE_UPDATE_ELEMS:
        return _apply_row_updates_dense(table, moments, ids, reg_grads, opt,
                                        lr, lr_scale, entry_counts,
                                        entry_sqs)

    uids, gsum, counts, gsq = dedup_rows(ids, reg_grads, entry_counts,
                                         entry_sqs)
    cuids = jnp.minimum(uids, table.shape[0] - 1)  # safe gather; scatter drops
    mrows = tuple(m[cuids] for m in moments)
    delta, new_mrows = moment_delta(opt, lr, gsum, mrows, counts[:, None],
                                    gsq)
    new_table = table.at[uids].add(-(lr_scale * delta).astype(table.dtype), mode="drop")
    new_moments = tuple(
        m.at[uids].set(nm.astype(m.dtype), mode="drop")
        for m, nm in zip(moments, new_mrows)
    )
    return new_table, new_moments
