"""Pallas OHEM sampling kernel (BASELINE.json:5 elevates the OHEM loss to
kernel status; SURVEY.md C6).

Same contract as ops.ohem.ohem_mask, batched — and bit-identical to it for
distinct loss values. The pure-jax twin selects negatives with two argsort
ranks; sorting is awkward on the VPU, so this kernel replaces rank selection
with THRESHOLD BISECTION: count(x > t) is monotone in t, so ~40 float
bisection steps find the exact n-th-largest cutoff. Elements strictly above
the cutoff are taken, and any shortfall from TIES at the cutoff (identical
losses are common early in training) is filled from the tie class ordered by
the kernel's uniform noise — so the selected COUNT always matches the
argsort twin; membership differs from it only within a tie class, where the
ordering is arbitrary anyway.

Randomness is drawn OUTSIDE the kernel with the same per-sample key split
as the jax twin, so the random-half selection matches the twin exactly and
the kernel itself is deterministic and RNG-free (also keeps CPU interpret
mode working: pltpu.prng_* has no CPU lowering).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from densebox_tpu.config import LossCfg

_BISECT_ITERS = 40


def _count_threshold(values: jnp.ndarray, cand: jnp.ndarray,
                     n_want: jnp.ndarray) -> jnp.ndarray:
    """Bisect t so that count(cand & values > t) == n_want (values >= 0)."""
    hi0 = jnp.max(jnp.where(cand, values, 0.0)) + 1.0

    def body(_, lo_hi):
        lo, hi = lo_hi
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((cand & (values > mid)).astype(jnp.int32))
        too_many = cnt > n_want
        return (jnp.where(too_many, mid, lo), jnp.where(too_many, hi, mid))

    _, hi = lax.fori_loop(0, _BISECT_ITERS, body, (-1.0, hi0))
    return hi


def _ohem_kernel(sq_ref, pos_ref, ign_ref, rnd_ref, mask_ref, *,
                 p: int, ratio: float, hard_frac: float, min_neg: int):
    sq = sq_ref[0, 0, :].reshape(1, p)
    pos = pos_ref[0, 0, :].reshape(1, p) > 0
    ign = ign_ref[0, 0, :].reshape(1, p) > 0
    rnd = rnd_ref[0, 0, :].reshape(1, p)
    neg_cand = ~pos & ~ign

    npos = jnp.sum(pos.astype(jnp.int32))
    n_neg = jnp.where(npos > 0,
                      jnp.round(ratio * npos.astype(jnp.float32))
                      .astype(jnp.int32),
                      jnp.int32(min_neg))
    n_neg = jnp.minimum(n_neg, jnp.sum(neg_cand.astype(jnp.int32)))
    n_hard = jnp.floor(hard_frac * n_neg.astype(jnp.float32)).astype(jnp.int32)
    n_rand = n_neg - n_hard

    # Strictly-above-cutoff selection undercounts when loss values TIE at the
    # cutoff (common early in training: large regions share identical squared
    # error). Fill the shortfall from the tie set, ordered by the same uniform
    # noise the random half uses — count then matches the argsort twin exactly
    # (membership within a tie class is noise-ordered rather than
    # position-ordered; both are arbitrary among equal losses).
    t_hard = _count_threshold(sq, neg_cand, n_hard)
    above = neg_cand & (sq > t_hard)
    n_above = jnp.sum(above.astype(jnp.int32))
    vstar = jnp.max(jnp.where(neg_cand & ~above, sq, -jnp.inf))
    ties = neg_cand & (sq == vstar)
    t_tie = _count_threshold(rnd, ties, n_hard - n_above)
    hard_sel = above | (ties & (rnd > t_tie))

    rand_cand = neg_cand & ~hard_sel
    t_rand = _count_threshold(rnd, rand_cand, n_rand)
    rand_sel = rand_cand & (rnd > t_rand)

    mask_ref[0, 0, :] = (pos | hard_sel | rand_sel).reshape(p)


def ohem_mask_pallas(
    sq_loss: jnp.ndarray,   # (B, P)
    pos: jnp.ndarray,       # (B, P) bool
    ignore: jnp.ndarray,    # (B, P) bool
    key: jax.Array,
    cfg: LossCfg,
    *,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Batched OHEM mask (B, P) bool; bit-compatible with the jax twin."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, p = sq_loss.shape
    # same per-sample uniform stream as ops.ohem's vmapped twin
    keys = jax.random.split(key, b)
    rnd = jax.vmap(lambda k: jax.random.uniform(k, (p,)))(keys)

    kern = functools.partial(
        _ohem_kernel, p=p, ratio=float(cfg.neg_pos_ratio),
        hard_frac=float(cfg.hard_frac), min_neg=int(cfg.min_neg))
    # a unit middle axis keeps the block's last two dims == array dims
    # (Mosaic requires sublane blocks be 8-divisible or full)
    row = pl.BlockSpec((1, 1, p), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[row, row, row, row],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((b, 1, p), jnp.bool_),
        interpret=interpret,
    )(sq_loss[:, None], pos.astype(jnp.int32)[:, None],
      ignore.astype(jnp.int32)[:, None], rnd[:, None])
    return out[:, 0]
