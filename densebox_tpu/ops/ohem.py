"""OHEM-masked multi-task L2 loss, fully in-graph (SURVEY.md C6; paper §3.3).

The reference builds its hard-negative mask per step with torch sort ops
(possibly via a host sync, SURVEY.md §4.1). Here mask construction is
jit-safe and fixed-shape: sample counts (#pos, #neg) are *traced scalars*
used in elementwise rank comparisons, never in shapes. Selection is done
with the rank trick (argsort∘argsort), and the "random half" of negatives
draws from a threaded PRNG key so every step is reproducible
(SURVEY.md §8 hard part 2).

Loss spec (paper §3.3, §4; Appendix B):
  L = mean_sampled (ŝ − y)²  +  λ_loc · mean_pos Σ₄ (d̂ − d*)²
      [+ λ_lm · balanced-L2(landmark heatmaps) + λ_ref · OHEM-L2(refined)]

OHEM mask: keep ALL positives; sample #neg = neg_pos_ratio·#pos negatives
(min_neg for positive-free patches) — hard_frac of them the highest-loss
negatives, the rest uniformly at random from the remaining candidates;
gray-zone pixels are never sampled. Both cls terms (raw + refined score) mine
their own hard negatives.

Where the paper is silent, our spec: per-term normalization is by sampled
count (cls) / positive count (loc); the landmark term is class-balanced L2
(0.5·mean-over-positives + 0.5·mean-over-negatives) rather than mined.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from densebox_tpu.config import LossCfg


def _rank_desc(values: jnp.ndarray) -> jnp.ndarray:
    """rank[i] = position of element i in a descending sort of `values`."""
    order = jnp.argsort(-values)
    return jnp.argsort(order)


def _select_topk_desc(values: jnp.ndarray, cand: jnp.ndarray,
                      k: jnp.ndarray) -> jnp.ndarray:
    """Select the k largest candidates, ties broken by LOWEST index —
    bit-identical to the stable argsort rank trick
    (``cand & (_rank_desc(where(cand, values, -inf)) < k)``) but with ONE
    value-only sort instead of two index-payload sorts per call. The rank
    twin was 0.76 ms/step of FWD sort in the round-4 train profile (four
    variadic sorts per mask); this is two value sorts + elementwise math.
    `k` is a traced scalar; values must be finite on candidates."""
    v = jnp.where(cand, values, -jnp.inf)
    s = -jnp.sort(-v)                      # descending
    th = s[jnp.maximum(k - 1, 0)]          # value at rank k-1
    above = cand & (v > th)
    n_above = jnp.sum(above)
    tie = cand & (v == th)
    tie_order = jnp.cumsum(tie) - 1        # 0-based index-order rank of ties
    sel = above | (tie & (tie_order < (k - n_above)))
    return sel & (k > 0)


def ohem_mask(
    sq_loss: jnp.ndarray,    # (P,) per-pixel squared cls error
    pos: jnp.ndarray,        # (P,) bool positives
    ignore: jnp.ndarray,     # (P,) bool gray zone
    key: jax.Array,
    cfg: LossCfg,
) -> jnp.ndarray:
    """Per-sample OHEM sampling mask (bool, (P,)). Fixed shapes throughout."""
    neg_cand = ~pos & ~ignore
    npos = jnp.sum(pos)
    n_neg = jnp.where(npos > 0,
                      jnp.round(cfg.neg_pos_ratio * npos).astype(jnp.int32),
                      jnp.int32(cfg.min_neg))
    n_neg = jnp.minimum(n_neg, jnp.sum(neg_cand))
    n_hard = jnp.floor(cfg.hard_frac * n_neg).astype(jnp.int32)
    n_rand = n_neg - n_hard

    hard_sel = _select_topk_desc(sq_loss, neg_cand, n_hard)

    rnd = jax.random.uniform(key, sq_loss.shape)
    rand_cand = neg_cand & ~hard_sel
    rand_sel = _select_topk_desc(rnd, rand_cand, n_rand)

    return pos | hard_sel | rand_sel


def ohem_mask_rank(sq_loss, pos, ignore, key, cfg):
    """The original argsort∘argsort formulation — kept as the equality twin
    for :func:`ohem_mask` (rounds 1–3 goldens were produced by this path;
    the sort-threshold rewrite must match it bit-for-bit)."""
    neg_cand = ~pos & ~ignore
    npos = jnp.sum(pos)
    n_neg = jnp.where(npos > 0,
                      jnp.round(cfg.neg_pos_ratio * npos).astype(jnp.int32),
                      jnp.int32(cfg.min_neg))
    n_neg = jnp.minimum(n_neg, jnp.sum(neg_cand))
    n_hard = jnp.floor(cfg.hard_frac * n_neg).astype(jnp.int32)
    n_rand = n_neg - n_hard

    neg_inf = jnp.float32(-jnp.inf)
    hard_rank = _rank_desc(jnp.where(neg_cand, sq_loss, neg_inf))
    hard_sel = neg_cand & (hard_rank < n_hard)

    rnd = jax.random.uniform(key, sq_loss.shape)
    rand_cand = neg_cand & ~hard_sel
    rand_rank = _rank_desc(jnp.where(rand_cand, rnd, neg_inf))
    rand_sel = rand_cand & (rand_rank < n_rand)

    return pos | hard_sel | rand_sel


def _cls_term(pred, gt, ignore, key, cfg):
    """OHEM-masked L2 classification term over a batch. pred/gt (B, M, M, 1)."""
    b = pred.shape[0]
    sq = ((pred - gt) ** 2).reshape(b, -1)
    pos = (gt > 0.5).reshape(b, -1)
    ign = (ignore > 0.5).reshape(b, -1)
    backend = cfg.backend
    if backend == "auto":
        # Measured on v5e (round 2, full train step, fast w0.5 batch 128):
        # jax argsort-rank twin 17.2 steps/s vs pallas bisection kernel
        # 16.6 — the OHEM mask is a tiny slice of the step and the argsort
        # twin fuses better into the surrounding graph, so 'auto' keeps the
        # jax path. The kernel stays wired + tested (backend='pallas').
        backend = "jax"
    if backend == "pallas":
        from densebox_tpu.ops.pallas.ohem import ohem_mask_pallas

        # The mask is a constant w.r.t. params (selection, not value —
        # matching the jax twin, whose argsort ranks carry no gradient), and
        # pallas_call has no autodiff rule, so sever the tangent path through
        # the kernel's loss input explicitly (zero-tangent inputs make JVP
        # tracing skip the primitive's rule entirely).
        mask = ohem_mask_pallas(jax.lax.stop_gradient(sq), pos, ign, key, cfg)
    else:
        keys = jax.random.split(key, b)
        mask = jax.vmap(lambda s, p, i, k: ohem_mask(s, p, i, k, cfg))(
            sq, pos, ign, keys)
    n = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(sq * mask) / n, mask


def densebox_loss(
    outputs: Dict[str, jnp.ndarray],   # model heads (score/loc[/lm/refined])
    gts: Dict[str, jnp.ndarray],       # rasterizer maps (score/loc/... )
    key: jax.Array,
    cfg: LossCfg,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total multi-task loss + metrics dict (all scalars, f32)."""
    import chex

    # shape guards (SURVEY.md §5.2): preds and GTs must agree per head
    for name in ("score", "loc"):
        chex.assert_shape(outputs[name], gts[name].shape)
    chex.assert_rank(outputs["score"], 4)
    if "lm" in outputs and "lm" in gts:
        chex.assert_shape(outputs["lm"], gts["lm"].shape)

    k_cls, k_ref = jax.random.split(key)

    cls_loss, mask = _cls_term(outputs["score"], gts["score"], gts["ignore"],
                               k_cls, cfg)

    loc_mask = gts["loc_mask"]
    npos = jnp.maximum(jnp.sum(loc_mask), 1.0)
    loc_sq = jnp.sum((outputs["loc"] - gts["loc"]) ** 2, axis=-1,
                     keepdims=True)
    loc_loss = jnp.sum(loc_sq * loc_mask) / npos

    total = cls_loss + cfg.lambda_loc * loc_loss
    metrics = {
        "loss_cls": cls_loss,
        "loss_loc": loc_loss,
        "n_pos": jnp.sum(gts["score"]),
        "n_sampled": jnp.sum(mask).astype(jnp.float32),
    }

    if "lm" in outputs and "lm" in gts:
        lm_sq = (outputs["lm"] - gts["lm"]) ** 2
        lm_pos = gts["lm"] > 0.5
        p = jnp.maximum(jnp.sum(lm_pos), 1.0)
        n = jnp.maximum(jnp.sum(~lm_pos), 1.0)
        lm_loss = 0.5 * (jnp.sum(lm_sq * lm_pos) / p +
                         jnp.sum(lm_sq * ~lm_pos) / n)
        total = total + cfg.lambda_lm * lm_loss
        metrics["loss_lm"] = lm_loss

    if "refined" in outputs:
        ref_loss, _ = _cls_term(outputs["refined"], gts["score"],
                                gts["ignore"], k_ref, cfg)
        total = total + cfg.lambda_refine * ref_loss
        metrics["loss_refined"] = ref_loss

    metrics["loss_total"] = total
    return total, metrics
