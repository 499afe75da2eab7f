"""Frozen config tree — single source of truth for every constant in the framework.

Reference provenance: the reference scatters these as hard-coded constants in its
train/test scripts (SURVEY.md §6 "Config / flag system", reference mount empty —
values fixed by the DenseBox paper, arXiv:1509.04874 §3, and SURVEY.md Appendix B).

All dataclasses are frozen + hashable so they can be closed over by jitted
functions as static arguments, and serialized into checkpoints.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple


def _round_channels(c: float, multiple: int = 8) -> int:
    """Round a channel count to a TPU-friendly multiple (sublane alignment)."""
    return max(multiple, int(round(c / multiple)) * multiple)


@dataclasses.dataclass(frozen=True)
class ModelCfg:
    """VGG-FCN DenseBox architecture (paper §3.2, §4; SURVEY.md C1–C4).

    ``width_mult`` scales every conv width (rounded to sublane multiples) —
    the "slim trunk" production-inference config demanded by the 5k img/s/chip
    target (SURVEY.md §7 sanity math); ``width_mult=1.0`` is the full-width
    parity config.
    """

    num_landmarks: int = 0          # N per-landmark heatmap channels (paper §4)
    use_refine: bool = False        # refinement branch fusing score+landmarks (paper §4)
    width_mult: float = 1.0         # trunk/head channel multiplier
    # Production-speed knobs (the paper config is stem='conv', depth=4).
    # stem='s2d': space-to-depth(2) + stride-2 conv1/conv2 replace the
    #   full-resolution conv1 block + pool1 (identical strides/channels
    #   downstream; the full-res stem is the measured utilization hole).
    # stem='s2d4': space-to-depth(4) — the whole trunk runs at the output
    #   stride, removing the full/half-res activations (the HBM-bandwidth
    #   bottleneck at slim widths; BASELINE.md round-2 breakdown).
    # trunk_depth=3: VGG16-style 3-conv conv3/conv4 blocks instead of 4.
    stem: str = "conv"              # 'conv' (paper) | 's2d' | 's2d4' (fast)
    trunk_depth: int = 4            # convs per conv3/conv4 block (4=VGG19)
    head_width: int = 512           # 1x1 conv width in det/loc/lm heads (paper §3.2)
    refine_width: int = 64          # conv width in the refinement branch
    skip_fusion: str = "auto"       # 'concat' | 'split' | 'auto'. 'split'
    # computes each head conv1 as two sliced-weight matmuls over f3 and
    # the upsampled f4 instead of one conv over their concat — the
    # (B, H/4, W/4, 384) concat tensor and its relayout copy never
    # materialize (identical parameters; f32 sum order differs). 'auto'
    # = 'split', the measured policy (round-4 train ladder, BASELINE.md:
    # 21.84 vs 20.86 steps/s).
    dropout_rate: float = 0.5       # dropout between head convs (paper §3.2)
    dropout_impl: str = "auto"      # 'flax' | 'packed' | 'fused' | 'fused8' | 'auto'.
    # 'fused' fuses relu+dropout under a custom VJP whose backward derives
    # the combined mask from the OUTPUT (`g * (y > 0) / keep_prob`) — zero
    # mask residuals, so the two ~118M-element head keep masks are never
    # stored or re-read in backward (forward mask draw is bit-identical
    # to flax for the same key). 'packed'
    # derives 4 mask bytes per generated u32 word instead of one mask per
    # word (flax bernoulli), quartering the generator bytes of the two
    # ~118M-element head masks; keep probability quantizes to 1/256
    # (exact for the paper's 0.5). 'fused8' = 'fused' whose forward draws
    # the mask from uint8 random bytes — 4x fewer RngBitGenerator words
    # with no user-level pack reshape; same 1/256 keep-prob quantization.
    # 'auto' = 'fused8', the measured policy (round-4 train ladder,
    # BASELINE.md: fused 22.48 vs 21.84; fused8 23.52 vs 22.51 steps/s).
    # 'packed' was measured as a remote-compile bomb on the axon runtime
    # (>20 min compiles, BASELINE.md round 3) and stays a wired,
    # unit-tested backend for runtimes with a local compiler only.
    head_impl: str = "auto"         # 'separate' | 'fused' | 'auto'. 'fused'
    # computes ALL prediction heads (det/loc[/lm]) as ONE conv1 GEMM over
    # Cout-concatenated weights plus ONE block-diagonal conv2, with a
    # single relu+dropout pass (one RNG draw) over the fused hidden
    # tensor. The shared skip-feature reads (and, in backward, the
    # per-head dgrad contributions that must otherwise be summed) happen
    # once instead of once per head. Parameters stay byte-identical to
    # 'separate' (each head's convs declared under its own scope), so
    # checkpoints are interchangeable; the dropout mask STREAM differs
    # (one fused draw vs per-head draws — same distribution). The
    # block-diagonal conv2 adds only zero-block FLOPs (Cout sums to 5+L).
    # This is NOT the rejected int8-infer 'head_fuse' (which split the
    # fused tensor before per-head conv2s and lost to relayout copies);
    # here nothing large is ever sliced. 'auto' = 'separate' until the
    # train A/B lands (bench.py --mode train --head-impl fused).
    pool_impl: str = "auto"         # 'xla' | 'reshape' | 'auto'. 'reshape'
    # computes the 2x2/2 maxpool as a reshape + max over the two window
    # axes with a custom VJP whose backward is pure elementwise math +
    # length-2 cumsums (first-max tie rule, bit-matching XLA's
    # select_and_scatter) — the select_and_scatter bwd op was 1.1 ms/step
    # in the round-3 train profile. Forward and backward are bit-identical
    # to 'xla' (equality-tested, ties included). 'auto' = 'xla': reshape
    # measured −16% end to end (round-4 A/B, BASELINE.md) — the
    # interleaved-axis tie-break backward costs more than the op it
    # removes. Kept as a wired, tested backend.
    compute_dtype: str = "float32"  # 'bfloat16' for production inference
    param_dtype: str = "float32"

    # Architecture invariants (not knobs): 3 maxpools + one 2x skip-upsample
    # => output stride 4 (paper §3.2). Inputs must be divisible by 8.
    stride: int = 4
    min_divisor: int = 8

    def scaled(self, c: int) -> int:
        return _round_channels(c * self.width_mult)


@dataclasses.dataclass(frozen=True)
class LabelCfg:
    """Dense GT label-map geometry (paper §3.1; SURVEY.md Appendix B).

    All radii/normalizers below are in *map units* (output-grid pixels) unless
    suffixed ``_px`` (input-image pixels).
    """

    stride: int = 4
    patch_size: int = 240           # training patch edge (px)
    rc_ratio: float = 0.3           # positive-disc radius = rc_ratio * box height (map units)
    rnear: float = 2.0              # gray-zone dilation radius around positives (map units)
    std_height_px: float = 50.0     # standard object height in a patch (px)
    scale_band: Tuple[float, float] = (0.8, 1.25)  # in-scale box-height band vs std_height
    # Landmark channel permutation under horizontal flip (dataset semantics:
    # e.g. left-eye<->right-eye, box corners TL<->TR / BL<->BR). Flipping
    # mirrors coordinates but ALSO swaps left/right landmark identities;
    # without the permutation each channel trains on a 50/50 mix of mirror
    # twins (found as NME 0.5 at round-1 scale). None = identity (only safe
    # for flip-symmetric landmark sets or hflip=False).
    lm_flip_perm: Optional[Tuple[int, ...]] = None
    # Box-relative expected landmark positions ((ax, ay) in [0,1]^2 box
    # coords per channel), e.g. 4 corners = ((0,0),(1,0),(1,1),(0,1)) or a
    # canonical 5-point face layout. When set, the decode-time peak search
    # for channel l is restricted to a disc around its expected position —
    # this kills the NME tail from overlapping objects' peaks landing
    # inside the box (measured in BASELINE.md round 2). None = search the
    # whole (dilated) box.
    lm_anchors: Optional[Tuple[Tuple[float, float], ...]] = None
    lm_anchor_radius: float = 0.25  # search-disc radius around each anchor,
                                    # as a fraction of the box diagonal
                                    # (A/B'd on the round-2 cert checkpoint)

    @property
    def map_size(self) -> int:
        assert self.patch_size % self.stride == 0
        return self.patch_size // self.stride

    @property
    def loc_norm(self) -> float:
        """Regression normalizer: 50 px / stride 4 = 12.5 map units (paper §3.3)."""
        return self.std_height_px / self.stride

    @property
    def height_band_map(self) -> Tuple[float, float]:
        """In-scale box-height band in map units."""
        lo, hi = self.scale_band
        return (lo * self.std_height_px / self.stride,
                hi * self.std_height_px / self.stride)


@dataclasses.dataclass(frozen=True)
class LossCfg:
    """OHEM-masked multi-task L2 loss (paper §3.3; SURVEY.md C6)."""

    lambda_loc: float = 3.0         # loc-loss weight (paper §3.3)
    lambda_lm: float = 1.0          # landmark heatmap loss weight (paper §4)
    lambda_refine: float = 1.0      # refined-score loss weight (paper §4)
    neg_pos_ratio: float = 1.0      # #sampled negatives = ratio * #positives
    hard_frac: float = 0.5          # fraction of sampled negatives that are hardest-by-loss
    min_neg: int = 16               # negatives sampled even when a patch has no positives
    backend: str = "auto"           # OHEM selection: 'jax' (argsort ranks) |
                                    # 'pallas' (bisection-threshold kernel) |
                                    # 'auto' = jax (measured faster in the
                                    # full train step on v5e — ops/ohem.py)


@dataclasses.dataclass(frozen=True)
class InferCfg:
    """Image-pyramid inference + decode + NMS (paper §2; SURVEY.md C10–C11)."""

    scales: Tuple[float, ...] = (0.5, 0.7071, 1.0, 1.4142)  # pyramid scale factors
    score_thresh: float = 0.5
    nms_iou: float = 0.5
    topk_per_scale: int = 256       # fixed-shape candidate extraction (no dynamic shapes)
    max_dets: int = 128             # final detections after cross-scale NMS
    pre_nms_topk: int = 512         # cross-scale candidate cap before NMS: the
                                    # per-scale sets concat to S*topk_per_scale;
                                    # greedy NMS is O(K^2)+K sequential steps, so
                                    # pruning to the top 512 by score cuts 4-scale
                                    # single-image latency ~4x. Candidates below
                                    # rank 512 can only surface if >pre_nms-max_dets
                                    # higher-score boxes all get suppressed —
                                    # the same truncation class as topk_per_scale.
                                    # 0 disables.
    pad_multiple: int = 8           # input spatial padding granularity
    nms_backend: str = "auto"       # 'jax' | 'pallas' | 'auto' (measured policy:
                                    # pallas at small batch*K, jax otherwise —
                                    # see ops/nms.py nms_dispatch)
    approx_topk: bool = False       # lax.approx_max_k candidate extraction
                                    # (faster on TPU; recall ~1.0 at the 0.95
                                    # target on dense score maps). Default
                                    # OFF so accuracy-measurement paths (eval
                                    # CLI, mAP parity) use exact top_k; the
                                    # throughput bench opts in explicitly.
    lm_topk: int = 64               # decode landmarks for only the top-K
                                    # detections by score (NMS output is
                                    # score-sorted, so this is a slice);
                                    # lower slots get the invalid/center
                                    # fallback with lm_valid=False. Same
                                    # truncation class as pre_nms_topk:
                                    # >64 landmark-bearing objects in one
                                    # image can truncate. 0 = all max_dets
                                    # slots (exact; quality-measurement
                                    # paths that need every slot use it).
    lm_dtype: str = "auto"          # landmark heatmap dtype through the
                                    # window gather + peak search:
                                    # 'float32' | 'bfloat16' | 'auto' (=
                                    # 'bfloat16', the measured policy —
                                    # +5.8% lm4 img/s, BASELINE.md round-4
                                    # step 05). bf16 halves the strip-DMA and
                                    # peak-reduce read traffic; the
                                    # argmax tie-break prior and the
                                    # sub-pixel parabola still run in f32
                                    # (dtype promotion), so only the
                                    # heatmap VALUES quantize (~3 decimal
                                    # digits — beneath detection-heat
                                    # contrast).
    lm_window_dp: int = 0           # pallas window gather: detections per
                                    # grid step (in-flight-DMA depth; the
                                    # kernel is DMA-issue-rate-bound at
                                    # production shapes). 0 = kernel
                                    # default (16, measured round-4 —
                                    # ops/pallas/window.py); A/B knob,
                                    # must divide lm_topk
    lm_backend: str = "auto"        # landmark window gather: 'pallas' (the
                                    # scalar-prefetch DMA kernel — the
                                    # measured TPU policy, see BASELINE.md
                                    # round 3) | 'jax' (vmapped
                                    # dynamic_slice twin; XLA lowers it to a
                                    # sequential while loop on TPU — CPU/
                                    # reference path) | 'auto' = pallas
    lm_decode: str = "std"          # which pyramid scale's heatmap decodes a
                                    # detection's landmarks:
                                    # 'std' — per detection, the scale that
                                    #   brings its box closest to the
                                    #   standard object height, i.e. where
                                    #   the landmark head was TRAINED to
                                    #   respond (scale-banded GT): small
                                    #   objects read finer maps, large ones
                                    #   coarser. Best measured NME — see
                                    #   BASELINE.md round-2 A/B.
                                    # 'source' — the scale the detection was
                                    #   found at (its strongest det score)
                                    # 'finest' — always the largest scale
                                    #   (off-band response; measured worse)


@dataclasses.dataclass(frozen=True)
class TrainCfg:
    """Training loop (paper §3.4; SURVEY.md C9)."""

    batch_size: int = 32
    learning_rate: float = 1e-3
    momentum: float = 0.9
    weight_decay: float = 5e-4
    lr_decay_steps: int = 20000
    lr_decay_rate: float = 0.5
    grad_clip_norm: float = 10.0   # global-norm gradient clip; 0 disables.
    # Not in the reference (it diverges instead); the initial multi-task L2
    # loss is large (~100s) at production scale, so unclipped SGD at
    # lr>=3e-3 NaNs within steps.
    num_steps: int = 100000
    max_boxes: int = 16             # padded per-patch box capacity
    seed: int = 0
    ckpt_every: int = 1000
    ckpt_keep: int = 3
    log_every: int = 50
    label_backend: str = "auto"     # GT rasterizer: 'jax' | 'pallas' | 'auto'
    rng_impl: str = "auto"          # per-step bulk-mask RNG: 'threefry' |
    # 'rbg' | 'auto'. 'rbg' re-wraps the per-step dropout/OHEM keys onto
    # JAX's rbg impl so the ~118M-element head dropout masks lower to the
    # TPU hardware RngBitGenerator instead of fused threefry rounds
    # (measured round 3, fast w0.5/B128: 58.2 -> 48.4 ms/step). 'auto' =
    # 'rbg' on TPU, 'threefry' elsewhere (CPU test goldens unchanged).
    # state.key itself stays threefry2x32 — checkpoint format unchanged.
    remat: str = "auto"             # rematerialize the forward in the
    # backward pass ('on' | 'off' | 'auto'): trades one extra forward's
    # FLOPs for not storing fwd activations to HBM — a win only if the
    # step is bandwidth-bound. Measured round 3 (fast w0.5/B128, 240px):
    # see BASELINE.md train ladder; 'auto' = the measured winner.
    crop_dtype: str = "auto"        # patch-crop interpolation dtype:
    # 'float32' | 'bfloat16' | 'auto' (= follow model.compute_dtype).
    # The vmapped crop matmuls + the canvas relayout copy are ~8% of the
    # train step in f32 (round-3 profile); canvases come from 8-bit
    # images, so bf16 interpolation is sub-quantization noise. CPU parity
    # tests run compute_dtype=float32 and stay bit-exact.
    canvas_dtype: str = "auto"      # dtype the data pipeline DELIVERS
    # canvases in ('float32' | 'bfloat16' | 'auto' = follow crop_dtype).
    # When the crop interpolates in bf16 anyway (crop_dtype policy
    # above), shipping f32 canvases pays a full-canvas
    # convert_element_type inside the train step plus 2x the H2D bytes;
    # canvases are 8-bit image data, so bf16 at the SOURCE loses nothing
    # the bf16 crop hadn't already dropped. Measured round-5 queue D
    # (BASELINE.md): 24.84 vs 24.68 steps/s — inside the noise band (XLA
    # was already fusing the convert), kept for the structural H2D win.
    # Resolved at batch production (synthetic_batch / data.pipeline),
    # not in the jitted step.


def resolved_canvas_dtype(cfg: "DenseBoxConfig") -> str:
    """'float32' | 'bfloat16' the pipeline should deliver canvases in.

    'auto' follows the resolved crop_dtype chain (canvas_dtype -> crop_dtype
    -> model.compute_dtype): if the crop already interpolates in bf16, the
    canvas ships in bf16 too — the in-step full-canvas convert disappears
    (speed-neutral measured, round-5 queue D) along with half the H2D
    bytes."""
    cd = cfg.train.canvas_dtype
    if cd == "auto":
        cd = cfg.train.crop_dtype
        if cd == "auto":
            cd = cfg.model.compute_dtype
    return "bfloat16" if cd == "bfloat16" else "float32"


@dataclasses.dataclass(frozen=True)
class DenseBoxConfig:
    """Root config bundling every subsystem; serialized into checkpoints."""

    model: ModelCfg = dataclasses.field(default_factory=ModelCfg)
    label: LabelCfg = dataclasses.field(default_factory=LabelCfg)
    loss: LossCfg = dataclasses.field(default_factory=LossCfg)
    infer: InferCfg = dataclasses.field(default_factory=InferCfg)
    train: TrainCfg = dataclasses.field(default_factory=TrainCfg)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "DenseBoxConfig":
        def _mk(tp, sub):
            fields = {f.name for f in dataclasses.fields(tp)}
            kw = {k: (tuple(v) if isinstance(v, list) else v)
                  for k, v in sub.items() if k in fields}
            return tp(**kw)

        return cls(
            model=_mk(ModelCfg, d.get("model", {})),
            label=_mk(LabelCfg, d.get("label", {})),
            loss=_mk(LossCfg, d.get("loss", {})),
            infer=_mk(InferCfg, d.get("infer", {})),
            train=_mk(TrainCfg, d.get("train", {})),
        )
