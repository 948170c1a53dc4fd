"""Static configuration system.

The torch reference threads a mutable OmegaConf object through every model
forward (reference: model_dit4sr/transformer_sd3.py:278, attention.py:281).
That is jit-hostile; here every config is a frozen dataclass that is fully
resolved *before* tracing, so model code branches on Python constants and XLA
sees a single static program.

Variant mapping to the reference:
  * ``MMDiTConfig.streams=("hq","control")``           == ``dit4sr``
    (model_dit4sr/transformer_sd3.py + attention.py)
  * ``("hq","control","ocr")`` + ``ffn_couplings=(("control","hq"),("ocr","hq"))``
    == ``dit4sr_ocrbranch_ocr2hq``
  * ... + ``("hq","ocr")`` coupling == ``dit4sr_ocrbranch_ocr2hq2ocr``
    (attention_ocrbranch_ocr2hq2ocr.py:156-210)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Mapping, Optional, Sequence, Tuple

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Model configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MMDiTConfig:
    """SD3.5-style MMDiT with extra zero-init image-token streams.

    Defaults follow SD3.5-medium geometry (reference:
    model_dit4sr/transformer_sd3.py:63-114 — patch 2, 16 latent channels,
    24 heads x 64 = 1536 inner dim, dual attention on layers 0-12,
    sincos pos-embed table of 96x96 patches).
    """

    sample_size: int = 128          # latent H=W the pos-embed base grid targets
    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    num_layers: int = 24
    attention_head_dim: int = 64
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096   # raw text embedding dim (padded CLIP+T5)
    caption_projection_dim: int = 1536
    pooled_projection_dim: int = 2048
    pos_embed_max_size: int = 96
    dual_attention_layers: Tuple[int, ...] = tuple(range(13))
    qk_norm: Optional[str] = "rms_norm"

    # --- stream layout -----------------------------------------------------
    # First stream is always the denoised ("hq") stream and uses the base
    # q/k/v/out projections. Every further stream gets composed zero-init
    # projections W_s(W_base(x)) and its own out projection (reference:
    # attention.py:401-431,475-477).
    streams: Tuple[str, ...] = ("hq", "control")
    # Depthwise 3x3 conv couplings inside the FFN hidden space, applied in
    # order; "hq" as src means the post-coupling hq activations
    # (attention_ocrbranch_ocr2hq2ocr.py:156-210).
    ffn_couplings: Tuple[Tuple[str, str], ...] = (("control", "hq"),)
    # Which stream(s) feed the text-spotting head. One of
    # "hq" | "control" | "ocr" | "hq+control" (reference feat_extract values
    # hq_feat/lq_feat/ocr_feat/hqlq_feat, attention.py:353-374).
    feat_extract: str = "hq+control"
    feat_extract_layers: Tuple[int, ...] = ()
    feat_extract_stop_gradient: bool = True

    # Reproduce the reference's norm_k quirk where the control (and only the
    # control) key is overwritten with a re-normalized hq key
    # (attention.py:489, attention_ocrbranch_ocr2hq2ocr.py:598). Off by
    # default; enable only for bit-parity with reference-trained checkpoints.
    ref_norm_k_quirk: bool = False

    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    # "auto" = Pallas flash kernel on TPU, jnp reference on CPU;
    # "xla" | "xla_dpa" | "pallas" to force a backend.
    attn_impl: str = "auto"
    # sow attention probabilities into the 'intermediates' collection for
    # visualization (forces the xla backend; the reference's attn-map
    # harness, pipeline_dit4sr.py:1135-1202)
    capture_attention: bool = False
    # inference-only: control projections are algebraically folded
    # (W_ctrl @ W_base as one matmul); requires params transformed by
    # models.mmdit.fold_control_projections
    folded_control: bool = False
    # inference-only: attention/FFN Dense layers run w8a8 on the int8 MXU
    # (x1.16/x1.28 measured at MMDiT shapes, tools/int8_layer_probe.py);
    # requires params transformed by ops.quant.quantize_mmdit_params
    w8a8: bool = False
    # remat transformer blocks to trade FLOPs for HBM during training
    remat: bool = False

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def num_streams(self) -> int:
        return len(self.streams)

    def with_(self, **kw) -> "MMDiTConfig":
        return dataclasses.replace(self, **kw)


def mmdit_base() -> MMDiTConfig:
    """The `dit4sr` variant (reference model_dit4sr/transformer_sd3.py)."""
    return MMDiTConfig()


def mmdit_ocr2hq() -> MMDiTConfig:
    """`dit4sr_ocrbranch_ocr2hq` (transformer_sd3_ocrbranch_ocr2hq.py)."""
    return MMDiTConfig(
        streams=("hq", "control", "ocr"),
        ffn_couplings=(("control", "hq"), ("ocr", "hq")),
        feat_extract="ocr",
    )


def mmdit_ocr2hq2ocr() -> MMDiTConfig:
    """`dit4sr_ocrbranch_ocr2hq2ocr` (transformer_sd3_ocrbranch_ocr2hq2ocr.py)."""
    return MMDiTConfig(
        streams=("hq", "control", "ocr"),
        ffn_couplings=(("control", "hq"), ("ocr", "hq"), ("hq", "ocr")),
        feat_extract="ocr",
    )


def mmdit_tiny(**kw) -> MMDiTConfig:
    """Tiny geometry for tests: same structure, trivial FLOPs."""
    base = MMDiTConfig(
        sample_size=16,
        num_layers=2,
        attention_head_dim=8,
        num_attention_heads=4,
        joint_attention_dim=24,
        caption_projection_dim=32,
        pooled_projection_dim=16,
        pos_embed_max_size=24,
        dual_attention_layers=(0,),
        dtype=jnp.float32,
    )
    return base.with_(**kw)


@dataclass(frozen=True)
class VAEConfig:
    """SD3 AutoencoderKL geometry (reference loads it from
    stable-diffusion-3.5-medium; initialize.py:311)."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 1.5305
    shift_factor: float = 0.0609
    sample_size: int = 512
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    def with_(self, **kw) -> "VAEConfig":
        return dataclasses.replace(self, **kw)


def vae_tiny(**kw) -> VAEConfig:
    base = VAEConfig(
        latent_channels=4,
        block_out_channels=(8, 8, 16, 16),
        layers_per_block=1,
        norm_num_groups=4,
        sample_size=64,
        dtype=jnp.float32,
    )
    return base.with_(**kw)


# ---------------------------------------------------------------------------
# Scheduler / sampler configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SchedulerConfig:
    """FlowMatchEulerDiscrete (SD3.5-medium: shift=3.0)."""

    num_train_timesteps: int = 1000
    shift: float = 3.0


@dataclass(frozen=True)
class SamplerConfig:
    """Inference-time knobs (reference run_configs/val/*.yaml + test/test.py)."""

    num_inference_steps: int = 40
    guidance_scale: float = 1.0       # CFG active iff > 1 (pipeline_dit4sr.py:730)
    start_point: str = "noise"        # "noise" | "lr"  (pipeline_dit4sr.py:1024-1034)
    latent_tiled_size: int = 64
    latent_tiled_overlap: int = 24
    align_method: str = "adain"       # "adain" | "wavelet" | "nofix"
    upscale: int = 4
    process_size: int = 512
    # Training-free block caching (Delta-DiT, arXiv 2406.01125 — absent in the
    # reference, whose protocol always runs every block every step). When
    # cache_interval > 1 and cache_span = (lo, hi), the contribution of blocks
    # [lo, hi) is recomputed only every cache_interval-th denoise step and
    # reused (as a hidden-state delta) in between. (1, None) = exact baseline.
    cache_interval: int = 1
    cache_span: Optional[Tuple[int, int]] = None


# ---------------------------------------------------------------------------
# TESTR config
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TESTRConfig:
    """Deformable-DETR text spotter (reference testr/adet/config/defaults.py:340-369)."""

    d_model: int = 256
    nheads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 1024
    dropout: float = 0.1
    num_feature_levels: int = 4
    enc_n_points: int = 4
    dec_n_points: int = 4
    num_queries: int = 100
    num_ctrl_points: int = 16
    max_text_len: int = 25
    voc_size: int = 96                # charset size; +1 pad class in CE
    num_classes: int = 1
    sigmoid_offset: bool = True       # used with point supervision
    # fused DiT features: 24 layers x inner_dim tokens grouped into 4 levels
    num_dit_layers: int = 24
    dit_dim: int = 1536
    feat_extract: str = "hq+control"  # matches MMDiTConfig.feat_extract
    inference_th_test: float = 0.45
    # loss weights (transformer_detector.py:44-75)
    point_class_weight: float = 2.0
    point_coord_weight: float = 5.0
    point_text_weight: float = 4.0
    box_class_weight: float = 2.0
    box_coord_weight: float = 5.0
    giou_weight: float = 2.0
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    aux_loss: bool = True
    # recognition-CE weight on PAD positions (target == voc_size). The
    # reference averages uniformly over all max_text_len positions
    # (adet/modeling/testr/losses.py loss_texts F.cross_entropy) — with
    # short words most
    # positions are pad, and a from-scratch recognizer can sit at a low
    # loss by emitting pad everywhere while real characters stay at
    # chance (observed in the OCR quality probe). 1.0 = reference parity;
    # <1 rebalances gradient toward real characters.
    text_pad_weight: float = 1.0
    # static padding bound for per-image text instances (XLA ragged handling)
    max_instances: int = 32
    dtype: Any = jnp.float32          # fp32: deformable attn is precision-sensitive
    param_dtype: Any = jnp.float32
    # remat encoder/decoder layers: required for batch>=2 backward on the
    # axon TPU runtime (full-graph backward crashes the remote compiler)
    # and cheap — TESTR is small next to the MMDiT
    remat: bool = True
    # encoder remat granularity when remat=True: "layer" remats the whole
    # encoder layer (lowest memory — the full stage-3 joint step needs it:
    # 17.0 GB vs the chip's 15.75 GB with "ffn"); "ffn" saves the deformable
    # -attention residuals and remats only the FFN (~17% faster standalone
    # TESTR training when memory allows)
    encoder_remat: str = "layer"
    # "auto" matcher: exact host Hungarian on CPU, on-device auction on TPU
    # (axon does not support host callbacks)
    matcher_impl: str = "auto"
    # prefilter each matching to the K lowest-min-cost queries before the
    # solve (matcher.py solve_assignment): the stacked auction's per-round
    # work is O(B*I*Q) and the encoder has Q=16k proposals for <=32 targets.
    # 0 disables (exact full-Q solve).
    matcher_topk: int = 256
    # deformable-attention sampling backend: "auto" = Pallas VMEM-gather
    # kernel on TPU (ops/deform_attn.py), XLA gather on CPU / non-uniform
    # levels; "xla" / "pallas" force one.
    deform_impl: str = "auto"

    def with_(self, **kw) -> "TESTRConfig":
        return dataclasses.replace(self, **kw)


def testr_tiny(**kw) -> TESTRConfig:
    base = TESTRConfig(
        d_model=32,
        nheads=4,
        num_encoder_layers=1,
        num_decoder_layers=1,
        dim_feedforward=32,
        num_queries=10,
        num_ctrl_points=4,
        max_text_len=5,
        num_dit_layers=2,
        dit_dim=32,
        max_instances=4,
    )
    return base.with_(**kw)


# ---------------------------------------------------------------------------
# Training config
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class OptimConfig:
    lr: float = 1e-5
    testr_lr: float = 1e-5
    weight_decay: float = 1e-2
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    max_grad_norm: float = 1.0
    # the diffusers get_scheduler family (train_dit4sr.py:95): constant |
    # constant_with_warmup | linear | cosine | cosine_with_restarts |
    # polynomial
    lr_scheduler: str = "constant"
    lr_warmup_steps: int = 0
    lr_num_cycles: int = 1          # cosine_with_restarts
    lr_power: float = 1.0           # polynomial
    lr_end: float = 1e-7            # polynomial floor
    # reference offers AdamW8bit via bitsandbytes (initialize.py:563-590);
    # here "adamw" (fp32 state), "adamw_bf16" (bf16 1st/2nd moments), or
    # "adamw_8bit" (block-wise int8 moments, train/adam8bit.py — the direct
    # bnb AdamW8bit equivalent at ~1 byte/param/moment)
    optimizer: str = "adamw"
    quant_block_size: int = 256     # adamw_8bit per-block scale granularity


@dataclass(frozen=True)
class TrainConfig:
    """Three-stage recipe (reference run_configs/train/JIHYE_train_stage*.yaml)."""

    stage: str = "stage3"             # stage1: diff only; stage2: ocr only; stage3: joint
    batch_size: int = 4
    gradient_accumulation_steps: int = 16
    num_train_steps: int = 10_000
    ocr_loss_weight: float = 0.01
    # substring match on flattened param paths, like the reference's
    # finetune_layer_names (initialize.py:460-558). Empty = train everything.
    finetune_layer_names: Tuple[str, ...] = (
        "control_conv",
        "q_control",
        "k_control",
        "v_control",
        "out_control",
    )
    # separate list for the spotter, like the reference's per-module
    # ts_module.finetune_layer_names (initialize.py:533-543); empty = the
    # whole TESTR trains (the only mode the reference supports)
    testr_finetune_layer_names: Tuple[str, ...] = ()
    # logit-normal timestep sampling (train_dit4sr.py:247-256)
    weighting_scheme: str = "logit_normal"
    logit_mean: float = 0.0
    logit_std: float = 1.0
    mode_scale: float = 1.29
    precondition_outputs: bool = True
    # EMA of the trainable partition (0 = off, the reference's only mode).
    # Standard diffusion-finetune practice: eval/export uses
    # train_step.ema_params(state, mask); warmup ramp min(d, (1+t)/(10+t))
    ema_decay: float = 0.0
    # per-module gradient-norm metrics ("gn/<module>/<submodule>"), the
    # reference's grads-by-name txt dumps (train_dit4sr.py:407-479)
    log_grad_norms: bool = False
    # LoRA finetuning (models/lora.py): >0 adds an "mmdit_lora" adapter tree
    # to the train params, trains ONLY it (set finetune_layer_names to
    # ("mmdit_lora",)), and merges it into the MMDiT kernels inside the loss.
    # Beyond the reference (its recipes finetune full control branches).
    lora_rank: int = 0
    lora_scale: float = 1.0
    null_text_ratio: float = 0.1
    seed: int = 42
    checkpointing_steps: int = 500
    # overlap checkpoint disk writes with training (the device->host copy
    # stays synchronous in both modes so donation is safe)
    async_checkpointing: bool = False
    # "host_staged": foreground device->host pull + background disk-writer
    # thread — works on the axon TPU runtime, where "orbax" (orbax's own
    # async save) stalls in its background device->host pull (CLAUDE.md).
    # "device_staged": on-device snapshot (milliseconds) + background pull
    # AND write — the ~7 min/save pull at stage-3 geometry fully overlaps
    # training, at the cost of transient HBM for the snapshot (trainable
    # partition + opt state when checkpoint_frozen_once is on). MEASURED
    # LIMIT: at full stage-3 geometry (2.64B params, 16 GB v5e) the ~4.8 GB
    # snapshot does not fit next to the train step's working set — the step
    # after the first save dies RESOURCE_EXHAUSTED. Use host_staged there;
    # device_staged needs snapshot-sized HBM headroom.
    async_checkpoint_mode: str = "host_staged"
    # partition-aware saves: write the frozen partition once, then only the
    # trainable params + optimizer state per step. Halves the device->host
    # pull that blocks the train loop on axon (~5.3 of ~10 GB at stage-3
    # geometry). Restore recombines; legacy full-tree ckpts still load.
    checkpoint_frozen_once: bool = True
    # lossy checkpoint transport: "" (exact fp32) or "bfloat16" — fp32 leaves
    # are cast to bf16 on DEVICE before the device->host pull, halving the
    # bytes moved over the ~25-34 MB/s axon tunnel (the pull, not the disk
    # write, is what blocks the loop: 409-465 s/save at stage-3 geometry).
    # Restore casts back to fp32 (a transport.json marker makes checkpoints
    # self-describing). Opt-in: bf16 masters lose ~3 decimal digits — the
    # standard large-model bf16-checkpoint tradeoff, fine for resumes, not
    # for bit-exact reproduction.
    checkpoint_transport_dtype: str = ""
    # in-training validation cadence (reference train_dit4sr.py:519-748 runs
    # the full pipeline inside training); 0 = off, or pass val_samples to
    # Trainer.fit and set a step interval
    validation_steps: int = 0
    validation_num_inference_steps: int = 20
    # store FROZEN params in the model's compute dtype (bf16) instead of the
    # fp32 master layout: they are never updated, and the forward casts to
    # compute dtype anyway — saves ~4.7 GB at SD3.5-medium size, which is
    # what lets full-geometry finetuning fit one 16 GB v5e chip
    frozen_params_in_compute_dtype: bool = False
    optim: OptimConfig = field(default_factory=OptimConfig)


# ---------------------------------------------------------------------------
# Parallelism config
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MeshConfig:
    """Logical mesh axes. The reference only has DDP (SURVEY.md §2.3); here a
    single mesh gives data, fsdp (param/optimizer sharding), tensor
    (head/FFN-hidden sharding, up to num_heads chips), seq (ring attention
    over the token axis, parallel/ring_attention.py), and pipe (GPipe block
    pipelining, parallel/pipeline.py) axes. There is no expert axis: none of
    the reference's models are MoE."""

    data: int = 1
    fsdp: int = 1
    tensor: int = 1
    seq: int = 1
    pipe: int = 1

    @property
    def axis_names(self) -> Tuple[str, ...]:
        return ("data", "fsdp", "tensor", "seq", "pipe")

    @property
    def shape(self) -> Tuple[int, ...]:
        return (self.data, self.fsdp, self.tensor, self.seq, self.pipe)


# ---------------------------------------------------------------------------
# YAML loading (reference uses OmegaConf; we map YAML into the dataclasses)
# ---------------------------------------------------------------------------


_DTYPE_NAMES = {
    "float32": jnp.float32,
    "fp32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "float16": jnp.float16,
    "fp16": jnp.float16,
}


def _coerce(v, tp):
    """Coerce a YAML value to the annotated field type. Handles the two YAML
    footguns: string annotations (PEP 563 makes `f.type` a *string*, so type
    checks need `typing.get_type_hints`) and numeric strings (`5e-5` without
    a dot parses as a string under YAML 1.1)."""
    import typing

    if tp is None:
        return tuple(v) if isinstance(v, list) else v
    if dataclasses.is_dataclass(tp) and isinstance(v, Mapping):
        return _build(tp, v)

    origin = typing.get_origin(tp)
    args = typing.get_args(tp)
    if origin is typing.Union:  # Optional[X] and friends
        if v is None:
            return None
        for a in args:
            if a is not type(None):
                return _coerce(v, a)
        return v
    if isinstance(v, (list, tuple)):
        if origin is tuple and args:
            if len(args) == 2 and args[-1] is Ellipsis:
                return tuple(_coerce(x, args[0]) for x in v)
            if len(args) == len(v):
                return tuple(_coerce(x, a) for x, a in zip(v, args))
        return tuple(tuple(x) if isinstance(x, list) else x for x in v)
    if tp is Any:
        if isinstance(v, str) and v in _DTYPE_NAMES:
            return _DTYPE_NAMES[v]
        return v
    try:
        if tp is float and isinstance(v, (str, int)):
            return float(v)
        if tp is int and not isinstance(v, bool):
            iv = int(float(v)) if isinstance(v, str) else int(v)
            if float(iv) == float(v):
                return iv
        if tp is bool and isinstance(v, str):
            return v.strip().lower() in ("1", "true", "yes", "on")
    except (TypeError, ValueError):
        pass
    return v


def _build(cls, data: Mapping[str, Any]):
    import typing

    hints = typing.get_type_hints(cls)
    kw = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        kw[f.name] = _coerce(data[f.name], hints.get(f.name))
    return cls(**kw)


def load_yaml_config(path: str) -> dict:
    """Load a YAML experiment file into {section: dataclass} configs."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    sections = {
        "model": MMDiTConfig,
        "vae": VAEConfig,
        "scheduler": SchedulerConfig,
        "sampler": SamplerConfig,
        "testr": TESTRConfig,
        "train": TrainConfig,
        "mesh": MeshConfig,
    }
    out = {}
    for key, cls in sections.items():
        if key in raw and isinstance(raw[key], Mapping):
            out[key] = _build(cls, raw[key])
    return out
