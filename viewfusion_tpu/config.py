"""Typed configuration tree for ViewFusion-TPU.

Replaces the reference's schema-less YAML dicts with scattered ``.get``
defaults (reference: experiment.py:40-50, 112-113, 219-223) by an explicit
dataclass tree.  The YAML *schema* is kept identical to the reference's
``configs/*.yaml`` so that every reference config loads 1:1.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import yaml


@dataclass(frozen=True)
class BetaScheduleConfig:
    """One noise schedule (reference: model/view_fusion.py:330-362)."""

    schedule: str = "linear"
    num_timesteps: int = 2000
    linear_start: float = 1e-6
    linear_end: float = 1e-2
    cosine_s: float = 8e-3

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "BetaScheduleConfig":
        return cls(**{k: v for k, v in d.items() if k in _field_names(cls)})


@dataclass(frozen=True)
class DiffusionConfig:
    """ViewFusion diffusion wrapper params (reference: experiment.py:96-101).

    ``phases`` holds the train/test schedules; the reference installs the
    *train* schedule even for inference (experiment.py:102) — reproduced by
    ``active_phase`` defaulting to "train".
    """

    phases: Dict[str, BetaScheduleConfig] = field(
        default_factory=lambda: {
            "train": BetaScheduleConfig(),
            "test": BetaScheduleConfig(
                num_timesteps=1000, linear_start=1e-4, linear_end=0.09
            ),
        }
    )
    weighting_train: bool = True
    weighting_inference: bool = True
    active_phase: str = "train"

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "DiffusionConfig":
        phases = {
            name: BetaScheduleConfig.from_dict(sched)
            for name, sched in d.get("beta_schedule", {}).items()
        }
        return cls(
            phases=phases or cls().phases,
            weighting_train=d.get("weighting_train", True),
            weighting_inference=d.get("weighting_inference", True),
        )


@dataclass(frozen=True)
class UNetConfig:
    """Denoiser UNet hyper-params (reference: model/unet.py:8-21).

    Reference defaults differ from the paper config; the paper config
    (configs/small-v100-4.yaml:20-30) is image 64, in 6, out 6, inner 64,
    mults (1,2,3,5), res_blocks 3, attention at 16x16.
    """

    image_size: int = 128
    in_channel: int = 6
    out_channel: int = 3
    inner_channel: int = 32
    norm_groups: int = 32
    channel_mults: Tuple[int, ...] = (1, 2, 4, 8, 8)
    attn_res: Tuple[int, ...] = (8,)
    res_blocks: int = 3
    dropout: float = 0.0
    with_noise_level_emb: bool = True

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "UNetConfig":
        d = dict(d)
        for key in ("channel_mults", "attn_res"):
            if key in d:
                d[key] = tuple(d[key])
        return cls(**{k: v for k, v in d.items() if k in _field_names(cls)})


@dataclass(frozen=True)
class DiTConfig:
    """DiT denoiser hyper-params (TPU extension family, models/dit.py).
    Shares image_size/in_channel/out_channel field names with UNetConfig
    so the trainer can size inputs for either backbone."""

    image_size: int = 64
    in_channel: int = 6
    out_channel: int = 6
    patch_size: int = 4
    hidden_size: int = 256
    depth: int = 8
    num_heads: int = 4
    mlp_ratio: int = 4

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "DiTConfig":
        return cls(**{k: v for k, v in d.items() if k in _field_names(cls)})


@dataclass(frozen=True)
class SplitConfig:
    """One dataset split (reference: configs/*.yaml data.params.{train,test})."""

    path: str = ""
    mode: str = "train"
    start_shard: int = 0
    end_shard: int = 3
    size: int = 8751  # default test-set size, reference experiment.py:198
    # Shard format: "auto" feeds from pre-decoded `.rec` twins
    # (data/rawrec.py) when present, falling back to the reference's
    # PNG tars; "raw"/"tar" force one or the other.
    format: str = "auto"

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "SplitConfig":
        return cls(**{k: v for k, v in d.items() if k in _field_names(cls)})


@dataclass(frozen=True)
class DataConfig:
    """Data pipeline params (reference: configs/*.yaml ``data.params``)."""

    batch_size: int = 112
    max_views: int = 6
    # Reference dataloader workers (experiment.py:181).  Values > 1 map
    # onto the native loader's decode-thread count when tpu.native_threads
    # is not set explicitly (see trainer._init_dataloaders).
    num_workers: int = 1
    train: SplitConfig = field(default_factory=lambda: SplitConfig(mode="train"))
    test: SplitConfig = field(default_factory=lambda: SplitConfig(mode="test"))
    validation: SplitConfig = field(default_factory=lambda: SplitConfig(mode="val"))
    # Total stored views per object in NMR ShapeNet (data/nmr_dataset.py:11).
    total_views: int = 24

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "DataConfig":
        params = d.get("params", d)
        kwargs: Dict[str, Any] = {
            k: v
            for k, v in params.items()
            if k in _field_names(cls) and k not in ("train", "test", "validation")
        }
        for split in ("train", "test", "validation"):
            if split in params:
                kwargs[split] = SplitConfig.from_dict(params[split].get("params", {}))
        return cls(**kwargs)


@dataclass(frozen=True)
class TrainConfig:
    """Training-loop knobs.

    Defaults mirror the reference's ``.get`` fallbacks:
    max_it / validate_every / validate_from / checkpoint_every / log_every
    (experiment.py:219-223), lr warmup & decay (experiment.py:112-116),
    peak_lr hardcoded 1e-4 (experiment.py:116).
    """

    max_it: int = 1_000_000
    validate_every: int = 5_000
    validate_from: int = 100_000
    checkpoint_every: int = 100
    log_every: int = 100
    peak_lr: float = 1e-4
    lr_warmup: int = 2500
    decay_it: int = 4_000_000
    decay_rate: float = 0.16
    seed: int = 0
    # Intermediate frames captured during reverse sampling
    # (reference default: model/view_fusion.py:180 sample_num=8).
    sample_num: int = 8
    # TPU-specific (no reference equivalent): compute dtype for the UNet.
    compute_dtype: str = "bfloat16"
    # Rematerialize UNet stage activations to trade FLOPs for HBM.
    remat: bool = False
    # Mesh shape overrides; 0 = auto (data = largest divisor of the batch).
    mesh_data: int = 0
    mesh_view: int = 1
    # Capture a jax.profiler trace for steps
    # [profile_from, profile_from + profile_steps) into <run>/profile
    # (SURVEY.md §5: the reference has no tracing at all).
    profile_from: int = 0
    profile_steps: int = 0
    # Use the native C++ shard loader when built (data/native_loader.py).
    native_loader: Optional[bool] = None
    native_threads: int = 4
    # Eval-time sampler: "ddpm" = reference-parity full ancestral chain;
    # "ddim" = fast strided sampler (models/view_fusion.py generate_ddim);
    # "dpm" = DPM-Solver++(2M), second-order ODE solver (deterministic —
    # same quality class as DDIM eta=0); "dpm_sde" = its SDE variant
    # (per-step noise injection: self-corrects model error like eta=1
    # while keeping the second-order update).
    sampler: str = "ddpm"
    ddim_steps: int = 50
    ddim_eta: float = 1.0
    dpm_steps: int = 20

    def __post_init__(self):
        if self.sampler not in ("ddpm", "ddim", "dpm", "dpm_sde"):
            raise ValueError(
                f"unknown tpu.sampler {self.sampler!r}; options: ddpm "
                "(reference ancestral), ddim, dpm, dpm_sde"
            )
        if self.grad_accum < 1:
            raise ValueError(
                f"tpu.grad_accum must be >= 1, got {self.grad_accum}"
            )
    # Exponential moving average of params (standard diffusion practice;
    # the reference has none). 0 = off; typical 0.9999. Eval/inference
    # use the EMA weights when enabled.
    ema_decay: float = 0.0
    # Dump generated + ground-truth images during eval into
    # <run>/images-<it>/{generated,target}/ for the offline metric CLI
    # (utils/compute_metrics.py) — the reference's eval image folders
    # (utils/compute_metrics.py:10) were produced by ad-hoc code.
    eval_dump_images: bool = False
    # Exact-epoch eval: iterate the test shards exactly once per eval
    # (resampling off; final partial batch padded + masked) so PSNR/SSIM
    # cover each test sample exactly once.  Default False matches the
    # reference's resampled-stream `.with_epoch(size)` semantics
    # (experiment.py:198-208).  Single-process only (per-host shard
    # subsets would finish at different step counts).
    eval_exact_epoch: bool = False
    # Split visualization/inference reverse chains into K jitted
    # dispatches of T/K steps each (identical math + RNG to one call;
    # models/view_fusion.py chain_segment).  Keeps each device execution
    # short — preemption windows, per-execution runtime limits on shared
    # dev rigs.  1 = single dispatch (default).
    chain_segments: int = 1
    # Eval view-count draw when packed_views is on.  Default (False):
    # the packed eval derives a DETERMINISTIC stratified count multiset
    # per batch (identical across evals -> low metric variance between
    # checkpoints; documented divergence from the reference's iid eval
    # draw, experiment.py:329 — see PARITY.md).  True: eval runs the
    # dense path with fresh iid U{1..max_views} host draws — exact
    # reference eval semantics at masked-row FLOP cost.
    eval_iid_counts: bool = False
    # Also evaluate on a held-in TRAIN-split stream at every gated eval
    # and log ssim_train/psnr_train next to the test metrics.  A
    # widening train/test gap is generalization failure; both curves
    # collapsing together points at the sampler/eval path instead
    # (overfitting diagnosis for small datasets; no reference
    # equivalent).  Best-model selection still uses test metrics only.
    eval_train_split: bool = False
    # Packed training: run the UNet on exactly sum(view_count) rows
    # (stratified per-batch view counts keep the row budget static) —
    # ~1.7x fewer UNet FLOPs at max_views=6 vs the dense masked layout.
    # Default off: per-sample iid counts exactly match the reference
    # (experiment.py:277-279).
    packed_views: bool = False
    # Asynchronous checkpoint saves: the step loop pays one fused HBM
    # snapshot; D2H + serialize + write run on a background writer
    # thread (training/checkpoint.py save_async).  Disable on hosts
    # where background transfers contend with device dispatch.
    async_checkpoint: bool = True
    # Feed train/eval image batches to the device as uint8 and
    # normalize (x.astype(float32)/255) inside the jitted step: 4x
    # fewer host->device bytes and no host-side float conversion.
    # The cast is exact and the divide is the same IEEE op the host
    # would run; XLA fusing it into downstream consumers can differ
    # from host normalization by ~1 ulp (pinned at rtol 2e-6 by
    # tests/test_trainer.py::test_u8_feed_matches_float_feed).
    u8_feed: bool = True
    # ZeRO-1: shard the Adam m/v state over the mesh's data axis
    # (parallel/mesh.py zero1_shard_specs) instead of replicating it —
    # cuts per-chip optimizer memory by the data-axis size (2x params
    # worth of f32 at stake).  XLA inserts the update-side collectives
    # from the sharding annotations.  Multi-host: checkpoint saves of
    # the partitioned state are COLLECTIVE (process_allgather before
    # host 0 serializes); the trainer's save gates are deterministic
    # across hosts, and SIGTERM final saves assume the preemption
    # signal reaches every host (TPU maintenance events do).
    shard_opt_state: bool = False
    # Gradient accumulation: split each optimizer step's batch into K
    # microbatches of batch_size/K rows, lax.scan the fwd+bwd over them
    # inside ONE jitted dispatch (grads accumulate in the scan carry),
    # then apply a single Adam update.  data.batch_size stays the
    # EFFECTIVE batch — grad_accum trains the reference's global batch
    # (112) on one chip with activation HBM bounded by one microbatch.
    # 1 = off (the plain fused step, bit-identical to before).
    grad_accum: int = 1
    # Fuse each train batch into 3 device puts instead of 6
    # (training/fused_feed.py): one batch-major image buffer
    # (target+cond) + two packed int32 metadata arrays.  Wins when the
    # runtime's per-put fixed cost dominates (tunneled links —
    # scripts/probe_h2d.py measures it); numerics identical to the
    # split feed.  Requires packed_views; absolute conditioning only.
    fused_feed: bool = False


@dataclass(frozen=True)
class Config:
    """Top-level config; loads the reference YAML schema 1:1."""

    unet: UNetConfig = field(default_factory=UNetConfig)
    diffusion: DiffusionConfig = field(default_factory=DiffusionConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    denoise_net: str = "unet"
    relative: bool = False  # relative-conditioning variant (experiment.py:151)
    raw: Dict[str, Any] = field(default_factory=dict, compare=False)

    @property
    def denoiser(self):
        """Typed params of the ACTIVE denoiser family: UNetConfig for
        ``denoise_net: unet``, DiTConfig for ``dit`` (both expose
        image_size/in_channel/out_channel)."""
        if self.denoise_net == "dit":
            return DiTConfig.from_dict(
                self.raw.get("model", {}).get("denoise_net_params", {})
            )
        return self.unet

    @classmethod
    def from_dict(cls, raw: Dict[str, Any]) -> "Config":
        model = raw.get("model", {})
        train_kwargs = dict(
            max_it=model.get("max_it", 1_000_000),
            validate_every=model.get("validate_every", 5_000),
            validate_from=model.get("validate_from", 100_000),
            checkpoint_every=model.get("checkpoint_every", 100),
            log_every=model.get("log_every", 100),
            lr_warmup=raw.get("lr_warmup", 2500),
            decay_it=raw.get("decay_it", 4_000_000),
        )
        # TPU-only extension block; absent from reference configs.
        train_kwargs.update(
            {
                k: v
                for k, v in raw.get("tpu", {}).items()
                if k in _field_names(TrainConfig)
            }
        )
        return cls(
            unet=UNetConfig.from_dict(model.get("denoise_net_params", {})),
            diffusion=DiffusionConfig.from_dict(model.get("view_fusion_params", {})),
            data=DataConfig.from_dict(raw.get("data", {})),
            train=TrainConfig(**train_kwargs),
            denoise_net=model.get("denoise_net", "unet"),
            relative=model.get("relative", False),
            raw=raw,
        )

    def to_yaml(self) -> str:
        return yaml.dump(self.raw, default_flow_style=False)


def load_config(path: str) -> Config:
    """Load a reference-schema YAML config file (experiment.py:49-50)."""
    with open(path, "r") as f:
        raw = yaml.safe_load(f)
    return Config.from_dict(raw)


def _field_names(cls) -> List[str]:
    return [f.name for f in dataclasses.fields(cls)]
