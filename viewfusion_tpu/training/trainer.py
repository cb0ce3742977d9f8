"""Experiment orchestration: train / eval / inference.

Capability parity with the reference ``Experiment`` (experiment.py:26-691):
run-dir naming and config snapshot/restore, resume semantics, training
loop with checkpoint/validation gates, full-generation eval with
best-metric checkpoints, and the four inference modes (train-time vis
grid, extrapolation, autoregressive orbit, weight-map GIF).

TPU-native architecture (not a translation of the torch god-class):
  * one jitted, donated train step (loss+grad+Adam update fused by XLA)
    instead of eager loss/backward/step (experiment.py:286-293);
  * LR schedule inside optax instead of mutating param groups per step
    (experiment.py:265-267);
  * SPMD sharding over a device mesh replaces DDP: gradients and eval
    metrics are globally reduced by XLA collectives because the jitted
    computation operates on global arrays — no barriers, no reduce_dict
    (experiment.py:347-366, utils/dist.py);
  * loss is fetched asynchronously and synced only at log boundaries, so
    the device never stalls on host round-trips inside the hot loop.
"""

from __future__ import annotations

import datetime
import os
import threading
import time
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from viewfusion_tpu.config import load_config
from viewfusion_tpu.data.nmr import Batcher, create_nmr_stream, prefetch
from viewfusion_tpu.models.view_fusion import ViewFusion
from viewfusion_tpu.ops.metrics import compute_psnr, compute_ssim
from viewfusion_tpu.parallel.mesh import (
    MeshSpec,
    make_global_batch,
    make_mesh,
    replicate,
    zero1_shard_specs,
)
from jax.sharding import NamedSharding, PartitionSpec as P
from viewfusion_tpu.training import fused_feed
from viewfusion_tpu.training.checkpoint import Checkpoint
from viewfusion_tpu.training.logging import MetricLogger
from viewfusion_tpu.training.schedulers import lr_schedule
from viewfusion_tpu.utils.image import make_grid, to_uint8

__all__ = ["Experiment", "TrainState", "stratified_count_multiset"]


def _norm_img(x):
    """uint8 image batch -> float32 in [0, 1]; float passes through.

    Under tpu.u8_feed the host ships uint8 pixels (4x fewer H2D bytes)
    and this runs inside the jitted step.  The u8->f32 cast is exact
    and the /255 divide is the same IEEE op the host pipeline would
    run, but XLA may fuse the divide into downstream consumers with
    different intermediate rounding — equivalence to float feeding is
    ulp-level (~1e-7), pinned by
    tests/test_trainer.py::test_u8_feed_matches_float_feed."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / np.float32(255.0)
    return x


def stratified_count_multiset(b: int, max_views: int) -> np.ndarray:
    """The packed path's per-batch view-count multiset: each of
    1..max_views floor(b / max_views) times, with the b % max_views
    remainder filled by end-paired values (1, max_views, 2,
    max_views-1, ...) so the multiset mean stays (max_views + 1) / 2 —
    the mean of the reference's iid U{1..max_views} draw
    (experiment.py:277-279).  sum(counts) is therefore both static
    across batches (static packed shapes under jit) and work-matched to
    the reference's expected sum(view_count) per step."""
    counts = np.resize(np.arange(1, max_views + 1), b)
    r = b % max_views
    if r:
        lo, hi = 1, max_views
        tail = []
        while len(tail) < r:
            if r - len(tail) == 1:
                tail.append((max_views + 2) // 2)  # round(mean)
                break
            tail.append(lo)
            tail.append(hi)
            lo, hi = lo + 1, hi - 1
        counts[-r:] = tail
    return counts


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    # EMA shadow params; empty dict when tpu.ema_decay == 0
    ema_params: Any = struct.field(default_factory=dict)


@dataclass
class ExperimentArgs:
    """Flag surface parity with main.py:6-24."""

    config: Optional[str] = None
    src: Optional[str] = None
    train: bool = False
    eval: bool = False
    resume: bool = False
    inference: bool = False
    wandb: bool = False
    autoregressive: bool = False
    generate_gifs: bool = False
    extrapolate: bool = False
    gpu: bool = False  # accepted for CLI parity; device choice is JAX's


class Experiment:
    def __init__(self, args, log_root: str = "./logs"):
        self.args = args
        self.log_dict: Dict[str, Any] = {}

        # --- run dir + config (experiment.py:34-50) ---
        if args.inference or args.resume or args.eval:
            if args.src is None:
                raise ValueError(
                    "Source directory (-s, --src) must be provided."
                )
            self.out_dir = str(Path(args.src))
            exp_name = os.path.basename(os.path.normpath(args.src))
            self.config = load_config(os.path.join(args.src, "config.yaml"))
        else:
            config_name = os.path.splitext(os.path.basename(args.config))[0]
            now = datetime.datetime.now().strftime("%Y-%m-%dT%H-%M-%S")
            exp_name = "-".join((now, config_name))
            self.out_dir = os.path.join(log_root, exp_name)
            self.config = load_config(args.config)
        self.exp_name = exp_name

        cfg = self.config
        self.is_host0 = jax.process_index() == 0
        self.mesh = self._make_mesh()
        self.rng = np.random.default_rng(cfg.train.seed + jax.process_index())

        self.model = ViewFusion.from_config(cfg)
        self.max_views = cfg.data.max_views
        self.relative = cfg.relative
        self.cond_key = "relative_cond" if self.relative else "cond"
        self.angle_key = "relative_angle" if self.relative else "angle"

        if cfg.train.fused_feed and (
            not cfg.train.packed_views or self.relative
        ):
            raise ValueError(
                "tpu.fused_feed requires tpu.packed_views and absolute "
                "conditioning (training/fused_feed.py)"
            )


        self._init_model()
        self._init_dataloaders()

        self.logger = MetricLogger(
            self.out_dir,
            use_wandb=args.wandb and self.is_host0,
            run_id=self.run_id,
            exp_name=exp_name,
            config=cfg.raw,
            is_host0=self.is_host0,
        )
        self.run_id = self.logger.run_id

    # ------------------------------------------------------------------
    def _make_mesh(self):
        """Device mesh sized to the batch: the data axis must divide the
        global batch, so use the largest compatible divisor of the device
        count (config-overridable via tpu.mesh_data/mesh_view)."""
        cfg = self.config
        ndev = len(jax.devices())
        view = max(1, cfg.train.mesh_view)
        data = cfg.train.mesh_data
        if data <= 0:
            # largest divisor of the sharded batch dim that fits the
            # devices: under grad_accum the device batch is one
            # microbatch (d | batch/K also implies d | batch, so the
            # full-batch eval arrays stay shardable)
            shard_rows = max(
                1, cfg.data.batch_size // cfg.train.grad_accum
            )
            limit = max(1, ndev // view)
            data = max(
                d for d in range(1, limit + 1)
                if shard_rows % d == 0
            )
        used = data * view
        if used < ndev and self.is_host0:
            print(
                f"mesh uses {used}/{ndev} devices (data={data} x "
                f"view={view}); adjust batch_size or tpu.mesh_* to use all"
            )
        return make_mesh(MeshSpec(data=data, view=view),
                         devices=jax.devices()[:used])

    # ------------------------------------------------------------------
    def _init_model(self) -> None:
        """Model/optimizer/checkpoint init (experiment.py:90-156)."""
        cfg = self.config  # denoiser validated by ViewFusion.from_config

        self.tx = optax.adam(
            learning_rate=lr_schedule(
                peak_lr=cfg.train.peak_lr,
                peak_it=cfg.train.lr_warmup,
                decay_rate=cfg.train.decay_rate,
                decay_it=cfg.train.decay_it,
            ),
            b1=0.9, b2=0.999, eps=1e-8,  # torch Adam defaults
        )
        self._lr_fn = lr_schedule(
            peak_lr=cfg.train.peak_lr, peak_it=cfg.train.lr_warmup,
            decay_rate=cfg.train.decay_rate, decay_it=cfg.train.decay_it,
        )

        hw = cfg.denoiser.image_size
        cc = cfg.denoiser.in_channel - 3
        cond0 = jnp.zeros((1, 1, hw, hw, cc), jnp.float32)
        y0 = jnp.zeros((1, hw, hw, 3), jnp.float32)
        params = jax.jit(self.model.init)(
            jax.random.PRNGKey(cfg.train.seed), cond0, y0
        )
        self.state = TrainState(
            params=params,
            opt_state=jax.jit(self.tx.init)(params),
            step=jnp.zeros((), jnp.int32),
            ema_params=(jax.tree_util.tree_map(jnp.copy, params)
                        if cfg.train.ema_decay > 0 else {}),
        )

        self.checkpoint = Checkpoint(
            self.out_dir,
            config_yaml=cfg.to_yaml(),
            is_host0=self.is_host0,
        )

        # train/resume loads rolling; eval/inference loads best
        # (experiment.py:132-145)
        if self.args.train or self.args.resume:
            ckpt_name = "model.msgpack"
        else:
            ckpt_name = "best_model_all.msgpack"
        load_dict: Dict[str, Any] = {}
        if not self.checkpoint.exists(ckpt_name) and (
            self.args.eval or self.args.inference
        ) and not self.args.train:
            # eval/inference on random weights is never intended; the
            # reference fails on the missing file too (torch.load).
            raise FileNotFoundError(
                f"{ckpt_name} not found in {self.out_dir}; run training "
                "first or point -s at a run with a best checkpoint"
            )
        if self.checkpoint.exists(ckpt_name):
            try:
                self.state, load_dict = self.checkpoint.load(
                    ckpt_name, self.state
                )
            except (KeyError, ValueError):
                # Params-only checkpoint (e.g. converted from the
                # reference's torch weights): restore params, keep a
                # fresh optimizer state.
                restored, load_dict = self.checkpoint.load(
                    ckpt_name, {"params": self.state.params}
                )
                self.state = self.state.replace(params=restored["params"])
            if self.is_host0:
                print(f"Loaded checkpoint {ckpt_name}.")

        self.it = load_dict.get("it", -1)
        self.time_elapsed = load_dict.get("t", 0.0)
        self.run_id = load_dict.get("run_id", None)
        self.best_metrics = {
            "ssim": load_dict.get("ssim", -np.inf),
            "psnr": load_dict.get("psnr", -np.inf),
        }

        self.state = replicate(self.state, self.mesh)
        self._opt_shardings = None
        if cfg.train.shard_opt_state:
            self._opt_shardings = zero1_shard_specs(
                self.state.opt_state, self.mesh
            )
            # Partition from HOST values: every process holds the full
            # opt state (identical init / restored checkpoint), and
            # device_put of a host array onto a multi-process sharding
            # slices each host's shards locally — no collective needed
            # here.  Saves gather it back (checkpoint._gather_partitioned).
            opt_host = jax.tree_util.tree_map(
                lambda x: np.asarray(x) if hasattr(x, "shape") else x,
                self.state.opt_state,
            )
            self.state = self.state.replace(
                opt_state=jax.device_put(opt_host, self._opt_shardings)
            )
        step_impl = (
            self._train_step_accum_impl
            if self.config.train.grad_accum > 1
            else self._train_step_impl
        )
        self._train_step = jax.jit(step_impl, donate_argnums=(0,))

        # Each sampler entry normalizes a possibly-uint8 cond on device
        # (tpu.u8_feed) — inside jit, so XLA fuses the u8->f32 divide
        # into the first consumer and the H2D transfer stays 4x smaller.
        def _gen(params, key, cond, vc, angle, packed_idx=None,
                 capture_aux=True):
            return self.model.generate(
                params, key, _norm_img(cond), vc, angle,
                packed_idx=packed_idx, capture_aux=capture_aux,
                sample_num=self.config.train.sample_num,
            )

        def _gen_ddim(params, key, cond, vc, angle, packed_idx=None):
            return self.model.generate_ddim(
                params, key, _norm_img(cond), vc, angle,
                packed_idx=packed_idx,
                num_steps=self.config.train.ddim_steps,
                eta=self.config.train.ddim_eta,
            )

        def _gen_dpm(params, key, cond, vc, angle, packed_idx=None):
            return self.model.generate_dpm(
                params, key, _norm_img(cond), vc, angle,
                packed_idx=packed_idx,
                num_steps=self.config.train.dpm_steps,
                sde=self.config.train.sampler == "dpm_sde",
            )

        def _chain_segment(params, carry, ts, cond, vc, angle, **kw):
            return self.model.chain_segment(
                params, carry, ts, _norm_img(cond), vc, angle,
                sample_num=self.config.train.sample_num, **kw,
            )

        self._jit_generate = jax.jit(
            _gen, static_argnames=("capture_aux",)
        )
        self._jit_generate_ddim = jax.jit(_gen_ddim)
        self._jit_generate_dpm = jax.jit(_gen_dpm)
        self._jit_chain_segment = jax.jit(
            _chain_segment, static_argnames=("capture_aux",)
        )

    @property
    def _infer_params(self):
        """Weights used for generation: EMA shadow when enabled."""
        if self.config.train.ema_decay > 0 and self.state.ema_params:
            return self.state.ema_params
        return self.state.params

    def _eval_samples(self, key, device_batch):
        """Eval-time generation: reference-parity ancestral chain by
        default; fast DDIM when tpu.sampler == "ddim"; DPM-Solver++(2M)
        when "dpm"; packed per-step UNet rows when tpu.packed_views."""
        cond = device_batch[self.cond_key]
        vc = device_batch["view_count"]
        angle = device_batch[self.angle_key]
        packed_idx = None
        if "sample_idx" in device_batch:
            packed_idx = (device_batch["sample_idx"],
                          device_batch["view_idx"])
        if self.config.train.sampler == "ddim":
            return self._jit_generate_ddim(
                self._infer_params, key, cond, vc, angle,
                packed_idx=packed_idx,
            )
        if self.config.train.sampler in ("dpm", "dpm_sde"):
            return self._jit_generate_dpm(
                self._infer_params, key, cond, vc, angle,
                packed_idx=packed_idx,
            )
        # sampler name validated at config load (TrainConfig.__post_init__)
        if self.config.train.chain_segments > 1:
            # ancestral eval as K short dispatches (tpu.chain_segments):
            # bit-identical to one generate() call, but each device
            # execution stays under per-execution runtime limits
            out = self._generate_segmented(
                key, _norm_img(cond), vc, angle,
                self.config.train.chain_segments,
                packed_idx=packed_idx, capture_aux=False,
            )
            return out.generated_samples
        out = self._jit_generate(
            self._infer_params, key, cond, vc, angle,
            packed_idx=packed_idx, capture_aux=False,
        )
        return out.generated_samples

    def _microbatch_loss(self, params, batch, rng):
        """Training loss on one (micro)batch dict — shared by the plain
        fused step and the grad-accum scan body."""
        if "img" in batch:  # fused feed: slices + same-size bitcasts
            batch = fused_feed.unpack_batch(batch)
        target = _norm_img(batch["target"])
        cond = _norm_img(batch[self.cond_key])
        if self.config.train.packed_views:
            return self.model.loss_packed(
                params, rng,
                target, cond,
                batch["view_count"], batch[self.angle_key],
                batch["sample_idx"], batch["view_idx"],
            )
        return self.model.loss(
            params, rng,
            target, cond,
            batch["view_count"], batch[self.angle_key],
            deterministic=self.config.unet.dropout == 0.0,
        )

    def _apply_update(self, state: TrainState, grads, loss):
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        if self._opt_shardings is not None:
            # ZeRO-1: pin the layouts so the compiled step keeps m/v
            # partitioned and params replicated regardless of how
            # propagation would otherwise resolve the elementwise
            # update (a silent reshard here would defeat the donation
            # AND the memory saving)
            opt_state = jax.lax.with_sharding_constraint(
                opt_state, self._opt_shardings
            )
            params = jax.lax.with_sharding_constraint(
                params, NamedSharding(self.mesh, P())
            )
        decay = self.config.train.ema_decay
        ema = (
            jax.tree_util.tree_map(
                lambda e, p: decay * e + (1.0 - decay) * p,
                state.ema_params, params,
            )
            if decay > 0 else state.ema_params
        )
        return TrainState(params, opt_state, state.step + 1, ema), loss

    def _train_step_impl(self, state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(self._microbatch_loss)(
            state.params, batch, rng
        )
        return self._apply_update(state, grads, loss)

    def _train_step_accum_impl(self, state: TrainState, batch, rng):
        """tpu.grad_accum: K stacked microbatches -> ONE optimizer
        update, in one jitted dispatch.  ``lax.scan`` bounds activation
        HBM at a single microbatch while grads accumulate in the carry;
        the averaged gradient equals the full-batch gradient exactly
        (equal-size microbatches), so one step here is one reference
        step at data.batch_size (experiment.py:286-293) — modulo fp
        summation order.  Each microbatch draws its own t/gamma/noise
        from a folded key, matching the iid per-row draws of a single
        large batch."""
        from jax import lax

        n_micro = self.config.train.grad_accum

        def body(carry, xs):
            mb, k = xs
            loss, grads = jax.value_and_grad(self._microbatch_loss)(
                state.params, mb, jax.random.fold_in(rng, k)
            )
            g_acc, l_acc = carry
            return (
                jax.tree_util.tree_map(jnp.add, g_acc, grads),
                l_acc + loss,
            ), None

        init = (
            jax.tree_util.tree_map(jnp.zeros_like, state.params),
            jnp.zeros((), jnp.float32),
        )
        (g_sum, l_sum), _ = lax.scan(
            body, init, (batch, jnp.arange(n_micro))
        )
        grads = jax.tree_util.tree_map(lambda g: g / n_micro, g_sum)
        return self._apply_update(state, grads, l_sum / n_micro)

    # ------------------------------------------------------------------
    def _init_dataloaders(self) -> None:
        """Data streams (experiment.py:158-216).  Per-host batch =
        global batch // process_count (experiment.py:159-162)."""
        cfg = self.config
        nproc = jax.process_count()
        self.local_batch_size = max(1, cfg.data.batch_size // nproc)
        n_micro = cfg.train.grad_accum
        if self.local_batch_size % n_micro:
            raise ValueError(
                f"tpu.grad_accum={n_micro} must divide the per-host "
                f"batch {self.local_batch_size} "
                f"(data.batch_size // process_count)"
            )
        # Train-loader batch: one microbatch.  Each optimizer step
        # consumes grad_accum of them (data.batch_size effective rows).
        self.micro_batch_size = self.local_batch_size // n_micro
        seed = cfg.train.seed

        # Reference dataloader-worker knob (experiment.py:180-187): each
        # torch worker ran the whole read+decode pipeline.  Here decode
        # parallelism lives in the native loader's C++ threads, so
        # num_workers > 1 maps onto the decode-thread count unless the
        # tpu block pins native_threads explicitly; num_workers == 1 (the
        # common reference value) keeps the measured default — one torch
        # worker process is not comparable to one decode thread.
        native_threads = cfg.train.native_threads
        if ("native_threads" not in cfg.raw.get("tpu", {})
                and cfg.data.num_workers > 1):
            native_threads = cfg.data.num_workers
            if self.is_host0:
                print(f"data.num_workers={cfg.data.num_workers} -> "
                      f"{native_threads} native decode threads")

        self.train_loader: Optional[Iterator] = None
        if self.args.train:
            # materialize only what the train step consumes — all_views
            # alone is ~24x the transferred payload (B, 24, H, W, 3),
            # and needed_keys/n_cond_views push the trim into
            # process_sample so untouched views never convert to float
            train_keys = ["target", self.cond_key, self.angle_key]
            stream = create_nmr_stream(
                cfg.data.train, shuffle_buffer=1000, seed=seed,
                host_id=jax.process_index(), num_hosts=nproc,
                resample=True, relative=self.relative,
                native=cfg.train.native_loader,
                native_threads=native_threads,
                needed_keys=train_keys, n_cond_views=self.max_views,
                out_dtype=np.uint8 if cfg.train.u8_feed else np.float32,
            )
            self.train_loader = prefetch(
                iter(Batcher(stream, self.micro_batch_size,
                             n_cond_views=self.max_views,
                             keys=train_keys)),
                depth=2 * n_micro,
            )

        testset_size = cfg.data.test.size
        self.epoch_size = max(1, testset_size // self.local_batch_size)
        exact = cfg.train.eval_exact_epoch
        if exact and nproc > 1:
            raise ValueError(
                "tpu.eval_exact_epoch requires a single process: per-host "
                "shard subsets drain at different batch counts, which "
                "would deadlock the global-array eval collectives"
            )

        def val_loader():
            stream = create_nmr_stream(
                cfg.data.test, shuffle_buffer=0, seed=seed + 1,
                host_id=jax.process_index(), num_hosts=nproc,
                resample=not exact, relative=self.relative,
                needed_keys=["target", self.cond_key, self.angle_key],
                n_cond_views=self.max_views,
                out_dtype=np.uint8 if cfg.train.u8_feed else np.float32,
            )
            it = iter(Batcher(stream, self.local_batch_size,
                              n_cond_views=self.max_views,
                              keys=["target", self.cond_key,
                                    self.angle_key],
                              pad_final=exact))
            if exact:
                # one full pass over the shards, every sample exactly once
                yield from it
            else:
                # reference semantics: first epoch_size batches of the
                # reshuffled infinite stream (.with_epoch equivalent)
                for _ in range(self.epoch_size):
                    yield next(it)

        self.val_loader = val_loader

        # tpu.eval_train_split: a held-in eval stream over the TRAIN
        # shards with TEST-time sample semantics (no 10% target-leak),
        # same batch count as the test eval — logged as
        # ssim_train/psnr_train for overfitting diagnosis.
        self.train_eval_loader = None
        if cfg.train.eval_train_split and self.args.train:
            def train_eval_loader():
                stream = create_nmr_stream(
                    cfg.data.train, shuffle_buffer=0, seed=seed + 3,
                    host_id=jax.process_index(), num_hosts=nproc,
                    resample=True, relative=self.relative,
                    process_mode="test",
                    needed_keys=["target", self.cond_key,
                                 self.angle_key],
                    n_cond_views=self.max_views,
                    out_dtype=(np.uint8 if cfg.train.u8_feed
                               else np.float32),
                )
                it = iter(Batcher(stream, self.local_batch_size,
                                  n_cond_views=self.max_views,
                                  keys=["target", self.cond_key,
                                        self.angle_key]))
                for _ in range(self.epoch_size):
                    yield next(it)

            self.train_eval_loader = train_eval_loader

        # fixed 12-sample visualization batch, drawn once
        # (experiment.py:210-216)
        vis_stream = create_nmr_stream(
            cfg.data.test, shuffle_buffer=0, seed=seed + 2,
            resample=True, relative=self.relative,
        )
        self.val_vis_data = next(
            iter(Batcher(vis_stream, batch_size=12))
        )

    # ------------------------------------------------------------------
    def _host_prep(self, batch: Dict[str, np.ndarray],
                   view_count: np.ndarray,
                   packed_idx=None,
                   fused: bool = False) -> Dict[str, np.ndarray]:
        """Host-side batch assembly (pre-device-put)."""
        prepped = {
            "target": batch["target"],
            self.cond_key: batch[self.cond_key],
            self.angle_key: np.asarray(batch[self.angle_key]).reshape(-1),
            "view_count": view_count.astype(np.int32),
        }
        if "eval_mask" in batch:  # exact-epoch eval padding mask
            prepped["eval_mask"] = batch["eval_mask"]
        if packed_idx is not None:
            prepped["sample_idx"], prepped["view_idx"] = packed_idx
        if fused:  # 3 device puts instead of 6 (tpu.fused_feed)
            prepped = fused_feed.pack_batch(prepped)
        return prepped

    def _prep_batch(self, batch: Dict[str, np.ndarray],
                    view_count: np.ndarray,
                    packed_idx=None, fused: bool = False) -> Dict[str, Any]:
        return make_global_batch(
            self._host_prep(batch, view_count, packed_idx, fused),
            self.mesh,
        )

    def _prep_accum(self, micro: list) -> Dict[str, Any]:
        """Stack grad_accum host-prepped microbatches on a leading K
        axis and ship them as one sharded put per key; the accum train
        step lax.scans over axis 0."""
        stacked = {k: np.stack([m[k] for m in micro]) for k in micro[0]}
        return make_global_batch(stacked, self.mesh, accum=True)

    def _sample_view_count(self, n: int) -> np.ndarray:
        """view_count ~ U{1..max_views} per sample (experiment.py:277-279)."""
        return self.rng.integers(1, self.max_views + 1, (n,))

    def _sample_view_count_stratified(self, n: int) -> np.ndarray:
        """Fixed per-batch count multiset (each of 1..max_views equally
        often, remainder end-paired), randomly permuted — keeps
        sum(view_count) static for the packed train step while matching
        the uniform marginal distribution in expectation."""
        counts = stratified_count_multiset(n, self.max_views)
        self.rng.shuffle(counts)
        return counts

    def _global_packed_counts(self, salt: int,
                              local_batch: Optional[int] = None):
        """Packed mode, multi-host-safe: every process derives the SAME
        global stratified count vector from (seed, salt), so the packed
        row indices can be replicated across hosts while each host's
        batch slice carries its own view_count segment.

        Returns (local_counts (B_local,), sample_idx, view_idx) with the
        index arrays enumerating the GLOBAL batch's valid rows.
        ``local_batch`` overrides the per-host row count (grad_accum
        microbatches); default is the full per-host batch (eval)."""
        lb = (self.local_batch_size if local_batch is None
              else local_batch)
        nproc = jax.process_count()
        gb = lb * nproc
        rng = np.random.default_rng(
            [self.config.train.seed, 0x9E37, salt]
        )
        counts = stratified_count_multiset(gb, self.max_views)
        rng.shuffle(counts)
        si, vi = self._packed_indices(counts)
        h = jax.process_index()
        local = counts[h * lb:(h + 1) * lb]
        return local, si, vi

    @staticmethod
    def _packed_indices(view_count: np.ndarray):
        """Enumerate valid (sample, view) pairs for loss_packed."""
        sample_idx = np.repeat(np.arange(len(view_count)), view_count)
        view_idx = np.concatenate([np.arange(v) for v in view_count])
        return sample_idx.astype(np.int32), view_idx.astype(np.int32)

    def _save_ckpt(self, filename: str, state, **extra) -> None:
        """Checkpoint save honoring tpu.async_checkpoint (default on:
        the loop pays one fused HBM snapshot; sync mode blocks on
        D2H + serialize + write)."""
        if self.config.train.async_checkpoint:
            self.checkpoint.save_async(filename, state, **extra)
        else:
            self.checkpoint.save(filename, state, **extra)

    # ------------------------------------------------------------------
    def train(self) -> None:
        cfg = self.config.train
        acc_loss = []
        step_t0 = None

        # wandb-resume parity: the run summary's max metrics take
        # precedence over the checkpoint sidecar (experiment.py:226-232).
        summary_best = self.logger.best_metric_summary()
        if summary_best is not None:
            self.best_metrics.update(summary_best)

        # Preemption safety (no reference equivalent — torch runs just
        # die): SIGTERM requests a final rolling checkpoint at the next
        # step boundary, so TPU-VM maintenance events never lose more
        # than one step.
        import signal

        self._stop_requested = False

        def _request_stop(signum, frame):
            self._stop_requested = True

        try:
            prev_handler = signal.signal(signal.SIGTERM, _request_stop)
        except ValueError:  # non-main thread (tests)
            prev_handler = None

        try:
            self._train_loop(cfg, acc_loss)
        finally:
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)
            # Durability on ANY exit, including exceptions out of the
            # loop: queued async saves must reach disk before the
            # process dies (the writer is a daemon thread).  Swallow
            # writer errors only when already unwinding another
            # exception — capture that state BEFORE flushing (inside the
            # except handler, exc_info would report the flush's own
            # error and the condition could never re-raise).
            import sys

            unwinding = sys.exc_info()[0] is not None
            ck = getattr(self, "checkpoint", None)  # absent on fakes
            if ck is not None:
                try:
                    ck.flush()
                except RuntimeError:
                    if not unwinding:
                        raise

    def _device_feed(self, first_it: int, depth: int = 2):
        """Device-side input double-buffering for the packed path.

        The host prefetch thread overlaps decode with compute, but the
        per-step H2D transfer (make_global_batch) still ran on the
        dispatch thread — over a tunneled link that serialization tax
        was ~35% of the data-fed step time.  Packed view counts are a
        pure function of (seed, it) (_global_packed_counts), so the
        whole count-derivation + _prep_batch + device transfer moves
        into a worker thread holding ``depth`` batches on device.  The
        dense path keeps main-thread prep: its U{1..max_views} draw
        consumes self.rng, whose call order is part of the documented
        reference-parity semantics."""
        import queue as _queue

        q: "_queue.Queue" = _queue.Queue(maxsize=depth)
        stop = object()

        def worker():
            it = first_it
            n_micro = self.config.train.grad_accum
            try:
                fused = self.config.train.fused_feed
                micro = []
                for batch in self.train_loader:
                    # salt = it*K + k: unique per microbatch, reduces to
                    # the pre-grad-accum salt sequence at K=1
                    vc, si, vi = self._global_packed_counts(
                        it * n_micro + len(micro),
                        local_batch=self.micro_batch_size,
                    )
                    micro.append(self._host_prep(
                        batch, vc, packed_idx=(si, vi), fused=fused
                    ))
                    if len(micro) < n_micro:
                        continue
                    if n_micro == 1:
                        q.put(make_global_batch(micro[0], self.mesh))
                    else:
                        q.put(self._prep_accum(micro))
                    micro = []
                    it += 1
                q.put(stop)
            except BaseException as e:  # noqa: BLE001 — re-raised below
                q.put(e)

        threading.Thread(target=worker, daemon=True,
                         name="device-feed").start()
        while True:
            item = q.get()
            if item is stop:
                return
            if isinstance(item, BaseException):
                raise item
            yield item

    def _train_loop(self, cfg, acc_loss) -> None:
        last_log = [time.perf_counter(), self.it]
        feed = (self._device_feed(self.it + 1)
                if cfg.packed_views else None)
        while True:
            for batch in (feed if feed is not None
                          else self.train_loader):
                self.it += 1

                # Labels the last COMPLETED step: the rolling checkpoint
                # is saved post-step below, so "it" in the sidecar always
                # matches the number of optimizer updates in the state
                # (the reference saves pre-step and silently loses one
                # update per resume, experiment.py:241-254).
                checkpoint_extra = {
                    "it": self.it,
                    "t": self.time_elapsed,
                    "run_id": self.run_id,
                    **{k: float(v) for k, v in self.best_metrics.items()},
                }
                self._checkpoint_extra = checkpoint_extra

                if self._stop_requested:
                    print("SIGTERM received: checkpointing and exiting.")
                    # state holds it-1 updates; label accordingly.
                    # Queue behind any in-flight rolling save (single
                    # ordered writer), then drain before exiting.
                    self._save_ckpt(
                        "model.msgpack", self.state,
                        **{**checkpoint_extra, "it": self.it - 1},
                    )
                    self.checkpoint.flush()
                    return

                if (
                    self.it >= cfg.validate_from
                    and cfg.validate_every > 0
                    and (self.it - cfg.validate_from) % cfg.validate_every == 0
                ):
                    self.eval()
                    self.inference()

                if (
                    cfg.profile_steps > 0
                    and self.it == cfg.profile_from
                    and self.is_host0
                ):
                    jax.profiler.start_trace(
                        os.path.join(self.out_dir, "profile")
                    )
                if (
                    cfg.profile_steps > 0
                    and self.it == cfg.profile_from + cfg.profile_steps
                    and self.is_host0
                ):
                    jax.profiler.stop_trace()
                    print(f"Profiler trace written to "
                          f"{self.out_dir}/profile")

                t0 = time.perf_counter()
                if cfg.packed_views:
                    device_batch = batch  # prepped by _device_feed
                elif cfg.grad_accum > 1:
                    # dense grad_accum: this step's K microbatches, each
                    # with its own main-thread U{1..max_views} draw (rng
                    # call order stays a pure function of the microbatch
                    # sequence, as in the K=1 path)
                    group = [batch]
                    try:
                        for _ in range(cfg.grad_accum - 1):
                            group.append(next(self.train_loader))
                    except StopIteration:
                        return  # truncated final group: stream ended
                    device_batch = self._prep_accum([
                        self._host_prep(
                            b, self._sample_view_count(
                                b["target"].shape[0]
                            )
                        )
                        for b in group
                    ])
                else:
                    view_count = self._sample_view_count(
                        batch["target"].shape[0]
                    )
                    device_batch = self._prep_batch(batch, view_count)
                step_rng = jax.random.fold_in(
                    jax.random.PRNGKey(self.config.train.seed), self.it
                )
                self.state, loss = self._train_step(
                    self.state, device_batch, step_rng
                )
                acc_loss.append(loss)  # async device scalar; no host sync
                self.time_elapsed += time.perf_counter() - t0

                if (
                    cfg.checkpoint_every > 0
                    and self.it % cfg.checkpoint_every == 0
                    and self.it > 0
                ):
                    # Async: the step loop only pays for an HBM snapshot;
                    # D2H + serialize + write happen on the writer thread
                    # (a sync save measured 1.5-3.5 s on the flagship
                    # state — a 12-24% tax at checkpoint_every=100).
                    self._save_ckpt(
                        "model.msgpack", self.state,
                        **{**checkpoint_extra, "t": self.time_elapsed},
                    )

                if cfg.log_every > 0 and self.it % cfg.log_every == 0:
                    mean_loss = float(
                        jnp.mean(jnp.stack(acc_loss))
                    ) if acc_loss else 0.0
                    acc_loss.clear()
                    now = time.perf_counter()
                    steps = self.it - last_log[1]
                    sps = steps / max(now - last_log[0], 1e-9)
                    last_log[:] = [now, self.it]
                    self.log_dict.update(
                        t=self.time_elapsed,
                        lr=float(self._lr_fn(self.it)),
                        loss=mean_loss,
                        steps_per_sec=sps,
                    )
                    self.logger.log(self.log_dict, self.it)
                    self.log_dict = {}

                if self.it >= cfg.max_it:
                    print("Maximum iteration count reached.")
                    self._save_ckpt("model.msgpack", self.state,
                                    **self._checkpoint_extra)
                    self.checkpoint.flush()
                    return

    # ------------------------------------------------------------------
    def _eval_pass(self, loader, salt_base: int, dump: bool,
                   key_base: int = 0):
        """One metric pass over ``loader``: full generation + masked
        global SSIM/PSNR sums.  Returns (ssim, psnr, sample_count).
        ``key_base=0`` keeps the test pass's per-batch noise keys
        identical to the pre-refactor sequence (artifact
        comparability); the train-split pass uses a disjoint base."""
        ssims, psnrs, weights = [], [], []
        # tpu.eval_iid_counts forces the dense path with fresh iid count
        # draws (exact reference eval semantics, experiment.py:329);
        # default packed eval uses the deterministic stratified multiset
        # (documented divergence, PARITY.md).
        packed = (self.config.train.packed_views
                  and not self.config.train.eval_iid_counts)
        for val_batch in loader():
            if packed:
                view_count, si, vi = self._global_packed_counts(
                    salt_base + len(ssims)
                )
                device_batch = self._prep_batch(val_batch, view_count,
                                                packed_idx=(si, vi))
            else:
                view_count = self._sample_view_count(
                    val_batch["target"].shape[0]
                )
                device_batch = self._prep_batch(val_batch, view_count)
            key = jax.random.fold_in(
                jax.random.PRNGKey(self.config.train.seed + 17),
                key_base + len(ssims),
            )
            gen = self._eval_samples(key, device_batch)
            target = _norm_img(device_batch["target"])
            # eval_mask weights padded rows of the exact-epoch final
            # batch to zero; ordinary batches weight every row 1.
            mask = device_batch.get(
                "eval_mask", jnp.ones(gen.shape[0], jnp.float32)
            )
            ssims.append(jnp.sum(compute_ssim(gen, target) * mask))
            psnrs.append(jnp.sum(compute_psnr(gen, target) * mask))
            weights.append(jnp.sum(mask))
            if dump and self.config.train.eval_dump_images \
                    and self.is_host0:
                if jax.process_count() > 1:
                    print("eval_dump_images skipped: arrays span "
                          "non-addressable devices on multi-host")
                else:
                    self._dump_eval_images(gen, target, len(ssims) - 1,
                                           mask=np.asarray(mask))

        # Global means: arrays are mesh-global, so these reductions are
        # XLA collectives — replaces barrier+reduce_dict
        # (experiment.py:347-366).
        count = float(jnp.sum(jnp.stack(weights)))
        ssim = float(jnp.sum(jnp.stack(ssims)) / count)
        psnr = float(jnp.sum(jnp.stack(psnrs)) / count)
        return ssim, psnr, count

    def eval(self) -> None:
        """Full-generation metric eval + best-model checkpointing
        (experiment.py:314-391)."""
        print("Running metric evaluation...")
        ssim, psnr, count = self._eval_pass(
            self.val_loader, salt_base=1_000_000_000, dump=True
        )
        self.last_eval_count = count
        self.log_dict["ssim"] = ssim
        self.log_dict["psnr"] = psnr
        print(f"eval: ssim={ssim:.4f} psnr={psnr:.2f} "
              f"(n={int(count)})")

        if self.train_eval_loader is not None:
            # held-in curve next to the held-out one; never feeds the
            # best-model policy below
            tr_ssim, tr_psnr, tr_n = self._eval_pass(
                self.train_eval_loader, salt_base=2_000_000_000,
                dump=False, key_base=1_000_000,
            )
            self.log_dict["ssim_train"] = tr_ssim
            self.log_dict["psnr_train"] = tr_psnr
            print(f"eval[train-split]: ssim={tr_ssim:.4f} "
                  f"psnr={tr_psnr:.2f} (n={int(tr_n)})")

        if self.args.train:
            best_cnt = 0
            extra = getattr(self, "_checkpoint_extra", {"it": self.it})
            if ssim > self.best_metrics["ssim"]:
                best_cnt += 1
                self.best_metrics["ssim"] = ssim
                extra.update(ssim=ssim)
                self._save_ckpt("best_model_ssim.msgpack", self.state,
                                **extra)
            if psnr > self.best_metrics["psnr"]:
                best_cnt += 1
                self.best_metrics["psnr"] = psnr
                extra.update(psnr=psnr)
                self._save_ckpt("best_model_psnr.msgpack", self.state,
                                **extra)
            if best_cnt == 2:
                self._save_ckpt("best_model_all.msgpack", self.state,
                                **extra)
        # Eval is rare and slow next to a save; drain the writer so
        # best_model files are on disk when eval() returns (and so a
        # standalone -e process can exit immediately after).
        self.checkpoint.flush()
        if not self.args.train:
            # Standalone -e: nothing downstream flushes log_dict (during
            # training the loop/inference() does) — persist the metrics
            # to the JSONL sink here so `main.py -s run -e` leaves a
            # record, not just stdout.
            self.logger.log(self.log_dict, max(self.it, 0))
            self.log_dict = {}

    def _dump_eval_images(self, gen, target, batch_idx: int,
                          mask=None) -> None:
        """Write generated/target PNG pairs for the offline metric CLI."""
        from viewfusion_tpu.utils.image import save_png

        root = os.path.join(self.out_dir, f"images-{max(self.it, 0)}")
        gdir = os.path.join(root, "generated")
        tdir = os.path.join(root, "target")
        os.makedirs(gdir, exist_ok=True)
        os.makedirs(tdir, exist_ok=True)
        gen = np.asarray(gen)
        target = np.asarray(target)
        for i in range(gen.shape[0]):
            if mask is not None and mask[i] == 0.0:
                continue  # exact-epoch padding row
            stem = f"{batch_idx:04d}-{i:04d}.png"
            save_png(np.clip(gen[i], 0, 1), os.path.join(gdir, stem))
            save_png(target[i], os.path.join(tdir, stem))

    # ------------------------------------------------------------------
    def inference(self) -> None:
        """Visualization / inference dispatch (experiment.py:393-470)."""
        if self.args.train:
            self._train_vis_grid()
        elif self.args.inference:
            if self.args.extrapolate:
                self.extrapolate()
            if self.args.autoregressive:
                self.autoregressive()
            if self.args.generate_gifs:
                self.generate_gif()
        self.logger.log(self.log_dict, max(self.it, 0))
        self.log_dict = {}

    def _vis_inputs(self, n_views: int):
        batch = self.val_vis_data
        cond = batch[self.cond_key][:, :n_views]
        angle = np.asarray(batch[self.angle_key]).reshape(-1)
        target = batch["target"]
        return target, cond, angle

    def _gen_inputs(self, cond, view_count, angle, key_salt):
        """Shared generation prologue: the (seed+23, salt) key scheme
        and input conversion must stay identical across the ancestral
        and fast-sampler paths so the same salt reproduces the same
        chain inputs."""
        key = jax.random.fold_in(
            jax.random.PRNGKey(self.config.train.seed + 23), key_salt
        )
        return (key, _norm_img(jnp.asarray(cond)),
                jnp.asarray(view_count, jnp.int32),
                jnp.asarray(angle, jnp.float32))

    def _generate_np(self, cond, view_count, angle, key_salt=0):
        key, cond, view_count, angle = self._gen_inputs(
            cond, view_count, angle, key_salt
        )
        segs = self.config.train.chain_segments
        if segs > 1:
            out = self._generate_segmented(key, cond, view_count, angle,
                                           segs)
        else:
            out = self._jit_generate(
                self._infer_params, key, cond, view_count, angle
            )
        return jax.tree_util.tree_map(
            lambda x: np.asarray(x) if x is not None else None, out,
            is_leaf=lambda x: x is None,
        )

    def _sample_only_np(self, cond, view_count, angle, key_salt=0):
        """Final samples through the CONFIGURED sampler (tpu.sampler) —
        for modes that never read the denoising-frame buffers.  The
        default ("ddpm") keeps exact reference behavior; "ddim"/"dpm"/
        "dpm_sde" make the 24-chain autoregressive orbit 40-100x
        cheaper."""
        s = self.config.train.sampler  # validated at config load
        if s == "ddpm":
            return np.asarray(
                self._generate_np(cond, view_count, angle,
                                  key_salt=key_salt).generated_samples
            )
        key, cond, view_count, angle = self._gen_inputs(
            cond, view_count, angle, key_salt
        )
        fn = (self._jit_generate_ddim if s == "ddim"
              else self._jit_generate_dpm)
        return np.asarray(fn(self._infer_params, key, cond, view_count,
                             angle))

    def _generate_segmented(self, key, cond, view_count, angle, segs,
                            packed_idx=None, capture_aux=True):
        """Reverse chain as ``segs`` jitted dispatches (tpu.chain_segments):
        identical math/RNG to one generate() call, but each device
        execution runs T/segs steps — preemption windows and
        per-execution runtime limits stay bounded.  ``packed_idx`` /
        ``capture_aux=False`` serve the segmented EVAL path (packed UNet
        rows, no frame buffers)."""
        model = self.model
        sample_num = self.config.train.sample_num
        T = model.schedule.num_timesteps
        carry = model.init_chain(key, cond, view_count,
                                 sample_num=sample_num,
                                 capture_aux=capture_aux)
        bounds = np.linspace(T, 0, segs + 1).round().astype(int)
        for hi, lo in zip(bounds[:-1], bounds[1:]):
            ts = jnp.arange(int(hi) - 1, int(lo) - 1, -1)
            carry = self._jit_chain_segment(
                self._infer_params, carry, ts, cond, view_count, angle,
                packed_idx=packed_idx, capture_aux=capture_aux,
            )
            jax.block_until_ready(carry[0])  # bound each execution
        return model.finalize_chain(carry, capture_aux=capture_aux)

    def _grid_output(self, ret_arr, target, cond, view_count,
                     name: str) -> None:
        """Denoising-steps | target | conditioning grid
        (experiment.py:424-451)."""
        vmax = int(np.max(view_count))
        mask = (np.arange(vmax)[None, :] < view_count[:, None]).astype(
            np.float32
        )
        cond_rgb = cond[..., -3:]  # relative mode: last 3 channels are view
        cond_padded = cond_rgb[:, :vmax] * mask[:, :, None, None, None]
        output = np.concatenate(
            (np.clip(ret_arr, 0, 1), target[:, None], cond_padded), axis=1
        )
        b, s = output.shape[:2]
        grid = make_grid(
            output.reshape(b * s, *output.shape[2:]), nrow=s,
            scale_each=True,
        )
        self.logger.log_image(name, grid, max(self.it, 0),
                              caption="Denoising steps, Target, Input View")

    def _train_vis_grid(self) -> None:
        """12-sample generation grid during training
        (experiment.py:399-456)."""
        target, cond, angle = self._vis_inputs(self.max_views)
        view_count = self._sample_view_count(target.shape[0])
        out = self._generate_np(cond, view_count, angle)
        self._grid_output(out.ret_arr, target, cond, view_count, "output")

    # ------------------------------------------------------------------
    def extrapolate(self) -> None:
        """view_count ~ U{max_views+1 .. 23}: more views than training
        (experiment.py:472-514)."""
        print("Running extrapolate image generation...")
        batch = self.val_vis_data
        target = batch["target"]
        cond = batch["cond"]  # full 23 stored views, absolute mode
        angle = np.asarray(batch["angle"]).reshape(-1)
        view_count = self._sample_extrapolate_counts(
            target.shape[0], cond.shape[1]
        )
        out = self._generate_np(cond, view_count, angle, key_salt=1)
        self._grid_output(out.ret_arr, target, cond, view_count,
                          "extrapolate")

    def _sample_extrapolate_counts(self, n: int, total: int) -> np.ndarray:
        """U{max_views+1 .. total}: ``total`` is the number of STORED
        cond views (23 = the 24 NMR views minus the target), so the top
        draw uses every stored view — exactly the reference's
        ``randint(max_views+1, 24)`` with its exclusive high bound
        (experiment.py:477).  Bounds pinned by
        tests/test_trainer.py::test_extrapolate_count_bounds."""
        return self.rng.integers(self.max_views + 1, total + 1, (n,))

    def autoregressive(self) -> None:
        """3D-consistent orbit: generate 24 views in sequence, appending
        each to the conditioning set (experiment.py:516-578).

        The reference grows a ragged cond tensor each step
        (experiment.py:543); here cond lives in a static (1, 24, ...)
        buffer with view_count increasing — same jit program every step.
        """
        print("Running autoregressive generation...")
        total = self.config.data.total_views
        all_views = np.asarray(self.val_vis_data["all_views"])[10:11]
        h, w = all_views.shape[2:4]
        cond = np.zeros((1, total, h, w, 3), np.float32)
        cond[:, 0] = all_views[:, 0]

        cond_list, sample_list = [], []
        for count in range(1, total + 1):
            angle = np.asarray([2 * np.pi / total * count], np.float32)
            sample = self._sample_only_np(
                cond, np.asarray([count]), angle, key_salt=100 + count
            )[0]
            if count < total:
                cond[:, count] = sample
            cond_list.append(cond[0, :count].copy())
            sample_list.append(sample)

        # frame assembly (experiment.py:555-571): per step, a row of
        # [cond views padded to 24 with white, generated sample]
        frames = []
        for count, (conds, sample) in enumerate(
            zip(cond_list, sample_list), start=1
        ):
            padded = np.ones((total, h, w, 3), np.float32)
            padded[:count] = np.clip(conds, 0, 1)
            row = np.concatenate(
                [padded, np.clip(sample, 0, 1)[None]], axis=0
            )
            frames.append(to_uint8(make_grid(row, nrow=total + 1)))

        self.logger.log_image("autoregressive_single", frames[0],
                              max(self.it, 0))
        self.logger.log_video("autoregressive_animated", frames,
                              max(self.it, 0))

    def generate_gif(self) -> None:
        """Orbit animation with per-view weight maps
        (experiment.py:580-650)."""
        print("Running animation sequence generation...")
        obj = 10
        total = self.config.data.total_views
        views = np.asarray(self.val_vis_data["all_views"])  # (12,24,H,W,3)
        angles = np.asarray(
            [2 * np.pi / total * i for i in range(total)], np.float32
        )
        target = views[obj]  # (24, H, W, 3)
        cond_views = np.stack([views[obj, ::4]] * total, axis=0)  # (24,6,...)
        view_counts = np.full((total,), cond_views.shape[1])
        out = self._generate_np(cond_views, view_counts, angles, key_salt=2)

        ret, weights = out.ret_arr, out.weight_arr
        if weights is None:
            # weight maps only exist with weighting_inference=True; the
            # reference crashes here on no-weighting configs
            # (experiment.py:620 on an empty list) — fail clearly instead.
            raise ValueError(
                "generate_gif needs weighting_inference=True (no weight "
                "maps in the no-weighting ablation)"
            )
        n_cond = cond_views.shape[1]
        frames = []
        for i in range(total):
            # rows: weight maps per frame + cond views; cols add the
            # generated frame and the tiled target (experiment.py:611-637)
            rows = np.concatenate(
                [weights[i], cond_views[i][None]], axis=0
            )  # (frames+1, n_cond, H, W, 3)
            gen_col = np.clip(ret[i][:, None], 0, 1)  # (frames+1, 1, ...)
            rows = np.concatenate([rows, gen_col], axis=1)
            target_row = np.stack([target[i]] * (n_cond + 1))[None]
            rows = np.concatenate([rows, target_row], axis=0)
            s, v = rows.shape[:2]
            grid = make_grid(
                rows.transpose(1, 0, 2, 3, 4).reshape(
                    v * s, *rows.shape[2:]
                ),
                nrow=s,
                pad_value=0.9,
            )
            frames.append(to_uint8(grid))
        self.logger.log_video("weights_animated", frames, max(self.it, 0))
