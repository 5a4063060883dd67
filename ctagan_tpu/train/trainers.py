"""Trainer families: pix2pix, CycleGAN, RegGAN, CTA-GAN HD stage 1/2.

Each trainer exposes the reference's surface — ``__init__(config)``,
``train()``, ``test()`` (train.py:31-45 dispatch) — around a jitted
functional train step (ctagan_tpu.train.steps):

- epoch loop with the reference's lr schedule, including its faithful
  accelerating-decay quirk: after ``n_epochs`` the lr drops by
  ``current_lr / decay_epoch`` each epoch, computed from the *mutated* lr
  (CycTrainer.py:117-126); the HD family's D lr never decays (the reference
  writes it to a bogus optimizer key, HdTrainer.py:163-164);
- validation every ``val_every`` epochs (masked PSNR + SSIM) with
  metric-stamped checkpoints, plus first-class resume from the newest
  checkpoint (the reference's resume is hand-edited code);
- data-parallel execution over every local device via a 1-D mesh: batches
  are sharded on the leading axis, parameters replicated, and XLA inserts
  the ICI all-reduce (ctagan_tpu.parallel.mesh);
- HD stage 1/2 behaviors: dual-window batches, per-epoch stochastic
  oversampling re-draw, mid-epoch checkpoints every
  ``checkpoint_every_iters`` (HdTrainer.py:233-240), stage-2 bootstrap from
  stage-1 weights with the multi-scale D and masked SR_loss2.
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ctagan_tpu.data.datasets import DualWindowDataset, PairedSliceDataset
from ctagan_tpu.data.loader import PrefetchLoader
from ctagan_tpu.models import (
    Discriminator,
    Generator,
    MultiScaleDiscriminator,
    RegNet,
)
from ctagan_tpu.ops.metrics import masked_psnr, ssim
from ctagan_tpu.parallel.mesh import pad_batch_to
from ctagan_tpu.train import steps
from ctagan_tpu.train.evaluation import DicomWriteback, aggregate, evaluate_pair
from ctagan_tpu.utils.checkpoint import (
    find_latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from ctagan_tpu.utils.config import Config
from ctagan_tpu.utils.logging import TrainLogger


def _dtype(cfg: Config):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None


def _tap_convs(cfg: Config):
    """config reg_tap_convs -> RegNet.tap_convs (None = model-level auto)."""
    return {"auto": None, "on": True, "off": False}[cfg.reg_tap_convs]


def _fused_body_grad(cfg: Config) -> bool:
    """config fused_body_grad -> bool ('auto' = on TPU; the Generator gates
    shape eligibility itself)."""
    v = cfg.fused_body_grad
    if isinstance(v, bool):
        return v
    if v == "auto":
        return jax.default_backend() == "tpu"
    return v == "on"


class TrainerBase:
    """Shared machinery: mesh, schedules, loops, val, checkpoints, test."""

    family: str = "base"
    dual_window: bool = False
    _watchdog = None  # armed by train() when config.stall_timeout > 0

    def __init__(self, config: Config, quiet: bool = False):
        if config.context_slices > 1 and self.family != "p2p":
            raise ValueError(
                "context_slices > 1 is supported by the P2p family only"
            )
        self.config = config
        self.quiet = quiet
        # persistent XLA compile cache (config compilation_cache): kills
        # the once-per-process cold compiles on the tunneled TPU (first
        # eval 160-340 s -> sub-second across processes; utils/jaxcache.py)
        from ctagan_tpu.utils.jaxcache import maybe_enable_compilation_cache

        maybe_enable_compilation_cache(config.compilation_cache)
        # parallelism plan: an explicit config `mesh:` spec ({dp/fsdp/tp/sp})
        # wins; otherwise the legacy data_parallel behavior (all local
        # devices on a 1-D data mesh)
        from ctagan_tpu.parallel.mesh import plan_from_spec

        if config.mesh:
            self.plan = plan_from_spec(config.mesh)
            if not quiet and self._is_host0():
                ax = dict(zip(self.plan.mesh.axis_names,
                              self.plan.mesh.devices.shape))
                print(f"mesh plan: {ax} (kind={self.plan.kind}, "
                      f"batch x{self.plan.batch_scale})")
        else:
            n_dp = len(jax.devices()) if config.data_parallel else 1
            self.plan = plan_from_spec({"dp": n_dp})
        if self.plan.kind == "pp" and self.family not in (
            "p2p", "reg", "hd1", "hd2"
        ):
            raise ValueError(
                "mesh.pp (pipeline-parallel training) supports the P2p and "
                f"reg/HD families, not {self.family!r} — the schedule "
                "stages the 2-D Generator's residual body "
                "(parallel/pipeline.py); the Cyc family has two generators "
                "and the P3d family a 3-D body"
            )
        self.mesh = self.plan.mesh
        self.n_devices = len(self.mesh.devices.ravel())
        # batch feed scale: how many ways batches shard (dp*fsdp extents —
        # tp/sp replicate the batch across their axis)
        self.batch_scale = self.plan.batch_scale
        self.lr = float(config.lr)
        self.lr_d = float(config.lrd)
        self.start_epoch = int(config.epoch)
        self._current_epoch = self.start_epoch
        self.key = jax.random.PRNGKey(config.seed)
        self._dev_window_fn = None  # lazy jitted on-device windowing
        self.g_model = self._build_generator()
        # inference-path generator: identical params; optionally routed
        # through the fused conv+IN Pallas body (config fused_body — no
        # autodiff rule, so the TRAINING model never uses it)
        self.g_eval = self._build_eval_generator()
        self._build_models()
        self.state, self.tx = self._init_state()
        if config.mesh:
            # explicit plan: place the whole train state (fsdp = ZeRO-3
            # layout, tp = Megatron generator layout, pp = stage-packed
            # generator body, dp/sp = replicated); the family's jitted step
            # then runs sharded via GSPMD (pp: via the GPipe schedule)
            self.state = self.plan.shard_state(
                self.state, generator=self.g_model
            )
        self._step = self._compile_step()
        self._gen_fwd = jax.jit(lambda p, a: self.g_eval.apply(p, a))

        def _val_step(params, a, b):
            # G forward + both validation metrics in ONE device call —
            # per-call tunnel latency would otherwise dominate val time.
            # Returns per-sample (N,) vectors; the N==1 branch keeps the
            # exact unbatched arithmetic (identical HLO to the per-slice
            # path) so the default eval_batch=1 stays bit-identical.
            a, b = self._eval_input(a), self._eval_input(b)
            fake = self.g_eval.apply(params, a)
            fb = self._eval_slices(fake).astype(jnp.float32)
            rb = self._eval_slices(b).astype(jnp.float32)
            if fb.shape[0] == 1:
                return (
                    masked_psnr(fb[0], rb[0])[None],
                    ssim(fb[0], rb[0])[None],
                )
            return jax.vmap(masked_psnr)(fb, rb), jax.vmap(ssim)(fb, rb)

        self._val_step = jax.jit(_val_step)

        # metrics come back as ONE (len(keys), N) matrix — a dict of (N,)
        # scalars would cost one ~29 ms tunnel round-trip PER ARRAY to pull
        # (docs/evidence/bench_eval_diag_r2.log: the metric math itself is
        # 3.8 ms; the pulls were the eval wall)
        self._metric_keys = (
            "MAEw", "PSNRw", "SSIMw", "UQIw", "MAE", "PSNR", "SSIM", "UQI"
        )

        def _test_step(params, a, b, wc, ww):
            # G forward + the full 8-metric window/raw suite in ONE call;
            # the synthetic slices come back for DICOM writeback.
            # wc/ww: per-sample (N,) vectors (each slice scores in its own
            # SE1 header window). N==1 keeps the exact unbatched arithmetic.
            from ctagan_tpu.train.evaluation import _metric_suite

            a, b = self._eval_input(a), self._eval_input(b)
            fake = self.g_eval.apply(params, a)
            fb = self._eval_slices(fake).astype(jnp.float32)
            rb = self._eval_slices(b).astype(jnp.float32)
            if fb.shape[0] == 1:
                m = _metric_suite(fb[0], rb[0], wc[0], ww[0])
                mat = jnp.stack([m[k] for k in self._metric_keys])[:, None]
            else:
                m = jax.vmap(_metric_suite)(fb, rb, wc, ww)
                mat = jnp.stack([m[k] for k in self._metric_keys])
            # de-normalize to STORED int16 on device (HdTrainer.py:539-549):
            # the DICOM writeback then pulls 2 B/px instead of 4 (the
            # device->host image transfer was the test() wall — ~200 ms/MB
            # through the tunnel, docs/evidence/bench_eval3_r2.log)
            stored = ((fb + 1.0) * 0.5 * 4095.0).astype(jnp.int16)
            return stored, mat

        self._test_step = jax.jit(_test_step)
        self._build_datasets()
        if config.resume:
            self._try_resume()

    # -- per-family hooks ---------------------------------------------------
    def _build_generator(self):
        # Pallas fused kernels are single-device programs; with a model
        # axis active (fsdp/tp/sp) GSPMD must partition the whole step, so
        # the generator stays on its plain XLA path (tap/im2col routes are
        # plain XLA and partition fine)
        fused_grad = (
            False if self.plan.model_sharded
            else _fused_body_grad(self.config)
        )
        return Generator(
            self.config.input_nc * self.config.context_slices,
            self.config.output_nc,
            dtype=_dtype(self.config),
            remat=self.config.remat,
            pad_mode=self.config.pad_mode,
            fused_body_grad=fused_grad,
            tap_heads=False if self.plan.model_sharded else None,
        )

    def _build_eval_generator(self):
        """The generator used by val/test/figures/serving. With config
        ``fused_body`` it enables the Pallas fused conv+IN body (param tree
        unchanged); families whose generator lacks the flag (3-D) keep the
        training model."""
        if not getattr(self.config, "fused_body", False) or self.plan.model_sharded:
            return self.g_model
        import dataclasses

        try:
            return dataclasses.replace(self.g_model, fused_body=True)
        except TypeError:
            return self.g_model

    def _build_models(self):
        raise NotImplementedError

    def _init_state(self):
        raise NotImplementedError

    def _compile_step(self):
        raise NotImplementedError

    @staticmethod
    def _eval_slices(x):
        """Extract the (N, H, W) evaluation slices from a model tensor — 2-D
        families take the slice per sample; the 3-D family overrides with
        the center depth slice."""
        return x[:, :, :, 0]

    def _canonical_state(self):
        """``self.state`` with the canonical (reference-layout) param trees.
        The pp plan stores the generator body stage-PACKED on the mesh
        (parallel/pipeline.py::pp_pack_params); checkpoints and eval unpack
        back to the plain tree so artifacts stay plan-portable. Every other
        plan keeps the canonical tree (sharding is placement only)."""
        if self.config.mesh and self.plan.kind == "pp":
            from ctagan_tpu.parallel.pipeline import unshard_p2p_state_pp

            # device_get: the unpacked leaves are per-stage committed
            # slices of a pp-sharded array — pull to host so downstream
            # jit calls (eval fwd) and checkpoint writes see one clean tree
            return jax.device_get(
                unshard_p2p_state_pp(self.state, self.g_model)
            )
        if (
            self.config.mesh
            and self.plan.model_sharded
            and jax.process_count() > 1
        ):
            # multi-host fsdp/tp/sp/depth: shards of the state live on
            # OTHER hosts' devices, and jax.device_get of a non-addressable
            # array raises — all-gather to a replicated layout first (the
            # gather crosses the process boundary; every host then holds
            # the full canonical state locally). Caught by the 2-process
            # fsdp e2e test (tests/test_multiprocess.py) at checkpoint
            # time; single-process sharded state needs no gather (all
            # shards are addressable and device_get assembles them).
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(self.mesh, PartitionSpec())
            return jax.jit(lambda s: s, out_shardings=rep)(self.state)
        return self.state

    def _g_params(self):
        """Evaluation params: the EMA shadow when enabled, else the live G
        (val/test/figures/serving all route through here)."""
        state = self._canonical_state()
        ema = getattr(state, "g_ema", None)
        if self.config.ema_decay > 0 and ema is not None:
            return ema
        return state.g_params

    def _set_g_params(self, params):
        if self.config.mesh and self.plan.kind == "pp":
            # loaded weights arrive in the canonical tree; repack
            state = self._canonical_state().replace(g_params=params)
            if getattr(state, "g_ema", None) is not None:
                state = state.replace(g_ema=params)
            self.state = self.plan.shard_state(state, generator=self.g_model)
            return
        self.state = self.state.replace(g_params=params)
        # explicitly-loaded weights supersede any EMA shadow
        if getattr(self.state, "g_ema", None) is not None:
            self.state = self.state.replace(g_ema=params)
        if self.config.mesh:
            self.state = self.plan.shard_state(
                self.state, generator=self.g_model
            )

    def _place_state(self, state):
        """Host state tree -> device placement per the parallelism plan."""
        if self.config.mesh:
            return self.plan.shard_state(state, generator=self.g_model)
        return jax.device_put(state)

    # -- data ---------------------------------------------------------------
    def _make_train_dataset(self, rng):
        if self.dual_window:
            return DualWindowDataset(
                self.config.train_list,
                oversample=True,
                rng=rng,
                size=self.config.size,
                raw_feed=self.config.device_windowing,
            )
        return PairedSliceDataset(
            self.config.train_list,
            size=self.config.size,
            unaligned=self.config.unaligned,
            context_slices=self.config.context_slices,
            seed=self.config.seed,
            raw_feed=self.config.device_windowing,
        )

    def _make_eval_dataset(self, list_file):
        if self.dual_window:
            return DualWindowDataset(
                list_file,
                size=self.config.size,
                raw_feed=self.config.device_windowing,
            )
        return PairedSliceDataset(
            list_file,
            size=self.config.size,
            context_slices=self.config.context_slices,
            raw_feed=self.config.device_windowing,
        )

    def _build_datasets(self):
        cfg = self.config
        self._data_rng = np.random.default_rng(cfg.seed)
        self.val_dataset = self._make_eval_dataset(cfg.val_list)
        self.test_dataset = self._make_eval_dataset(cfg.test_list)

    def _train_loader(self):
        ds = self._make_train_dataset(self._data_rng)
        # multi-host: each process feeds its local devices a disjoint shard
        # — but ONLY when the batch actually shards across processes
        # (batch_scale > 1: dp/fsdp/dp-hybrids). A model-only axis (tp, sp,
        # depth, single pipeline group) REPLICATES the batch, so every host
        # must load the SAME samples (same seed -> same loader order);
        # disjoint shards there would silently place different data under a
        # replicated sharding (caught by the 2-process TP e2e test).
        shard = (
            (jax.process_index(), jax.process_count())
            if jax.process_count() > 1 and self.batch_scale > 1
            else None
        )
        n_local = self.batch_scale // max(1, jax.process_count())
        return PrefetchLoader(
            ds,
            batch_size=self.config.batchSize * max(1, n_local),
            shuffle=True,
            drop_last=True,
            num_threads=self.config.n_cpu,
            rng=self._data_rng,
            shard=shard,
        )

    # -- schedule -----------------------------------------------------------
    def update_learning_rate(self):
        """lr schedule. ``decay_mode='reference'`` reproduces the reference's
        accelerating decay (the decrement is recomputed from the already-
        mutated lr each epoch — CycTrainer.py:117-126 — so lr decays
        geometrically, never reaching 0); ``'linear'`` is the clean
        LambdaLR-style linear ramp to 0 the reference imports but never uses
        (utils.py:142-150). HD's D lr stays frozen either way (faithful to
        HdTrainer.py:163-164)."""
        if self.config.decay_mode == "linear":
            new_lr = max(0.0, self.lr - self.config.lr / self.config.decay_epoch)
        else:
            new_lr = self.lr - self.lr / self.config.decay_epoch
        if not self.quiet:
            print(f"update learning rate: {self.lr:f} -> {new_lr:f}")
        self.lr = new_lr
        if self.family not in ("hd1", "hd2"):
            self.lr_d = new_lr

    # -- checkpoint/resume --------------------------------------------------
    @property
    def ckpt_prefix(self):
        return f"{self.config.name}_{self.family}"

    @staticmethod
    def _is_host0() -> bool:
        return jax.process_index() == 0

    def _save(self, epoch, psnr=None, ssim_v=None):
        # canonical-state first, on EVERY host: for multi-host sharded
        # plans it is an all-gather COLLECTIVE — a host-0-only call would
        # desynchronize the collective streams (Gloo "collective mismatch"
        # crash, caught by the 2-process fsdp e2e test). Only the file
        # write below is host-0-only.
        state_dev = self._canonical_state()
        if not self._is_host0():
            # multi-host: only host 0 writes, all hosts read on resume
            # (shared storage convention)
            return None
        payload = {
            "state": jax.device_get(state_dev),
            "epoch": epoch,
            "lr": self.lr,
            "lr_d": self.lr_d,
        }
        if self.config.checkpoint_backend == "orbax":
            from ctagan_tpu.utils.checkpoint import save_checkpoint_orbax

            return save_checkpoint_orbax(
                self.config.save_root, self.ckpt_prefix, epoch, payload,
                psnr, ssim_v,
            )
        return save_checkpoint(
            self.config.save_root, self.ckpt_prefix, epoch, payload, psnr, ssim_v
        )

    def _load_payload(self, path, target):
        if path.endswith(".ocp"):
            from ctagan_tpu.utils.checkpoint import load_checkpoint_orbax

            return load_checkpoint_orbax(path, target)
        return load_checkpoint(path, target)

    def _try_resume(self):
        from ctagan_tpu.utils.checkpoint import find_checkpoints

        target = {
            "state": jax.device_get(self._canonical_state()),
            "epoch": 0,
            "lr": 0.0,
            "lr_d": 0.0,
        }
        # newest first; a checkpoint torn by a crash landing mid-write
        # (pre-atomic files, or a dying filesystem) must not wedge every
        # supervised retry — quarantine it and fall back to the next one
        for path, _epoch in find_checkpoints(
            self.config.save_root, self.ckpt_prefix
        ):
            try:
                payload = self._load_payload(path, target)
            except Exception as e:  # corrupt/truncated: skip, keep evidence
                quarantined = path + ".corrupt"
                try:
                    os.replace(path, quarantined)
                except OSError:
                    quarantined = path
                print(
                    f"[resume] checkpoint {path} unreadable ({e}) — "
                    f"quarantined as {quarantined}, trying the next newest",
                    file=sys.stderr,
                    flush=True,
                )
                continue
            self.state = self._place_state(payload["state"])
            self.start_epoch = int(payload["epoch"])
            self.lr = float(payload["lr"])
            self.lr_d = float(payload["lr_d"])
            if not self.quiet:
                print(f"resumed from {path} (epoch {self.start_epoch})")
            return

    def load_generator(self, path: str):
        if path.endswith((".pth", ".pt")):
            # reference PyTorch checkpoint -> native params (torch_import)
            from ctagan_tpu.models.torch_import import import_generator

            self._set_g_params(jax.device_put(import_generator(path)))
            return
        target = {
            "state": jax.device_get(self._canonical_state()),
            "epoch": 0,
            "lr": 0.0,
            "lr_d": 0.0,
        }
        payload = self._load_payload(path, target)
        self._set_g_params(jax.device_put(payload["state"].g_params))

    # -- loops --------------------------------------------------------------
    def _device_batch(self, batch):
        # pad to the per-process feed size (== global batch when single-host)
        n_local = max(1, self.batch_scale // max(1, jax.process_count()))
        batch, _ = pad_batch_to(batch, self.config.batchSize * n_local)
        db = self.plan.shard_batch(batch)
        return self._window_device_batch(db)

    def _window_device_batch(self, db):
        """device_windowing: the host uploaded raw uint16 stored pixels —
        derive the normalized views on device (bit-matched to the host
        codec, ops/windowing.py; locked by test). 2 x u16 per pair instead
        of 4 x f32 (dual-window) / 2 x f32 — the host->device link is the
        training-feed bottleneck on tunneled chips (95 ms/MB measured,
        docs/evidence/bench_eval_diag_r2.log)."""
        if not (
            self.config.device_windowing
            and "A" in db
            and jnp.issubdtype(db["A"].dtype, jnp.integer)
        ):
            return db
        from ctagan_tpu.ops.windowing import (
            dual_window_from_stored,
            fullrange_from_stored,
        )

        if self.dual_window:
            if self._dev_window_fn is None:

                @jax.jit
                def _dw(a, b):
                    a1, a2 = dual_window_from_stored(a)
                    b1, b2 = dual_window_from_stored(b)
                    return {"A1": a1, "A2": a2, "B1": b1, "B2": b2}

                self._dev_window_fn = _dw
            out = self._dev_window_fn(db["A"], db["B"])
        else:
            if self._dev_window_fn is None:

                @jax.jit
                def _fr(a, b):
                    return {
                        "A": fullrange_from_stored(a),
                        "B": fullrange_from_stored(b),
                    }

                self._dev_window_fn = _fr
            out = self._dev_window_fn(db["A"], db["B"])
        out.update({k: v for k, v in db.items() if k.endswith("_path")})
        return out

    def _check_loader(self, loader):
        if len(loader) == 0:
            n_local = self.batch_scale // max(1, jax.process_count())
            raise ValueError(
                f"train loader is EMPTY: the dataset has fewer samples than "
                f"one global batch (batchSize {self.config.batchSize} x "
                f"{max(1, n_local)} local devices = "
                f"{self.config.batchSize * max(1, n_local)}, drop_last). "
                "Reduce batchSize, train on fewer devices, or grow the "
                "training list — silently training on zero batches is never "
                "what you want."
            )
        return loader

    def train(self, max_steps_per_epoch: Optional[int] = None):
        cfg = self.config
        loader = self._check_loader(self._train_loader())
        logger = TrainLogger(
            cfg.name,
            cfg.total_epochs,
            len(loader),
            log_dir=cfg.save_root if self._is_host0() else None,
            log_every=cfg.log_every,
            quiet=self.quiet or not self._is_host0(),
            start_epoch=self.start_epoch,
        )
        # stall watchdog (SURVEY.md §5 failure detection): a wedged device
        # call never raises, so the emergency-checkpoint handler below can't
        # see it — the watchdog hard-exits instead and --supervise resumes
        # from the newest on-disk checkpoint.
        self._watchdog = None
        if cfg.stall_timeout and cfg.stall_timeout > 0:
            from ctagan_tpu.utils.watchdog import Watchdog

            self._watchdog = Watchdog(cfg.stall_timeout).start()
        try:
            self._train_epochs(cfg, loader, logger, max_steps_per_epoch)
        except (KeyboardInterrupt, Exception):
            # failure containment the reference lacks (a crash loses up to an
            # epoch, SURVEY.md §5): emergency checkpoint, then re-raise
            self._save(self._current_epoch)
            if not self.quiet:
                print(
                    f"\nemergency checkpoint saved at epoch {self._current_epoch}"
                )
            raise
        finally:
            if self._watchdog is not None:
                self._watchdog.stop()
                self._watchdog = None
        return self

    def _train_epochs(self, cfg, loader, logger, max_steps_per_epoch):
        from ctagan_tpu.utils.profiling import StepTimer

        timer = StepTimer()
        for epoch in range(self.start_epoch + 1, cfg.total_epochs + 1):
            self._current_epoch = epoch
            if epoch > cfg.n_epochs:
                self.update_learning_rate()
            if self.dual_window:
                # per-epoch oversampling redraw
                loader = self._check_loader(self._train_loader())
                logger.set_epoch_size(len(loader))
            pending = []  # device-side loss dicts; pulled lazily at log points

            def _device_batches():
                # one-batch lookahead: the next host->device transfer is
                # issued before the current step is consumed, so the copy
                # overlaps with compute (double buffering — replaces the
                # reference's DataLoaderX/DataPrefetcher role)
                nxt = None
                for b in loader:
                    cur, nxt = nxt, self._device_batch(b)
                    if cur is not None:
                        yield cur
                if nxt is not None:
                    yield nxt

            for i, db in enumerate(_device_batches()):
                if max_steps_per_epoch is not None and i >= max_steps_per_epoch:
                    for lo in pending:
                        logger.log({k: float(v) for k, v in lo.items()})
                    pending = []
                    logger.epoch += 1
                    logger.batch = 1
                    break
                first_step = epoch == self.start_epoch + 1 and i == 0
                if first_step and self._watchdog is not None:
                    # the first call compiles the whole step program —
                    # minutes through the remote tunnel; not a stall
                    self._watchdog.pause()
                try:
                    self.state, losses = self._step(
                        self.state, db, jnp.float32(self.lr),
                        jnp.float32(self.lr_d),
                    )
                finally:
                    if first_step and self._watchdog is not None:
                        self._watchdog.resume()
                # never sync the hot loop on fresh results: buffer the device
                # scalars and convert them once they're ancient history
                pending.append(losses)
                if len(pending) >= cfg.log_every or i + 1 == len(loader):
                    for lo in pending:
                        logger.log({k: float(v) for k, v in lo.items()})
                    pending = []
                    if cfg.live_panels:
                        self._refresh_live_panel(db)
                if (i + 1) % cfg.checkpoint_every_iters == 0:
                    self._save(epoch)
                timer.tick()
                if self._watchdog is not None:
                    self._watchdog.beat()
            if not self.quiet and timer.summary():
                s = timer.summary()
                print(
                    f"\n[epoch {epoch}] {s['steps_per_sec']:.2f} steps/s "
                    f"(p50 {s['p50_ms']:.1f} ms, p90 {s['p90_ms']:.1f} ms)"
                )
            if epoch % cfg.val_every == 0:
                if self._watchdog is not None:
                    # eval pays its own cold compile on the first call —
                    # don't count it against the training-loop heartbeat
                    self._watchdog.pause()
                try:
                    psnr_v, ssim_v = self.validate()
                finally:
                    if self._watchdog is not None:
                        self._watchdog.resume()
                if not self.quiet:
                    print(f"PSNR: {psnr_v}\nSSIM: {ssim_v}")
                self._log_val_dashboard(epoch, psnr_v, ssim_v)
                self._save(epoch, psnr_v, ssim_v)
                self._collapse_guard(epoch, float(psnr_v), float(ssim_v))
            else:
                self._save(epoch)
        return self

    # best validation seen this run: (psnr, checkpoint filename). The guard
    # tracks the stamped FILENAME, not a path returned by _save — the name
    # is a pure function of (prefix, epoch, metrics), so every host in a
    # multi-host run derives the identical restore target from its own
    # identical validate() numbers (no host-0 broadcast needed).
    _best_val = None

    def _collapse_guard(self, epoch: int, psnr_v: float, ssim_v: float):
        """GAN collapse guard (config ``collapse_guard``, default ON).

        The failure mode (observed on the 3.6x-corpus exact-semantics run,
        docs/evidence/quality_exact_r4.log: 27.5 dB -> 12.7 dB final): the
        discriminator — whose lr the HD recipe keeps frozen while G decays
        (HdTrainer.py:163-164) — eventually overpowers G and validation
        PSNR falls off a cliff. The reference ships whatever the final
        epoch is. Here, when a validation lands ``collapse_drop_db`` below
        the best-so-far, the FULL train state (G, R, D and optimizers)
        restores from the best metric-stamped checkpoint and the D lr
        backs off by ``collapse_lrd_backoff`` — semantics-preserving (no
        loss/augmentation change), and repeated collapses back D off
        geometrically. Returns True when it fired (unit-locked by
        tests/test_collapse_guard.py)."""
        from ctagan_tpu.utils.checkpoint import checkpoint_name

        cfg = self.config
        name = checkpoint_name(self.ckpt_prefix, epoch, psnr_v, ssim_v)
        if self.config.checkpoint_backend == "orbax":
            name = name[: -len(".ckpt")] + ".ocp"
        if self._best_val is None or psnr_v > self._best_val[0]:
            self._best_val = (psnr_v, name)
            return False
        best_psnr, best_name = self._best_val
        if not cfg.collapse_guard:
            return False
        if best_psnr - psnr_v < cfg.collapse_drop_db:
            return False
        best_path = os.path.join(cfg.save_root, best_name)
        if not os.path.exists(best_path):
            return False  # stamped best was pruned/moved — nothing to do
        target = {
            "state": jax.device_get(self._canonical_state()),
            "epoch": 0,
            "lr": 0.0,
            "lr_d": 0.0,
        }
        payload = self._load_payload(best_path, target)
        self.state = self._place_state(payload["state"])
        self.lr_d = float(self.lr_d) * float(cfg.collapse_lrd_backoff)
        if not self.quiet and self._is_host0():
            print(
                f"[collapse guard] val PSNR {psnr_v:.2f} fell "
                f"{best_psnr - psnr_v:.2f} dB below best {best_psnr:.2f} — "
                f"restored {best_name}, D lr backed off to {self.lr_d:g}",
                flush=True,
            )
        return True

    _live_panel_fwd = None  # lazy jitted (G fwd + u8 pack) for live panels

    def _refresh_live_panel(self, db):
        """Per-batch image panels at the logger cadence: the reference's
        visdom pushes real_A | fake_B | real_B on EVERY log call during
        training (trainer/utils.py:95-110); regenerating the dashboard only
        at epoch/val boundaries loses that cadence (VERDICT r4 missing #3).
        Renders the LIVE training batch's first sample through the current
        (EMA) generator into ``{name}_latest_panel.png`` + dashboard.html.
        Config ``live_panels`` (default ON). Cost control for tunneled
        chips: the panel is packed to uint8 ON DEVICE before the pull
        (3 x 0.25 MB instead of 3 MB f32 at 512²), one G forward per
        ``log_every`` steps — <1% of step time at the default cadence.
        Best-effort: a rendering hiccup never kills training."""
        cfg = self.config
        # multi-host: the live training batch is a GLOBAL array — any
        # host-0-only computation on it (slice, G forward, device pull)
        # desyncs the cluster's collectives and aborts the other hosts
        # (the r4 cross-host _save bug class; caught again by the
        # 2-process e2e suite). The epoch/val-boundary dashboard, which
        # builds its panel from a host-local val batch, still covers
        # multi-host observability.
        if jax.process_count() > 1:
            return
        if not self._is_host0() or not cfg.save_root:
            return
        try:
            from ctagan_tpu.utils.dashboard import write_dashboard
            from ctagan_tpu.utils.figures import write_png_gray

            if self.dual_window and "A2" in db:
                a, b = db["A2"], db["B2"]
            elif "A" in db and "B" in db:
                a, b = db["A"], db["B"]
            else:
                return
            if a.ndim != 4:  # 3-D volume families: no 2-D panel
                return
            if self._live_panel_fwd is None:
                u8 = lambda t: jnp.clip(
                    (t.astype(jnp.float32) + 1.0) * 127.5, 0, 255
                ).astype(jnp.uint8)

                @jax.jit
                def _fwd(params, a1, b1):
                    fake = self.g_eval.apply(params, a1)
                    return (
                        u8(a1[0, ..., a1.shape[-1] // 2]),
                        u8(fake[0, ..., 0]),
                        u8(b1[0, ..., 0]),
                    )

                self._live_panel_fwd = _fwd
            tiles = self._live_panel_fwd(self._g_params(), a[:1], b[:1])
            panel = np.hstack([np.asarray(t) for t in tiles])
            write_png_gray(
                os.path.join(
                    cfg.save_root, f"{cfg.name}_latest_panel.png"
                ),
                panel,
            )
            write_dashboard(cfg.save_root, cfg.name)
        except Exception as e:  # observability only — never fatal
            if not self.quiet:
                print(f"\n[live panel] skipped: {e}", file=sys.stderr)

    def _log_val_dashboard(self, epoch: int, psnr_v: float, ssim_v: float):
        """Validation observability (visdom replacement, utils.py:62-66):
        append the val metrics CSV, refresh the newest qualitative panel
        (input | synthesized | target on the first val slice), regenerate
        ``dashboard.html``. Best-effort — a rendering hiccup must never
        kill a training run."""
        cfg = self.config
        if not self._is_host0() or not cfg.save_root:
            return
        try:
            from ctagan_tpu.utils.dashboard import (
                append_val_csv,
                write_dashboard,
            )
            from ctagan_tpu.utils.figures import save_qualitative_panel

            append_val_csv(
                cfg.save_root, cfg.name, epoch, float(psnr_v), float(ssim_v)
            )
            loader = PrefetchLoader(
                self.val_dataset, batch_size=1, num_threads=0
            )
            batch = next(iter(loader), None)
            if batch is not None:
                a, b = self._val_pairs(batch)
                a_n = self._eval_input(jnp.asarray(np.asarray(a)))
                b_n = self._eval_input(jnp.asarray(np.asarray(b)))
                fake = self._gen_fwd(self._g_params(), a_n)
                a_np, f_np, b_np = (
                    np.asarray(t, np.float32) for t in (a_n, fake, b_n)
                )
                imgs = [
                    a_np[0, ..., a_np.shape[-1] // 2],  # center context slice
                    f_np[0, ..., 0],
                    b_np[0, ..., 0],
                ]
                save_qualitative_panel(
                    cfg.save_root, f"{cfg.name}_latest_panel", imgs
                )
            write_dashboard(cfg.save_root, cfg.name)
        except Exception as e:  # observability only — never fatal
            if not self.quiet:
                print(f"\n[dashboard] skipped: {e}", file=sys.stderr)

    def _val_pairs(self, batch):
        if self.dual_window and "A2" in batch:
            return batch["A2"], batch["B2"]
        # raw_feed mode yields A/B raw uint16 for BOTH families (the eval
        # pair is the full-range view in both); normalization happens on
        # device inside the jitted eval steps
        return batch["A"], batch["B"]

    def _eval_put(self, x):
        """Place an eval batch on the mesh: sharded over the data axis when
        the batch divides the device count (DP eval — the per-sample metric
        suite partitions trivially over the batch dim), else the default
        single-device placement. Single-process only: multi-host eval keeps
        each host's full loop for the host-0 aggregate print."""
        x = np.asarray(x)
        if (
            self.batch_scale > 1
            and jax.process_count() == 1
            and x.ndim >= 1
            and x.shape[0] % self.batch_scale == 0
        ):
            return jax.device_put(x, self.plan.batch_sharding())
        return jnp.asarray(x)

    @staticmethod
    def _eval_input(x):
        """Normalize a (possibly raw uint16) eval tensor on device —
        identity for float inputs."""
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.integer):
            from ctagan_tpu.ops.windowing import fullrange_from_stored

            return fullrange_from_stored(x)
        return x

    def validate(self):
        """Mean masked PSNR/SSIM over the val list (HdTrainer.py:230-281).

        Pipelined: every per-batch metric program is DISPATCHED before the
        first result is pulled (device programs execute in order, so one
        late drain overlaps the ~29 ms per-call tunnel latency across the
        whole list — same methodology as bench.py). ``eval_batch`` > 1
        additionally batches slices through one forward; the default of 1
        keeps arithmetic bit-identical to the reference's per-slice loop.
        """
        from collections import deque

        k = max(1, int(self.config.eval_batch))
        loader = PrefetchLoader(
            self.val_dataset, batch_size=k, num_threads=self.config.n_cpu
        )
        psnr_sum = ssim_sum = 0.0
        num = 0
        gp = self._g_params()
        pending = deque()

        def _drain_all():
            # ONE device concatenate + ONE host pull for the whole queue:
            # per-batch float() pulls cost a ~29 ms tunnel round-trip each
            # (bench_eval_diag_r2.log). Per-sample values identical; the
            # mean is still summed host-side in slice order.
            nonlocal psnr_sum, ssim_sum, num
            if not pending:
                return
            ps = np.asarray(jnp.concatenate([p for p, _ in pending]))
            ss = np.asarray(jnp.concatenate([s for _, s in pending]))
            pending.clear()
            for p_i, s_i in zip(ps, ss):
                psnr_sum += float(p_i)
                ssim_sum += float(s_i)
                num += 1

        for batch in loader:
            a, b = self._val_pairs(batch)
            pending.append(
                self._val_step(gp, self._eval_put(a), self._eval_put(b))
            )
            if len(pending) > 256:  # bound in-flight device memory
                _drain_all()
        _drain_all()
        if num == 0:
            return 0.0, 0.0
        return psnr_sum / num, ssim_sum / num

    def make_figures(self, out_dir: Optional[str] = None, limit: int = 8):
        """Qualitative PNG panels over the test list — the reference's
        ``testt()`` surface (HdTrainer.py:282-426) without cv2."""
        from ctagan_tpu.utils.figures import save_qualitative_panel

        out_dir = out_dir or os.path.join(self.config.image_save, "panels")
        loader = PrefetchLoader(
            self.test_dataset, batch_size=1, num_threads=self.config.n_cpu
        )
        gp = self._g_params()
        size = self.config.size
        for i, batch in enumerate(loader):
            if i >= limit:
                break
            a, b = self._val_pairs(batch)
            a_n, b_n = self._eval_input(a), self._eval_input(b)
            fake = np.asarray(self._gen_fwd(gp, a_n))[0, :, :, 0]
            # with 2.5-D context the CENTER channel is the input slice
            a_center = np.asarray(a_n)[0, :, :, a.shape[-1] // 2]
            save_qualitative_panel(
                out_dir,
                f"slice{i}",
                [a_center, np.asarray(b_n)[0, :, :, 0], fake],
                zoom_center=(size // 2, size // 2),
            )
        return out_dir

    def test(self, write_dicom: bool = True):
        cfg = self.config
        if cfg.generator_ckpt:
            self.load_generator(cfg.generator_ckpt)
        elif cfg.resume is False:
            found = find_latest_checkpoint(cfg.save_root, self.ckpt_prefix)
            if found:
                self.load_generator(found[0])
        k = max(1, int(cfg.eval_batch))
        loader = PrefetchLoader(
            self.test_dataset, batch_size=k, num_threads=cfg.n_cpu
        )
        writeback = (
            DicomWriteback(cfg.image_save)
            if write_dicom and self._is_host0()
            else None
        )
        from ctagan_tpu.ops.lpips import make_lpips_fn

        lpips_fn = make_lpips_fn(cfg.lpips_weights)
        rows = []
        gp = self._g_params()
        from ctagan_tpu.data.dicom import read_dicom as _rd

        def _se1_window(a_path):
            ds1 = _rd(a_path.replace("SE0", "SE1"))
            return ds1.window_center or 50.0, ds1.window_width or 400.0

        # SE1 header reads overlap with device compute: prefetched across
        # the whole test list by a thread pool instead of one blocking
        # host read per slice in the hot loop (HdTrainer.py:437-446)
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        files = list(getattr(self.test_dataset, "files_a", []))
        with ThreadPoolExecutor(max(1, cfg.n_cpu)) as pool:
            hdr_futures = {p: pool.submit(_se1_window, p) for p in files}

            pending = deque()  # (paths, fake_dev, metric_mat_dev) in order
            mats = []  # device-side (K, N) metric matrices; pulled ONCE
            all_paths = []
            # ONE dedicated writer thread: image pulls + DICOM emission
            # overlap device compute, and a single worker preserves the
            # submission order DicomWriteback's stateful patient/series
            # numbering requires
            writer = ThreadPoolExecutor(1) if writeback is not None else None
            writer_futures = []

            def _write_batch(paths, fake_dev):
                fake_np = np.asarray(fake_dev)  # int16 stored pixels
                for j, pth in enumerate(paths):
                    writeback.write(pth, fake_np[j])

            def _drain_one():
                # metric matrices stay on device until the end; the image
                # pull + writeback run on the writer thread
                paths, fake_dev, mat_dev = pending.popleft()
                mats.append(mat_dev)
                all_paths.extend(paths)
                if writer is not None:
                    writer_futures.append(
                        writer.submit(_write_batch, paths, fake_dev)
                    )

            for batch in loader:
                a, b = self._val_pairs(batch)
                paths = batch["A_path"]
                wcww = [
                    hdr_futures[p].result()
                    if p in hdr_futures
                    else _se1_window(p)
                    for p in paths
                ]
                if lpips_fn is None:
                    wc = jnp.asarray([x[0] for x in wcww], jnp.float32)
                    ww = jnp.asarray([x[1] for x in wcww], jnp.float32)
                    pending.append(
                        (
                            paths,
                            *self._test_step(
                                gp, self._eval_put(a), self._eval_put(b),
                                wc, ww,
                            ),
                        )
                    )
                    if len(pending) > 16:  # bound in-flight device memory
                        _drain_one()
                else:  # LPIPS path keeps the modular per-slice evaluator
                    a_n = self._eval_input(a)
                    fakes = np.asarray(self._gen_fwd(gp, a_n))
                    reals = np.asarray(self._eval_input(b))
                    for j, pth in enumerate(paths):
                        wc_j, ww_j = wcww[j]
                        fake = fakes[j, :, :, 0]
                        rows.append(
                            evaluate_pair(
                                fake, reals[j, :, :, 0], wc_j, ww_j,
                                lpips_fn=lpips_fn,
                            )
                        )
                        if writeback is not None:
                            writeback.write(pth, fake)
            while pending:
                _drain_one()
            if writer is not None:
                for f in writer_futures:
                    f.result()  # propagate writeback errors
                writer.shutdown()
            if mats:
                # one concatenate + one pull for every metric of every slice
                full = np.asarray(jnp.concatenate(mats, axis=1))
                for j in range(full.shape[1]):
                    rows.append(
                        {
                            mk: float(full[i, j])
                            for i, mk in enumerate(self._metric_keys)
                        }
                    )
        agg = aggregate(rows)
        if not self.quiet:
            for k in ("MAEw", "PSNRw", "SSIMw", "UQIw", "LPIPSw"):
                if k in agg:
                    print(f"{k}: {agg[k]}")
            print()
            for k in ("MAE", "PSNR", "SSIM", "UQI", "LPIPS"):
                if k in agg:
                    print(f"{k}: {agg[k]}")
            if "LPIPS" not in agg:
                # the reference always prints 10 aggregate numbers
                # (HdTrainer.py:553-564); state the two missing columns
                # explicitly rather than silently printing 8
                print(
                    "LPIPSw/LPIPS: not computed — no lpips_weights "
                    "configured (build the weights file with "
                    "`python -m ctagan_tpu.ops.lpips`)"
                )
        return agg


# ===========================================================================


class P2pTrainer(TrainerBase):
    family = "p2p"

    def _build_models(self):
        cfg = self.config
        # conditional D sees the (possibly 2.5-D) input stack + the output
        self.d_model = Discriminator(
            cfg.input_nc * cfg.context_slices + cfg.output_nc, dtype=_dtype(cfg)
        )

    def _init_state(self):
        self.key, k = jax.random.split(self.key)
        return steps.init_p2p_state(
            self.g_model,
            self.d_model,
            k,
            self.config.size,
            self.config.input_nc * self.config.context_slices,
            self.config.output_nc,
            ema=self.config.ema_decay > 0,
        )

    def _compile_step(self):
        cfg = {
            "P2P_lamda": self.config.P2P_lamda,
            "Adv_lamda": self.config.Adv_lamda,
            "noise_level": self.config.noise_level,
            "aligned_aug": self.config.aligned_aug,
            "grad_accum": self.config.grad_accum,
            "ema_decay": self.config.ema_decay or 0.999,
        }
        if self.config.mesh and self.plan.kind == "pp":
            # pipeline-parallel training: the generator staged GPipe-style
            # over the pp mesh; state arrives stage-packed (shard_state).
            # The schedule replaces the generator inside the SAME family
            # step, so losses/optimizer semantics are unchanged.
            from ctagan_tpu.parallel.pipeline import pp_train_step_fn

            if cfg["grad_accum"] > 1:
                raise ValueError(
                    "mesh.pp does not compose with grad_accum — the GPipe "
                    "schedule already microbatches (pp_microbatches)"
                )
            fn = pp_train_step_fn(
                self.g_model, self.d_model, self.tx, cfg,
                self.mesh, microbatches=self.config.pp_microbatches,
                schedule=self.config.pp_schedule,
            )

            def pp_step(state, batch, lr, lr_d):
                return fn(state, batch, lr)

            return pp_step

        fn = partial(steps.p2p_train_step, self.g_model, self.d_model, self.tx, cfg)

        @jax.jit
        def step(state, batch, lr, lr_d):
            return fn(state, batch, lr)

        return step


class CycTrainer(TrainerBase):
    family = "cyc"

    def _build_models(self):
        self.d_model = Discriminator(self.config.input_nc, dtype=_dtype(self.config))

    def _init_state(self):
        self.key, k = jax.random.split(self.key)
        return steps.init_cyc_state(
            self.g_model,
            self.d_model,
            k,
            self.config.size,
            self.config.input_nc,
            ema=self.config.ema_decay > 0,
        )

    def _compile_step(self):
        cfg = {
            "grad_accum": self.config.grad_accum,
            "Adv_lamda": self.config.Adv_lamda,
            "Cyc_lamda": self.config.Cyc_lamda,
            "noise_level": self.config.noise_level,
            "aligned_aug": self.config.aligned_aug,
            "ema_decay": self.config.ema_decay or 0.999,
        }
        fn = partial(steps.cyc_train_step, self.g_model, self.d_model, self.tx, cfg)

        @jax.jit
        def step(state, batch, lr, lr_d):
            return fn(state, batch, lr)

        return step

    def _g_params(self):
        if self.config.ema_decay > 0 and self.state.g_ema is not None:
            return self.state.g_ema
        return self.state.g_a2b_params

    def _set_g_params(self, params):
        self.state = self.state.replace(g_a2b_params=params)
        if self.state.g_ema is not None:
            self.state = self.state.replace(g_ema=params)


class RegTrainer(TrainerBase):
    family = "reg"

    def _build_models(self):
        cfg = self.config
        self.r_model = RegNet(
            cfg.input_nc, cfg.input_nc, dtype=_dtype(cfg),
            fuse_up=cfg.reg_fuse_up, tap_convs=_tap_convs(cfg),
            im2col_levels=(
                None if cfg.reg_im2col_levels == "auto"
                else cfg.reg_im2col_levels
            ),
        )
        self.d_model = Discriminator(cfg.input_nc, dtype=_dtype(cfg))

    def _init_state(self):
        self.key, k = jax.random.split(self.key)
        return steps.init_reg_state(
            self.g_model,
            self.r_model,
            self.d_model,
            k,
            self.config.size,
            self.config.input_nc,
            ema=self.config.ema_decay > 0,
        )

    def _step_cfg(self):
        c = self.config
        return {
            "Adv_lamda": c.Adv_lamda,
            "Corr_lamda": c.Corr_lamda,
            "Smooth_lamda": c.Smooth_lamda,
            "Adv_lamda1": c.Adv_lamda1,
            "Corr_lamda1": c.Corr_lamda1,
            "Corr_lamda2": c.Corr_lamda2,
            "FM_lamda": c.FM_lamda,
            "r1_gamma": c.r1_gamma,
            "noise_level": c.noise_level,
            "aligned_aug": c.aligned_aug,
            "warp_max_disp": c.warp_max_disp,
            "warp_impl": c.warp_impl,
            "reg_downsample": c.reg_downsample,
            "d_refwd": c.d_refwd,
            "grad_accum": c.grad_accum,
            "ema_decay": c.ema_decay or 0.999,
        }

    def _reg_step(self, dual_window_mode=False, stage2=False,
                  pass_lr_d=True):
        """Shared reg-family step compiler: the plain jitted
        ``steps.reg_train_step``, or — under ``mesh: {pp: N}`` — the same
        step with the generator pipelined GPipe-style
        (parallel/pipeline.py::pp_reg_train_step_fn). ``pass_lr_d`` False
        reproduces the RegGAN trainer's single-lr call (the reference's
        Reg family has no separate D lr, RegTrainer.py:148-159)."""
        cfg = self._step_cfg()
        if self.config.mesh and self.plan.kind == "pp":
            from ctagan_tpu.parallel.pipeline import pp_reg_train_step_fn

            if cfg["grad_accum"] > 1:
                raise ValueError(
                    "mesh.pp does not compose with grad_accum — the GPipe "
                    "schedule already microbatches (pp_microbatches)"
                )
            fn = pp_reg_train_step_fn(
                self.g_model, self.r_model, self.d_model, self.tx, cfg,
                self.mesh, microbatches=self.config.pp_microbatches,
                dual_window_mode=dual_window_mode, stage2=stage2,
                schedule=self.config.pp_schedule,
            )

            def pp_step(state, batch, lr, lr_d):
                return fn(state, batch, lr, lr_d if pass_lr_d else None)

            return pp_step

        fn = partial(
            steps.reg_train_step,
            self.g_model,
            self.r_model,
            self.d_model,
            self.tx,
            cfg,
        )

        @jax.jit
        def step(state, batch, lr, lr_d):
            return fn(
                state, batch, lr, lr_d=lr_d if pass_lr_d else None,
                dual_window_mode=dual_window_mode, stage2=stage2,
            )

        return step

    def _compile_step(self):
        return self._reg_step(pass_lr_d=False)


class HdTrainerStage1(RegTrainer):
    """CTA-GAN stage 1: RegGAN losses on dual-window data, separate D lr,
    45 epochs full-image (HdTrainer.py:94-281)."""

    family = "hd1"
    dual_window = True

    def _compile_step(self):
        return self._reg_step(dual_window_mode=True)


class HdTrainerStage2(RegTrainer):
    """CTA-GAN stage 2 fine-tune: multi-scale D (center-crop pyramid,
    w=[1.8, 0.2]), window-masked SR_loss2, bootstrapped from stage-1 weights
    (HdTrainer.py:605-803)."""

    family = "hd2"
    dual_window = True

    def _build_models(self):
        cfg = self.config
        self.r_model = RegNet(
            cfg.input_nc, cfg.input_nc, dtype=_dtype(cfg),
            fuse_up=cfg.reg_fuse_up, tap_convs=_tap_convs(cfg),
            im2col_levels=(
                None if cfg.reg_im2col_levels == "auto"
                else cfg.reg_im2col_levels
            ),
        )
        # reference defaults: num_D=1, center-crop pyramid (HdGan.py:208,251);
        # both overridable from YAML extras for multi-scale experiments
        self.d_model = MultiScaleDiscriminator(
            cfg.input_nc,
            num_d=int(cfg.extras.get("num_d", 1)),
            pyramid=str(cfg.extras.get("pyramid", "center_crop")),
            dtype=_dtype(cfg),
        )

    def _compile_step(self):
        return self._reg_step(dual_window_mode=True, stage2=True)

    def bootstrap_from_stage1(self, path: Optional[str] = None):
        """Load G and R from a stage-1 checkpoint (HdTrainer.py:697-699)."""
        path = path or self.config.stage1_ckpt
        if not path:
            # stage 1 may have run under any config name — find the newest
            # checkpoint with an ..._hd1 prefix in save_root (either backend)
            found = None
            if os.path.isdir(self.config.save_root):
                prefixes = {
                    f.split("_e")[0]
                    for f in os.listdir(self.config.save_root)
                    if "_hd1_e" in f and f.endswith((".ckpt", ".ocp"))
                }
                for pref in prefixes:
                    cand = find_latest_checkpoint(self.config.save_root, pref)
                    if cand and (found is None or cand[1] > found[1]):
                        found = cand
            if not found:
                raise FileNotFoundError(
                    "no stage-1 checkpoint found; set stage1_ckpt"
                )
            path = found[0]
        target = {
            "state": jax.device_get(self._canonical_state()),
            "epoch": 0,
            "lr": 0.0,
            "lr_d": 0.0,
        }
        # stage-1 state has a scalar-D param tree; restore G and R only
        import flax.serialization as ser

        if path.endswith(".ocp"):
            from ctagan_tpu.utils.checkpoint import _get_orbax

            ckptr = _get_orbax()
            ckptr.wait_until_finished()
            raw = ckptr.restore(os.path.abspath(path))
            st = ser.to_state_dict(raw["state"])
        else:
            with open(path, "rb") as f:
                raw = ser.msgpack_restore(f.read())
            st = raw["state"]
        # under pp the live g_params tree is stage-packed; template against
        # the canonical tree and re-place afterwards
        state_c = self._canonical_state()
        g_params = ser.from_state_dict(
            jax.device_get(state_c.g_params), st["g_params"]
        )
        r_params = ser.from_state_dict(
            jax.device_get(state_c.r_params), st["r_params"]
        )
        if self.config.mesh:
            self.state = self.plan.shard_state(
                state_c.replace(g_params=g_params, r_params=r_params),
                generator=self.g_model,
            )
        else:
            self.state = self.state.replace(
                g_params=jax.device_put(g_params),
                r_params=jax.device_put(r_params),
            )
        return self


class P3dTrainer(TrainerBase):
    """3-D volumetric pix2pix: paired depth-window patches, L1 + conditional
    LSGAN (new family — BASELINE.json's full-volume config; the reference
    has no 3-D path)."""

    family = "p3d"

    def _build_generator(self):
        from ctagan_tpu.models.volumetric import Generator3D

        ds = {1: (1, 1), 2: (1, 2), 4: (2, 2)}[self.config.depth_downsample]
        return Generator3D(
            self.config.input_nc, self.config.output_nc, depth_strides=ds,
            dtype=_dtype(self.config),
        )

    def _build_models(self):
        from ctagan_tpu.models.volumetric import Discriminator3D

        self.d_model = Discriminator3D(
            self.config.input_nc * 2, dtype=_dtype(self.config)
        )

    def _init_state(self):
        self.key, k = jax.random.split(self.key)
        return steps.init_p3d_state(
            self.g_model,
            self.d_model,
            k,
            self.config.patch_depth,
            self.config.size,
            self.config.input_nc,
            ema=self.config.ema_decay > 0,
        )

    def _compile_step(self):
        cfg = {
            "grad_accum": self.config.grad_accum,
            "P2P_lamda": self.config.P2P_lamda,
            "Adv_lamda": self.config.Adv_lamda,
            "ema_decay": self.config.ema_decay or 0.999,
        }
        fn = partial(steps.p3d_train_step, self.g_model, self.d_model, self.tx, cfg)

        @jax.jit
        def step(state, batch, lr, lr_d):
            return fn(state, batch, lr)

        return step

    @staticmethod
    def _eval_slices(x):
        return x[:, x.shape[1] // 2, :, :, 0]  # center depth slice

    def _make_train_dataset(self, rng):
        from ctagan_tpu.data.volumes import VolumePatchDataset

        return VolumePatchDataset(
            self.config.train_list,
            depth=self.config.patch_depth,
            size=self.config.size,
            train=True,
            rng=rng,
        )

    def _make_eval_dataset(self, list_file):
        from ctagan_tpu.data.volumes import VolumePatchDataset

        return VolumePatchDataset(
            list_file,
            depth=self.config.patch_depth,
            size=self.config.size,
            train=False,
        )

    def test(self, write_dicom: bool = False):
        """Patch-window evaluation on center slices; series-level DICOM
        emission goes through ``--mode infer`` (depth-blended)."""
        return super().test(write_dicom=write_dicom)


TRAINERS = {
    "P2p": P2pTrainer,
    "CycleGan": CycTrainer,
    "RegGan": RegTrainer,
    "HdGan": HdTrainerStage1,
    "HdGan2": HdTrainerStage2,
    "P3d": P3dTrainer,
}


def build_trainer(config: Config, quiet: bool = False) -> TrainerBase:
    """Name-dispatch matching the reference entry point (train.py:38-44),
    plus explicit stage selection for the HD family."""
    name = config.name
    if name not in TRAINERS:
        raise KeyError(f"unknown trainer '{name}' (have {sorted(TRAINERS)})")
    return TRAINERS[name](config, quiet=quiet)
