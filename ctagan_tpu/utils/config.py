"""Typed configuration with reference-YAML key compatibility.

The reference drives everything from a flat, schema-less YAML dict
(train.py:18-20, Yaml/*.yaml) that trainers mutate at runtime. Here the same
YAML files load into a validated dataclass; every reference key keeps its
exact name (including the ``Adv_lamda`` spellings) so existing configs work
unchanged, and new TPU-specific knobs get defaults.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import yaml


@dataclass
class Config:
    # --- identity / dispatch (Yaml/*.yaml) ---
    name: str = "P2p"
    noise_level: int = 1
    port: int = 8097  # kept for config-compat; visdom is replaced by CSV logs
    save_root: str = "./output/model/"
    image_save: str = "./output/img/"

    # --- loss weights ---
    Adv_lamda: float = 1.0
    Cyc_lamda: float = 10.0
    Corr_lamda: float = 20.0
    Smooth_lamda: float = 10.0
    P2P_lamda: float = 100.0
    Adv_lamda1: float = 1.0
    Adv_lamda2: float = 0.1
    Corr_lamda1: float = 20.0
    Corr_lamda2: float = 2.0
    FM_lamda: float = 0.0  # pix2pixHD feature matching (0 = reference behavior)
    # R1 gradient penalty on D(real) — opt-in GAN stabilizer for the
    # stage-2 fine-tune (observed collapse ~e14, VERDICT r1 #5); 0 keeps
    # exact reference semantics. Typical value 0.1-1.0.
    r1_gamma: float = 0.0

    # --- schedule ---
    epoch: int = 0  # starting epoch
    n_epochs: int = 60
    decay_epoch: int = 20
    lr: float = 1e-4
    lrd: float = 1e-4  # discriminator lr (HD family)
    batchSize: int = 1

    # --- data ---
    train_list: str = "./data/train.txt"
    val_list: str = "./data/val.txt"
    test_list: str = "./data/test.txt"
    size: int = 512
    input_nc: int = 1
    output_nc: int = 1
    n_cpu: int = 4

    # --- platform (reference: 'cuda'; kept, ignored on TPU) ---
    cuda: bool = True

    # --- TPU-native knobs (new) ---
    seed: int = 42
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16'
    decay_mode: str = "reference"  # 'reference' (accelerating quirk) | 'linear'
    unaligned: bool = False  # unpaired B sampling (CycleGAN-style)
    remat: bool = False  # rematerialize generator residual blocks
    checkpoint_backend: str = "msgpack"  # 'msgpack' | 'orbax' (async saves)
    context_slices: int = 1  # 2.5-D input context (odd; 1 = reference behavior)
    warp_max_disp: int = 0  # >0: gather-free local warp with this radius (px)
    # 'auto' (default): adaptive on TPU / gather on CPU; 'adaptive': exact
    # warp, static-shift fast path behind a data cond; 'gather': plain
    # gather formulation; 'dense': dynamic-ring variant (measured negative
    # result — see ops/warp.py). All numerically exact.
    warp_impl: str = "auto"
    reg_downsample: int = 1  # >1: registration net at reduced resolution
    reg_fuse_up: bool = False  # fold ResUNet up-path resize+concat into the
    # conv (phase decomposition; interior-exact, 1-px border approximated)
    reg_tap_convs: str = "auto"  # tap-decompose the RegNet's MXU-degenerate
    # 512² convs (input 2->32, flow head 32->2; ops/tap_conv.py). 'auto' =
    # on TPU at batch <= 8; 'on'/'off' force. Exact up to float ordering.
    reg_im2col_levels: Any = "auto"  # top-k RegNet levels run their 3x3
    # convs as im2col matmuls (dodges the degenerate small-C weight-grad
    # contractions in the backward). 'auto' = 1 level on TPU at batch <= 4
    # (measured: fused-grad HD step 85.7 -> 83.1 ms, k=2+ gives it back);
    # an int forces. Exact up to float ordering.
    pad_mode: str = "reflect"  # generator padding: 'reflect' (reference) or
    # 'zero' (fuses into convs, −12% fwd; for from-scratch training)
    fused_body: bool = False  # inference paths (val/test/figures/serving)
    # run the generator body through the fused conv+IN Pallas kernel
    # (+8.6% fwd at 512² b=32 on v5e; single-ulp bf16 differences)
    fused_body_grad: Any = "auto"  # TRAINING path: fused body with custom
    # VJP Pallas backward kernels (grad parity locked by tests); single-ulp
    # bf16 forward differences vs the op-by-op XLA body. 'auto' (default) =
    # on TPU (measured 96.7 -> 84.2 ms HD step; three full quality runs
    # trained through it incl. the anchor-crossing aligned_aug run);
    # True/'on' or False/'off' force. Same math, different float ordering.
    d_refwd: bool = True  # True (reference): D update re-forwards G with the
    # just-updated weights (HdTrainer.py:213-219); False: reuse the G-step's
    # fake image (one-step-stale, saves a full G forward per step)
    aligned_aug: bool = False  # True: A and B draw the SAME random affine
    # per pair (aligned augmentation). False (reference semantics): each
    # side draws independently — deliberate misalignment the RegNet learns
    # to bridge (HdTrainer.py:131-142 seeds A's transform only; B's draw is
    # left unseeded, so the pair is misaligned by a random relative affine)
    grad_accum: int = 1  # >1: split each (augmented) batch into this many
    # microbatches and accumulate grads via lax.scan before the optimizer
    # update (steps._grad_accum_scan) — reference-scale EFFECTIVE batches
    # at one microbatch's activation memory. Exact for P2p/RegGAN/HD1
    # (elementwise-mean losses; equality locked by tests); supported for
    # the P2p and Reg/HD families
    ema_decay: float = 0.0  # >0: keep an EMA of G params, used for eval
    compilation_cache: str = "auto"  # persistent XLA compile cache dir for
    # accelerator backends: 'auto' = ~/.cache/ctagan_tpu/jaxcache, a path =
    # that dir, 'off' = disabled. Kills the once-per-process cold compiles
    # on the tunneled TPU (first eval measured 160-340 s; cache probe r5:
    # >110 s cold -> 0.63 s warm across processes). CPU backends skip it
    # (their big SPMD executables don't serialize).
    device_windowing: bool = True  # feed raw uint16 pixels and derive the
    # windowed/full-range views ON DEVICE (ops/windowing.py, bit-matched to
    # the host codec) — 2-6x fewer host->device bytes; False = host-side
    # normalization (round-1 behavior)
    eval_batch: int = 1  # slices per val/test device call; 1 = bit-exact
    # reference per-slice arithmetic, >1 batches the forward+metrics
    # (per-sample metrics via vmap; faster on the tunnel-latency floor)
    patch_depth: int = 8  # 3-D family (P3d): slices per depth window
    infer_depth_sharded: bool = False  # P3d --mode infer: EXACT whole-series
    # synthesis with the depth axis halo-sharded over the mesh
    # (parallel.volume.infer_volume_depth_sharded) instead of Hann-blended
    # depth windows; requires depth_downsample 1 (falls back with a warning)
    depth_downsample: int = 1  # P3d: depth reduction in the generator body
    # (1 = anisotropic default, full-depth body; 2/4 for thin-slice series)
    data_parallel: bool = True  # shard batch over all local devices
    mesh: Dict[str, int] = field(default_factory=dict)  # explicit
    # parallelism plan, e.g. {dp: 2, fsdp: 4} / {tp: 4} / {sp: 8} /
    # {depth: 8} / {pp: 3}: dp = data parallelism (batch sharding), fsdp =
    # ZeRO-3 state sharding (batch shards over this axis too), tp = Megatron
    # channel sharding of the generator body, sp = spatial (H-row)
    # activation sharding, depth = 3-D volume D-axis sharding (P3d), pp =
    # GPipe pipeline staging of the generator's residual body
    # (parallel/pipeline.py; P2p and reg/HD families — R/D replicate —
    # body blocks must divide pp).
    # At most one of fsdp/tp/sp/depth/pp may exceed 1; dp composes with any
    # single one ({dp: 2, pp: 4} = 2 data-parallel pipeline groups).
    # Empty (default) = the legacy data_parallel behavior. When a model
    # axis is active the Pallas fused paths are gated off (single-device
    # programs — GSPMD can't partition them); everything else is the plain
    # jitted step, sharded by placement (parallel/mesh.py::plan_from_spec).
    pp_microbatches: int = 2  # mesh.pp > 1: microbatches per step in the
    # GPipe schedule (batchSize must divide by it; more microbatches =
    # smaller pipeline fill/drain bubble, finer activation stashes)
    pp_schedule: str = "gpipe"  # mesh.pp > 1: 'gpipe' (scan forward,
    # backward = autodiff transpose; stashes grow with pp_microbatches) or
    # '1f1b' (hand-scheduled one-forward-one-backward: each microbatch's
    # backward starts as soon as the last stage finishes it, stage-input
    # stashes bounded at O(stages) with the stage forward recomputed in
    # its backward tick — the deep-pipeline / many-microbatch memory mode)
    # --- GAN collapse guard (default ON; semantics-preserving) ---
    # The reference's HD recipe has no defense against late-run GAN collapse
    # (HdTrainer.py:184-280 only stamps metrics into checkpoint names):
    # measured on the 3.6x corpus, the exact-semantics arm collapses from
    # 27.5 dB to 12.7 dB and SHIPS the collapsed final model. The guard
    # watches the val-PSNR curve the trainer already computes: when a
    # validation lands >= collapse_drop_db BELOW the best-so-far, it
    # restores the best metric-stamped checkpoint (full train state — G, R
    # and the collapsed D) and backs the D learning rate off by
    # collapse_lrd_backoff. Loss math, augmentation and optimizer semantics
    # are untouched — this is a training-control policy (like early
    # stopping), so it stays ON by default; r1_gamma remains the stronger
    # opt-in stabilizer that does change the loss.
    collapse_guard: bool = True
    collapse_drop_db: float = 6.0  # val-PSNR drop (dB) below best that fires
    collapse_lrd_backoff: float = 0.5  # D-lr multiplier on each fire
    val_every: int = 5  # epochs between validations (reference: hardcoded 5)
    log_every: int = 50  # steps between stdout log lines
    live_panels: bool = True  # per-batch image panels at the log cadence:
    # refresh {name}_latest_panel.png + dashboard.html from the live
    # training batch every log_every steps (the reference's visdom pushes
    # image panels on every log call, trainer/utils.py:95-110); uint8
    # device-side pack keeps the pull <1% of step time on tunneled chips
    checkpoint_every_iters: int = 40000  # HD mid-epoch checkpoint cadence
    resume: bool = False  # resume from newest checkpoint in save_root
    stall_timeout: float = 0.0  # >0: arm a per-process stall watchdog — if
    # no training-loop heartbeat lands for this many seconds (a wedged
    # tunnel/device call, the observed futex-wait failure mode), hard-exit
    # with code 42 so `train.py --supervise N` restarts with resume. Set
    # comfortably above the cold-compile ceiling (160-340 s observed);
    # 1200 is a good production value. 0 = off.
    generator_ckpt: str = ""  # explicit checkpoint for test()
    stage1_ckpt: str = ""  # HD stage-2 bootstrap (netG/R from stage 1)
    lpips_weights: str = ""  # torch LPIPS(alex) weights; metric gated if empty
    compile_cache_dir: str = "~/.cache/ctagan_tpu/jax"  # persistent XLA
    # compilation cache (cold jit of the eval/train graphs measured
    # 160-340 s through the tunnel — pay it once per MACHINE, not per
    # process); "" disables

    extras: Dict[str, Any] = field(default_factory=dict)

    @property
    def total_epochs(self) -> int:
        return self.n_epochs + self.decay_epoch

    def validate(self):
        if self.size % 4 != 0:
            raise ValueError("size must be divisible by 4 (generator strides)")
        if self.compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unknown compute_dtype {self.compute_dtype}")
        if self.decay_mode not in ("reference", "linear"):
            raise ValueError(f"unknown decay_mode {self.decay_mode}")
        if self.checkpoint_backend not in ("msgpack", "orbax"):
            raise ValueError(f"unknown checkpoint_backend {self.checkpoint_backend}")
        if self.batchSize < 1:
            raise ValueError("batchSize must be >= 1")
        if self.pad_mode not in ("reflect", "zero"):
            raise ValueError("pad_mode must be 'reflect' or 'zero'")
        if self.warp_impl not in ("auto", "adaptive", "dense", "gather"):
            raise ValueError(
                "warp_impl must be 'auto', 'adaptive', 'dense' or 'gather'"
            )
        if self.reg_tap_convs not in ("auto", "on", "off"):
            raise ValueError("reg_tap_convs must be 'auto', 'on' or 'off'")
        if self.reg_im2col_levels != "auto" and not (
            isinstance(self.reg_im2col_levels, int)
            and 0 <= self.reg_im2col_levels <= 7
        ):
            raise ValueError("reg_im2col_levels must be 'auto' or an int 0..7")
        if self.fused_body_grad not in (True, False, "auto", "on", "off"):
            raise ValueError(
                "fused_body_grad must be a bool, 'auto', 'on' or 'off'"
            )
        if self.mesh:
            if not isinstance(self.mesh, dict):
                raise ValueError("mesh must be a dict of axis extents")
            unknown = set(self.mesh) - {"dp", "fsdp", "tp", "sp", "depth",
                                        "pp"}
            if unknown:
                raise ValueError(
                    f"unknown mesh axes {sorted(unknown)} "
                    "(have dp/fsdp/tp/sp/depth/pp)"
                )
            for k, v in self.mesh.items():
                if not isinstance(v, int) or v < 1:
                    raise ValueError(f"mesh.{k} must be an int >= 1, got {v!r}")
            if sum(
                int(self.mesh.get(k, 1)) > 1
                for k in ("fsdp", "tp", "sp", "depth", "pp")
            ) > 1:
                raise ValueError(
                    "at most one of mesh.fsdp/tp/sp/depth/pp may exceed 1 "
                    "(dp composes with any single one)"
                )
            if int(self.mesh.get("pp", 1)) > 1:
                # under dp x pp each data-parallel pipeline group runs the
                # schedule on its own batchSize-sized shard, so the
                # per-group batch is what must split into microbatches
                if self.batchSize % self.pp_microbatches != 0:
                    raise ValueError(
                        f"batchSize {self.batchSize} must divide into "
                        f"pp_microbatches {self.pp_microbatches}"
                    )
        if self.pp_microbatches < 1:
            raise ValueError("pp_microbatches must be an int >= 1")
        if self.pp_schedule not in ("gpipe", "1f1b"):
            raise ValueError(
                f"pp_schedule must be 'gpipe' or '1f1b', got "
                f"{self.pp_schedule!r}"
            )
        if self.collapse_drop_db <= 0:
            raise ValueError("collapse_drop_db must be > 0")
        if not (0 < self.collapse_lrd_backoff <= 1):
            raise ValueError("collapse_lrd_backoff must be in (0, 1]")
        if self.depth_downsample not in (1, 2, 4):
            raise ValueError("depth_downsample must be 1, 2 or 4")
        if self.patch_depth % self.depth_downsample != 0:
            raise ValueError("patch_depth must be divisible by depth_downsample")
        return self


def enable_compile_cache(cache_dir: str) -> bool:
    """Point JAX's persistent compilation cache at ``cache_dir`` (expanded).

    Cold jit of the train/eval graphs costs 160-340 s through the TPU
    tunnel (docs/evidence/bench_eval3_r2.log) — the persistent cache pays
    that once per machine instead of once per process. Fail-safe: returns
    False (and changes nothing) if the backend rejects the cache or the
    directory cannot be created.
    """
    if not cache_dir:
        return False
    import os

    try:
        import jax

        path = os.path.expanduser(cache_dir)
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every compile that took >=2 s; tiny programs stay uncached
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        return True
    except Exception:
        return False


def load_config(path_or_dict) -> Config:
    """Load a reference-style YAML (or dict) into a Config."""
    if isinstance(path_or_dict, dict):
        raw = dict(path_or_dict)
    else:
        with open(path_or_dict) as f:
            raw = yaml.safe_load(f) or {}
    known = {f.name for f in dataclasses.fields(Config)}
    kwargs = {k: v for k, v in raw.items() if k in known}
    extras = {k: v for k, v in raw.items() if k not in known}
    cfg = Config(**kwargs)
    cfg.extras = extras
    return cfg.validate()
