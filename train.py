#!/usr/bin/env python3
"""CLI entry point: config-driven trainer dispatch.

TPU-native counterpart of the reference's train.py (reference train.py:31-45):
``python train.py --config configs/HdGan.yaml [--mode train|test|train_test]``.
Unlike the reference (which comments/uncomments ``trainer.train()`` by hand
and needs manual class renames for the HD stages), the mode is a flag and
every documented trainer name dispatches cleanly; HD stage 2 bootstraps from
the newest stage-1 checkpoint automatically.
"""
from __future__ import annotations

import argparse
import random

import numpy as np


def seed_everything(seed: int):
    random.seed(seed)
    np.random.seed(seed)
    # device-side randomness is fully controlled by explicit jax PRNG keys
    # derived from config.seed (no global torch/cudnn state to pin).


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--config", type=str, default="configs/HdGan.yaml",
        help="Path to the config file.",
    )
    parser.add_argument(
        "--mode", type=str, default="test",
        choices=["train", "test", "train_test", "infer", "figures", "serve",
                 "export"],
        help="What to run (the reference hardcodes test; train by editing).",
    )
    parser.add_argument(
        "--out", type=str, default=None,
        help="export mode: artifact output path (default "
        "<save_root>/generator.ctax).",
    )
    parser.add_argument(
        "--max-steps", type=int, default=None,
        help="Optional cap on train steps per epoch (smoke runs).",
    )
    parser.add_argument(
        "--series", type=str, default=None,
        help="infer mode: path to an SE0 series directory (whole volume).",
    )
    parser.add_argument(
        "--train-list", type=str, default=None,
        help="Override config train_list (path-list file).",
    )
    parser.add_argument(
        "--val-list", type=str, default=None,
        help="Override config val_list.",
    )
    parser.add_argument(
        "--test-list", type=str, default=None,
        help="Override config test_list — e.g. a per-vendor list from "
        "`python -m ctagan_tpu.data.corpus --equip-split`.",
    )
    parser.add_argument(
        "--resume", action="store_true",
        help="Force resume from the newest checkpoint (overrides config).",
    )
    parser.add_argument(
        "--platform", type=str, default=None, choices=["cpu", "tpu"],
        help="Override the JAX platform (default: environment's). "
        "'cpu' enables CPU-host runs — e.g. driving a mesh: config on "
        "virtual devices (see --host-devices) or smoke-training without "
        "an accelerator.",
    )
    parser.add_argument(
        "--host-devices", type=int, default=0, metavar="N",
        help="With --platform cpu: present N virtual CPU devices "
        "(XLA_FLAGS --xla_force_host_platform_device_count) so mesh: "
        "configs (dp/fsdp/tp/sp/depth/pp) run on a single host.",
    )
    parser.add_argument(
        "--supervise", type=int, default=0, metavar="N",
        help="Run the command under the crash/stall supervisor: on any "
        "non-zero exit (crash, OOM-kill, or the config stall_timeout "
        "watchdog detecting a wedged device call) re-launch up to N times "
        "with --resume so training continues from the newest checkpoint.",
    )
    opts = parser.parse_args()

    if opts.supervise > 0:
        # child processes run the identical command minus --supervise;
        # supervise() appends --resume from the second attempt on
        import sys

        from ctagan_tpu.utils.watchdog import supervise

        argv = [sys.executable] + [
            a for a in sys.argv if not a.startswith("--supervise")
        ]
        # drop a split "--supervise N" form too
        if "--supervise" in sys.argv:
            i = sys.argv.index("--supervise")
            argv = [sys.executable] + [
                a for j, a in enumerate(sys.argv) if j not in (i, i + 1)
            ]
        raise SystemExit(supervise(argv, max_restarts=opts.supervise))

    if opts.host_devices > 0:
        # must land in XLA_FLAGS before the CPU backend initializes (it is
        # lazy, so setting it here — even though the site hook already
        # imported jax — is early enough)
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={opts.host_devices}"
        )
    if opts.platform:
        import jax

        jax.config.update("jax_platforms", opts.platform)

    from ctagan_tpu.train import build_trainer
    from ctagan_tpu.utils.config import enable_compile_cache, load_config

    config = load_config(opts.config)
    if opts.resume:
        config.resume = True
    # Cold jit of the train/eval graphs costs 160-340 s through the TPU
    # tunnel; the persistent cache pays it once per machine.
    enable_compile_cache(config.compile_cache_dir)
    if opts.train_list:
        config.train_list = opts.train_list
    if opts.val_list:
        config.val_list = opts.val_list
    if opts.test_list:
        config.test_list = opts.test_list
    seed_everything(config.seed)
    trainer = build_trainer(config)
    if config.name == "HdGan2" and trainer.start_epoch == 0:
        # only bootstrap a FRESH stage-2 run; a resumed run (start_epoch > 0)
        # already carries its own fine-tuned weights
        try:
            trainer.bootstrap_from_stage1()
        except FileNotFoundError:
            print("warning: no stage-1 checkpoint found; training from scratch")

    if opts.mode in ("train", "train_test"):
        trainer.train(max_steps_per_epoch=opts.max_steps)
    if opts.mode in ("test", "train_test"):
        trainer.test()
    if opts.mode == "figures":
        print("panels:", trainer.make_figures())
    if opts.mode == "infer":
        if not opts.series:
            parser.error("--mode infer requires --series <SE0 dir>")
        from ctagan_tpu.parallel.serve import infer_series

        out = infer_series(trainer, opts.series, config.image_save)
        print("synthetic CTA written to:", out)
    if opts.mode == "export":
        import os

        from ctagan_tpu.serving.export import export_generator
        from ctagan_tpu.utils.checkpoint import find_latest_checkpoint

        if config.generator_ckpt:
            trainer.load_generator(config.generator_ckpt)
        else:
            found = find_latest_checkpoint(config.save_root, trainer.ckpt_prefix)
            if found:
                trainer.load_generator(found[0])
        out = opts.out or os.path.join(config.save_root, "generator.ctax")
        export_generator(
            trainer.g_eval, trainer._g_params(), out, size=config.size,
            channels=config.input_nc * config.context_slices,
            platforms=("tpu", "cpu"),
        )
        print("artifact written to:", out)
    if opts.mode == "serve":
        from ctagan_tpu.serving.server import serve
        from ctagan_tpu.utils.checkpoint import find_latest_checkpoint

        if config.generator_ckpt:
            trainer.load_generator(config.generator_ckpt)
        else:
            found = find_latest_checkpoint(config.save_root, trainer.ckpt_prefix)
            if found:
                trainer.load_generator(found[0])
        port = int(config.extras.get("serve_port", 8080))
        quantize = str(config.extras.get("serve_quantize", "") or "")
        print(
            f"serving CT->CTA synthesis on :{port} (POST /synthesize)"
            + (f" [{quantize}]" if quantize else "")
        )
        serve(
            trainer.g_eval, trainer._g_params(), port=port, size=config.size,
            quantize=quantize,
            channels=config.input_nc * config.context_slices,
        )


if __name__ == "__main__":
    main()
