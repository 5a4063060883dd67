#!/usr/bin/env python3
"""End-to-end demo on a synthetic corpus (no hospital data needed).

Builds a synthetic paired NCCT/CTA DICOM tree, trains CTA-GAN stage 1 for a
couple of (tiny) epochs, fine-tunes stage 2, evaluates with the full metric
suite, emits a synthetic-CTA DICOM series, and renders qualitative panels.

Run: python examples/demo.py [--size 128] [--epochs 2] [--cpu]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--out", default="./demo_out")
    ap.add_argument("--cpu", action="store_true", help="force CPU platform")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ctagan_tpu.data.fixtures import make_corpus
    from ctagan_tpu.train import HdTrainerStage1, HdTrainerStage2
    from ctagan_tpu.utils.config import load_config

    root = os.path.join(args.out, "corpus")
    lists = make_corpus(root, n_patients=3, slices_per_patient=4, size=64)

    base = dict(
        noise_level=1,
        save_root=os.path.join(args.out, "model") + "/",
        image_save=os.path.join(args.out, "img") + "/",
        train_list=lists["train"],
        val_list=lists["val"],
        test_list=lists["test"],
        size=args.size,
        n_epochs=args.epochs,
        decay_epoch=1,
        batchSize=1,
        n_cpu=2,
        val_every=1,
    )

    print("=== stage 1 (RegGAN on dual-window data) ===")
    cfg1 = load_config({**base, "name": "HdGan"})
    t1 = HdTrainerStage1(cfg1)
    t1.train()

    print("=== stage 2 (multi-scale D fine-tune) ===")
    cfg2 = load_config({**base, "name": "HdGan2", "n_epochs": 1})
    t2 = HdTrainerStage2(cfg2)
    t2.bootstrap_from_stage1()
    t2.train()

    print("=== evaluation + DICOM emission ===")
    agg = t2.test()
    print({k: round(v, 4) for k, v in agg.items()})

    print("=== qualitative panels ===")
    print("panels at:", t2.make_figures(limit=4))


if __name__ == "__main__":
    main()
