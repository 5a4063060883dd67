"""Round-5 composed arm: certified perf modes + aligned_aug + r1_gamma.

Everything-on variant of quality_perfmode_r5.py (same corpus recipe, same
seed, same 62+26 schedule): the three certified perf modes PLUS the two
quality levers the r2d/r4 ablations proved out (pair-aligned augmentation
and the R1 discriminator penalty). Sets the repo's best-achievable point
on this corpus.

ROOFLINE.md prices the remaining single-chip headroom (322 sl/s) on
`pad_mode: zero`, and the perf-mode train ladder (67-70 ms HD step) on
`warp_max_disp: 4` + `reg_downsample: 2` — but the quality evidence
behind those modes was a 3-epoch A/B plus a pre-SSIM-fix 60-epoch run.
This arm reruns the FULL r4 exact-semantics recipe (identical
deterministic 3.6x corpus recipe, same seed 0, same 62+26 two-stage
schedule as docs/evidence/quality_exact_r4.log) with ONLY the three perf
modes flipped:

    pad_mode: zero, warp_max_disp: 4, reg_downsample: 2

Exact-arm numbers to compare against (quality_exact_r4.log):
  stage-1 best e4 27.549 dB / 0.9341; stage-2 best 30.06, final
  29.86/0.963; test() PSNRw 12.19 / raw 20.36/0.9816.
Done = quality within noise of those at the measured wall-clock saving.
Wall-clock is read from the per-epoch steps/s lines in both logs.
"""
import os
import re
import sys
import time

from ctagan_tpu.data.fixtures import make_corpus
from ctagan_tpu.train import build_trainer
from ctagan_tpu.utils.config import load_config

root = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.runs/qperf_aligned_r5"
os.makedirs(root, exist_ok=True)
print("run root:", root, flush=True)
if not os.path.exists(os.path.join(root, "train.txt")):
    lists = make_corpus(root, n_patients=40, slices_per_patient=18, size=512)
else:
    lists = {k: os.path.join(root, f"{k}.txt") for k in ("train", "val", "test")}

base = dict(
    size=512, batchSize=2, compute_dtype="bfloat16", val_every=2,
    save_root=os.path.join(root, "save") + "/",
    image_save=os.path.join(root, "img") + "/",
    train_list=lists["train"], val_list=lists["val"],
    test_list=lists["test"], n_cpu=4, seed=0, lr=1e-4, lrd=1e-4,
    Adv_lamda=1.0, Corr_lamda=20.0, Smooth_lamda=10.0, noise_level=1,
    ema_decay=0.999, eval_batch=4, stall_timeout=900.0,
    # the three perf modes under certification:
    pad_mode="zero", warp_max_disp=4, reg_downsample=2,
    aligned_aug=True, r1_gamma=0.1,
)

t0 = time.time()
save1 = os.path.join(root, "save")
has1 = os.path.isdir(save1) and any(
    f.startswith("HdGan_") for f in os.listdir(save1)
)
cfg1 = load_config(dict(base, name="HdGan", n_epochs=62, decay_epoch=8,
                        resume=has1))
tr1 = build_trainer(cfg1)
tr1.train()
print("stage1 final validate:", tr1.validate(), flush=True)
print(f"stage1 wall-clock: {time.time() - t0:.0f} s", flush=True)

stamp = re.compile(r"HdGan_hd1_e(\d+)_([0-9.]+)_([0-9.]+)\.ckpt$")
best = max(
    (
        (float(m.group(2)), os.path.join(save1, f))
        for f in os.listdir(save1)
        if (m := stamp.match(f))
    ),
    default=(None, None),
)
print("best stage-1 checkpoint:", best, flush=True)

t1 = time.time()
save2 = os.path.join(root, "save2") + "/"
cfg2 = load_config(dict(
    base, name="HdGan2", n_epochs=26, decay_epoch=4, save_root=save2,
    image_save=os.path.join(root, "img2") + "/",
    Adv_lamda1=1.0, Corr_lamda1=20.0, Corr_lamda2=2.0,
    stage1_ckpt=best[1],
    resume=os.path.isdir(save2) and any(
        f.startswith("HdGan2_") for f in os.listdir(save2)
    ),
))
tr2 = build_trainer(cfg2)
if not cfg2.resume:
    tr2.bootstrap_from_stage1()
tr2.train()
print("stage2 final validate:", tr2.validate(), flush=True)
print(f"stage2 wall-clock: {time.time() - t1:.0f} s", flush=True)
print("stage2 test() protocol:", flush=True)
agg = tr2.test(write_dicom=False)
print("TEST_AGG", {k: round(float(v), 4) for k, v in agg.items()}, flush=True)
print(f"total wall-clock: {time.time() - t0:.0f} s", flush=True)
