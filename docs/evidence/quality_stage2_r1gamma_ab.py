"""Stage-2 GAN-collapse stabilizer A/B (VERDICT r1 #5 tail).

Usage: python quality_stage2_r1gamma_ab.py <corpus_root> [r1_gamma]

Reuses the corpus + stage-1 checkpoint produced by quality_detcorpus_r2.py
(<corpus_root> is the temp dir it printed) and reruns ONLY stage 2 with the
opt-in R1 gradient penalty (config ``r1_gamma``) on the discriminator, same
seed. The main run's stage 2 is the gamma=0 baseline; compare per-epoch val
PSNR/SSIM trajectories for collapse (a sudden multi-dB PSNR drop) and the
best-epoch numbers.
"""
import os
import sys

from ctagan_tpu.train import build_trainer
from ctagan_tpu.utils.config import load_config

root = sys.argv[1]
gamma = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
print("corpus:", root, "r1_gamma:", gamma, flush=True)
base = dict(
    size=512, batchSize=2, compute_dtype="bfloat16", val_every=3,
    save_root=os.path.join(root, "save") + "/",
    image_save=os.path.join(root, "img_r1g") + "/",
    train_list=os.path.join(root, "train.txt"),
    val_list=os.path.join(root, "val.txt"),
    test_list=os.path.join(root, "test.txt"),
    n_cpu=4, seed=0, lr=1e-4, lrd=1e-4,
    Adv_lamda=1.0, Corr_lamda=20.0, Smooth_lamda=10.0, noise_level=1,
    ema_decay=0.999, eval_batch=4,
)
# separate save_root so the A/B never collides with the baseline's
# checkpoints; the stage-1 checkpoint is discovered in the main save dir
from ctagan_tpu.utils.checkpoint import find_latest_checkpoint

main_save = base["save_root"]
found = None
for f in os.listdir(main_save):
    if "_hd1_e" in f:
        cand = find_latest_checkpoint(main_save, f.split("_e")[0])
        if cand and (found is None or cand[1] > found[1]):
            found = cand
assert found, f"no stage-1 checkpoint under {main_save}"
print("stage1 ckpt:", found[0], flush=True)

cfg2 = load_config(dict(
    base, name="HdGan2", n_epochs=18, decay_epoch=2,
    save_root=os.path.join(root, "save_r1g") + "/",
    Adv_lamda1=1.0, Corr_lamda1=20.0, Corr_lamda2=2.0, r1_gamma=gamma,
))
tr2 = build_trainer(cfg2)
tr2.bootstrap_from_stage1(found[0])
tr2.train()
print("stage2(r1_gamma=%s) final validate:" % gamma, tr2.validate(), flush=True)
