"""Full quality run on hardware with the NEW exact-path defaults (no opt-in
perf modes): HD stage-1 60 epochs + stage-2 fine-tune 20 epochs, 512^2 b=2
bf16, 180-slice synthetic corpus (same generator as quality_smoke).
Archived r1b comparator (perf-mode): stage1 best 30.38 dB / stage2 best
32.90 dB / 0.9855 SSIM."""
import os, tempfile

from ctagan_tpu.data.fixtures import make_corpus
from ctagan_tpu.train import build_trainer
from ctagan_tpu.utils.config import load_config

root = tempfile.mkdtemp(prefix="qf_corpus_")
lists = make_corpus(root, n_patients=15, slices_per_patient=12, size=512)
base = dict(
    size=512, batchSize=2, compute_dtype="bfloat16", val_every=3,
    save_root=os.path.join(root, "save") + "/",
    image_save=os.path.join(root, "img") + "/",
    train_list=lists["train"], val_list=lists["val"],
    test_list=lists["test"], n_cpu=4, seed=0, lr=1e-4, lrd=1e-4,
    Adv_lamda=1.0, Corr_lamda=20.0, Smooth_lamda=10.0, noise_level=1,
    ema_decay=0.999,
)
cfg1 = load_config(dict(base, name="HdGan", n_epochs=55, decay_epoch=5))
tr1 = build_trainer(cfg1)
tr1.train()
print("stage1 final validate:", tr1.validate(), flush=True)

cfg2 = load_config(dict(
    base, name="HdGan2", n_epochs=18, decay_epoch=2,
    Adv_lamda1=1.0, Corr_lamda1=20.0, Corr_lamda2=2.0,
))
tr2 = build_trainer(cfg2)
tr2.bootstrap_from_stage1()
tr2.train()
print("stage2 final validate:", tr2.validate(), flush=True)
