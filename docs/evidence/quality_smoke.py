"""Quality smoke on real TPU with the NEW exact-path defaults (tap heads +
adaptive warp, no opt-in perf modes): HD stage-1, 512^2 b=2, 6 epochs on a
180-slice synthetic corpus. Sanity: val PSNR at e3/e6 should track the
archived r1b trajectory (27.0 / 28.6 dB, quality_60epoch_perfmode_r1b.log;
different corpus geometry + exact-vs-perf mode, so +-1.5 dB is in-family).
"""
import os, tempfile

from ctagan_tpu.data.fixtures import make_corpus
from ctagan_tpu.train import build_trainer
from ctagan_tpu.utils.config import load_config

root = tempfile.mkdtemp(prefix="qs_corpus_")
lists = make_corpus(root, n_patients=15, slices_per_patient=12, size=512)
cfg = load_config({
    "name": "HdGan", "size": 512, "batchSize": 2, "n_epochs": 6,
    "decay_epoch": 1, "compute_dtype": "bfloat16", "val_every": 3,
    "save_root": os.path.join(root, "save") + "/",
    "image_save": os.path.join(root, "img") + "/",
    "train_list": lists["train"], "val_list": lists["val"],
    "test_list": lists["test"], "n_cpu": 4, "seed": 0,
    "lr": 1e-4, "lrd": 1e-4,
    "Adv_lamda": 1.0, "Corr_lamda": 20.0, "Smooth_lamda": 10.0,
    "noise_level": 1,
})
tr = build_trainer(cfg)
tr.train()
print("final validate:", tr.validate(), flush=True)
