"""r2 eval-throughput A/B AFTER the fix pair (run serialized on hardware):

  (a) batched metric pulls — validate()/test() now pull ONE concatenated
      metric matrix instead of one ~29 ms tunnel round-trip per scalar
      (the diag showed 64 scalar pulls cost 1.9 s of the 2.1 s loop);
  (b) device_windowing — the loaders feed raw uint16 stored pixels and the
      normalized views are derived on device (LUT, bit-exact), cutting
      host->device bytes 2x (paired) / 6x (dual-window) on the ~95 ms/MB
      tunnel uplink.

Baseline (bench_s8_eval_r2.log, pre-fix): validate 10.0/19.6 sl/s
(eval_batch 1/8), test 2.3 sl/s. VERDICT r1 #4 target: test() >= 5x.
"""
import os, tempfile, time

import jax

from ctagan_tpu.data.fixtures import make_corpus
from ctagan_tpu.train import build_trainer
from ctagan_tpu.utils.config import load_config

print("devices:", jax.devices(), flush=True)

root = tempfile.mkdtemp(prefix="evalbench2_")
lists = make_corpus(root, n_patients=6, slices_per_patient=16, size=512)

for dw in (True, False):
    for eb in (1, 8):
        cfg = load_config(dict(
            name="P2p", size=512, compute_dtype="bfloat16", fused_body=True,
            eval_batch=eb, device_windowing=dw,
            train_list=lists["train"], val_list=lists["val"],
            test_list=lists["test"],
            save_root=os.path.join(root, f"m{dw}{eb}") + "/",
            image_save=os.path.join(root, f"i{dw}{eb}") + "/",
            n_cpu=4, seed=0,
        ))
        t = build_trainer(cfg, quiet=True)
        n_val = len(t.val_dataset)
        t.validate()  # compile
        t0 = time.perf_counter()
        psnr, ssim = t.validate()
        dt = time.perf_counter() - t0
        print(f"validate dw={int(dw)} eb={eb}: {n_val} slices in {dt:.2f}s "
              f"= {n_val/dt:.1f} sl/s (psnr {psnr:.2f} ssim {ssim:.3f})",
              flush=True)
        n_test = len(t.test_dataset)
        t0 = time.perf_counter()
        agg = t.test(write_dicom=True)
        dt = time.perf_counter() - t0
        print(f"test     dw={int(dw)} eb={eb}: {n_test} slices in {dt:.2f}s "
              f"= {n_test/dt:.1f} sl/s (PSNR {agg.get('PSNR'):.2f} "
              f"SSIM {agg.get('SSIM'):.3f})", flush=True)

# HD-family dual-window training-feed A/B: per-step wall including the
# host->device feed (the 6x-byte win shows up here, not in the step math).
# Times the trainer's own feed path (_device_batch incl. on-device window
# derivation) + _step, skipping epoch-end validate/checkpoint noise.
import jax.numpy as jnp

for dw in (True, False):
    cfg = load_config(dict(
        name="HdGan", size=512, batchSize=1, compute_dtype="bfloat16",
        device_windowing=dw, n_epochs=1, decay_epoch=1,
        train_list=lists["train"], val_list=lists["val"],
        test_list=lists["test"],
        save_root=os.path.join(root, f"hd{dw}") + "/",
        image_save=os.path.join(root, f"hi{dw}") + "/",
        n_cpu=4, seed=0,
    ))
    t = build_trainer(cfg, quiet=True)
    loader = t._train_loader()

    def run_steps(n):
        done = 0
        last = None
        while done < n:
            for b in loader:
                db = t._device_batch(b)
                t.state, last = t._step(
                    t.state, db, jnp.float32(t.lr), jnp.float32(t.lr_d)
                )
                done += 1
                if done >= n:
                    break
        return float(next(iter(last.values())))  # one late sync

    run_steps(4)  # compile + warm
    n = 24
    t0 = time.perf_counter()
    run_steps(n)
    dt = (time.perf_counter() - t0) / n
    print(f"hd1 train step incl feed dw={int(dw)}: {dt*1e3:.1f} ms "
          f"({1/dt:.2f} steps/s)", flush=True)
