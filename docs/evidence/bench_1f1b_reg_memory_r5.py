"""Evidence (VERDICT r4 #2): 1F1B bounds the FLAGSHIP reg/HD three-net
step's pipeline-training temp memory at O(stages); GPipe's
autodiff-transpose backward stashes O(microbatches).

Same methodology as bench_1f1b_memory_r4.py (XLA compiled memory
analysis, temp allocation size) but on the HD stage-1 step —
G + ResUNet + D via `pp_reg_train_step_fn`, one sample per microbatch so
batch-proportional buffers grow identically under both schedules and the
schedule-owned stashes are the scaling difference.

Run on the 8-virtual-device CPU mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  PYTHONPATH=/root/repo:/root/.axon_site \
  python docs/evidence/bench_1f1b_reg_memory_r5.py
"""
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from ctagan_tpu.models import Discriminator, Generator, RegNet
from ctagan_tpu.parallel.pipeline import (
    make_pp_mesh,
    pp_reg_train_step_fn,
    shard_state_pp,
)
from ctagan_tpu.train import steps

SIZE = 128  # RegNet's 7-level ladder needs >= 128
STAGES = 4
BLOCKS = 8

g = Generator(1, 1, n_residual_blocks=BLOCKS)
r = RegNet(1, 1)
d = Discriminator(1)
cfg = {
    "Adv_lamda1": 1.0, "Corr_lamda1": 20.0, "Smooth_lamda": 10.0,
    "noise_level": 1, "ema_decay": 0.999,
}
mesh = make_pp_mesh(STAGES)

for M in (2, 8, 16):
    state, tx = steps.init_reg_state(
        g, r, d, jax.random.PRNGKey(0), SIZE, ema=True
    )
    pp_state = shard_state_pp(state, g, mesh)
    batch = {
        k: np.zeros((M, SIZE, SIZE, 1), np.float32)
        for k in ("A2", "B2", "B1")
    }
    row = {"M": M}
    for sched in ("gpipe", "1f1b"):
        step = pp_reg_train_step_fn(
            g, r, d, tx, cfg, mesh, microbatches=M,
            dual_window_mode=True, schedule=sched,
        )
        compiled = step.lower(
            pp_state, batch, jnp.float32(1e-4), jnp.float32(1e-4)
        ).compile()
        ma = compiled.memory_analysis()
        row[sched] = ma.temp_size_in_bytes
    row["ratio"] = row["gpipe"] / max(row["1f1b"], 1)
    print(
        f"M={row['M']:3d}  temp bytes  gpipe {row['gpipe']/1e6:9.1f} MB  "
        f"1f1b {row['1f1b']/1e6:9.1f} MB  ratio {row['ratio']:.2f}x",
        flush=True,
    )
