"""Evidence: 1F1B bounds pipeline-training activation memory at O(stages);
GPipe's autodiff-transpose backward stashes O(microbatches).

Compares XLA's compiled memory analysis (temp allocation size — where
activation stashes land) for the SAME pipelined P2p train step under the
two `pp_schedule` values while the microbatch count M grows at one sample
per microbatch (so batch-proportional buffers grow identically for both;
the schedule-owned stashes are the difference that scales).

Run on the 8-virtual-device CPU mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  PYTHONPATH=/root/repo:/root/.axon_site python docs/evidence/bench_1f1b_memory_r4.py
"""
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from ctagan_tpu.models import Discriminator, Generator
from ctagan_tpu.parallel.pipeline import (
    make_pp_mesh,
    pp_train_step_fn,
    shard_p2p_state_pp,
)
from ctagan_tpu.train import steps

SIZE = 128
STAGES = 4
BLOCKS = 8

g = Generator(1, 1, n_residual_blocks=BLOCKS)
d = Discriminator(2)
cfg = {"P2P_lamda": 10.0, "Adv_lamda": 1.0, "noise_level": 1}
mesh = make_pp_mesh(STAGES)

for M in (2, 8, 16):
    state, tx = steps.init_p2p_state(g, d, jax.random.PRNGKey(0), SIZE)
    pp_state = shard_p2p_state_pp(state, g, mesh)
    batch = {
        k: np.zeros((M, SIZE, SIZE, 1), np.float32) for k in ("A", "B")
    }
    row = {"M": M}
    for sched in ("gpipe", "1f1b"):
        step = pp_train_step_fn(
            g, d, tx, cfg, mesh, microbatches=M, schedule=sched
        )
        compiled = step.lower(pp_state, batch, jnp.float32(1e-4)).compile()
        ma = compiled.memory_analysis()
        row[sched] = ma.temp_size_in_bytes
    row["ratio"] = row["gpipe"] / max(row["1f1b"], 1)
    print(
        f"M={row['M']:3d}  temp bytes  gpipe {row['gpipe']/1e6:9.1f} MB  "
        f"1f1b {row['1f1b']/1e6:9.1f} MB  ratio {row['ratio']:.2f}x",
        flush=True,
    )
