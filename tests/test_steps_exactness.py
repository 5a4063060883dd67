"""Step-level exactness properties of the reg/HD train step.

- The dual-window joint affine (B2+B1 warped as channels of one gather)
  must be bit-identical to two independent passes with the same key.
- d_refwd=False (reuse the G-step's fake image for the D update) must be
  bit-identical to the reference re-forward when lr == 0 (the only
  difference is pre- vs post-update generator weights).
"""
import jax
import jax.numpy as jnp
import numpy as np

from ctagan_tpu.models import Discriminator, Generator, RegNet
from ctagan_tpu.ops.augment import random_affine
from ctagan_tpu.train import steps


def test_joint_affine_bit_exact():
    key = jax.random.PRNGKey(7)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (3, 32, 32, 1)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (3, 32, 32, 1)).astype(np.float32))
    joint = random_affine(key, jnp.concatenate([x, y], axis=-1), 2)
    ax = random_affine(key, x, 2)
    ay = random_affine(key, y, 2)
    np.testing.assert_array_equal(np.asarray(joint[..., :1]), np.asarray(ax))
    np.testing.assert_array_equal(np.asarray(joint[..., 1:]), np.asarray(ay))


def _run_step(cfg, lr):
    g = Generator(1, 1, n_residual_blocks=2)
    r = RegNet(1, 1)
    d = Discriminator(1)
    state, tx = steps.init_reg_state(g, r, d, jax.random.PRNGKey(0), 128)
    rng = np.random.default_rng(1)
    batch = {
        k: jnp.asarray(rng.uniform(-1, 1, (1, 128, 128, 1)).astype(np.float32))
        for k in ("A2", "B1", "B2")
    }
    step = jax.jit(
        lambda s, b: steps.reg_train_step(
            g, r, d, tx, cfg, s, b, jnp.float32(lr), dual_window_mode=True
        )
    )
    new_state, losses = step(state, batch)
    return jax.device_get(new_state), jax.device_get(losses)


def test_d_refwd_false_identical_at_lr0():
    base = {
        "Adv_lamda1": 1.0, "Corr_lamda1": 20.0, "Corr_lamda2": 2.0,
        "Smooth_lamda": 10.0, "Adv_lamda": 1.0, "Corr_lamda": 20.0,
        "noise_level": 1,
    }
    s_ref, l_ref = _run_step(dict(base, d_refwd=True), 0.0)
    s_new, l_new = _run_step(dict(base, d_refwd=False), 0.0)
    for a, b in zip(jax.tree.leaves(s_ref), jax.tree.leaves(s_new)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for k in l_ref:
        np.testing.assert_array_equal(l_ref[k], l_new[k])


def test_d_refwd_false_runs_and_is_finite():
    base = {
        "Adv_lamda1": 1.0, "Corr_lamda1": 20.0, "Corr_lamda2": 2.0,
        "Smooth_lamda": 10.0, "Adv_lamda": 1.0, "Corr_lamda": 20.0,
        "noise_level": 1, "d_refwd": False,
    }
    _, losses = _run_step(base, 1e-4)
    assert all(np.isfinite(float(v)) for v in losses.values())


def _record_affine_keys(monkeypatch):
    """Patch steps.random_affine with a recorder (eager path: keys concrete)."""
    seen = []
    orig = steps.random_affine

    def recorder(key, x, noise_level):
        seen.append(np.asarray(jax.random.key_data(key)))
        return orig(key, x, noise_level)

    monkeypatch.setattr(steps, "random_affine", recorder)
    return seen


def test_aligned_aug_shares_the_affine_key(monkeypatch):
    """aligned_aug=True must route A and B through ONE affine draw per pair
    in every family's step; False (reference semantics, HdTrainer.py:131-142)
    keeps the draws independent."""
    rng = np.random.default_rng(2)
    lr = jnp.float32(1e-4)

    def keys_for(family, aligned):
        size = 128 if family == "reg" else 64
        img = lambda: jnp.asarray(
            rng.uniform(-1, 1, (1, size, size, 1)).astype(np.float32)
        )
        seen = _record_affine_keys(monkeypatch)
        if family == "p2p":
            g, d = Generator(1, 1, n_residual_blocks=1), Discriminator(2)
            state, tx = steps.init_p2p_state(g, d, jax.random.PRNGKey(0), 64)
            cfg = {"P2P_lamda": 10.0, "Adv_lamda": 1.0, "noise_level": 1,
                   "aligned_aug": aligned}
            steps.p2p_train_step(g, d, tx, cfg, state,
                                 {"A": img(), "B": img()}, lr)
        elif family == "cyc":
            g, d = Generator(1, 1, n_residual_blocks=1), Discriminator(1)
            state, tx = steps.init_cyc_state(g, d, jax.random.PRNGKey(0), 64)
            cfg = {"Adv_lamda": 1.0, "Cyc_lamda": 10.0, "noise_level": 1,
                   "aligned_aug": aligned}
            steps.cyc_train_step(g, d, tx, cfg, state,
                                 {"A": img(), "B": img()}, lr)
        else:
            g, r, d = Generator(1, 1, n_residual_blocks=1), RegNet(1, 1), Discriminator(1)
            state, tx = steps.init_reg_state(g, r, d, jax.random.PRNGKey(0), 128)
            cfg = {"Adv_lamda": 1.0, "Corr_lamda": 20.0, "Smooth_lamda": 10.0,
                   "noise_level": 1, "aligned_aug": aligned}
            steps.reg_train_step(g, r, d, tx, cfg, state,
                                 {"A": img(), "B": img()}, lr,
                                 dual_window_mode=False)
        return seen

    for family in ("p2p", "cyc", "reg"):
        aligned = keys_for(family, True)
        assert len(aligned) >= 2
        np.testing.assert_array_equal(aligned[0], aligned[1])
        indep = keys_for(family, False)
        assert not np.array_equal(indep[0], indep[1])
