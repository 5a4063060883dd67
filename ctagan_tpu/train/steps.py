"""Functional, jit-compiled train/eval steps for the four trainer families.

The reference expresses each optimization step imperatively with
``.backward()``/``optimizer.step()``/``no_grad`` (CycTrainer.py:138-197,
p2pTrainer.py:122-148, RegTrainer.py:173-198, HdTrainer.py:192-228,
709-760). Here each family is a single pure function
``state, batch, lr(s), key -> state, losses`` compiled once by ``jax.jit``:

- G (and R) updates take grads through a joint loss with the discriminator
  frozen (its params are captured as non-diff arguments);
- the D update re-runs G's forward with the *updated* G params under
  ``stop_gradient`` — faithfully matching the reference, which re-forwards
  under ``no_grad`` *after* stepping G;
- the whole G+D (or G+R+D) sequence fuses into one XLA program: one
  host->device transfer per batch, zero host sync inside the step;
- augmentation (random affine) runs on device at the top of the step —
  replacing the reference's host-side PIL pipeline;
- Adam(0.5, 0.999) with the learning rate passed in as a traced scalar, so
  the reference's mutating lr schedule (including its accelerating-decay
  quirk, CycTrainer.py:117-126) needs no recompilation.

Parallelism: steps are written batch-first and loss terms are global-batch
means, so sharding the batch over a 1-D mesh makes XLA's SPMD partitioner
derive the gradient all-reduce over ICI automatically.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ctagan_tpu.ops import losses as L
from ctagan_tpu.ops.augment import random_affine
from ctagan_tpu.ops.warp import (
    smoothing_loss,
    warp2d,
    warp2d_adaptive,
    warp2d_dense,
    warp2d_local,
)
from ctagan_tpu.train.replay_buffer import ReplayBuffer, push_and_pop

Params = Any


def make_optimizer():
    """Adam direction (b1=0.5, b2=0.999, eps=1e-8) — lr applied manually so
    it can be a traced runtime scalar."""
    return optax.scale_by_adam(b1=0.5, b2=0.999, eps=1e-8)


def _apply(tx, grads, opt_state, params, lr):
    updates, new_opt = tx.update(grads, opt_state, params)
    new_params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
    return new_params, new_opt


def _ema_update(ema, params, decay: float, count=None):
    """Exponential moving average of generator params (production eval
    trick — the reference has no EMA; opt-in via config ema_decay).

    The shadow starts at the random init, so a flat high decay leaves it
    mostly-init for ~1/(1-decay) steps (measured: 0.999 made a 6-epoch
    512² run validate at 13.8 dB vs ~24 dB live). With ``count`` (the
    post-update optimizer step counter) the effective decay ramps as
    ``min(decay, (1+t)/(10+t))`` — the TF ExponentialMovingAverage
    num_updates convention — tracking params closely early and
    asymptoting to the configured decay."""
    if ema is None:
        return None
    if count is not None:
        t = jnp.asarray(count, jnp.float32)
        decay = jnp.minimum(decay, (1.0 + t) / (10.0 + t))
    return jax.tree.map(lambda e, p: e * decay + p * (1.0 - decay), ema, params)


def _grad_accum_scan(loss_fn, params, batches, n: int):
    """Gradient accumulation: mean (loss, aux, grads) of
    ``loss_fn(params, mb) -> (loss, aux_pytree)`` over ``n`` equal
    microbatches, via ``lax.scan`` — activation memory of ONE microbatch
    plus one grad-accumulator param tree, instead of the whole batch's
    activations at once. ``batches``: dict of arrays whose leading dim is
    divisible by ``n``. Because every loss term is a per-batch mean over
    equal-size microbatches, the result equals the full-batch
    ``value_and_grad`` up to float summation order (locked by
    tests/test_grad_accum.py). The reference has no analogue (batchSize=1
    on one GPU); this is the single-chip route to reference-scale
    *effective* batches when activations exceed HBM (512²+ dual-window HD
    batches, the 3-D family's volumes).
    """
    lead = next(iter(batches.values())).shape[0]
    assert lead % n == 0, f"grad_accum={n} must divide the batch ({lead})"
    split = {
        k: v.reshape((n, lead // n) + v.shape[1:]) for k, v in batches.items()
    }
    vg = jax.value_and_grad(loss_fn, has_aux=True)
    first = {k: v[0] for k, v in split.items()}
    (loss, aux), grads = vg(params, first)

    def body(carry, mb):
        loss_s, aux_s, grad_s = carry
        (l, a), g = vg(params, mb)
        return (
            loss_s + l,
            jax.tree.map(jnp.add, aux_s, a),
            jax.tree.map(jnp.add, grad_s, g),
        ), None

    (loss, aux, grads), _ = jax.lax.scan(
        body, (loss, aux, grads), {k: v[1:] for k, v in split.items()}
    )
    inv = 1.0 / n
    return (
        loss * inv,
        jax.tree.map(lambda x: x * inv, aux),
        jax.tree.map(lambda x: x * inv, grads),
    )


def _ones(pred):
    return jnp.ones_like(pred)


def _zeros(pred):
    return jnp.zeros_like(pred)


# ===========================================================================
# pix2pix (p2pTrainer.py:117-148)
# ===========================================================================

@struct.dataclass
class P2pState:
    g_params: Params
    d_params: Params
    g_opt: Any
    d_opt: Any
    rng: jax.Array
    g_ema: Any = None


def init_p2p_state(
    g_model, d_model, key, size, input_nc=1, output_nc=1, ema: bool = False
):
    kg, kd, kr = jax.random.split(key, 3)
    a = jnp.zeros((1, size, size, input_nc))
    ab = jnp.zeros((1, size, size, input_nc + output_nc))
    tx = make_optimizer()
    gp = g_model.init(kg, a)
    dp = d_model.init(kd, ab)
    g_ema = jax.tree.map(lambda x: x, gp) if ema else None
    return P2pState(gp, dp, tx.init(gp), tx.init(dp), kr, g_ema), tx


def p2p_train_step(g_model, d_model, tx, cfg, state: P2pState, batch, lr):
    """cfg: dict(P2P_lamda, Adv_lamda, noise_level). batch: A, B (N,H,W,C).

    ``grad_accum: K`` (default 1) splits the augmented batch into K equal
    microbatches and accumulates grads via ``_grad_accum_scan`` — same
    math as the full-batch step (all loss terms are elementwise means) at
    one microbatch's activation memory.
    """
    rng, ka, kb = jax.random.split(state.rng, 3)
    if bool(cfg.get("aligned_aug", False)):
        kb = ka  # opt-in: pair-aligned augmentation (see reg_train_step)
    a = random_affine(ka, batch["A"], cfg["noise_level"])
    b = random_affine(kb, batch["B"], cfg["noise_level"])
    n_accum = int(cfg.get("grad_accum", 1))

    def g_loss_mb(gp, mb):
        fake = g_model.apply(gp, mb["a"])
        loss_l1 = L.l1(fake, mb["b"]) * cfg["P2P_lamda"]
        pred = d_model.apply(
            state.d_params, jnp.concatenate([mb["a"], fake], -1)
        )
        loss_adv = L.mse(pred, _ones(pred)) * cfg["Adv_lamda"]
        return loss_l1 + loss_adv, (loss_l1, loss_adv)

    if n_accum > 1:
        g_loss, (l1v, advv), g_grads = _grad_accum_scan(
            g_loss_mb, state.g_params, {"a": a, "b": b}, n_accum
        )
    else:
        (g_loss, (l1v, advv)), g_grads = jax.value_and_grad(
            g_loss_mb, has_aux=True
        )(state.g_params, {"a": a, "b": b})
    g_params, g_opt = _apply(tx, g_grads, state.g_opt, state.g_params, lr)

    # D update: re-forward with the UPDATED generator (reference order)
    def d_loss_mb(dp, mb):
        fake2 = jax.lax.stop_gradient(g_model.apply(g_params, mb["a"]))
        # faithful quirk: the reference scales the *predictions* by Adv_lamda
        # before the MSE (p2pTrainer.py:143-145)
        pf = d_model.apply(
            dp, jnp.concatenate([mb["a"], fake2], -1)
        ) * cfg["Adv_lamda"]
        pr = d_model.apply(
            dp, jnp.concatenate([mb["a"], mb["b"]], -1)
        ) * cfg["Adv_lamda"]
        return L.mse(pf, _zeros(pf)) + L.mse(pr, _ones(pr)), ()

    if n_accum > 1:
        d_loss, _, d_grads = _grad_accum_scan(
            d_loss_mb, state.d_params, {"a": a, "b": b}, n_accum
        )
    else:
        (d_loss, _), d_grads = jax.value_and_grad(d_loss_mb, has_aux=True)(
            state.d_params, {"a": a, "b": b}
        )
    d_params, d_opt = _apply(tx, d_grads, state.d_opt, state.d_params, lr)

    g_ema = _ema_update(state.g_ema, g_params, cfg.get("ema_decay", 0.999),
                        count=g_opt.count)
    new_state = P2pState(g_params, d_params, g_opt, d_opt, rng, g_ema)
    return new_state, {
        "loss_G": g_loss,
        "loss_L1": l1v,
        "loss_GAN_A2B": advv,
        "loss_D_B": d_loss,
    }


# ===========================================================================
# 3-D volumetric pix2pix (new family — BASELINE.json full-volume config)
# ===========================================================================

def init_p3d_state(g_model, d_model, key, depth, size, input_nc=1, ema=False):
    kg, kd, kr = jax.random.split(key, 3)
    a = jnp.zeros((1, depth, size, size, input_nc))
    ab = jnp.zeros((1, depth, size, size, input_nc * 2))
    tx = make_optimizer()
    gp = g_model.init(kg, a)
    dp = d_model.init(kd, ab)
    g_ema = jax.tree.map(lambda x: x, gp) if ema else None
    return P2pState(gp, dp, tx.init(gp), tx.init(dp), kr, g_ema), tx


def p3d_train_step(g_model, d_model, tx, cfg, state: P2pState, batch, lr):
    """Paired 3-D patch step: L1 + conditional LSGAN (the p2p recipe on
    volumes). Augmentation = paired random H/W flips (affine warps don't
    compose cheaply in 3-D; flips are the standard volumetric augment).

    ``grad_accum: K`` accumulates over K volume microbatches — the single-
    chip route for volumes whose batched activations exceed HBM (same
    ``_grad_accum_scan`` equality contract as the 2-D families)."""
    rng, kf = jax.random.split(state.rng)
    a, b = batch["A"], batch["B"]
    fh, fw = jax.random.bernoulli(kf, 0.5, (2,))
    a = jnp.where(fh, a[:, :, ::-1, :, :], a)
    b = jnp.where(fh, b[:, :, ::-1, :, :], b)
    a = jnp.where(fw, a[:, :, :, ::-1, :], a)
    b = jnp.where(fw, b[:, :, :, ::-1, :], b)
    n_accum = int(cfg.get("grad_accum", 1))

    def g_loss_mb(gp, mb):
        fake = g_model.apply(gp, mb["a"])
        loss_l1 = L.l1(fake, mb["b"]) * cfg["P2P_lamda"]
        pred = d_model.apply(
            state.d_params, jnp.concatenate([mb["a"], fake], -1)
        )
        loss_adv = L.mse(pred, _ones(pred)) * cfg["Adv_lamda"]
        return loss_l1 + loss_adv, (loss_l1, loss_adv)

    if n_accum > 1:
        g_loss, (l1v, advv), g_grads = _grad_accum_scan(
            g_loss_mb, state.g_params, {"a": a, "b": b}, n_accum
        )
    else:
        (g_loss, (l1v, advv)), g_grads = jax.value_and_grad(
            g_loss_mb, has_aux=True
        )(state.g_params, {"a": a, "b": b})
    g_params, g_opt = _apply(tx, g_grads, state.g_opt, state.g_params, lr)

    def d_loss_mb(dp, mb):
        fake2 = jax.lax.stop_gradient(g_model.apply(g_params, mb["a"]))
        pf = d_model.apply(dp, jnp.concatenate([mb["a"], fake2], -1))
        pr = d_model.apply(dp, jnp.concatenate([mb["a"], mb["b"]], -1))
        return L.mse(pf, _zeros(pf)) + L.mse(pr, _ones(pr)), ()

    if n_accum > 1:
        d_loss, _, d_grads = _grad_accum_scan(
            d_loss_mb, state.d_params, {"a": a, "b": b}, n_accum
        )
    else:
        (d_loss, _), d_grads = jax.value_and_grad(d_loss_mb, has_aux=True)(
            state.d_params, {"a": a, "b": b}
        )
    d_params, d_opt = _apply(tx, d_grads, state.d_opt, state.d_params, lr)

    g_ema = _ema_update(state.g_ema, g_params, cfg.get("ema_decay", 0.999),
                        count=g_opt.count)
    new_state = P2pState(g_params, d_params, g_opt, d_opt, rng, g_ema)
    return new_state, {
        "loss_G": g_loss,
        "loss_L1": l1v,
        "loss_GAN_A2B": advv,
        "loss_D_B": d_loss,
    }


# ===========================================================================
# CycleGAN (CycTrainer.py:136-197)
# ===========================================================================

@struct.dataclass
class CycState:
    g_a2b_params: Params
    g_b2a_params: Params
    d_a_params: Params
    d_b_params: Params
    g_opt: Any
    d_a_opt: Any
    d_b_opt: Any
    fake_a_buffer: ReplayBuffer
    fake_b_buffer: ReplayBuffer
    rng: jax.Array
    g_ema: Any = None  # EMA of the A2B generator (the eval surface)
    g_ema_b2a: Any = None  # EMA of the B2A generator (CTA->NCCT direction)


def init_cyc_state(
    g_model, d_model, key, size, input_nc=1, buffer_size=50, ema=False
):
    ks = jax.random.split(key, 5)
    a = jnp.zeros((1, size, size, input_nc))
    tx = make_optimizer()
    g_a2b = g_model.init(ks[0], a)
    g_b2a = g_model.init(ks[1], a)
    d_a = d_model.init(ks[2], a)
    d_b = d_model.init(ks[3], a)
    # one optimizer over both generators (itertools.chain in the reference,
    # CycTrainer.py:74-76) -> a single opt state over the param pair
    g_opt = tx.init((g_a2b, g_b2a))
    g_ema = jax.tree.map(lambda x: x, g_a2b) if ema else None
    g_ema_b2a = jax.tree.map(lambda x: x, g_b2a) if ema else None
    return (
        CycState(
            g_a2b,
            g_b2a,
            d_a,
            d_b,
            g_opt,
            tx.init(d_a),
            tx.init(d_b),
            ReplayBuffer.create(buffer_size, (size, size, input_nc)),
            ReplayBuffer.create(buffer_size, (size, size, input_nc)),
            ks[4],
            g_ema,
            g_ema_b2a,
        ),
        tx,
    )


def cyc_train_step(g_model, d_model, tx, cfg, state: CycState, batch, lr):
    """``grad_accum: K`` accumulates the two-generator loss over K
    microbatches. The replay-buffer fakes can't ride the (averaged) scan
    aux, so under accumulation they are recomputed with one extra
    forward-only pass over the full batch at the PRE-update params — the
    reference's buffer semantics (CycTrainer.py:170-173) at one
    microbatch's backward memory."""
    rng, ka, kb, kba, kbb = jax.random.split(state.rng, 5)
    if bool(cfg.get("aligned_aug", False)):
        kb = ka  # opt-in: pair-aligned augmentation (see reg_train_step)
    real_a = random_affine(ka, batch["A"], cfg["noise_level"])
    real_b = random_affine(kb, batch["B"], cfg["noise_level"])
    adv, cyc = cfg["Adv_lamda"], cfg["Cyc_lamda"]
    n_accum = int(cfg.get("grad_accum", 1))

    def g_loss_mb(gs, mb):
        g_a2b, g_b2a = gs
        fake_b = g_model.apply(g_a2b, mb["a"])
        pred_fb = d_model.apply(state.d_b_params, fake_b)
        loss_gan_a2b = adv * L.mse(pred_fb, _ones(pred_fb))

        fake_a = g_model.apply(g_b2a, mb["b"])
        pred_fa = d_model.apply(state.d_a_params, fake_a)
        loss_gan_b2a = adv * L.mse(pred_fa, _ones(pred_fa))

        recov_a = g_model.apply(g_b2a, fake_b)
        loss_cyc_aba = cyc * L.l1(recov_a, mb["a"])
        recov_b = g_model.apply(g_a2b, fake_a)
        loss_cyc_bab = cyc * L.l1(recov_b, mb["b"])
        total = loss_gan_a2b + loss_gan_b2a + loss_cyc_aba + loss_cyc_bab
        return total, (loss_gan_a2b, loss_cyc_aba)

    gs0 = (state.g_a2b_params, state.g_b2a_params)
    if n_accum > 1:
        g_loss, (gan_a2b, cyc_aba), g_grads = _grad_accum_scan(
            g_loss_mb, gs0, {"a": real_a, "b": real_b}, n_accum
        )
        # buffer fakes: forward-only at the pre-update params (activation
        # memory = one layer's peak, not a backward's stash)
        fake_b = jax.lax.stop_gradient(g_model.apply(gs0[0], real_a))
        fake_a = jax.lax.stop_gradient(g_model.apply(gs0[1], real_b))
    else:
        def g_loss_fn(gs):
            g_a2b, g_b2a = gs
            fake_b = g_model.apply(g_a2b, real_a)
            pred_fb = d_model.apply(state.d_b_params, fake_b)
            loss_gan_a2b = adv * L.mse(pred_fb, _ones(pred_fb))

            fake_a = g_model.apply(g_b2a, real_b)
            pred_fa = d_model.apply(state.d_a_params, fake_a)
            loss_gan_b2a = adv * L.mse(pred_fa, _ones(pred_fa))

            recov_a = g_model.apply(g_b2a, fake_b)
            loss_cyc_aba = cyc * L.l1(recov_a, real_a)
            recov_b = g_model.apply(g_a2b, fake_a)
            loss_cyc_bab = cyc * L.l1(recov_b, real_b)
            total = loss_gan_a2b + loss_gan_b2a + loss_cyc_aba + loss_cyc_bab
            return total, (fake_a, fake_b, loss_gan_a2b, loss_cyc_aba)

        (g_loss, (fake_a, fake_b, gan_a2b, cyc_aba)), g_grads = (
            jax.value_and_grad(g_loss_fn, has_aux=True)(gs0)
        )
    (g_a2b, g_b2a), g_opt = _apply(
        tx, g_grads, state.g_opt, (state.g_a2b_params, state.g_b2a_params), lr
    )

    # D updates use the PRE-update fakes via the replay buffers
    # (CycTrainer.py:170-173, 189-192)
    buf_a, fake_a_d = push_and_pop(
        state.fake_a_buffer, jax.lax.stop_gradient(fake_a), kba
    )
    buf_b, fake_b_d = push_and_pop(
        state.fake_b_buffer, jax.lax.stop_gradient(fake_b), kbb
    )

    def d_loss_mb(dp, mb):
        pr = d_model.apply(dp, mb["real"])
        loss_real = adv * L.mse(pr, _ones(pr))
        pf = d_model.apply(dp, mb["fake"])
        loss_fake = adv * L.mse(pf, _zeros(pf))
        return loss_real + loss_fake, ()

    def d_update(dp, d_opt, real, fake):
        if n_accum > 1:
            loss, _, grads = _grad_accum_scan(
                d_loss_mb, dp, {"real": real, "fake": fake}, n_accum
            )
        else:
            (loss, _), grads = jax.value_and_grad(d_loss_mb, has_aux=True)(
                dp, {"real": real, "fake": fake}
            )
        new_dp, new_opt = _apply(tx, grads, d_opt, dp, lr)
        return loss, new_dp, new_opt

    d_a_loss, d_a_params, d_a_opt = d_update(
        state.d_a_params, state.d_a_opt, real_a, fake_a_d
    )
    d_b_loss, d_b_params, d_b_opt = d_update(
        state.d_b_params, state.d_b_opt, real_b, fake_b_d
    )

    g_ema = _ema_update(state.g_ema, g_a2b, cfg.get("ema_decay", 0.999),
                        count=g_opt.count)
    g_ema_b2a = _ema_update(state.g_ema_b2a, g_b2a,
                            cfg.get("ema_decay", 0.999), count=g_opt.count)
    new_state = CycState(
        g_a2b, g_b2a, d_a_params, d_b_params, g_opt, d_a_opt, d_b_opt,
        buf_a, buf_b, rng, g_ema, g_ema_b2a,
    )
    return new_state, {
        "loss_G": g_loss,
        "loss_GAN_A2B": gan_a2b,
        "loss_cycle_ABA": cyc_aba,
        "loss_D_A": d_a_loss,
        "loss_D_B": d_b_loss,
    }


# ===========================================================================
# RegGAN (RegTrainer.py:161-198) and HD stage 1 (HdTrainer.py:184-228)
# ===========================================================================

@struct.dataclass
class RegState:
    g_params: Params
    r_params: Params
    d_params: Params
    g_opt: Any
    r_opt: Any
    d_opt: Any
    rng: jax.Array
    g_ema: Any = None


def init_reg_state(g_model, r_model, d_model, key, size, input_nc=1, ema=False):
    ks = jax.random.split(key, 4)
    a = jnp.zeros((1, size, size, input_nc))
    tx = make_optimizer()
    gp = g_model.init(ks[0], a)
    rp = r_model.init(ks[1], a, a)
    dp = d_model.init(ks[2], a)
    g_ema = jax.tree.map(lambda x: x, gp) if ema else None
    return (
        RegState(
            gp, rp, dp, tx.init(gp), tx.init(rp), tx.init(dp), ks[3], g_ema
        ),
        tx,
    )


def reg_train_step(
    g_model,
    r_model,
    d_model,
    tx,
    cfg,
    state: RegState,
    batch,
    lr,
    lr_d=None,
    dual_window_mode=False,
    stage2=False,
    pipeline_1f1b=None,
):
    """RegGAN / HD-stage-1 / HD-stage-2 unified step.

    - ``dual_window_mode`` False (RegGAN): G input = A, registration target
      = B, simple scalar D, MSE adversarial terms.
    - True (HD stage 1): G input = A2 (full-range), target = B2, separate D
      lr ``lr_d``; same loss structure with {Adv,Corr}_lamda1.
    - ``stage2``: D is multi-scale (feature-list output) with the weighted
      GANLoss, D loss divided by D=2, plus the window-masked SR_loss2 from
      the B1-thresholded body mask.
    - ``pipeline_1f1b``: ``(plain_generator, mesh, microbatches)`` — run
      the G+R phase's value-and-grad through the hand-scheduled 1F1B
      pipeline (parallel/pipeline.py::pp_1f1b_value_and_grad): G's body
      staged over the pp mesh axis, R's full fwd+bwd inside the
      per-microbatch loss epilogue. Requires a stage-packed state
      (shard_state_pp) and ``g_model`` being the matching PPGenerator
      (the D phase re-forwards through it). Stage-2 caveat: SR_loss2's
      mask normalization is per microbatch (grad_accum convention).
    """
    rng, k1, k2 = jax.random.split(state.rng, 3)
    if bool(cfg.get("aligned_aug", False)):
        # opt-in: both sides share one affine draw -> the pair stays
        # geometrically aligned under augmentation (the reference's
        # commented-out second random.seed, datasets.py:224)
        k2 = k1
    if dual_window_mode:
        real_a = random_affine(k1, batch["A2"], cfg["noise_level"])
        # one affine per sample pair keeps B1 (mask source) aligned with B2.
        # Both streams draw k2's parameters, so warping them as channels of
        # ONE gather is bit-identical to two passes (affine_warp is
        # channel-agnostic) and halves the index math + gather count —
        # equivalence locked by tests/test_trainers.py.
        cat_b = jnp.concatenate([batch["B2"], batch["B1"]], axis=-1)
        warped_b = random_affine(k2, cat_b, cfg["noise_level"])
        c2 = batch["B2"].shape[-1]
        real_b = warped_b[..., :c2]
        real_b1 = warped_b[..., c2:]
        adv_w = cfg["Adv_lamda1"]
        corr_w = cfg["Corr_lamda1"]
    else:
        real_a = random_affine(k1, batch["A"], cfg["noise_level"])
        real_b = random_affine(k2, batch["B"], cfg["noise_level"])
        real_b1 = None
        adv_w = cfg["Adv_lamda"]
        corr_w = cfg["Corr_lamda"]
    smooth_w = cfg["Smooth_lamda"]
    if lr_d is None:
        lr_d = lr

    # warp_max_disp > 0 selects the gather-free local warp (TPU fast path;
    # exact for |flow| <= R, saturating beyond — see ops.warp.warp2d_local)
    warp_r = int(cfg.get("warp_max_disp", 0))
    # warp_impl: 'adaptive' = exact warp with the static-shift fast path
    # behind a data cond (ops.warp.warp2d_adaptive — replaces XLA's serial
    # gather fwd + ~25 ms scatter-add bwd whenever max|flow| <= 4, i.e.
    # essentially always for registration flows); 'gather' = the plain
    # gather formulation; 'dense' = the dynamic-ring variant (measured
    # negative result, see ops/warp.py); 'auto' (default) = adaptive on
    # TPU, gather elsewhere. All numerically exact.
    warp_impl = str(cfg.get("warp_impl", "auto"))
    if warp_impl == "auto":
        warp_impl = "adaptive" if jax.default_backend() == "tpu" else "gather"
    # reg_downsample > 1 runs the registration net at reduced resolution and
    # bilinearly upsamples the (smooth) flow, rescaling displacements —
    # the ResUNet's full-res top level dominates its cost (CLAUDE.md).
    reg_ds = int(cfg.get("reg_downsample", 1))

    def _warp(x, f):
        if warp_r > 0:
            return warp2d_local(x, f, warp_r)
        if warp_impl == "adaptive":
            return warp2d_adaptive(x, f)
        if warp_impl == "dense":
            return warp2d_dense(x, f)
        return warp2d(x, f)

    def _predict_flow(rp, moving, fixed):
        if reg_ds <= 1:
            return r_model.apply(rp, moving, fixed)
        from ctagan_tpu.ops.resize import interpolate_bilinear

        h, w = moving.shape[1], moving.shape[2]
        small = (h // reg_ds, w // reg_ds)
        flow_s = r_model.apply(
            rp,
            interpolate_bilinear(moving, small),
            interpolate_bilinear(fixed, small),
        )
        return interpolate_bilinear(flow_s, (h, w)) * float(reg_ds)

    # grad_accum: K > 1 accumulates G+R and D grads over K microbatches via
    # _grad_accum_scan — identical math for stage 1 / RegGAN (all terms are
    # elementwise means; locked by tests/test_grad_accum.py). Stage-2 note:
    # the mask-normalized SR_loss2 weights microbatches equally rather than
    # by per-microbatch mask size (the standard grad-accum convention).
    n_accum = int(cfg.get("grad_accum", 1))

    def tail_losses(rp, dparams, fake_b, rb, rb1):
        """Everything after the G forward: R flow + warp + SM/SR losses,
        the D adversarial term, and the stage-2 extras. Shared between the
        sequential ``gr_core`` and the 1F1B pipeline epilogue (which runs
        it per microbatch on the last stage's up/tail output)."""
        flow = _predict_flow(rp, fake_b, rb)
        warped = _warp(fake_b, flow)
        sm = smooth_w * smoothing_loss(flow)
        sr = corr_w * L.l1(warped, rb)
        d_out = d_model.apply(dparams, fake_b)
        if stage2:
            adv = adv_w * L.gan_loss_multiscale(d_out, True)
        else:
            adv = adv_w * L.mse(d_out, _ones(d_out))
        total = sm + adv + sr
        aux = {"SM_loss": sm, "SR_loss": sr, "adv_loss": adv}
        if stage2 and cfg.get("FM_lamda", 0.0) > 0.0:
            real_out = d_model.apply(dparams, rb)
            fm = cfg["FM_lamda"] * L.feature_matching_loss(
                d_out, real_out, num_d=len(d_out)
            )
            total = total + fm
            aux["FM_loss"] = fm
        if stage2:
            sr2 = cfg["Corr_lamda2"] * L.masked_correlation_loss(
                warped, rb, rb1
            )
            total = total + sr2
            aux["SR_loss2"] = sr2
        return total, aux

    def gr_core(params, ra, rb, rb1):
        gp, rp = params
        fake_b = g_model.apply(gp, ra)
        total, aux = tail_losses(rp, state.d_params, fake_b, rb, rb1)
        return total, (aux, fake_b)

    if pipeline_1f1b is not None:
        # 1F1B pipelined G+R value-and-grad: G's body staged over the pp
        # mesh, the whole tail (up/tail + R + warp + losses) as the
        # per-microbatch epilogue — R grads fall out of the epilogue vjp.
        from ctagan_tpu.parallel import pipeline as _pl

        gen, pp_mesh, pp_micro = pipeline_1f1b

        def _epilogue(rest_p, extras, frozen, y, mb):
            (rp,) = extras
            fake_mb = _pl._up_tail(gen, rest_p, y)
            return tail_losses(rp, frozen, fake_mb, mb["b"], mb.get("b1"))

        prog = _pl.pp_1f1b_value_and_grad(gen, pp_mesh, pp_micro, _epilogue)
        arrays = {"a": real_a, "b": real_b}
        if real_b1 is not None:
            arrays["b1"] = real_b1
        (gr_loss, aux), (bg, restg, exg) = prog(
            state.g_params["body"], state.g_params["rest"],
            (state.r_params,), state.d_params, arrays,
        )
        (r_g,) = exg
        grads = ({"body": bg, "rest": restg}, r_g)
        fake_b = None  # D phase re-forwards through the pipeline
    elif n_accum > 1:
        mbs = {"a": real_a, "b": real_b}
        if real_b1 is not None:
            mbs["b1"] = real_b1

        def gr_mb(params, mb):
            total, (aux, _fb) = gr_core(
                params, mb["a"], mb["b"], mb.get("b1")
            )
            return total, aux

        gr_loss, aux, grads = _grad_accum_scan(
            gr_mb, (state.g_params, state.r_params), mbs, n_accum
        )
        fake_b = None  # microbatch-local; D phase re-forwards per microbatch
    else:
        (gr_loss, (aux, fake_b)), grads = jax.value_and_grad(
            gr_core, has_aux=True
        )((state.g_params, state.r_params), real_a, real_b, real_b1)
    g_grads, r_grads = grads
    g_params, g_opt = _apply(tx, g_grads, state.g_opt, state.g_params, lr)
    r_params, r_opt = _apply(tx, r_grads, state.r_opt, state.r_params, lr)

    # d_refwd True (default, reference semantics): the D update sees a fresh
    # G forward with the JUST-UPDATED weights (HdTrainer.py:213-219 steps the
    # optimizers before the no_grad re-forward). False (opt-in perf mode,
    # config d_refwd): reuse the G-step's fake_b (pre-update weights) —
    # saves one full G forward (~7.5 ms of the 84 ms fused step at 512²);
    # identical when lr == 0, one-optimizer-step-stale otherwise. Under
    # grad_accum > 1 the re-forward happens per microbatch (reference
    # semantics; d_refwd=False is ignored there).
    if bool(cfg.get("d_refwd", True)) or fake_b is None:
        fake2 = None  # computed (per microbatch) inside the D phase
    else:
        fake2 = jax.lax.stop_gradient(fake_b)

    # Opt-in R1 gradient penalty on D(real) (r1_gamma > 0): a standard GAN
    # stabilizer (Mescheder et al. 2018, "Which Training Methods for GANs
    # do Actually Converge?") targeting the stage-2 collapse observed at
    # ~e14 (VERDICT r1 #5). gamma=0 keeps exact reference semantics.
    r1_w = float(cfg.get("r1_gamma", 0.0))

    def d_core(dp, d_fake, rb):
        pf = d_model.apply(dp, d_fake)
        pr = d_model.apply(dp, rb)
        if stage2:
            base = (
                adv_w
                * (L.gan_loss_multiscale(pf, False) + L.gan_loss_multiscale(pr, True))
                / 2.0
            )
        else:
            base = adv_w * L.mse(pf, _zeros(pf)) + adv_w * L.mse(pr, _ones(pr))
        if r1_w <= 0.0:
            return base, jnp.zeros((), base.dtype)

        def _score(x):
            out = d_model.apply(dp, x)
            if stage2:
                s = 0.0
                for feats in out:
                    s = s + jnp.mean(
                        feats[-1].astype(jnp.float32),
                        axis=tuple(range(1, feats[-1].ndim)),
                    )
            else:
                s = jnp.mean(
                    out.astype(jnp.float32), axis=tuple(range(1, out.ndim))
                )
            return jnp.sum(s)

        gx = jax.grad(_score)(rb).astype(jnp.float32)
        r1 = 0.5 * r1_w * jnp.mean(
            jnp.sum(jnp.square(gx), axis=tuple(range(1, gx.ndim)))
        )
        return base + r1.astype(base.dtype), r1

    def d_loss_mb(dp, mb):
        d_fake = mb.get("fake2")
        if d_fake is None:
            d_fake = jax.lax.stop_gradient(g_model.apply(g_params, mb["a"]))
        return d_core(dp, d_fake, mb["b"])

    d_batch = {"a": real_a, "b": real_b}
    if fake2 is not None:
        d_batch["fake2"] = fake2
    if n_accum > 1:
        d_loss, r1_loss, d_grads = _grad_accum_scan(
            d_loss_mb, state.d_params, d_batch, n_accum
        )
    else:
        (d_loss, r1_loss), d_grads = jax.value_and_grad(
            d_loss_mb, has_aux=True
        )(state.d_params, d_batch)
    d_params, d_opt = _apply(tx, d_grads, state.d_opt, state.d_params, lr_d)

    g_ema = _ema_update(state.g_ema, g_params, cfg.get("ema_decay", 0.999),
                        count=g_opt.count)
    new_state = RegState(
        g_params, r_params, d_params, g_opt, r_opt, d_opt, rng, g_ema
    )
    out = {"toal_loss": gr_loss, "loss_D_B": d_loss}
    if r1_w > 0.0:
        out["R1_loss"] = r1_loss
    out.update(aux)
    return new_state, out
