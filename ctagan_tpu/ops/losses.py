"""Loss functions for all trainer families, as pure jnp functions.

Covers the reference's loss surface:
- LSGAN adversarial losses on scalar logits (MSE vs 0/1 targets,
  CycTrainer.py:143-160, RegTrainer.py:173-198);
- multi-scale GAN loss with hand-tuned per-scale weights w=[1.8, 0.2] and a
  global-average-pooled final feature map (Model/HdGan.py:258-293);
- L1 correlation / cycle / pix2pix losses;
- flow smoothness (trainer/utils.py:165-173, re-exported from ops.warp);
- the window-masked second correlation loss of HD stage 2
  (HdTrainer.py:726-735).
"""
from __future__ import annotations

import jax.numpy as jnp

from ctagan_tpu.ops.warp import smoothing_loss  # noqa: F401  (re-export)
from ctagan_tpu.ops.windowing import body_mask, mask_background_to_air

# Per-scale weights of the multi-scale GAN loss (Model/HdGan.py:273).
MULTISCALE_WEIGHTS = (1.8, 0.2)


def mse(pred, target):
    return jnp.mean((pred - target) ** 2)


def l1(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def lsgan_loss(pred, target_is_real):
    """LSGAN: MSE of discriminator output against 1 (real) or 0 (fake)."""
    target = 1.0 if target_is_real else 0.0
    return mse(pred, jnp.full_like(pred, target))


def _pool_logit(feat):
    """Global-avg-pool a (N, H, W, 1) map to a (N, 1) scalar logit — the
    reference's ``F.avg_pool2d(x, x.size()[2:])`` idiom (HdGan.py:276)."""
    return jnp.mean(feat, axis=(1, 2))


def gan_loss_multiscale(scale_features, target_is_real, weights=MULTISCALE_WEIGHTS):
    """The HD ``GANLoss`` on multi-scale discriminator output.

    ``scale_features``: list over scales of lists of intermediate feature
    maps (NHWC); only the last map of each scale is used, pooled to a scalar
    logit, with per-scale weights (HdGan.py:267-284).
    """
    loss = 0.0
    for i, feats in enumerate(scale_features):
        pred = _pool_logit(feats[-1])
        loss = loss + lsgan_loss(pred, target_is_real) * weights[i]
    return loss


def gan_loss_single(features, target_is_real):
    """HD ``GANLoss`` on a single-scale feature list (HdGan.py:286-293)."""
    pred = _pool_logit(features[-1])
    return lsgan_loss(pred, target_is_real)


def feature_matching_loss(fake_feats, real_feats, n_layers=3, num_d=1):
    """pix2pixHD feature-matching loss over multi-scale D features.

    The reference allocates ``criterionGAN_feature`` (HdTrainer.py:115) and
    its discriminators expose intermediate features (``getIntermFeat``) but
    the live trainers never wire the loss; here it is first-class and
    enabled with a nonzero ``FM_lamda``. Standard weighting: mean-abs over
    all but the final (logit) map of every scale, averaged with the usual
    4/(n_layers+1) / num_D factors, real features stop-gradiented.
    """
    import jax

    loss = 0.0
    d_weight = 1.0 / num_d
    feat_weight = 4.0 / (n_layers + 1)
    for scale_f, scale_r in zip(fake_feats, real_feats):
        for f, r in zip(scale_f[:-1], scale_r[:-1]):
            loss = loss + d_weight * feat_weight * l1(
                f, jax.lax.stop_gradient(r)
            )
    return loss


def masked_correlation_loss(pred, target, window_target, threshold=0.3):
    """HD stage-2 window-masked L1 (SR_loss2, HdTrainer.py:726-735).

    The windowed target ``window_target`` (B1) is thresholded at 0.3 into a
    body/contrast mask; both images are masked with background forced to -1
    (faithful to the reference's ``x*mask; x[x==0]=-1`` idiom) before L1.
    """
    mask = body_mask(window_target, threshold)
    target_m = mask_background_to_air(target, mask)
    pred_m = mask_background_to_air(pred, mask)
    return l1(pred_m, target_m)
