"""Golden tests for metrics against independent numpy implementations of the
reference formulas (CycTrainer.py:362-398) and skimage-default SSIM."""
import numpy as np
import jax.numpy as jnp

from ctagan_tpu.ops.metrics import masked_psnr, masked_mae, uqi, ssim


def _np_psnr(fake, real):
    a = np.where(real != -1)
    x, y = a[0], a[1]
    if x.size == 0 or y.size == 0:
        mse = np.mean(((fake + 1) / 2.0 - (real + 1) / 2.0) ** 2) + 1e-10
    else:
        mse = np.mean(((fake[x, y] + 1) / 2.0 - (real[x, y] + 1) / 2.0) ** 2)
    if mse < 1e-10:
        return 100.0
    return 20 * np.log10(1.0 / (np.sqrt(mse) + 1e-10))


def _np_mae(fake, real):
    a = np.where(real != -1)
    x, y = a[0], a[1]
    if x.size == 0 or y.size == 0:
        mae = np.nanmean(np.abs(fake - real)) + 1e-10
    else:
        mae = np.nanmean(np.abs(fake[x, y] - real[x, y]))
    return mae / 2.0


def _np_uqi(fake, real):
    meanf, meanr = np.mean(fake), np.mean(real)
    m, n = fake.shape
    varf = np.sqrt(np.sum((fake - meanf) ** 2) / (m * n - 1))
    varr = np.sqrt(np.sum((real - meanr) ** 2) / (m * n - 1))
    cov = np.sum((fake - meanf) * (real - meanr)) / (m * n - 1)
    return 4 * meanf * meanr * cov / ((meanf**2 + meanr**2) * (varf**2 + varr**2) + 1e-10)


def _make_pair(seed, with_bg=True):
    rng = np.random.default_rng(seed)
    real = rng.uniform(-1, 1, size=(40, 40)).astype(np.float32)
    fake = np.clip(real + rng.normal(0, 0.1, real.shape), -1, 1).astype(np.float32)
    if with_bg:
        real[:10, :10] = -1.0
    return fake, real


def test_masked_psnr_matches_reference():
    fake, real = _make_pair(0)
    np.testing.assert_allclose(
        float(masked_psnr(fake, real)), _np_psnr(fake, real), rtol=1e-4
    )


def test_masked_psnr_identical_images_capped():
    img = np.zeros((8, 8), np.float32)
    assert float(masked_psnr(img, img)) == 100.0


def test_masked_psnr_all_background():
    fake = np.zeros((8, 8), np.float32)
    real = -np.ones((8, 8), np.float32)
    np.testing.assert_allclose(
        float(masked_psnr(fake, real)), _np_psnr(fake, real), rtol=1e-4
    )


def test_masked_mae_matches_reference():
    fake, real = _make_pair(1)
    np.testing.assert_allclose(
        float(masked_mae(fake, real)), _np_mae(fake, real), rtol=1e-5
    )


def test_uqi_matches_reference():
    fake, real = _make_pair(2, with_bg=False)
    np.testing.assert_allclose(float(uqi(fake, real)), _np_uqi(fake, real), rtol=1e-4)


def test_ssim_self_is_one():
    fake, _ = _make_pair(3)
    np.testing.assert_allclose(float(ssim(fake, fake)), 1.0, atol=1e-5)


def test_ssim_against_reference_impl():
    """Compare against a literal (slow) numpy port of skimage's
    structural_similarity with gaussian_weights=False, win=7, data_range=2."""
    fake, real = _make_pair(4, with_bg=False)
    win = 7
    pad = win // 2

    def box(img):
        out = np.zeros((img.shape[0] - win + 1, img.shape[1] - win + 1))
        for i in range(out.shape[0]):
            for j in range(out.shape[1]):
                out[i, j] = img[i : i + win, j : j + win].mean()
        return out

    ux, uy = box(fake), box(real)
    uxx, uyy, uxy = box(fake * fake), box(real * real), box(fake * real)
    cn = win * win / (win * win - 1)
    vx, vy = cn * (uxx - ux * ux), cn * (uyy - uy * uy)
    vxy = cn * (uxy - ux * uy)
    c1, c2 = (0.01 * 2) ** 2, (0.03 * 2) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    np.testing.assert_allclose(float(ssim(fake, real)), s.mean(), rtol=1e-4)


def test_ssim_decreases_with_noise():
    fake, real = _make_pair(5, with_bg=False)
    assert float(ssim(fake, real)) < float(ssim(real, real))


def test_fused_metric_suite_matches_modular_path():
    """The jitted 8-metric suite (train/evaluation._metric_suite) must agree
    with computing each metric through the masked views independently."""
    import jax.numpy as jnp
    from ctagan_tpu.train.evaluation import _masked_views, _metric_suite

    rng = np.random.default_rng(7)
    real = rng.uniform(-1, 1, (40, 40)).astype(np.float32)
    fake = np.clip(real + rng.normal(0, 0.15, real.shape), -1, 1).astype(np.float32)
    wc, ww = 60.0, 300.0

    suite = {k: float(v) for k, v in _metric_suite(
        jnp.asarray(fake), jnp.asarray(real), wc, ww).items()}
    c_m, b_m, fake_m, real_m = _masked_views(
        jnp.asarray(fake), jnp.asarray(real), wc, ww)
    np.testing.assert_allclose(suite["MAEw"], float(masked_mae(c_m, b_m)), rtol=1e-6)
    np.testing.assert_allclose(suite["PSNRw"], float(masked_psnr(c_m, b_m)), rtol=1e-6)
    np.testing.assert_allclose(suite["SSIM"], float(ssim(fake_m, real_m)), rtol=1e-6)
    np.testing.assert_allclose(suite["UQI"], float(uqi(fake_m, real_m)), rtol=1e-5)
