"""Golden-value tests for the loss functions against the reference formulas
(reference lib/core/criterion.py:61-116) computed independently in numpy."""

import numpy as np
import jax.numpy as jnp

from vae2_tpu.core import losses


def test_l1_loss_sum_over_batch():
    rng = np.random.RandomState(0)
    pred = rng.randn(4, 3, 5).astype(np.float32)
    tgt = rng.randn(4, 3, 5).astype(np.float32)
    expected = np.sum(np.abs(pred - tgt)) / 4.0
    got = losses.l1_loss(jnp.asarray(pred), jnp.asarray(tgt))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_kl_loss_single():
    rng = np.random.RandomState(1)
    mu = rng.randn(8, 16).astype(np.float32)
    logvar = rng.randn(8, 16).astype(np.float32) * 0.1
    expected = np.sum(0.5 * (mu**2 + np.exp(logvar) - logvar - 1.0)) / 8.0
    got = losses.kl_loss(jnp.asarray(mu), jnp.asarray(logvar))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_kl_loss_zero_at_standard_normal():
    mu = jnp.zeros((4, 10))
    logvar = jnp.zeros((4, 10))
    np.testing.assert_allclose(losses.kl_loss(mu, logvar), 0.0, atol=1e-7)


def test_kl_loss_list_sums_branches():
    rng = np.random.RandomState(2)
    mus = [rng.randn(2, 4, 4, 3).astype(np.float32) for _ in range(4)]
    logvars = [rng.randn(2, 4, 4, 3).astype(np.float32) * 0.1 for _ in range(4)]
    expected = sum(
        np.sum(0.5 * (m**2 + np.exp(v) - v - 1.0)) / 2.0
        for m, v in zip(mus, logvars)
    )
    got = losses.kl_loss([jnp.asarray(m) for m in mus],
                         [jnp.asarray(v) for v in logvars])
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_lsgan_loss():
    rng = np.random.RandomState(3)
    s = rng.randn(6, 9, 9, 1).astype(np.float32)
    exp_real = np.sum((s - 1.0) ** 2) / 6.0
    exp_fake = np.sum(s**2) / 6.0
    np.testing.assert_allclose(
        losses.lsgan_loss(jnp.asarray(s), real=True), exp_real, rtol=1e-5)
    np.testing.assert_allclose(
        losses.lsgan_loss(jnp.asarray(s), real=False), exp_fake, rtol=1e-5)


def test_psnr():
    a = jnp.full((4, 4), 100.0)
    b = jnp.full((4, 4), 110.0)
    # mse=100 -> psnr = 20*log10(255/10)
    np.testing.assert_allclose(
        losses.psnr(a, b), 20.0 * np.log10(25.5), rtol=1e-5)


def test_cross_entropy_ignores_label():
    logits = jnp.asarray(np.random.RandomState(4).randn(2, 4, 4, 5), jnp.float32)
    target = np.zeros((2, 4, 4), np.int32)
    target[0, 0, 0] = -1  # ignored
    loss_all = losses.cross_entropy_loss(logits, jnp.asarray(target))
    assert np.isfinite(float(loss_all))

    # all-ignored gives 0/eps ~ 0 without NaN
    loss_ign = losses.cross_entropy_loss(
        logits, jnp.full((2, 4, 4), -1, jnp.int32))
    assert np.isfinite(float(loss_ign))


def test_ohem_keeps_hard_pixels():
    rng = np.random.RandomState(5)
    logits = jnp.asarray(rng.randn(1, 8, 8, 3), jnp.float32)
    target = jnp.asarray(rng.randint(0, 3, (1, 8, 8)), jnp.int32)
    loss = losses.ohem_cross_entropy(logits, target, min_kept=10, thres=0.7)
    assert np.isfinite(float(loss))
