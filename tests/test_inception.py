"""FID/IS stack tests: inception forward shapes, Frechet distance math,
and end-to-end FID over tiny image dirs (random-init weights)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vae2_tpu.models.inception import (init_inception_params,
                                       inception_forward)

pytestmark = pytest.mark.slow  # heavyweight jit compiles; excluded from the cold-container smoke tier


@pytest.fixture(scope="module")
def params():
    return init_inception_params(jax.random.PRNGKey(0), with_fc=True)


def test_pool3_features_shape(params):
    x = jnp.asarray(np.random.RandomState(0).rand(2, 128, 256, 3),
                    jnp.float32)
    feats = inception_forward(params, x, fid_variant=True)
    assert feats.shape == (2, 2048)
    assert np.isfinite(np.asarray(feats)).all()


def test_logits_shape_torchvision_variant(params):
    x = jnp.asarray(np.random.RandomState(1).rand(2, 64, 64, 3), jnp.float32)
    logits = inception_forward(params, x, fid_variant=False, with_logits=True)
    assert logits.shape == (2, 1000)


def test_fid_avg_pool_patch():
    """The FID patch (count_include_pad=False) must match torch's avg_pool2d
    semantics at the borders: divide by the number of REAL elements."""
    from vae2_tpu.models.inception import _avg_pool

    x = jnp.ones((1, 4, 4, 1), jnp.float32)
    incl = np.asarray(_avg_pool(x, include_pad=True))[0, ..., 0]
    excl = np.asarray(_avg_pool(x, include_pad=False))[0, ..., 0]
    # corner: 4 real elements in the 3x3 window
    np.testing.assert_allclose(incl[0, 0], 4.0 / 9.0, rtol=1e-6)
    np.testing.assert_allclose(excl[0, 0], 1.0, rtol=1e-6)
    # edge: 6 real elements
    np.testing.assert_allclose(incl[0, 1], 6.0 / 9.0, rtol=1e-6)
    np.testing.assert_allclose(excl[0, 1], 1.0, rtol=1e-6)
    # interior identical
    np.testing.assert_allclose(incl[1:3, 1:3], excl[1:3, 1:3], rtol=1e-6)


def test_frechet_distance_math():
    from vae2_tpu.eval.fid import calculate_frechet_distance

    rng = np.random.RandomState(0)
    mu = rng.randn(8)
    a = rng.randn(8, 8)
    sigma = a @ a.T + np.eye(8)
    # identical distributions -> 0
    assert abs(calculate_frechet_distance(mu, sigma, mu, sigma)) < 1e-6
    # mean shift only -> squared distance
    mu2 = mu + 1.0
    d = calculate_frechet_distance(mu, sigma, mu2, sigma)
    np.testing.assert_allclose(d, 8.0, atol=1e-5)


def test_fid_end_to_end_tiny(tmp_path, params):
    """FID(dir, same dir) == 0; FID vs noise > 0. Uses random-init weights —
    only self-consistency is asserted."""
    from PIL import Image

    from vae2_tpu.eval import fid as fid_score

    rng = np.random.RandomState(3)
    d1 = tmp_path / "a"
    d2 = tmp_path / "b"
    d1.mkdir()
    d2.mkdir()
    for i in range(4):
        Image.fromarray(
            rng.randint(0, 255, (32, 64, 3), np.uint8)).save(d1 / f"{i}.png")
        Image.fromarray(
            rng.randint(0, 255, (32, 64, 3), np.uint8)).save(d2 / f"{i}.png")

    m1, s1 = fid_score.calculate_activation_statistics(
        fid_score.list_images(str(d1)), params, batch_size=4)
    m2, s2 = fid_score.calculate_activation_statistics(
        fid_score.list_images(str(d2)), params, batch_size=4)
    self_fid = fid_score.calculate_frechet_distance(m1, s1, m1, s1)
    cross_fid = fid_score.calculate_frechet_distance(m1, s1, m2, s2)
    assert abs(self_fid) < 1e-4
    assert np.isfinite(cross_fid)


def test_random_init_features_discriminative(tmp_path):
    """The weightless fallback must separate distinct distributions: He-scaled
    random convs keep activation variance alive through all 48 layers, so
    FID(noise, black) >> FID(noise, noise'). Guards against init scales that
    decay features to a constant (where every FID reads ~0)."""
    from PIL import Image

    from vae2_tpu.eval import fid as fid_score
    from vae2_tpu.models.inception import init_inception_params

    params = init_inception_params(jax.random.PRNGKey(1))
    rng = np.random.RandomState(0)
    dirs = {}
    for name in ("noise_a", "noise_b", "black"):
        d = tmp_path / name
        d.mkdir()
        for i in range(6):
            arr = (np.zeros((32, 64, 3), np.uint8) if name == "black"
                   else rng.randint(0, 255, (32, 64, 3), np.uint8))
            Image.fromarray(arr).save(d / f"{i}.png")
        dirs[name] = fid_score.calculate_activation_statistics(
            fid_score.list_images(str(d)), params, batch_size=6)
    same = fid_score.calculate_frechet_distance(*dirs["noise_a"],
                                                *dirs["noise_b"])
    diff = fid_score.calculate_frechet_distance(*dirs["noise_a"],
                                                *dirs["black"])
    assert diff > 10 * max(same, 1e-6), (same, diff)
