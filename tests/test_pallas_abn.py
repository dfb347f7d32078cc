"""Fused ABN Pallas kernel vs a plain-JAX reference implementation:
forward values and the activation-inverting backward (gradients wrt x,
scale, bias)."""

import jax
import jax.numpy as jnp
import numpy as np

from vae2_tpu.ops.pallas.abn import fused_abn, fused_abn_infer
import pytest

pytestmark = pytest.mark.slow  # heavyweight jit compiles; excluded from the cold-container smoke tier

SLOPE = 0.01


def _ref_abn(x, scale, bias, eps=1e-5):
    """Plain JAX: BN(batch stats) + leaky relu."""
    c = x.shape[-1]
    xf = x.reshape(-1, c).astype(jnp.float32)
    mean = jnp.mean(xf, axis=0)
    var = jnp.maximum(jnp.mean(xf * xf, axis=0) - mean**2, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    y = jnp.where(y >= 0, y, y * SLOPE)
    return y.reshape(x.shape)


def test_forward_matches_reference():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 8, 8, 16) * 2 + 1, jnp.float32)
    scale = jnp.asarray(rng.rand(16) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(16) * 0.3, jnp.float32)
    got = fused_abn(x, scale, bias)
    want = _ref_abn(x, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_infer_mode_matches_formula():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 4, 4, 8), jnp.float32)
    mean = jnp.asarray(rng.randn(8), jnp.float32)
    var = jnp.asarray(rng.rand(8) + 0.1, jnp.float32)
    scale = jnp.asarray(rng.rand(8) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(8), jnp.float32)
    got = fused_abn_infer(x, mean, var, scale, bias)
    y = (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
    want = jnp.where(y >= 0, y, y * SLOPE)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_backward_matches_autodiff_of_reference():
    """The activation-inverting backward (which never sees x, only y) must
    produce the same gradients as autodiff through the reference impl.

    Note: fused_abn treats the batch statistics as constants in the backward
    (the torch-BN 'eval-style' gradient used by InPlace-ABN's backward
    formulas with the mean/var terms folded into edz/eydz), so we compare
    against autodiff of the reference with stats treated the same way.
    """
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(6, 4, 4, 8), jnp.float32)
    scale = jnp.asarray(rng.rand(8) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(8) * 0.2, jnp.float32)

    def loss_fused(x, s, b):
        return jnp.sum(fused_abn(x, s, b) ** 2)

    def loss_ref(x, s, b):
        return jnp.sum(_ref_abn(x, s, b) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)

    # dx differs by the batch-statistic correction terms (InPlace-ABN's
    # training backward): compare against the ABN formula directly.
    c = 8
    xf = x.reshape(-1, c)
    n = xf.shape[0]
    mean = jnp.mean(xf, axis=0)
    var = jnp.maximum(jnp.mean(xf * xf, axis=0) - mean**2, 0.0)
    inv_std = jax.lax.rsqrt(var + 1e-5)
    y = _ref_abn(x, scale, bias).reshape(-1, c)
    dz = (2 * y)  # d loss / d y
    dz_eff = jnp.where(y >= 0, dz, dz * SLOPE)
    y_norm = (xf - mean) * inv_std
    edz = jnp.sum(dz_eff, axis=0)
    eydz = jnp.sum(y_norm * dz_eff, axis=0)
    dx_expected = ((dz_eff - edz / n - y_norm * eydz / n)
                   * scale * inv_std).reshape(x.shape)

    np.testing.assert_allclose(np.asarray(g_fused[0]),
                               np.asarray(dx_expected), atol=2e-3)
    # full-batch-stat autodiff matches the ABN formula too (sanity)
    np.testing.assert_allclose(np.asarray(g_ref[0]),
                               np.asarray(dx_expected), atol=2e-3)
    # dgamma / dbeta
    np.testing.assert_allclose(np.asarray(g_fused[1]), np.asarray(eydz),
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(g_fused[2]), np.asarray(edz),
                               rtol=2e-4)


def test_batchnormact_pallas_backend_matches_xla():
    """BatchNormAct(backend='pallas') must match the xla path for the
    ABN-invertible activations, in both train and eval mode, including the
    running-stat update (the TPU.FUSED_ABN wiring)."""
    from vae2_tpu.ops.norm import BatchNormAct

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 8, 8, 16) * 2 + 1, jnp.float32)

    for act in (None, "leaky_relu", "elu"):
        xla_bn = BatchNormAct(act=act, backend="xla")
        pal_bn = BatchNormAct(act=act, backend="pallas")
        variables = xla_bn.init(jax.random.PRNGKey(0), x, True)

        y_x, m_x = xla_bn.apply(variables, x, True, mutable=["batch_stats"])
        y_p, m_p = pal_bn.apply(variables, x, True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                                   atol=2e-5, err_msg=f"train act={act}")
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6),
            m_p["batch_stats"], m_x["batch_stats"])

        e_x = xla_bn.apply(m_x | {"params": variables["params"]}, x, False)
        e_p = pal_bn.apply(m_p | {"params": variables["params"]}, x, False)
        np.testing.assert_allclose(np.asarray(e_p), np.asarray(e_x),
                                   atol=2e-5, err_msg=f"eval act={act}")


def test_batchnormact_pallas_gradients_match_xla():
    from vae2_tpu.ops.norm import BatchNormAct

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 4, 4, 8), jnp.float32)
    for act in ("leaky_relu", "elu"):
        xla_bn = BatchNormAct(act=act, backend="xla")
        pal_bn = BatchNormAct(act=act, backend="pallas")
        variables = xla_bn.init(jax.random.PRNGKey(0), x, True)
        params = variables["params"]
        stats = {"batch_stats": variables.get("batch_stats", {})}

        def loss(bn, p, xx):
            y, _ = bn.apply({"params": p, **stats}, xx, True,
                            mutable=["batch_stats"])
            return jnp.sum(y * y)

        gx_p, gp_p = jax.grad(lambda p, xx: loss(pal_bn, p, xx),
                              argnums=(0, 1))(params, x)
        gx_x, gp_x = jax.grad(lambda p, xx: loss(xla_bn, p, xx),
                              argnums=(0, 1))(params, x)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-4, rtol=1e-3,
                err_msg=f"act={act}"),
            (gx_p, gp_p), (gx_x, gp_x))


def test_batchnormact_pallas_relu_falls_back_to_exact_relu():
    """backend='pallas' + act='relu' must NOT change model math: true ReLU
    is not invertible from outputs (the InPlace-ABN backward needs the
    normalized pre-activation at zeroed positions), so the layer falls back
    to the XLA epilogue and matches backend='xla' exactly."""
    from vae2_tpu.ops.norm import BatchNormAct

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 4, 4, 8), jnp.float32)
    relu_p = BatchNormAct(act="relu", backend="pallas")
    relu_x = BatchNormAct(act="relu", backend="xla")
    variables = relu_x.init(jax.random.PRNGKey(0), x, True)
    y_p, _ = relu_p.apply(variables, x, True, mutable=["batch_stats"])
    y_x, _ = relu_x.apply(variables, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), atol=0)
