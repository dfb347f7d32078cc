"""BatchNormAct numerics vs torch.nn.BatchNorm2d (the reference's BN)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from vae2_tpu.ops.norm import BatchNormAct


def _torch_bn_reference(x_nhwc, steps=3, momentum=0.01):
    """Run torch BN (train mode) over `steps` batches; return outputs and
    final running stats."""
    c = x_nhwc[0].shape[-1]
    bn = torch.nn.BatchNorm2d(c, momentum=momentum)
    bn.train()
    outs = []
    for x in x_nhwc:
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        outs.append(np.transpose(bn(xt).detach().numpy(), (0, 2, 3, 1)))
    return outs, bn.running_mean.numpy(), bn.running_var.numpy()


def test_batchnorm_matches_torch_train_and_stats():
    rng = np.random.RandomState(0)
    batches = [rng.randn(4, 6, 6, 5).astype(np.float32) * (i + 1)
               for i in range(3)]
    t_outs, t_mean, t_var = _torch_bn_reference(batches)

    bn = BatchNormAct(act=None, dtype=jnp.float32)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(batches[0]), True)
    state = variables["batch_stats"]
    params = variables["params"]
    for x, t_out in zip(batches, t_outs):
        out, upd = bn.apply({"params": params, "batch_stats": state},
                            jnp.asarray(x), True, mutable=["batch_stats"])
        state = upd["batch_stats"]
        np.testing.assert_allclose(np.asarray(out), t_out, atol=2e-5)
    np.testing.assert_allclose(np.asarray(state["mean"]), t_mean, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state["var"]), t_var, rtol=1e-4)


def test_batchnorm_eval_uses_running_stats():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 4, 3).astype(np.float32)
    bn = BatchNormAct(act=None, dtype=jnp.float32)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), True)
    # fresh stats: mean 0, var 1 -> eval output ~= x (up to the 1e-5 epsilon)
    out = bn.apply(variables, jnp.asarray(x), False)
    np.testing.assert_allclose(np.asarray(out), x, atol=5e-5)


def test_batchnorm_fused_relu():
    x = jnp.asarray(np.random.RandomState(2).randn(2, 4, 4, 3), jnp.float32)
    bn = BatchNormAct(act="relu", dtype=jnp.float32)
    variables = bn.init(jax.random.PRNGKey(0), x, True)
    out, _ = bn.apply(variables, x, True, mutable=["batch_stats"])
    assert (np.asarray(out) >= 0).all()


def test_batchnorm_global_stats_match_sharded_unsharded():
    """SyncBN semantics: with the batch sharded over a mesh, jit computes the
    same global statistics as the unsharded run (XLA inserts the collective)."""
    import jax.sharding as shd

    devs = jax.devices()
    if len(devs) < 4:
        import pytest
        pytest.skip("needs multi-device platform")
    mesh = shd.Mesh(np.array(devs[:4]), ("data",))
    x = jnp.asarray(np.random.RandomState(3).randn(8, 4, 4, 3), jnp.float32)
    bn = BatchNormAct(act=None, dtype=jnp.float32)
    variables = bn.init(jax.random.PRNGKey(0), x, True)

    @jax.jit
    def run(v, x):
        return bn.apply(v, x, True, mutable=["batch_stats"])

    out_ref, upd_ref = run(variables, x)
    xs = jax.device_put(
        x, shd.NamedSharding(mesh, shd.PartitionSpec("data")))
    out_sh, upd_sh = run(variables, xs)
    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(upd_sh["batch_stats"]["var"]),
                               np.asarray(upd_ref["batch_stats"]["var"]),
                               rtol=1e-5)
