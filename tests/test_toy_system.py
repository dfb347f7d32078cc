"""End-to-end tests of the toy VAE^2 system: init, G/D steps, loss decrease,
baseline modes, and checkpoint round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae2_tpu.config import get_default_config
from vae2_tpu.core.builder import build_system
from vae2_tpu.data.toy import ToyLoader, gen_toy_batch, make_toy_alphas
from vae2_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

pytestmark = pytest.mark.slow  # heavyweight jit compiles; excluded from the cold-container smoke tier


def _toy_config(**overrides):
    cfg = get_default_config()
    cfg.MODEL.NAME = "toy_fc"
    cfg.DATASET.DATASET = "toyexample"
    cfg.TRAIN.OPTIMIZER = "adam"
    cfg.TRAIN.LR = 1e-3
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 64
    for k, v in overrides.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return cfg


def _small_batch(n=64):
    alphas, seeds = make_toy_alphas(shuffle_seed=0)
    return gen_toy_batch(alphas[:n], seeds)


def test_toy_data_deterministic():
    alphas, seeds = make_toy_alphas(shuffle_seed=0)
    b1 = gen_toy_batch(alphas[:4], seeds)
    b2 = gen_toy_batch(alphas[:4], seeds)
    for k in ("xt", "x2t", "x3t"):
        np.testing.assert_array_equal(b1[k], b2[k])
        assert b1[k].shape == (4, 10)
        assert (b1[k] >= 0).all() and (b1[k] <= 1).all()  # sigmoid range


def test_toy_loader_covers_all_alphas():
    loader = ToyLoader(batch_size=500)
    assert len(loader) == 20  # 10k alphas / 500


def test_train_step_updates_and_loss_decreases():
    cfg = _toy_config()
    system = build_system(cfg)
    batch = {k: jnp.asarray(v) for k, v in _small_batch().items()}
    state = system.init(jax.random.PRNGKey(0), batch)
    step = system.make_train_step(donate=False)

    rng = jax.random.PRNGKey(1)
    first_loss = None
    for i in range(30):
        rng, sk = jax.random.split(rng)
        state, metrics, preds = step(state, batch, sk, jnp.float32(1.0))
        if first_loss is None:
            first_loss = float(metrics["loss_encdec"])
    last_loss = float(metrics["loss_encdec"])
    assert np.isfinite(last_loss)
    assert last_loss < first_loss, (first_loss, last_loss)
    assert int(state.step) == 30
    # predictions keep input shape
    assert preds[0].shape == batch["xt"].shape
    assert preds[1].shape == batch["x2t"].shape


def test_g_step_does_not_touch_d_params():
    cfg = _toy_config()
    system = build_system(cfg)
    batch = {k: jnp.asarray(v) for k, v in _small_batch().items()}
    state = system.init(jax.random.PRNGKey(0), batch)

    rng = jax.random.PRNGKey(2)
    g_params = system._g_params(state.params)
    d_params = system._d_params(state.params)
    grad_fn = jax.grad(system.generator_loss, has_aux=True)
    grads, _ = grad_fn(g_params, d_params, state.batch_stats, batch, rng,
                       jnp.float32(1.0))
    # Generator grads exist and cover only encdec/encz.
    assert set(grads.keys()) == {"encdec", "encz"}
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


def test_d_step_grads_nonzero():
    cfg = _toy_config()
    system = build_system(cfg)
    batch = {k: jnp.asarray(v) for k, v in _small_batch().items()}
    state = system.init(jax.random.PRNGKey(0), batch)

    x2p = batch["x2t"] + 0.1
    grad_fn = jax.grad(system.discriminator_loss, has_aux=True)
    grads, _ = grad_fn(system._d_params(state.params),
                       system._g_params(state.params),
                       state.batch_stats, batch["x2t"], x2p)
    assert set(grads.keys()) == {"d_seq"}
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in jax.tree.leaves(grads))


@pytest.mark.parametrize("mode", ["VAE_NATIVE", "VAE_ANNEAL", "VAE_GAN",
                                  "DETERMINISTIC"])
def test_baseline_modes_run(mode):
    cfg = _toy_config(**{"MODEL.EXTRA.IS_BASELINE": True,
                         "MODEL.EXTRA.BASELINE_MODE": mode})
    system = build_system(cfg)
    batch = {k: jnp.asarray(v) for k, v in _small_batch(16).items()}
    state = system.init(jax.random.PRNGKey(0), batch)
    step = system.make_train_step(donate=False)
    state, metrics, _ = step(state, batch, jax.random.PRNGKey(1),
                             jnp.float32(0.5))
    assert np.isfinite(float(metrics["loss_encdec"]))
    if mode in ("VAE_NATIVE", "VAE_ANNEAL"):
        assert float(metrics["loss_D"]) == 0.0  # no D-step outside VAE_GAN
    if mode == "DETERMINISTIC":
        assert float(metrics["loss_z_KL"]) == 0.0


def test_prior_sampling_eval_step():
    cfg = _toy_config()
    system = build_system(cfg)
    batch = {k: jnp.asarray(v) for k, v in _small_batch(8).items()}
    state = system.init(jax.random.PRNGKey(0), batch)
    eval_step = system.make_eval_step("prior_sampling")
    preds1, _ = eval_step(state, batch, jax.random.PRNGKey(1))
    preds2, _ = eval_step(state, batch, jax.random.PRNGKey(2))
    # different prior samples -> different predictions (stochasticity)
    assert not np.allclose(np.asarray(preds1[1]), np.asarray(preds2[1]))


def test_momentum_sampling():
    """momentum_sampling conditions the posterior on the previous window's
    clips (reference utils.py:195); needs xt_last/x3t_last batch keys."""
    cfg = _toy_config()
    system = build_system(cfg)
    b = _small_batch(8)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    batch["xt_last"] = batch["xt"] * 0.9
    batch["x3t_last"] = batch["x3t"] * 0.9
    state = system.init(jax.random.PRNGKey(0), batch)
    # amplify the posterior weights so input sensitivity is measurable
    # (fresh init is std=0.001 -> deltas vanish below float tolerance)
    g_params = system._g_params(state.params)
    g_params["encz"] = jax.tree.map(lambda x: x * 100.0, g_params["encz"])

    loss, (metrics, preds, _) = system.generator_loss(
        g_params, system._d_params(state.params),
        state.batch_stats, batch, jax.random.PRNGKey(1),
        jnp.float32(1.0), sampling_mode="momentum_sampling", train=False)
    assert np.isfinite(float(loss))
    # different previous-window clips -> different z -> different preds
    batch2 = dict(batch)
    batch2["xt_last"] = batch["xt_last"] + 10.0
    _, (_, preds2, _) = system.generator_loss(
        g_params, system._d_params(state.params),
        state.batch_stats, batch2, jax.random.PRNGKey(1),
        jnp.float32(1.0), sampling_mode="momentum_sampling", train=False)
    assert not np.allclose(np.asarray(preds[1]), np.asarray(preds2[1]))
    # while changing the CURRENT clips (not fed to the posterior in momentum
    # mode) with identical z leaves the posterior's z unchanged: check via
    # identical KL metric
    batch3 = dict(batch)
    batch3["x3t"] = batch["x3t"] + 5.0  # posterior must NOT see this
    _, (m3, _, _) = system.generator_loss(
        g_params, system._d_params(state.params),
        state.batch_stats, batch3, jax.random.PRNGKey(1),
        jnp.float32(1.0), sampling_mode="momentum_sampling", train=False)
    np.testing.assert_allclose(float(m3["loss_z_KL"]),
                               float(metrics["loss_z_KL"]), rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    cfg = _toy_config()
    system = build_system(cfg)
    batch = {k: jnp.asarray(v) for k, v in _small_batch(8).items()}
    state = system.init(jax.random.PRNGKey(0), batch)
    step = system.make_train_step(donate=False)
    state, _, _ = step(state, batch, jax.random.PRNGKey(1), jnp.float32(1.0))

    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(path, state, epoch=3)
    template = system.init(jax.random.PRNGKey(9), batch)
    restored, epoch = load_checkpoint(path, template)
    assert epoch == 3
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
