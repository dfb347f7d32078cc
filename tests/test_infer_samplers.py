"""Sampler tests for the inference loop (reference utils.py:186-207,
function.py:99-115): prior vs momentum sampling on a tiny stochastic model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae2_tpu.core.builder import build_system
from vae2_tpu.core.infer_loop import make_momentum_sampler, make_prior_sampler

pytestmark = pytest.mark.slow  # heavyweight jit compiles; excluded from the cold-container smoke tier


def _tiny_cfg(hd_z=True):
    from vae2_tpu.config import get_default_config

    cfg = get_default_config()
    cfg.TPU.DTYPE = "float32"
    cfg.MODEL.EXTRA.Z_DIM = 4
    cfg.MODEL.EXTRA.HD_Z = hd_z
    for i, (blocks, chans, block) in enumerate(
        [([1], [8], "BOTTLENECK"),
         ([1, 1], [4, 8], "BASIC"),
         ([1, 1, 1], [4, 8, 16], "BASIC"),
         ([1, 1, 1, 1], [4, 8, 16, 32], "BASIC")], start=1):
        node = cfg.MODEL.EXTRA[f"STAGE{i}"]
        node.NUM_MODULES = 1
        node.NUM_BLOCKS = blocks
        node.NUM_CHANNELS = chans
        node.BLOCK = block
        node.NUM_BRANCHES = len(blocks)
    return cfg


H, W, CHUNK = 32, 64, 3


@pytest.fixture(scope="module")
def tiny_state():
    cfg = _tiny_cfg()
    system = build_system(cfg)
    batch = {k: jnp.zeros((1, H, W, 9), jnp.float32)
             for k in ("xt", "x2t", "x3t")}
    state = system.init(jax.random.PRNGKey(0), batch)
    return system, state


def _u8(seed):
    return jnp.asarray(np.random.RandomState(seed).randint(
        0, 255, (1, H, W, 9), np.uint8))


def test_momentum_sampler_shapes_and_stochasticity(tiny_state):
    system, state = tiny_state
    sampler = make_momentum_sampler(system, chunk=CHUNK)
    xt, x2t = _u8(0), _u8(1)
    xt_last, x3t_last = _u8(2), _u8(3)
    x1p, x2p, x3p = sampler(state, xt, x2t, xt_last, x3t_last,
                            jax.random.PRNGKey(7))
    for p in (x1p, x2p, x3p):
        assert p.shape == (CHUNK, H, W, 9)
        assert np.isfinite(np.asarray(p)).all()
    # different posterior draws -> different predictions across the chunk
    assert not np.allclose(np.asarray(x2p[0]), np.asarray(x2p[1]))


def test_momentum_z_comes_from_previous_window_posterior(tiny_state):
    """Pin the sampler bit-for-bit against the reference math
    (utils.py:195): z = mu + exp(logvar/2)*eps with (mu, logvar) =
    encz(concat(xt_last, x3t_last)), eps fresh per chunk sample, then the
    shared-prefix decode. (An end-to-end 'changing xt_last changes the
    output' check is not testable at random init: the encz trunk in eval
    mode shrinks activations to ~1e-11 — identity running BN stats never
    renormalize the stddev-0.001 kernels — so mu/logvar are 0 to float
    precision regardless of input.)"""
    from vae2_tpu.core.infer_loop import _decode_samples
    from vae2_tpu.core.system import split_muvar
    from vae2_tpu.data.loader import normalize_clips

    system, state = tiny_state
    sampler = make_momentum_sampler(system, chunk=CHUNK)
    xt, x2t, xt_last, x3t_last = _u8(0), _u8(1), _u8(2), _u8(3)
    k = jax.random.PRNGKey(7)
    got = sampler(state, xt, x2t, xt_last, x3t_last, k)

    # manual reference computation, mirroring the sampler's rng discipline
    rng_eps, rng_code = jax.random.split(k)
    q_in = jnp.concatenate(
        [normalize_clips(xt_last), normalize_clips(x3t_last)], axis=-1)
    muvars, _ = system._apply(
        "encz", state.params, state.batch_stats, q_in, train=False)
    mus, logvars = split_muvar(muvars, system.hyper.z_dim)
    keys = jax.random.split(rng_eps, len(mus))
    z = [m + jnp.exp(0.5 * v)
         * jax.random.normal(kk, (CHUNK,) + m.shape[1:], m.dtype)
         for m, v, kk in zip(mus, logvars, keys)]
    enc_in = system._encoder_input(
        normalize_clips(xt), normalize_clips(x2t))
    want = _decode_samples(system, state, enc_in, z, rng_code, CHUNK)

    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-6, rtol=1e-5)


def test_momentum_rejects_deterministic_model():
    cfg = _tiny_cfg()
    cfg.MODEL.EXTRA.IS_BASELINE = True
    cfg.MODEL.EXTRA.BASELINE_MODE = "DETERMINISTIC"
    system = build_system(cfg)
    with pytest.raises(ValueError):
        make_momentum_sampler(system, chunk=2)


def test_run_inference_reuses_jitted_sampler(tiny_state, tmp_path,
                                             monkeypatch):
    """Multi-checkpoint trajectory evals (tools/inference.py
    --checkpoint a,b,c) must build the jitted sampler ONCE across
    run_inference calls — a fresh jax.jit object per snapshot recompiles."""
    from vae2_tpu.config import get_default_config
    from vae2_tpu.core import infer_loop

    system, state = tiny_state
    cfg = get_default_config()
    cfg.TRAIN.IMAGE_SIZE = [W, H]
    cfg.TPU.INFER_SAMPLE_BATCH = CHUNK

    calls = {"n": 0}
    real = infer_loop.make_prior_sampler

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(infer_loop, "make_prior_sampler", counting)
    infer_loop._SAMPLER_CACHE.clear()
    loader = [({k: np.asarray(_u8(i + 7)) for k in ("xt", "x2t", "x3t")},
               [f"clip{i}"]) for i in range(1)]
    for epoch in (0, 1):
        infer_loop.run_inference(
            cfg, system, state, loader, str(tmp_path), epoch,
            jax.random.PRNGKey(epoch), num_samples=CHUNK,
            save_images=False)
    assert calls["n"] == 1, "sampler was rebuilt per checkpoint"
    infer_loop._SAMPLER_CACHE.clear()
