"""Low-precision Adam moments (TPU.ADAM_MOMENT_DTYPE) vs optax.adam."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vae2_tpu.core.system import scale_by_adam_lowp


def _run(opt, params, grads_seq):
    state = opt.init(params)
    out = []
    for g in grads_seq:
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
        out.append(params)
    return params, state


def test_bf16_moments_track_f32_adam():
    rng = np.random.RandomState(0)
    params = {"w": jnp.asarray(rng.randn(16, 8), jnp.float32),
              "b": jnp.asarray(rng.randn(8), jnp.float32)}
    grads_seq = [
        {"w": jnp.asarray(rng.randn(16, 8) * 0.1, jnp.float32),
         "b": jnp.asarray(rng.randn(8) * 0.1, jnp.float32)}
        for _ in range(10)
    ]
    lr = 1e-3
    ref = optax.adam(lr)
    lowp = optax.chain(scale_by_adam_lowp(moment_dtype=jnp.bfloat16),
                       optax.scale(-lr))
    p_ref, _ = _run(ref, params, grads_seq)
    p_lowp, s_lowp = _run(lowp, params, grads_seq)
    # moments stored in bf16
    assert s_lowp[0].mu["w"].dtype == jnp.bfloat16
    assert s_lowp[0].nu["b"].dtype == jnp.bfloat16
    for k in params:
        # 10 steps of bf16 moment rounding: updates drift by O(1e-2 * lr)
        np.testing.assert_allclose(np.asarray(p_lowp[k]),
                                   np.asarray(p_ref[k]),
                                   rtol=2e-4, atol=2e-4)


def _train_cfg(**over):
    from vae2_tpu.config.defaults import get_default_config

    cfg = get_default_config()
    for k, v in over.items():
        setattr(cfg.TRAIN, k, v)
    return cfg.TRAIN


def test_poly_schedule_matches_reference_formula():
    """TRAIN.LR_SCHEDULE='poly' reproduces lr*(1-i/max)^power (reference
    utils.py:459-463) on every optimizer variant."""
    from vae2_tpu.core.system import make_optimizer
    from vae2_tpu.utils.schedule import adjust_learning_rate

    base, max_iters, steps = 1e-2, 20, 6
    params = {"w": jnp.ones((4,), jnp.float32)}
    g = {"w": jnp.ones((4,), jnp.float32)}

    for kw in ({"OPTIMIZER": "adam"},):
        for moment in ("float32", "bfloat16"):
            opt = make_optimizer(
                _train_cfg(LR=base, LR_SCHEDULE="poly", **kw),
                moment_dtype=moment, max_iters=max_iters)
            state = opt.init(params)
            p = params
            for i in range(steps):
                updates, state = opt.update(g, state, p)
                # constant gradient of ones -> Adam update is -lr(i) exactly
                # (bias corrections cancel on a constant gradient)
                want = adjust_learning_rate(base, max_iters, i)
                rtol = 1e-4 if moment == "float32" else 1e-2
                np.testing.assert_allclose(
                    -np.asarray(updates["w"])[0], want, rtol=rtol,
                    err_msg=f"{kw} moment={moment} step {i}")
                p = optax.apply_updates(p, updates)


def test_poly_schedule_requires_max_iters():
    from vae2_tpu.core.system import make_optimizer

    try:
        make_optimizer(_train_cfg(LR_SCHEDULE="poly", OPTIMIZER="adam"))
    except ValueError as e:
        assert "max_iters" in str(e)
    else:
        raise AssertionError("expected ValueError without max_iters")


def test_f32_moments_exactly_match_optax():
    rng = np.random.RandomState(1)
    params = {"w": jnp.asarray(rng.randn(4, 4), jnp.float32)}
    grads = [{"w": jnp.asarray(rng.randn(4, 4), jnp.float32)}
             for _ in range(5)]
    lr = 1e-2
    ref = optax.adam(lr)
    mine = optax.chain(scale_by_adam_lowp(moment_dtype=jnp.float32),
                       optax.scale(-lr))
    p_ref, _ = _run(ref, params, grads)
    p_mine, _ = _run(mine, params, grads)
    np.testing.assert_allclose(np.asarray(p_mine["w"]),
                               np.asarray(p_ref["w"]), rtol=1e-6, atol=1e-6)
