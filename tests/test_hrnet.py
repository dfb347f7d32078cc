"""Shape/behavior tests for the HRNet trunk and the VAE^2 model family,
on a tiny stage spec (CPU-feasible) mirroring the reference stage math
(reference enc_hrnet.py:106-250, 259-527)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae2_tpu.models.hrnet import (
    HRNetTrunk, StageSpec, concat_upsampled, stage_specs_from_extra)
from vae2_tpu.models import vae2 as fam
from vae2_tpu.config import get_default_config

pytestmark = pytest.mark.slow  # heavyweight jit compiles; excluded from the cold-container smoke tier

TINY_SPECS = (
    StageSpec(1, 1, (1,), (8,), "BOTTLENECK"),
    StageSpec(1, 2, (1, 1), (4, 8), "BASIC"),
    StageSpec(1, 3, (1, 1, 1), (4, 8, 16), "BASIC"),
    StageSpec(1, 4, (1, 1, 1, 1), (4, 8, 16, 32), "BASIC"),
)


def _tiny_config(**extra_over):
    cfg = get_default_config()
    for i, s in enumerate(TINY_SPECS, start=1):
        node = cfg.MODEL.EXTRA[f"STAGE{i}"]
        node.NUM_MODULES = s.num_modules
        node.NUM_BRANCHES = s.num_branches
        node.NUM_BLOCKS = list(s.num_blocks)
        node.NUM_CHANNELS = list(s.num_channels)
        node.BLOCK = s.block
    cfg.MODEL.EXTRA.Z_DIM = 4
    cfg.TPU.DTYPE = "float32"
    for k, v in extra_over.items():
        cfg.MODEL.EXTRA[k] = v
    return cfg


def test_stage_specs_from_extra():
    cfg = get_default_config()
    specs = stage_specs_from_extra(cfg.MODEL.EXTRA)
    assert specs[0].block == "BOTTLENECK"
    assert specs[0].out_channels == (256,)
    assert specs[3].out_channels == (18, 36, 72, 144)


def test_trunk_branch_shapes():
    """Stem stride 1 -> branch b at (H/2^b, W/2^b) with spec widths."""
    trunk = HRNetTrunk(specs=TINY_SPECS, stem_stride=1, dtype=jnp.float32)
    x = jnp.zeros((2, 16, 32, 9))
    variables = trunk.init(jax.random.PRNGKey(0), x, None, True)
    feats = trunk.apply(variables, x, None, False)
    assert len(feats) == 4
    for b, f in enumerate(feats):
        assert f.shape == (2, 16 // 2**b, 32 // 2**b, TINY_SPECS[3].out_channels[b])
    cat = concat_upsampled(feats)
    assert cat.shape == (2, 16, 32, sum(TINY_SPECS[3].out_channels))


def test_trunk_stem_stride2():
    """Legacy seg stem (two stride-2 convs) -> branch 0 at H/4."""
    trunk = HRNetTrunk(specs=TINY_SPECS, stem_stride=2, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 64, 3))
    variables = trunk.init(jax.random.PRNGKey(0), x, None, True)
    feats = trunk.apply(variables, x, None, False)
    assert feats[0].shape == (1, 8, 16, 4)


def test_encdec_shapes_and_z_sensitivity():
    cfg = _tiny_config()
    model = fam.get_encdec_model(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 32, 9), jnp.float32)
    # hd_z latent: per-branch maps at branch resolutions
    z = [jnp.ones((2, 16 // 2**b, 32 // 2**b, 4)) * 0.5 for b in range(4)]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, z, True)
    x1p, x2p, x3p = model.apply(variables, x, z, False,
                                rngs={"sample": jax.random.PRNGKey(2)})
    for p in (x1p, x2p, x3p):
        assert p.shape == (2, 16, 32, 9)  # 3 heads x NUM_CLASSES=3
    # different z -> different predictions
    z2 = [m * -2.0 for m in z]
    _, x2p_b, _ = model.apply(variables, x, z2, False,
                              rngs={"sample": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(x2p), np.asarray(x2p_b))


def test_posterior_hd_z_shapes():
    cfg = _tiny_config(HD_Z=True)
    model = fam.get_encz_model(cfg)
    x = jnp.zeros((2, 16, 32, 18))  # cat[xt, x3t]
    variables = model.init(jax.random.PRNGKey(0), x, True)
    muvars = model.apply(variables, x, False)
    assert isinstance(muvars, list) and len(muvars) == 4
    for b, m in enumerate(muvars):
        assert m.shape == (2, 16 // 2**b, 32 // 2**b, 8)  # 2*z_dim
        assert m.dtype == jnp.float32


def test_posterior_pooled_shapes():
    cfg = _tiny_config(HD_Z=False)
    model = fam.get_encz_model(cfg)
    x = jnp.zeros((2, 16, 32, 18))
    variables = model.init(jax.random.PRNGKey(0), x, True)
    muvars = model.apply(variables, x, False)
    assert muvars.shape == (2, 8)


def test_discriminator_shapes():
    cfg = _tiny_config()
    model = fam.get_D_sequence_model(cfg)
    x = jnp.zeros((2, 16, 32, 9))
    variables = model.init(jax.random.PRNGKey(0), x, True)
    out = model.apply(variables, x, False)
    assert out.shape == (2, 16, 32, 1)
    # frame discriminator: same net, 3-channel input
    fr = fam.get_D_frame_model(cfg)
    vf = fr.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 32, 3)), True)
    assert fr.apply(vf, jnp.zeros((2, 16, 32, 3)), False).shape == (2, 16, 32, 1)


def test_encoder_random_code_varies_with_rng():
    """The encoder draws a fresh random code per forward
    (enc_hrnet.py:454-462, 819): different 'sample' rng -> different x2p."""
    cfg = _tiny_config()
    model = fam.get_encdec_model(cfg)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 16, 32, 9), jnp.float32)
    z = [jnp.zeros((2, 16 // 2**b, 32 // 2**b, 4)) for b in range(4)]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, z, True)
    _, a, _ = model.apply(variables, x, z, False,
                          rngs={"sample": jax.random.PRNGKey(10)})
    _, b, _ = model.apply(variables, x, z, False,
                          rngs={"sample": jax.random.PRNGKey(20)})
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_sample_method_matches_full_forward():
    """The shared-prefix multi-sample path (VAE2EncDec.sample) must equal the
    plain forward on a tiled batch: same z, same rng => same predictions."""
    cfg = _tiny_config()
    model = fam.get_encdec_model(cfg)
    x1 = jnp.asarray(np.random.RandomState(3).randn(1, 16, 32, 9), jnp.float32)
    s = 3
    z = [jnp.asarray(np.random.RandomState(10 + b).randn(
        s, 16 // 2**b, 32 // 2**b, 4), jnp.float32) for b in range(4)]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x1, [m[:1] for m in z], True)

    rng = jax.random.PRNGKey(7)
    tiled = jnp.broadcast_to(x1, (s,) + x1.shape[1:])
    full = model.apply(variables, tiled, z, False, rngs={"sample": rng})
    shared = model.apply(variables, x1, z, False, rngs={"sample": rng},
                         method="sample")
    for a, b in zip(full, shared):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_bfloat16_compute_f32_params():
    cfg = _tiny_config()
    cfg.TPU.DTYPE = "bfloat16"
    model = fam.get_D_sequence_model(cfg)
    x = jnp.zeros((1, 16, 32, 9), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x, True)
    leaves = jax.tree.leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)
    out = model.apply(variables, x, False)
    assert out.dtype == jnp.float32  # discriminator casts output to f32


@pytest.mark.parametrize("remat", ["none", "trunk", "stage"])
def test_remat_policies_numerically_transparent(remat):
    """jax.checkpoint at any granularity must not change params, outputs, or
    gradients — only the backward's memory/recompute schedule."""
    cfg = _tiny_config()
    cfg.TPU.REMAT = remat
    model = fam.get_encdec_model(cfg)
    cfg_ref = _tiny_config()
    cfg_ref.TPU.REMAT = "none"
    ref = fam.get_encdec_model(cfg_ref)

    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 32, 9), jnp.float32)
    z = [jnp.asarray(np.random.RandomState(5 + b).randn(
        2, 16 // 2**b, 32 // 2**b, 4), jnp.float32) for b in range(4)]
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    variables = ref.init(rngs, x, z, True)
    # identical param tree regardless of remat policy
    v2 = model.init(rngs, x, z, True)
    assert jax.tree.structure(v2["params"]) == jax.tree.structure(
        variables["params"])

    def loss(m):
        def f(params):
            out = m.apply({**variables, "params": params}, x, z, False,
                          rngs={"sample": jax.random.PRNGKey(2)})
            return sum(jnp.sum(jnp.square(o)) for o in out)
        return f

    l_ref, g_ref = jax.value_and_grad(loss(ref))(variables["params"])
    l, g = jax.value_and_grad(loss(model))(variables["params"])
    np.testing.assert_allclose(np.asarray(l), np.asarray(l_ref),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_multiscale_head_exact_vs_concat_path():
    """ConvHead(list) commutes the 1x1 conv before the bilinear upsample —
    must equal ConvHead(concat_upsampled(...)) bit-for-bit in f32 (linear ops
    commute), with an IDENTICAL parameter tree (torch import compat)."""
    from vae2_tpu.models.hrnet import ConvHead

    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 5)
    feats = [
        jax.random.normal(ks[b], (2, 16 // 2**b, 32 // 2**b, c), jnp.float32)
        for b, c in enumerate((4, 8, 16, 32))
    ]
    head = ConvHead(out_features=3, final_kernel=1, dtype=jnp.float32)
    params = head.init(ks[4], feats, True)
    params_cat = head.init(ks[4], concat_upsampled(feats), True)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_cat)
    for (p1, p2) in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(params_cat)):
        assert p1.shape == p2.shape

    out_ms, _ = head.apply(params, feats, True,
                           mutable=["batch_stats"])
    out_cat, _ = head.apply(params, concat_upsampled(feats), True,
                            mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_ms), np.asarray(out_cat),
                               rtol=1e-5, atol=1e-5)

    # presum feed: pre-upsampled branch list (TPU.HEAD_DATAFLOW=presum)
    from vae2_tpu.models.hrnet import upsampled_branches

    out_ps, _ = head.apply(params, upsampled_branches(feats), True,
                           mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_ps), np.asarray(out_cat),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dataflow", ["multiscale", "presum"])
def test_encdec_head_dataflows_match_reference_dataflow(dataflow):
    """Full VAE2EncDec forward: every TPU.HEAD_DATAFLOW rewrite must agree
    with the reference conv-of-concat dataflow ('concat') under shared
    params (f32), with an identical parameter tree (torch import compat)."""
    cfg = _tiny_config()
    specs = stage_specs_from_extra(cfg.MODEL.EXTRA)
    kw = dict(specs=specs, clip_length=3, num_classes=3, z_dim=4,
              dtype=jnp.float32)
    m_fast = fam.VAE2EncDec(head_dataflow=dataflow, **kw)
    m_ref = fam.VAE2EncDec(head_dataflow="concat", **kw)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32, 9), jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 4), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(3), "sample": jax.random.PRNGKey(4)}
    v_fast = m_fast.init(rngs, x, z, True)
    v_ref = m_ref.init(rngs, x, z, True)
    assert jax.tree_util.tree_structure(v_fast) == \
        jax.tree_util.tree_structure(v_ref)
    o_fast = m_fast.apply(v_fast, x, z, False,
                          rngs={"sample": jax.random.PRNGKey(5)})
    o_ref = m_ref.apply(v_fast, x, z, False,
                        rngs={"sample": jax.random.PRNGKey(5)})
    for a, b in zip(o_fast, o_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
