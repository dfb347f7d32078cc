"""Torch-checkpoint import: naming-scheme spot checks against the reference
module tree (reference lib/models/enc_hrnet.py) and a synthetic round-trip."""

import numpy as np
import jax
import pytest

from vae2_tpu.utils import torch_import as ti


@pytest.mark.parametrize("net,parts,expected", [
    ("encdec", ["encoder", "trunk", "conv1"], "encdec_model.conv1"),
    ("encdec", ["dec_future", "trunk", "stage2_module0", "branch1", "block0",
                "conv1"], "encdec_model.decf_stage2.0.branches.1.0.conv1"),
    ("encdec", ["dec_past", "trunk", "layer1", "block0", "down_conv"],
     "encdec_model.decp_layer1.0.downsample.0"),
    ("encdec", ["encoder", "trunk", "transition1", "new1_0_conv"],
     "encdec_model.transition1.1.0.0"),
    ("encdec", ["encoder", "trunk", "transition2", "adapt0_conv"],
     "encdec_model.transition2.0.0"),
    ("encdec", ["encoder", "trunk", "stage3_module1", "fuse", "up_0_2_conv"],
     "encdec_model.stage3.1.fuse_layers.0.2.0"),
    ("encdec", ["encoder", "trunk", "stage4_module0", "fuse",
                "down_2_0_1_bn"], "encdec_model.stage4.0.fuse_layers.2.0.1.1"),
    ("encdec", ["encoder", "trunk", "transition3_e", "inject2_bn"],
     "encdec_model.transition3_e.2.1"),
    ("encdec", ["encoder", "last_layer_2", "bn"], "encdec_model.last_layer_2.1"),
    ("encdec", ["encoder", "last_layer_1", "conv2"],
     "encdec_model.last_layer_1.3"),
    ("encz", ["trunk", "bn2"], "encz_model.bn2"),
    ("encz", ["z_layer_3"], "encz_model.last_layer.3.0"),
    ("encz", ["z_fc1"], "encz_model.last_layer.1"),
    ("d_seq", ["trunk", "conv2"], "D_model_sequence.conv2"),
    ("d_seq", ["last_layer", "conv1"], "D_model_sequence.last_layer.0"),
    ("d_frame", ["last_layer", "bn"], "D_model_frame.last_layer.1"),
])
def test_torch_module_names(net, parts, expected):
    assert ti._net_torch_module(net, parts) == expected


def _fake_torch_sd_for(params, batch_stats):
    """Build a synthetic reference state dict covering our tree (inverse of
    the import mapping), with distinct values per tensor."""
    sd = {}
    counter = [0]

    def fill(tree, net, collection):
        for path, val in ti._walk(tree):
            parts, leaf = list(path[:-1]), path[-1]
            tmod = ti._net_torch_module(net, parts)
            counter[0] += 1
            rng = np.random.RandomState(counter[0])
            shape = np.asarray(val).shape
            if collection == "batch_stats":
                field = {"mean": "running_mean", "var": "running_var"}[leaf]
                sd[f"{tmod}.{field}"] = rng.randn(*shape).astype(np.float32)
            elif leaf == "kernel":
                if np.asarray(val).ndim == 2:
                    sd[f"{tmod}.weight"] = rng.randn(
                        shape[1], shape[0]).astype(np.float32)
                else:
                    kh, kw, cin, cout = shape
                    sd[f"{tmod}.weight"] = rng.randn(
                        cout, cin, kh, kw).astype(np.float32)
            elif leaf == "bias":
                sd[f"{tmod}.bias"] = rng.randn(*shape).astype(np.float32)
            elif leaf == "scale":
                sd[f"{tmod}.weight"] = rng.randn(*shape).astype(np.float32)

    for net in params:
        fill(params[net], net, "params")
        if batch_stats.get(net):
            fill(batch_stats[net], net, "batch_stats")
    return sd


def test_roundtrip_import_tiny_model():
    """Every leaf of a tiny VAE^2 system maps to a torch key and imports the
    right values back (validates mapping coverage + transposes)."""
    import jax.numpy as jnp
    from tests.test_hrnet import _tiny_config
    from vae2_tpu.core.builder import build_system

    cfg = _tiny_config()
    system = build_system(cfg)
    batch = {k: jnp.zeros((1, 16, 32, 9), jnp.float32)
             for k in ("xt", "x2t", "x3t")}
    state = system.init(jax.random.PRNGKey(0), batch)

    sd = _fake_torch_sd_for(state.params, state.batch_stats)
    new_params, new_stats, missing = ti.import_params(
        dict(state.params), dict(state.batch_stats), sd, strict=True)
    assert not missing

    # check a conv kernel transposed correctly
    w_ours = np.asarray(new_params["encdec"]["encoder"]["trunk"]["conv1"]["kernel"])
    w_torch = sd["encdec_model.conv1.weight"]
    np.testing.assert_allclose(
        w_ours, np.transpose(w_torch, (2, 3, 1, 0)))
    # a BN running stat
    v_ours = np.asarray(new_stats["d_seq"]["trunk"]["bn1"]["var"])
    np.testing.assert_allclose(v_ours, sd["D_model_sequence.bn1.running_var"])
    # original params untouched in value for... (different from new)
    assert not np.allclose(
        np.asarray(state.params["encdec"]["encoder"]["trunk"]["conv1"]["kernel"]),
        w_ours)
