"""Pretrained-HRNet trunk import: conv1 replication + decoder cloning
(reference enc_hrnet.py:753-785)."""

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_hrnet import _tiny_config
from vae2_tpu.core.builder import build_system
from vae2_tpu.utils import torch_import as ti
import pytest

pytestmark = pytest.mark.slow  # heavyweight jit compiles; excluded from the cold-container smoke tier


def _plain_hrnet_sd_from(state):
    """Synthesize a plain (no composite prefix, 3-channel conv1) HRNet state
    dict covering one trunk's weights, derived from our encoder tree names."""
    sd = {}
    counter = [0]
    enc = state.params["encdec"]["encoder"]
    for path, val in ti._walk(enc):
        parts, leaf = list(path[:-1]), path[-1]
        if parts[0] != "trunk":
            continue  # heads aren't in pretrained checkpoints
        tmod = ti._net_torch_module("encdec", ["encoder"] + parts)
        key = tmod[len("encdec_model."):]
        counter[0] += 1
        rng = np.random.RandomState(counter[0])
        shape = np.asarray(val).shape
        if leaf == "kernel":
            kh, kw, cin, cout = shape
            if key == "conv1":
                cin = 3  # pretrained stem is RGB
            sd[f"{key}.weight"] = rng.randn(cout, cin, kh, kw).astype(
                np.float32)
        elif leaf == "scale":
            sd[f"{key}.weight"] = rng.randn(*shape).astype(np.float32)
        elif leaf == "bias":
            sd[f"{key}.bias"] = rng.randn(*shape).astype(np.float32)
    for path, val in ti._walk(state.batch_stats["encdec"]["encoder"]):
        parts, leaf = list(path[:-1]), path[-1]
        tmod = ti._net_torch_module("encdec", ["encoder"] + parts)
        key = tmod[len("encdec_model."):]
        field = {"mean": "running_mean", "var": "running_var"}[leaf]
        sd[f"{key}.{field}"] = np.random.RandomState(
            hash(key) % 1000).randn(*np.asarray(val).shape).astype(np.float32)
    return sd


def test_pretrained_trunk_import(tmp_path):
    import torch

    cfg = _tiny_config()
    system = build_system(cfg)
    batch = {k: jnp.zeros((1, 16, 32, 9), jnp.float32)
             for k in ("xt", "x2t", "x3t")}
    state = system.init(jax.random.PRNGKey(0), batch)

    sd = _plain_hrnet_sd_from(state)
    path = str(tmp_path / "hrnet_imagenet.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)

    new_state, missing = ti.import_pretrained_trunk(
        state, path, clip_length=3, is_baseline=False)

    w3 = np.transpose(sd["conv1.weight"], (2, 3, 1, 0))  # HWIO, cin=3

    # encoder conv1: replicated x3 (9 input channels)
    enc_k = np.asarray(
        new_state.params["encdec"]["encoder"]["trunk"]["conv1"]["kernel"])
    assert enc_k.shape[2] == 9
    for r in range(3):
        np.testing.assert_allclose(enc_k[:, :, r * 3:(r + 1) * 3, :], w3)

    # decoders cloned from the same weights
    for dec in ("dec_future", "dec_past"):
        dk = np.asarray(
            new_state.params["encdec"][dec]["trunk"]["conv1"]["kernel"])
        np.testing.assert_allclose(dk, enc_k)
        b2 = np.asarray(
            new_state.params["encdec"][dec]["trunk"]["bn1"]["scale"])
        np.testing.assert_allclose(b2, sd["bn1.weight"])

    # posterior conv1: replicated x6 (2 clips)
    qz_k = np.asarray(new_state.params["encz"]["trunk"]["conv1"]["kernel"])
    assert qz_k.shape[2] == 18
    np.testing.assert_allclose(qz_k[:, :, :3, :], w3)

    # frame discriminator: no replication (3 channels)
    df_k = np.asarray(new_state.params["d_frame"]["trunk"]["conv1"]["kernel"])
    assert df_k.shape[2] == 3
    np.testing.assert_allclose(df_k, w3)

    # heads stayed at fresh init (reported missing, values unchanged)
    h_old = np.asarray(
        state.params["encdec"]["encoder"]["last_layer_1"]["conv1"]["kernel"])
    h_new = np.asarray(
        new_state.params["encdec"]["encoder"]["last_layer_1"]["conv1"]["kernel"])
    np.testing.assert_array_equal(h_old, h_new)
    assert missing  # head/z leaves are expected to be unmatched
