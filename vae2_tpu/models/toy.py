"""Toy 1-D sequence-VAE models (CPU-feasible smoke path).

Functional JAX/flax re-design of the reference toy MLPs
(reference lib/models/toy_fc.py): a synthetic sigmoid-family sequence task
exercising the full VAE^2 machinery — posterior encoder, reparameterized z,
encoder + dual decoders with random-code injection, and an LSGAN
discriminator — with no image data and no BatchNorm.

Shapes: inputs are (B, 10) function-value vectors; hidden dim 128; z dim 8
(toy_fc.py:16-18). The encoder consumes [x, z, r] where r is a fresh random
code drawn per forward (toy_fc.py:53-56, 108-117); each decoder consumes
[x2_pred, z].
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

HID_DIM = 128
Z_DIM = 8
INPUT_DIM = 10

_kernel_init = nn.initializers.normal(stddev=0.001)


class _MLP(nn.Module):
    """Two ReLU hidden layers + linear output (toy_fc.py:32-42)."""

    out_dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.relu(nn.Dense(HID_DIM, kernel_init=_kernel_init, name="h1")(x))
        x = nn.relu(nn.Dense(HID_DIM, kernel_init=_kernel_init, name="h2")(x))
        return nn.Dense(self.out_dim, kernel_init=_kernel_init, name="out")(x)


class ToyPosterior(nn.Module):
    """q(z | x_past, x_future) -> (B, 2*Z_DIM) [mu ; logvar].

    Input is the channel-concat of the conditioning clip(s) and the future
    clip (toy_fc_EDz, toy_fc.py:64-72).
    """

    is_baseline: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        del train  # no normalization state in the toy family
        return _MLP(out_dim=2 * Z_DIM, name="mlp")(x)

    @property
    def z_dim(self) -> int:
        return Z_DIM

    @property
    def hd_z(self) -> bool:
        return False


class ToyEncDec(nn.Module):
    """Encoder + dual decoders (toy_fc_ED, toy_fc.py:75-144).

    ``__call__(x, z)`` returns (x1_pred, x2_pred, x3_pred): the encoder
    predicts the middle clip from the past clip (plus z and a fresh random
    code r); both decoders then reconstruct past/future from the *prediction*,
    so gradients from both reconstructions flow through x2_pred.
    """

    is_baseline: bool = False
    baseline_mode: str = "VAE_NATIVE"

    def setup(self):
        self.deterministic = self.baseline_mode == "DETERMINISTIC"
        in_dim = INPUT_DIM * 2 if self.is_baseline else INPUT_DIM
        z_dim = 0 if self.deterministic else Z_DIM
        del in_dim, z_dim
        self.enc = _MLP(out_dim=INPUT_DIM, name="enc")
        self.decf = _MLP(out_dim=INPUT_DIM, name="decf")
        self.decp = _MLP(out_dim=INPUT_DIM * 2 if self.is_baseline else INPUT_DIM,
                         name="decp")

    def _random_code(self, batch: int) -> Array:
        rng = self.make_rng("sample")
        return jax.random.normal(rng, (batch, Z_DIM))

    def encode(self, x: Array, z: Optional[Array]) -> Array:
        if self.is_baseline:
            if self.deterministic:
                inp = x
            else:
                inp = jnp.concatenate([x, z], axis=-1)
        else:
            r = self._random_code(x.shape[0])
            inp = jnp.concatenate([x, z, r], axis=-1)
        return self.enc(inp)

    def decode_future(self, x2p: Array, z: Optional[Array]) -> Array:
        inp = x2p if self.deterministic else jnp.concatenate([x2p, z], axis=-1)
        return self.decf(inp)

    def decode_past(self, x2p: Array, z: Optional[Array]) -> Array:
        inp = x2p if self.deterministic else jnp.concatenate([x2p, z], axis=-1)
        return self.decp(inp)

    def __call__(self, x: Array, z: Optional[Array] = None, train: bool = True):
        del train
        x2p = self.encode(x, z)
        x1p = self.decode_past(x2p, z)
        x3p = self.decode_future(x2p, z)
        return x1p, x2p, x3p

    @property
    def z_dim(self) -> int:
        return Z_DIM

    @property
    def hd_z(self) -> bool:
        return False


class ToyDiscriminator(nn.Module):
    """LSGAN scalar discriminator over a predicted clip (toy_fc.py:147-155)."""

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        del train
        return _MLP(out_dim=1, name="mlp")(x)


# -- factories (mirror reference lib/models/toy_fc.py:158-176) ---------------


def get_encdec_model(config) -> ToyEncDec:
    extra = config.MODEL.EXTRA
    return ToyEncDec(is_baseline=extra.IS_BASELINE, baseline_mode=extra.BASELINE_MODE)


def get_encz_model(config) -> ToyPosterior:
    return ToyPosterior(is_baseline=config.MODEL.EXTRA.IS_BASELINE)


def get_D_model(config) -> ToyDiscriminator:
    del config
    return ToyDiscriminator()
