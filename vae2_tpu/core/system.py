"""The VAE^2 training system: functional state + jitted adversarial steps.

This replaces the reference's ``FullModel_encdec`` / ``FullModel_D`` composite
modules and the imperative G-step/D-step loop
(reference lib/utils/utils.py:39-155, 244-276; lib/core/function.py:443-516)
with a single pure ``train_step(state, batch, rng) -> (state, metrics)``
compiled once by XLA:

- G-step: posterior -> reparameterized z -> encoder+dual-decoder forward ->
  L1/KL/LSGAN generator loss -> SGD/Adam update of {encdec, encz} params.
- D-step: LSGAN real/fake loss on the sequence and per-frame discriminators
  (fake = x2_prediction under ``stop_gradient``, the ``.detach()`` at
  reference function.py:504) -> update of {d_seq, d_frame} params.

TPU-first design choices:
- Per-frame discriminator passes are folded into the batch axis (one forward
  over (F*B, H, W, 3) instead of F sequential forwards) — same loss up to BN
  batch-statistics pooling across frames, F x fewer kernel launches.
- All randomness is explicit ``jax.random`` keys threaded through the step.
- Batch-stat updates thread functionally; with the batch sharded over the
  mesh 'data' axis the BN reductions are global (SyncBN for free).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from . import losses

Array = jax.Array
PyTree = Any

BASELINE_MODES = ("VAE_NATIVE", "VAE_ANNEAL", "VAE_GAN", "DETERMINISTIC")
SAMPLING_MODES = ("default", "prior_sampling", "momentum_sampling")


@dataclasses.dataclass(frozen=True)
class Hyper:
    """Static loss/model hyper-parameters (from TRAIN.* / MODEL.EXTRA.*)."""

    x1recon_lambda: float = 1.0
    x2recon_lambda: float = 0.1
    x3recon_lambda: float = 1.0
    gan_lambda: float = 1.0
    is_baseline: bool = False
    baseline_mode: str = "VAE_NATIVE"
    hd_z: bool = True
    z_dim: int = 32
    clip_length: int = 3
    # 'toy' multiplies the x2-recon lambda by the sin-anneal multiplier
    # (reference utils.py:193); 'image' applies it to the KL lambda only in
    # VAE_ANNEAL mode (utils.py:74).
    family: str = "image"

    def __post_init__(self):
        assert self.baseline_mode in BASELINE_MODES, self.baseline_mode

    @property
    def deterministic(self) -> bool:
        return self.baseline_mode == "DETERMINISTIC"


class VAE2State(struct.PyTreeNode):
    """Full functional training state: one pytree, donated into the step."""

    step: Array
    params: PyTree  # {'encdec', 'encz', 'd_seq', 'd_frame'} (keys may be absent)
    batch_stats: PyTree
    opt_state_g: PyTree
    opt_state_d: PyTree


def scale_by_adam_lowp(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                       moment_dtype=jnp.bfloat16) -> optax.GradientTransformation:
    """Adam whose moment buffers are STORED in ``moment_dtype`` (all update
    math runs in f32). Halves optimizer-state HBM vs optax.adam — the 2x-f32
    moments are what pushed the combined G+D flagship program over HBM (r1);
    optax only supports a low-precision first moment (``mu_dtype``)."""

    def init(params):
        z = lambda p: jnp.zeros(p.shape, moment_dtype)
        return optax.ScaleByAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(z, params),
            nu=jax.tree_util.tree_map(z, params))

    def update(grads, state, params=None):
        del params
        f32 = jnp.float32
        mu = jax.tree_util.tree_map(
            lambda g, m: b1 * m.astype(f32) + (1 - b1) * g.astype(f32),
            grads, state.mu)
        nu = jax.tree_util.tree_map(
            lambda g, n: b2 * n.astype(f32) + (1 - b2) * jnp.square(
                g.astype(f32)),
            grads, state.nu)
        count = state.count + 1
        bc1 = 1 - b1 ** count.astype(f32)
        bc2 = 1 - b2 ** count.astype(f32)
        updates = jax.tree_util.tree_map(
            lambda m, n: (m / bc1) / (jnp.sqrt(n / bc2) + eps), mu, nu)
        store = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(moment_dtype), t)
        return updates, optax.ScaleByAdamState(
            count=count, mu=store(mu), nu=store(nu))

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg_train, moment_dtype: str = "float32",
                   max_iters: int = 0) -> optax.GradientTransformation:
    """Build the optimizer matching reference tools/train.py:232-263.

    torch SGD applies weight decay as an L2 gradient term *before* the
    momentum buffer — ``add_decayed_weights`` then ``sgd`` reproduces it.
    ``moment_dtype`` (TPU.ADAM_MOMENT_DTYPE) selects Adam moment storage.

    ``TRAIN.LR_SCHEDULE='poly'`` applies the reference family's per-iter
    poly decay lr*(1-i/max_iters)^LR_POWER (reference utils.py:459-463).
    The reference keeps that call commented out in adversarial training
    (function.py:525-528), so the default here is constant LR; the knob is
    a measured stabilizer for the long synthetic-data GAN runs.
    """
    name = cfg_train.OPTIMIZER.lower()
    schedule_name = str(cfg_train.get("LR_SCHEDULE", "")).lower()
    if schedule_name in ("", "constant", "none"):
        lr = cfg_train.LR
    elif schedule_name == "poly":
        if max_iters <= 0:
            raise ValueError(
                "TRAIN.LR_SCHEDULE='poly' needs max_iters > 0 "
                "(END_EPOCH * steps-per-epoch) from the caller")
        power = float(cfg_train.get("LR_POWER", 0.9))
        base = float(cfg_train.LR)

        def lr(count):  # noqa: ANN001 — optax schedule signature
            frac = jnp.minimum(count.astype(jnp.float32) / max_iters, 1.0)
            return base * (1.0 - frac) ** power
    else:
        raise ValueError(f"bad TRAIN.LR_SCHEDULE {schedule_name!r}")
    if name == "sgd":
        return optax.chain(
            optax.add_decayed_weights(cfg_train.WD),
            optax.sgd(
                learning_rate=lr,
                momentum=cfg_train.MOMENTUM,
                nesterov=cfg_train.NESTEROV,
            ),
        )
    if name == "adam":
        if moment_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"bad ADAM_MOMENT_DTYPE {moment_dtype!r}")
        if moment_dtype == "bfloat16":
            if callable(lr):
                scale = optax.scale_by_schedule(lambda c: -lr(c))
            else:
                scale = optax.scale(-lr)
            return optax.chain(
                scale_by_adam_lowp(moment_dtype=jnp.bfloat16), scale)
        return optax.adam(learning_rate=lr)
    raise ValueError("Only Support SGD and ADAM optimizer")


def reparameterize(mus, logvars, rng: Array):
    """z = mu + exp(logvar/2) * eps (reference utils.py:92-100)."""
    if isinstance(mus, (list, tuple)):
        keys = jax.random.split(rng, len(mus))
        return [
            m + jnp.exp(0.5 * v) * jax.random.normal(k, m.shape, m.dtype)
            for m, v, k in zip(mus, logvars, keys)
        ]
    return mus + jnp.exp(0.5 * logvars) * jax.random.normal(rng, mus.shape, mus.dtype)


def prior_sample_like(mus, rng: Array):
    """z ~ N(0, I) with the posterior's structure (utils.py:89, 97-98)."""
    if isinstance(mus, (list, tuple)):
        keys = jax.random.split(rng, len(mus))
        return [jax.random.normal(k, m.shape, m.dtype) for m, k in zip(mus, keys)]
    return jax.random.normal(rng, mus.shape, mus.dtype)


def split_muvar(muvars, z_dim: int):
    """Split posterior output into (mus, logvars) along the channel axis."""
    if isinstance(muvars, (list, tuple)):
        return (
            [m[..., :z_dim] for m in muvars],
            [m[..., z_dim:] for m in muvars],
        )
    return muvars[..., :z_dim], muvars[..., z_dim:]


def fold_frames(x: Array, frame_channels: int = 3) -> Array:
    """(B, H, W, F*c) -> (F*B, H, W, c): frames folded into the batch axis."""
    b = x.shape[0]
    f = x.shape[-1] // frame_channels
    x = x.reshape(x.shape[:-1] + (f, frame_channels))
    x = jnp.moveaxis(x, -2, 0)  # (F, B, H, W, c)
    return x.reshape((f * b,) + x.shape[2:])


class VAE2System:
    """Bundles the four networks plus loss hypers into jitted step functions.

    ``modules`` is a dict with keys 'encdec', 'encz' (optional), 'd_seq',
    and optionally 'd_frame' (absent in the toy family where a single
    discriminator plays both roles — reference tools/toy_example.py:84).
    Each module follows the uniform interface described in models/.
    """

    def __init__(self, modules: Dict[str, Any], hyper: Hyper,
                 optimizer_g: optax.GradientTransformation,
                 optimizer_d: optax.GradientTransformation):
        self.modules = modules
        self.hyper = hyper
        self.optimizer_g = optimizer_g
        self.optimizer_d = optimizer_d
        self._has_frame_d = "d_frame" in modules
        self._has_encz = "encz" in modules and modules["encz"] is not None

    # -- initialization ------------------------------------------------------

    def init(self, rng: Array, batch: Dict[str, Array]) -> VAE2State:
        """Initialize all parameters/stats from an example batch."""
        h = self.hyper
        rngs = jax.random.split(rng, 8)
        params: Dict[str, Any] = {}
        batch_stats: Dict[str, Any] = {}

        xt, x2t, x3t = batch["xt"], batch["x2t"], batch["x3t"]
        enc_in = self._encoder_input(xt, x2t)

        if self._has_encz:
            q_in = self._posterior_input(xt, x2t, x3t)
            v = self.modules["encz"].init({"params": rngs[0]}, q_in, train=True)
            params["encz"] = v["params"]
            batch_stats["encz"] = v.get("batch_stats", {})
            muvars = self.modules["encz"].apply(
                {"params": params["encz"], "batch_stats": batch_stats["encz"]},
                q_in, train=False)
            mus, _ = split_muvar(muvars, h.z_dim)
            z = prior_sample_like(mus, rngs[1])
        else:
            z = None

        v = self.modules["encdec"].init(
            {"params": rngs[2], "sample": rngs[3]}, enc_in, z, train=True)
        params["encdec"] = v["params"]
        batch_stats["encdec"] = v.get("batch_stats", {})

        v = self.modules["d_seq"].init({"params": rngs[4]}, x2t, train=True)
        params["d_seq"] = v["params"]
        batch_stats["d_seq"] = v.get("batch_stats", {})

        if self._has_frame_d:
            frame = x2t[..., : x2t.shape[-1] // h.clip_length]
            v = self.modules["d_frame"].init({"params": rngs[5]}, frame, train=True)
            params["d_frame"] = v["params"]
            batch_stats["d_frame"] = v.get("batch_stats", {})

        opt_g = self.optimizer_g.init(self._g_params(params))
        opt_d = self.optimizer_d.init(self._d_params(params))
        return VAE2State(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state_g=opt_g,
            opt_state_d=opt_d,
        )

    # -- parameter partitions ------------------------------------------------

    @staticmethod
    def _g_params(params):
        return {k: v for k, v in params.items() if k in ("encdec", "encz")}

    @staticmethod
    def _d_params(params):
        return {k: v for k, v in params.items() if k in ("d_seq", "d_frame")}

    # -- input assembly (reference utils.py:77, 105, 190-191) ----------------

    def _encoder_input(self, xt, x2t):
        if self.hyper.is_baseline:
            return jnp.concatenate([xt, x2t], axis=-1)
        return xt

    def _posterior_input(self, xt, x2t, x3t):
        if self.hyper.is_baseline:
            if self.hyper.family == "toy":
                # toy baseline concatenates x2t into xt first (utils.py:190-191)
                return jnp.concatenate([xt, x2t, x3t], axis=-1)
            return jnp.concatenate([xt, x2t, x3t], axis=-1)
        return jnp.concatenate([xt, x3t], axis=-1)

    # -- forward passes ------------------------------------------------------

    def _apply(self, name, params, batch_stats, *args, train, rngs=None,
               update_stats=True):
        variables = {"params": params[name]}
        stats = batch_stats.get(name, {})
        has_stats = bool(stats)
        if has_stats:
            variables["batch_stats"] = stats
        if train and has_stats and update_stats:
            out, updated = self.modules[name].apply(
                variables, *args, train=train, rngs=rngs, mutable=["batch_stats"])
            new_stats = dict(batch_stats)
            new_stats[name] = updated["batch_stats"]
            return out, new_stats
        out = self.modules[name].apply(variables, *args, train=train, rngs=rngs)
        return out, batch_stats

    def posterior(self, params, batch_stats, xt, x2t, x3t, train):
        q_in = self._posterior_input(xt, x2t, x3t)
        muvars, batch_stats = self._apply(
            "encz", params, batch_stats, q_in, train=train)
        mus, logvars = split_muvar(muvars, self.hyper.z_dim)
        return mus, logvars, batch_stats

    def encdec_forward(self, params, batch_stats, xt, x2t, z, rng, train):
        enc_in = self._encoder_input(xt, x2t)
        (x1p, x2p, x3p), batch_stats = self._apply(
            "encdec", params, batch_stats, enc_in, z,
            train=train, rngs={"sample": rng})
        if self.hyper.is_baseline:
            # Baseline decoders run without gradient (enc_hrnet.py:969-974).
            x1p = jax.lax.stop_gradient(x1p)
            x3p = jax.lax.stop_gradient(x3p)
        return x1p, x2p, x3p, batch_stats

    def _frame_gan(self, params, batch_stats, x, real, train):
        """Sum over frames of 0.5*lsgan(D_frame(frame)) with frames folded
        into the batch (see module docstring)."""
        num_frames = x.shape[-1] // 3
        folded = fold_frames(x, 3)
        d_out, batch_stats = self._apply(
            "d_frame", params, batch_stats, folded, train=train)
        # sum_f [0.5 * mse_sum(frame_f)/B] == 0.5 * F * mse_sum(all)/(F*B)
        loss = 0.5 * num_frames * losses.lsgan_loss(d_out, real)
        return loss, batch_stats

    # -- losses --------------------------------------------------------------

    def generator_loss(self, g_params, d_params, batch_stats, batch, rng,
                       multiplier, sampling_mode="default", train=True):
        """Reference FullModel_encdec.forward (utils.py:67-155) as a pure fn.

        Returns (total_loss, (metrics, predictions, new_batch_stats)).
        """
        h = self.hyper
        params = {**g_params, **d_params}
        xt, x2t, x3t = batch["xt"], batch["x2t"], batch["x3t"]
        rng_eps, rng_code = jax.random.split(rng)

        if h.family == "toy":
            x2recon_lambda = h.x2recon_lambda * multiplier
            kl_lambda = h.x3recon_lambda
        else:
            x2recon_lambda = h.x2recon_lambda
            kl_lambda = (h.x3recon_lambda * multiplier
                         if h.baseline_mode == "VAE_ANNEAL" else h.x3recon_lambda)

        if not h.deterministic:
            if sampling_mode == "momentum_sampling":
                # posterior conditioned on the PREVIOUS window's clips
                # (reference utils.py:195; requires a 5-clip batch)
                q_in = jnp.concatenate(
                    [batch["xt_last"], batch["x3t_last"]], axis=-1)
                muvars, batch_stats = self._apply(
                    "encz", params, batch_stats, q_in, train=train)
                mus, logvars = split_muvar(muvars, h.z_dim)
            else:
                mus, logvars, batch_stats = self.posterior(
                    params, batch_stats, xt, x2t, x3t, train)
            if sampling_mode == "prior_sampling":
                z = prior_sample_like(mus, rng_eps)
            else:
                z = reparameterize(mus, logvars, rng_eps)
        else:
            mus = logvars = z = None

        x1p, x2p, x3p, batch_stats = self.encdec_forward(
            params, batch_stats, xt, x2t, z, rng_code, train)

        zero = jnp.float32(0.0)
        if not h.is_baseline:
            x1_recon = losses.l1_loss(x1p, xt)
            x2_recon = losses.l1_loss(x2p, x2t)
            x3_recon = losses.l1_loss(x3p, x3t)
            z_kl = losses.kl_loss(mus, logvars)
            d_out, batch_stats = self._apply(
                "d_seq", params, batch_stats, x2p, train=train)
            gan_seq = 0.5 * losses.lsgan_loss(d_out, real=True)
            if self._has_frame_d:
                gan_frame, batch_stats = self._frame_gan(
                    params, batch_stats, x2p, True, train)
            else:
                # toy: single discriminator, no 0.5 factor (utils.py:232)
                gan_seq = 2.0 * gan_seq
                gan_frame = zero
        else:
            x1_recon = zero
            x2_recon = losses.l1_loss(x2p, x3t)  # baseline predicts the future
            x3_recon = zero
            if h.baseline_mode in ("VAE_NATIVE", "VAE_ANNEAL"):
                gan_seq = gan_frame = zero
                z_kl = losses.kl_loss(mus, logvars)
            elif h.baseline_mode == "DETERMINISTIC":
                gan_seq = gan_frame = z_kl = zero
            else:  # VAE_GAN
                d_out, batch_stats = self._apply(
                    "d_seq", params, batch_stats, x2p, train=train)
                gan_seq = 0.5 * losses.lsgan_loss(d_out, real=True)
                if self._has_frame_d:
                    gan_frame, batch_stats = self._frame_gan(
                        params, batch_stats, x2p, True, train)
                else:
                    gan_seq = 2.0 * gan_seq
                    gan_frame = zero
                z_kl = losses.kl_loss(mus, logvars)

        total = (h.x1recon_lambda * x1_recon + x2recon_lambda * x2_recon
                 + h.x3recon_lambda * x3_recon + kl_lambda * z_kl
                 + h.gan_lambda * (gan_seq + gan_frame))
        metrics = {
            "loss_encdec": total,
            "loss_xt_recon": x1_recon,
            "loss_x2t_recon": x2_recon,
            "loss_x3t_recon": x3_recon,
            "loss_z_KL": z_kl,
            "loss_x2t_gan_sequence": gan_seq,
            "loss_x2t_gan_frame": gan_frame,
        }
        return total, (metrics, (x1p, x2p, x3p), batch_stats)

    def discriminator_loss(self, d_params, other_params, batch_stats,
                           x2t_real, x2p, train=True):
        """Reference FullModel_D.forward (utils.py:259-276).

        Note the reference builds FullModel_D with its default
        ``gan_lambda=1.0`` (tools/train.py:211) — the D loss is NOT scaled by
        TRAIN.GAN_LAMBDA; we reproduce that.
        """
        params = {**other_params, **d_params}
        x2p = jax.lax.stop_gradient(x2p)
        x2t_real = jax.lax.stop_gradient(x2t_real)

        d_real, batch_stats = self._apply(
            "d_seq", params, batch_stats, x2t_real, train=train)
        real_seq = 0.5 * losses.lsgan_loss(d_real, real=True)
        d_fake, batch_stats = self._apply(
            "d_seq", params, batch_stats, x2p, train=train)
        fake_seq = 0.5 * losses.lsgan_loss(d_fake, real=False)
        loss_seq = real_seq + fake_seq

        if self._has_frame_d:
            real_f, batch_stats = self._frame_gan(
                params, batch_stats, x2t_real, True, train)
            fake_f, batch_stats = self._frame_gan(
                params, batch_stats, x2p, False, train)
            loss_frame = real_f + fake_f
        else:
            loss_frame = loss_seq  # toy reports D loss twice (utils.py:299)

        total = loss_seq + (loss_frame if self._has_frame_d else 0.0)
        metrics = {
            "loss_D": total,
            "loss_D_sequence": loss_seq,
            "loss_D_frame": loss_frame,
        }
        return total, (metrics, batch_stats)

    # -- jitted steps --------------------------------------------------------

    def make_train_step(self, donate: bool = True,
                        preprocess: Optional[Callable] = None,
                        split: bool = False) -> Callable:
        """Build the jitted adversarial step: G update then (optional) D update
        (reference function.py:482-516).

        ``preprocess`` runs *inside* the jit on the raw batch — e.g.
        ``normalize_clips`` so uint8 frames normalize on-device, fused with
        the first convolution's input pipeline.

        ``split``: compile the G and D updates as two programs — lower peak
        HBM (each program's temporaries die at its boundary) at the cost of a
        second dispatch; for recipes that brush against HBM capacity.
        """
        if split:
            return self._make_split_train_step(donate, preprocess)
        h = self.hyper
        run_d_step = (not h.is_baseline) or h.baseline_mode == "VAE_GAN"

        def step(state: VAE2State, batch: Dict[str, Array], rng: Array,
                 multiplier: Array):
            if preprocess is not None:
                batch = {k: preprocess(v) for k, v in batch.items()}
            rng_g, rng_d = jax.random.split(rng)
            g_params = self._g_params(state.params)
            d_params = self._d_params(state.params)

            grad_fn = jax.value_and_grad(self.generator_loss, has_aux=True)
            (_, (g_metrics, preds, batch_stats)), g_grads = grad_fn(
                g_params, d_params, state.batch_stats, batch, rng_g, multiplier)

            g_updates, opt_state_g = self.optimizer_g.update(
                g_grads, state.opt_state_g, g_params)
            g_params = optax.apply_updates(g_params, g_updates)
            params = {**state.params, **g_params}

            if run_d_step:
                x2_real = batch["x3t"] if h.is_baseline else batch["x2t"]
                dgrad_fn = jax.value_and_grad(self.discriminator_loss, has_aux=True)
                (_, (d_metrics, batch_stats)), d_grads = dgrad_fn(
                    d_params, self._g_params(params), batch_stats,
                    x2_real, preds[1])
                del rng_d
                d_updates, opt_state_d = self.optimizer_d.update(
                    d_grads, state.opt_state_d, d_params)
                d_params = optax.apply_updates(d_params, d_updates)
                params = {**params, **d_params}
            else:
                opt_state_d = state.opt_state_d
                zero = jnp.float32(0.0)
                d_metrics = {"loss_D": zero, "loss_D_sequence": zero,
                             "loss_D_frame": zero}

            new_state = state.replace(
                step=state.step + 1,
                params=params,
                batch_stats=batch_stats,
                opt_state_g=opt_state_g,
                opt_state_d=opt_state_d,
            )
            # preds ride along for end-of-epoch visualization dumps
            # (reference function.py:568-604); they stay on device unless
            # fetched by the caller.
            return new_state, {**g_metrics, **d_metrics}, preds

        donate_argnums = (0,) if donate else ()
        return jax.jit(step, donate_argnums=donate_argnums)

    def _make_split_train_step(self, donate: bool,
                               preprocess: Optional[Callable]) -> Callable:
        """Two-program variant of the adversarial step (see make_train_step)."""
        h = self.hyper
        run_d_step = (not h.is_baseline) or h.baseline_mode == "VAE_GAN"

        def g_step(state: VAE2State, batch, rng, multiplier):
            if preprocess is not None:
                batch = {k: preprocess(v) for k, v in batch.items()}
            g_params = self._g_params(state.params)
            d_params = self._d_params(state.params)
            grad_fn = jax.value_and_grad(self.generator_loss, has_aux=True)
            (_, (g_metrics, preds, batch_stats)), g_grads = grad_fn(
                g_params, d_params, state.batch_stats, batch, rng, multiplier)
            g_updates, opt_state_g = self.optimizer_g.update(
                g_grads, state.opt_state_g, g_params)
            g_params = optax.apply_updates(g_params, g_updates)
            state = state.replace(
                step=state.step + 1,
                params={**state.params, **g_params},
                batch_stats=batch_stats,
                opt_state_g=opt_state_g,
            )
            return state, g_metrics, preds

        def d_step(state: VAE2State, x2_real, x2p):
            if preprocess is not None:
                x2_real = preprocess(x2_real)
            d_params = self._d_params(state.params)
            dgrad_fn = jax.value_and_grad(self.discriminator_loss, has_aux=True)
            (_, (d_metrics, batch_stats)), d_grads = dgrad_fn(
                d_params, self._g_params(state.params), state.batch_stats,
                x2_real, x2p)
            d_updates, opt_state_d = self.optimizer_d.update(
                d_grads, state.opt_state_d, d_params)
            d_params = optax.apply_updates(d_params, d_updates)
            state = state.replace(
                params={**state.params, **d_params},
                batch_stats=batch_stats,
                opt_state_d=opt_state_d,
            )
            return state, d_metrics

        g_jit = jax.jit(g_step, donate_argnums=(0,) if donate else ())
        d_jit = jax.jit(d_step, donate_argnums=(0,) if donate else ())

        def step(state, batch, rng, multiplier):
            # (attributes g_jit/d_jit/run_d_step are attached below for
            # tooling — e.g. bench_train.py FLOPs counting via
            # compiled.cost_analysis)
            state, g_metrics, preds = g_jit(state, batch, rng, multiplier)
            if run_d_step:
                x2_real = batch["x3t"] if h.is_baseline else batch["x2t"]
                state, d_metrics = d_jit(state, x2_real, preds[1])
            else:
                zero = jnp.float32(0.0)
                d_metrics = {"loss_D": zero, "loss_D_sequence": zero,
                             "loss_D_frame": zero}
            return state, {**g_metrics, **d_metrics}, preds

        step.g_jit = g_jit
        step.d_jit = d_jit
        step.run_d_step = run_d_step
        return step

    def make_eval_step(self, sampling_mode: str = "prior_sampling",
                       preprocess: Optional[Callable] = None) -> Callable:
        """Jitted inference forward: one stochastic rollout (reference
        function.py:45-53, eval mode — running BN stats, no grads)."""

        def step(state: VAE2State, batch: Dict[str, Array], rng: Array):
            if preprocess is not None:
                batch = {k: preprocess(v) for k, v in batch.items()}
            _, (metrics, preds, _) = self.generator_loss(
                self._g_params(state.params), self._d_params(state.params),
                state.batch_stats, batch, rng,
                multiplier=jnp.float32(1.0),
                sampling_mode=sampling_mode, train=False)
            return preds, metrics

        return jax.jit(step)
