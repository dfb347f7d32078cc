"""Per-loss-term gradient attribution for the VAE^2 generator.

Diagnoses WHY the x2 (middle-clip) prediction trains slowly at flagship
resolution: every generator loss term pulls on the prediction ``x2p``
(the direct L1, both decoder reconstructions — which consume x2p as input,
models/vae2.py VAE2EncDec — and the two LSGAN terms), so the per-pixel
gradient each term lands on x2p tells which one actually steers it.
The reference tunes the relative lambdas (TRAIN.*_LAMBDA,
reference lib/config/default.py:69-76) at 128x256 on real Cityscapes with
pretrained stems; this tool measures whether those weights still balance
in a given recipe.

Reports, for each lambda-weighted term:
- grad w.r.t. x2p: mean |g| per pixel and global norm (direct steering),
- grad w.r.t. generator params, split encdec/encz (total training signal),
- the raw loss value.

    python tools/grad_diagnosis.py --cfg experiments/... \
        [--checkpoint path.msgpack] [--out diag.json] [KEY VALUE ...]
"""

import argparse
import json
import pprint

import jax
import jax.numpy as jnp
import numpy as np

import _init_paths  # noqa: F401
from vae2_tpu.config import config, update_config
from vae2_tpu.core import losses
from vae2_tpu.core.builder import build_system
from vae2_tpu.core.system import (fold_frames, reparameterize, split_muvar)
from vae2_tpu.data.loader import normalize_clips


def parse_args():
    ap = argparse.ArgumentParser(description="VAE^2 gradient attribution")
    ap.add_argument("--cfg", required=True, type=str)
    ap.add_argument("--checkpoint", default="", type=str,
                    help="diagnose a trained state instead of the init")
    ap.add_argument("--batch", default=4, type=int)
    ap.add_argument("--seed", default=0, type=int)
    ap.add_argument("--out", default="", help="also dump the table as JSON")
    ap.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = ap.parse_args()
    update_config(config, args)
    return args


def tree_norm(t):
    leaves = [jnp.sum(jnp.square(x.astype(jnp.float32)))
              for x in jax.tree.leaves(t)]
    return jnp.sqrt(sum(leaves)) if leaves else jnp.float32(0.0)


def main():
    args = parse_args()
    h, w = config.TRAIN.IMAGE_SIZE[1], config.TRAIN.IMAGE_SIZE[0]
    b = args.batch
    system = build_system(config)
    hyp = system.hyper
    assert not hyp.is_baseline and not hyp.deterministic, \
        "diagnosis targets the full adversarial VAE^2 graph"

    rng = jax.random.PRNGKey(args.seed)
    rng, init_rng, data_rng, eps_rng, code_rng = jax.random.split(rng, 5)

    # batch: real clips when the configured dataset exists, else random
    try:
        from vae2_tpu.data.loader import ClipLoader
        from vae2_tpu.data.video import make_dataset
        ds = make_dataset(config, config.DATASET.TRAIN_SET, random_pos=True,
                          seed=args.seed)
        loader = ClipLoader(ds, batch_size=b, shuffle=True, num_threads=2,
                            seed=args.seed)
        batch_np, _ = next(iter(loader))
        source = config.DATASET.TRAIN_SET
    except Exception as e:  # noqa: BLE001
        print(f"# dataset unavailable ({e}); using random uint8 clips")
        batch_np = {
            k: np.asarray(jax.random.randint(
                jax.random.fold_in(data_rng, i), (b, h, w, 9), 0, 255),
                np.uint8)
            for i, k in enumerate(("xt", "x2t", "x3t"))
        }
        source = "random"
    batch = {k: normalize_clips(jnp.asarray(v[:b])) for k, v in batch_np.items()}

    init_small = {k: v[:1, : min(32, h), : min(64, w)] for k, v in batch.items()}
    state = system.init(init_rng, init_small)
    if args.checkpoint:
        from vae2_tpu.utils.checkpoint import load_checkpoint
        state, epoch = load_checkpoint(args.checkpoint, state,
                                       restore_opt=False)
        print(f"# diagnosing checkpoint {args.checkpoint} (epoch {epoch})")

    params, stats = state.params, state.batch_stats
    g_params = system._g_params(params)
    lam = {
        "x1_recon": hyp.x1recon_lambda,
        "x2_recon": hyp.x2recon_lambda,
        "x3_recon": hyp.x3recon_lambda,
        "z_kl": hyp.x3recon_lambda,  # KL lambda (non-ANNEAL image family)
        "gan_seq": hyp.gan_lambda,
        "gan_frame": hyp.gan_lambda,
    }

    def mod_apply(name, x, method=None, p=None):
        variables = {"params": (p or params)[name]}
        if stats.get(name):
            variables["batch_stats"] = stats[name]
        kw = dict(train=True, mutable=["batch_stats"])
        if method is not None:
            out, _ = system.modules[name].apply(variables, x, method=method, **kw)
        else:
            out, _ = system.modules[name].apply(variables, x, **kw)
        return out

    # -- part 1: per-term gradient on the prediction x2p ---------------------
    def forward_x2p(gp):
        q_in = system._posterior_input(batch["xt"], batch["x2t"], batch["x3t"])
        muvars = mod_apply("encz", q_in, p={**params, **gp})
        mus, logvars = split_muvar(muvars, hyp.z_dim)
        z = reparameterize(mus, logvars, eps_rng)
        variables = {"params": gp["encdec"]}
        if stats.get("encdec"):
            variables["batch_stats"] = stats["encdec"]
        x2p, _ = system.modules["encdec"].apply(
            variables, batch["xt"], z, train=True,
            method="encode", rngs={"sample": code_rng},
            mutable=["batch_stats"])
        return x2p, (mus, logvars, z)

    x2p0, (mus, logvars, z) = jax.jit(forward_x2p)(g_params)

    def decode_term(x2p, which):
        variables = {"params": params["encdec"]}
        if stats.get("encdec"):
            variables["batch_stats"] = stats["encdec"]
        (x1p, x3p), _ = system.modules["encdec"].apply(
            variables, x2p, z, train=True, method="decode",
            mutable=["batch_stats"])
        if which == "x1":
            return losses.l1_loss(x1p, batch["xt"])
        return losses.l1_loss(x3p, batch["x3t"])

    def term_on_x2p(name):
        if name == "x2_recon":
            return lambda x2p: losses.l1_loss(x2p, batch["x2t"])
        if name == "x1_recon":
            return lambda x2p: decode_term(x2p, "x1")
        if name == "x3_recon":
            return lambda x2p: decode_term(x2p, "x3")
        if name == "gan_seq":
            return lambda x2p: 0.5 * losses.lsgan_loss(
                mod_apply("d_seq", x2p), real=True)
        if name == "gan_frame":
            return lambda x2p: 0.5 * (x2p.shape[-1] // 3) * losses.lsgan_loss(
                mod_apply("d_frame", fold_frames(x2p, 3)), real=True)
        raise KeyError(name)

    x2p_rows = {}
    for name in ("x2_recon", "x1_recon", "x3_recon", "gan_seq", "gan_frame"):
        fn = term_on_x2p(name)
        val, g = jax.jit(jax.value_and_grad(
            lambda x2p, fn=fn: jnp.float32(lam[name]) * fn(x2p)))(x2p0)
        g = g.astype(jnp.float32)
        x2p_rows[name] = {
            "loss": float(val),
            "grad_x2p_mean_abs": float(jnp.mean(jnp.abs(g))),
            "grad_x2p_norm": float(jnp.linalg.norm(g.ravel())),
        }

    # -- part 2: per-term gradient norms on the generator params -------------
    def full_term(gp, name):
        _, (metrics, _, _) = system.generator_loss(
            gp, system._d_params(params), stats, batch,
            jax.random.fold_in(rng, 7), jnp.float32(1.0))
        return jnp.float32(lam[name]) * metrics[{
            "x1_recon": "loss_xt_recon", "x2_recon": "loss_x2t_recon",
            "x3_recon": "loss_x3t_recon", "z_kl": "loss_z_KL",
            "gan_seq": "loss_x2t_gan_sequence",
            "gan_frame": "loss_x2t_gan_frame"}[name]]

    param_rows = {}
    for name in lam:
        g = jax.jit(jax.grad(full_term), static_argnums=1)(g_params, name)
        param_rows[name] = {
            "grad_encdec_norm": float(tree_norm(g.get("encdec"))),
            "grad_encz_norm": float(tree_norm(g.get("encz"))),
        }

    kl_val = float(losses.kl_loss(mus, logvars))

    hdr = (f"{'term':<10} {'lam':>6} {'loss(w)':>12} {'|g_x2p|/px':>12} "
           f"{'|g_x2p|':>10} {'|g_encdec|':>11} {'|g_encz|':>10}")
    print(f"\n# gradient attribution @ {h}x{w} batch {b} "
          f"(data: {source}; weighted by lambda)")
    print(hdr)
    print("-" * len(hdr))
    table = {}
    for name in ("x2_recon", "x1_recon", "x3_recon", "gan_seq", "gan_frame",
                 "z_kl"):
        r = dict(param_rows[name])
        if name in x2p_rows:
            r.update(x2p_rows[name])
        else:
            r["loss"] = lam[name] * kl_val
            r["grad_x2p_mean_abs"] = 0.0
            r["grad_x2p_norm"] = 0.0
        table[name] = r
        print(f"{name:<10} {lam[name]:>6.2f} {r['loss']:>12.2f} "
              f"{r['grad_x2p_mean_abs']:>12.3e} {r['grad_x2p_norm']:>10.3f} "
              f"{r['grad_encdec_norm']:>11.3f} {r['grad_encz_norm']:>10.3f}")

    direct = table["x2_recon"]["grad_x2p_mean_abs"]
    others = {k: v["grad_x2p_mean_abs"] / max(direct, 1e-30)
              for k, v in table.items() if k not in ("x2_recon", "z_kl")}
    print("\nper-pixel pull on x2p relative to the direct x2 L1 term:")
    pprint.pprint({k: round(v, 2) for k, v in others.items()})

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"resolution": [h, w], "batch": b, "source": source,
                       "lambdas": lam, "terms": table,
                       "rel_pull_vs_x2_l1": others}, f, indent=2)
        print(f"# wrote {args.out}")


if __name__ == "__main__":
    main()
