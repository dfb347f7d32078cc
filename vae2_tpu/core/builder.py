"""Wire a config into a VAE2System (models + hypers + optimizers).

Mirrors the model/composite construction in the reference entry points
(tools/train.py:79-263, tools/toy_example.py:82-176) as a single factory.
"""

from __future__ import annotations

from typing import Dict

from .system import Hyper, VAE2System, make_optimizer


def build_system(config, max_iters: int = 0) -> VAE2System:
    """``max_iters`` (END_EPOCH * steps-per-epoch) is only consulted when
    TRAIN.LR_SCHEDULE selects a decaying schedule."""
    from ..ops.norm import set_default_bn_backend

    set_default_bn_backend(config.TPU.FUSED_ABN)
    extra = config.MODEL.EXTRA
    name = config.MODEL.NAME
    deterministic = extra.BASELINE_MODE == "DETERMINISTIC"

    if name in ("toy_fc", "toyexample"):
        from ..models import toy as fam

        modules: Dict = {
            "encdec": fam.get_encdec_model(config),
            "d_seq": fam.get_D_model(config),
        }
        if not deterministic:
            modules["encz"] = fam.get_encz_model(config)
        hyper = Hyper(
            x1recon_lambda=config.TRAIN.X1RECON_LAMBDA,
            x2recon_lambda=config.TRAIN.X2RECON_LAMBDA,
            x3recon_lambda=config.TRAIN.X3RECON_LAMBDA,
            gan_lambda=config.TRAIN.GAN_LAMBDA,
            is_baseline=extra.IS_BASELINE,
            baseline_mode=extra.BASELINE_MODE,
            hd_z=False,
            z_dim=fam.Z_DIM,
            clip_length=1,
            family="toy",
        )
    elif name in ("enc_hrnet", "hrnet", "vae2"):
        from ..models import vae2 as fam

        modules = {
            "encdec": fam.get_encdec_model(config),
            "d_seq": fam.get_D_sequence_model(config),
            "d_frame": fam.get_D_frame_model(config),
        }
        if not deterministic:
            modules["encz"] = fam.get_encz_model(config)
        hyper = Hyper(
            x1recon_lambda=config.TRAIN.X1RECON_LAMBDA,
            x2recon_lambda=config.TRAIN.X2RECON_LAMBDA,
            x3recon_lambda=config.TRAIN.X3RECON_LAMBDA,
            gan_lambda=config.TRAIN.GAN_LAMBDA,
            is_baseline=extra.IS_BASELINE,
            baseline_mode=extra.BASELINE_MODE,
            hd_z=bool(extra.get("HD_Z", True)),
            z_dim=int(extra.get("Z_DIM", 32)),
            clip_length=config.TRAIN.CLIP_LENGTH,
            family="image",
        )
    else:
        raise KeyError(f"Unknown MODEL.NAME: {name}")

    opt = make_optimizer(
        config.TRAIN,
        moment_dtype=str(config.TPU.get("ADAM_MOMENT_DTYPE", "float32")),
        max_iters=max_iters)
    return VAE2System(modules, hyper, optimizer_g=opt, optimizer_d=opt)
