"""Model zoo: VAE^2 HRNet family, toy MLP family, segmentation HRNet, FID nets.

Factory functions mirror the reference factories
(reference lib/models/enc_hrnet.py:1185-1210, lib/models/toy_fc.py:158-176).
"""

from . import toy  # noqa: F401


def get_model_family(name: str):
    """Resolve a model family module by config MODEL.NAME."""
    if name in ("toy_fc", "toyexample"):
        from . import toy as fam
        return fam
    if name in ("enc_hrnet", "hrnet", "vae2"):
        from . import vae2 as fam
        return fam
    if name == "seg_hrnet":
        from . import seg_hrnet as fam
        return fam
    raise KeyError(f"Unknown model family: {name}")
