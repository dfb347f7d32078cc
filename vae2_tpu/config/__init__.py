"""Config system: yacs-compatible key tree, YAML merge, CLI overrides.

Usage mirrors the reference (lib/config/__init__.py):

    from vae2_tpu.config import config, update_config
    update_config(config, args)   # args has .cfg and .opts
"""

from .node import ConfigNode
from .defaults import get_default_config

config = get_default_config()


def update_config(cfg: ConfigNode, args) -> ConfigNode:
    """Merge a YAML file and a KEY VALUE override list, then freeze.

    Mirrors reference lib/config/default.py:121-127.
    """
    cfg.defrost()
    if getattr(args, "cfg", None):
        cfg.merge_from_file(args.cfg)
    cfg.merge_from_list(getattr(args, "opts", None))
    cfg.freeze()
    return cfg


__all__ = ["ConfigNode", "config", "get_default_config", "update_config"]
