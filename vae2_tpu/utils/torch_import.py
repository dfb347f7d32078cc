"""Import reference PyTorch checkpoints into the JAX parameter pytree.

Maps the reference's module naming (reference lib/models/enc_hrnet.py) onto
this framework's flax tree so trained reference checkpoints
(``checkpoint_encdec.pth.tar`` / ``model_encdec_final_state.pth``,
tools/train.py:317-348) can be evaluated here for FID/IS parity, and so the
ImageNet-pretrained HRNet stems can seed training (the conv1
channel-replication surgery at enc_hrnet.py:761-785).

Name correspondence (ours -> reference), per trunk:

  conv1.kernel                       conv1.weight            (OIHW->HWIO)
  bn1.{scale,bias|mean,var}          bn1.{weight,bias|running_mean,running_var}
  layer1.block{i}.conv1...           layer1.{i}.conv1...
  layer1.block{i}.down_{conv,bn}     layer1.{i}.downsample.{0,1}
  transition{t}.adapt{i}_{conv,bn}   transition{t}.{i}.{0,1}
  transition{t}.new{i}_{j}_{conv,bn} transition{t}.{i}.{j}.{0,1}
  stage{s}_module{m}.branch{b}.block{i}   stage{s}.{m}.branches.{b}.{i}
  stage{s}_module{m}.fuse.up_{i}_{j}_{conv,bn}    stage{s}.{m}.fuse_layers.{i}.{j}.{0,1}
  stage{s}_module{m}.fuse.down_{i}_{j}_{k}_{conv,bn} stage{s}.{m}.fuse_layers.{i}.{j}.{k}.{0,1}
  transition3_e.inject{i}_{conv,bn}  transition3_e.{i}.{0,1}
  last_layer_{k}.{conv1,bn,conv2}    last_layer_{k}.{0,1,3}

Network prefixes: our encdec.encoder -> '' , encdec.dec_future -> 'decf_',
encdec.dec_past -> 'decp_' (enc_hrnet.py:545-751); the composite checkpoint
prefixes 'encdec_model.' / 'encz_model.' / 'D_model_sequence.' /
'D_model_frame.' (FullModel_encdec, lib/utils/utils.py:47-61), including the
historical 'encdec_mode.' typo fixed by ckpt_checker.py:82-95.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint to numpy (handles the {epoch, state_dict,...}
    wrapper of tools/train.py:320-324 and the legacy key typo)."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]
    out = {}
    for k, v in raw.items():
        k = k.replace("module.", "")  # DDP wrapper
        k = k.replace("encdec_mode.", "encdec_model.")  # ckpt_checker.py:89
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


# ---------------------------------------------------------------------------
# path translation
# ---------------------------------------------------------------------------

_DEC_PREFIX = {"encoder": "", "dec_future": "decf_", "dec_past": "decp_"}


def _trunk_key(parts: List[str]) -> Optional[str]:
    """Translate a trunk-relative flax path (module names only, no leaf) to
    the reference module path."""
    name = parts[0]
    if name in ("conv1", "bn1", "conv2", "bn2"):
        return name
    m = re.fullmatch(r"layer1", name)
    if m:
        blk = re.fullmatch(r"block(\d+)", parts[1]).group(1)
        sub = _block_sub(parts[2])
        return f"layer1.{blk}.{sub}"
    m = re.fullmatch(r"transition(\d)", name)
    if m:
        t = m.group(1)
        a = re.fullmatch(r"adapt(\d+)_(conv|bn)", parts[1])
        if a:
            idx = a.group(1)
            slot = "0" if a.group(2) == "conv" else "1"
            return f"transition{t}.{idx}.{slot}"
        n = re.fullmatch(r"new(\d+)_(\d+)_(conv|bn)", parts[1])
        if n:
            i, j = n.group(1), n.group(2)
            slot = "0" if n.group(3) == "conv" else "1"
            return f"transition{t}.{i}.{j}.{slot}"
        raise KeyError(parts)
    m = re.fullmatch(r"stage(\d)_module(\d+)", name)
    if m:
        s, mod = m.group(1), m.group(2)
        if parts[1] == "fuse":
            u = re.fullmatch(r"up_(\d+)_(\d+)_(conv|bn)", parts[2])
            if u:
                slot = "0" if u.group(3) == "conv" else "1"
                return (f"stage{s}.{mod}.fuse_layers.{u.group(1)}."
                        f"{u.group(2)}.{slot}")
            d = re.fullmatch(r"down_(\d+)_(\d+)_(\d+)_(conv|bn)", parts[2])
            if d:
                slot = "0" if d.group(4) == "conv" else "1"
                return (f"stage{s}.{mod}.fuse_layers.{d.group(1)}."
                        f"{d.group(2)}.{d.group(3)}.{slot}")
            raise KeyError(parts)
        b = re.fullmatch(r"branch(\d+)", parts[1]).group(1)
        blk = re.fullmatch(r"block(\d+)", parts[2]).group(1)
        sub = _block_sub(parts[3])
        return f"stage{s}.{mod}.branches.{b}.{blk}.{sub}"
    if name == "transition3_e":
        inj = re.fullmatch(r"inject(\d+)_(conv|bn)", parts[1])
        slot = "0" if inj.group(2) == "conv" else "1"
        return f"transition3_e.{inj.group(1)}.{slot}"
    return None


def _block_sub(sub: str) -> str:
    return {
        "conv1": "conv1", "bn1": "bn1", "conv2": "conv2", "bn2": "bn2",
        "conv3": "conv3", "bn3": "bn3",
        "down_conv": "downsample.0", "down_bn": "downsample.1",
    }[sub]


def _head_key(parts: List[str]) -> Optional[str]:
    """TriHead / disc head: last_layer[_k].{conv1->0, bn->1, conv2->3}."""
    m = re.fullmatch(r"last_layer(_\d+)?", parts[0])
    if not m:
        return None
    slot = {"conv1": "0", "bn": "1", "conv2": "3"}[parts[1]]
    return f"{parts[0]}.{slot}"


def _net_torch_module(net: str, parts: List[str]) -> Optional[str]:
    """Full torch module path for one of our param paths inside a network.

    ``parts`` excludes the leaf (kernel/scale/...).
    """
    if net == "encdec":
        sub_net, rest = parts[0], list(parts[1:])
        prefix = _DEC_PREFIX[sub_net]
        if rest[0] == "trunk":
            key = _trunk_key(rest[1:])
        else:
            key = _head_key(rest)
        if key is None:
            raise KeyError((net, parts))
        return f"encdec_model.{prefix}{key}" if prefix == "" else (
            "encdec_model." + prefix + key)
    if net == "encz":
        rest = list(parts)
        if rest[0] == "trunk":
            key = _trunk_key(rest[1:])
            return f"encz_model.{key}"
        zl = re.fullmatch(r"z_layer_(\d+)", rest[0])
        if zl:  # hd_z per-branch 1x1 (enc_hrnet.py:1008-1017: Sequential(conv))
            return f"encz_model.last_layer.{zl.group(1)}.0"
        pooled = {"z_fc1": "last_layer.1", "z_bn": "last_layer.2",
                  "z_fc2": "last_layer.4"}
        if rest[0] in pooled:
            return f"encz_model.{pooled[rest[0]]}"
        raise KeyError((net, parts))
    if net in ("d_seq", "d_frame"):
        torch_net = ("D_model_sequence" if net == "d_seq" else "D_model_frame")
        rest = list(parts)
        if rest[0] == "trunk":
            return f"{torch_net}.{_trunk_key(rest[1:])}"
        key = _head_key(rest)
        if key is not None:
            return f"{torch_net}.{key}"
        raise KeyError((net, parts))
    raise KeyError(net)


def _convert_leaf(torch_module: str, leaf: str, collection: str,
                  sd: Dict[str, np.ndarray], dense: bool) -> Optional[np.ndarray]:
    """Fetch + transform the torch tensor for one flax leaf."""
    if collection == "batch_stats":
        field = {"mean": "running_mean", "var": "running_var"}[leaf]
        return sd.get(f"{torch_module}.{field}")
    if leaf == "kernel":
        w = sd.get(f"{torch_module}.weight")
        if w is None:
            return None
        if dense:
            # torch Linear (out, in) or 1x1 conv (out, in, 1, 1) -> (in, out)
            w = w.reshape(w.shape[0], -1)
            return np.transpose(w, (1, 0))
        return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
    if leaf == "bias":
        return sd.get(f"{torch_module}.bias")
    if leaf == "scale":
        return sd.get(f"{torch_module}.weight")
    raise KeyError(leaf)


def _walk(tree: Any, path: Tuple[str, ...] = ()):
    """Yield (path, leaf) pairs for every array leaf of a nested dict."""
    if isinstance(tree, dict):
        for k, v in tree.items():
            if hasattr(v, "shape"):
                yield path + (k,), v
            else:
                yield from _walk(v, path + (k,))


def import_params(params: Dict[str, Any], batch_stats: Dict[str, Any],
                  sd: Dict[str, np.ndarray], strict: bool = False
                  ) -> Tuple[Dict[str, Any], Dict[str, Any], List[str]]:
    """Return (new_params, new_batch_stats, missing_keys)."""
    import jax

    missing: List[str] = []

    def convert_tree(tree, net, collection):
        flat = dict(_walk(tree))
        out = jax.tree.map(lambda x: x, tree)  # deep copy structure
        for path, val in flat.items():
            parts, leaf = list(path[:-1]), path[-1]
            try:
                tmod = _net_torch_module(net, parts)
            except KeyError:
                missing.append("/".join((net,) + path))
                continue
            dense = leaf == "kernel" and val.ndim == 2
            new = _convert_leaf(tmod, leaf, collection, sd, dense)
            if new is None:
                missing.append("/".join((net,) + path) + f" <- {tmod}")
                continue
            new = np.asarray(new, dtype=np.float32)
            if new.size != int(np.prod(val.shape)):
                missing.append("/".join((net,) + path)
                               + f" <- {tmod} (shape {new.shape} vs "
                               f"{tuple(val.shape)})")
                continue
            new = new.reshape(val.shape)
            node = out
            for p in path[:-1]:
                node = node[p]
            node[leaf] = new
        return out

    new_params = {}
    new_stats = {}
    for net in params:
        new_params[net] = convert_tree(params[net], net, "params")
        if net in batch_stats and batch_stats[net]:
            new_stats[net] = convert_tree(batch_stats[net], net, "batch_stats")
        else:
            new_stats[net] = batch_stats.get(net, {})
    if strict and missing:
        raise KeyError(f"{len(missing)} unmatched parameters, e.g. "
                       f"{missing[:5]}")
    return new_params, new_stats, missing


def import_reference_checkpoint(state, path: str, strict: bool = False):
    """Load a reference FullModel checkpoint into a VAE2State."""
    sd = load_torch_state_dict(path)
    params, stats, missing = import_params(
        dict(state.params), dict(state.batch_stats), sd, strict=strict)
    return state.replace(params=params, batch_stats=stats), missing


def import_pretrained_trunk(state, path: str, clip_length: int = 3,
                            is_baseline: bool = False):
    """Seed every network's trunk from a plain (ImageNet/seg) HRNet torch
    checkpoint — the reference's MODEL.PRETRAINED surgery
    (enc_hrnet.py:753-785, 1043-1068, 1156-1183):

    - every trunk weight whose name matches loads as-is ('last_layer*'
      heads are skipped),
    - ``conv1.weight`` (3-channel stem) is input-channel-replicated to each
      net's stem width: encoder x(2L if baseline else L) with L=clip_length,
      decoders xL, posterior x(3L if baseline else 2L), sequence
      discriminator xL, frame discriminator x1,
    - the same trunk weights clone into the decf_/decp_ decoder copies
      (here: our dec_future/dec_past trunks).
    """
    sd = load_torch_state_dict(path)
    # strip an optional 'model.' prefix (enc_hrnet.py:765)
    sd = {k[len("model."):] if k.startswith("model.") else k: v
          for k, v in sd.items()}

    reps = {
        ("encdec", "encoder"): (2 * clip_length if is_baseline
                                else clip_length),
        ("encdec", "dec_future"): clip_length,
        ("encdec", "dec_past"): clip_length,
        ("encz", None): 3 * clip_length if is_baseline else 2 * clip_length,
        ("d_seq", None): clip_length,
        ("d_frame", None): 1,
    }

    def expanded(net, sub):
        """sd view with composite prefixes + conv1 replication for (net, sub)."""
        rep = reps[(net, sub)]
        out = {}
        torch_net = {"encdec": "encdec_model", "encz": "encz_model",
                     "d_seq": "D_model_sequence",
                     "d_frame": "D_model_frame"}[net]
        dec_prefix = {"encoder": "", "dec_future": "decf_",
                      "dec_past": "decp_", None: ""}[sub]
        for k, v in sd.items():
            if "last_layer" in k or "transition3_e" in k:
                # heads are task-specific; z-inject widths differ per net
                continue
            if k == "conv1.weight" and rep > 1:
                v = np.tile(v, (1, rep, 1, 1))
            out[f"{torch_net}.{dec_prefix}{k}"] = v
        return out

    params = dict(state.params)
    stats = dict(state.batch_stats)
    all_missing: List[str] = []
    for (net, sub) in reps:
        if net not in params:
            continue
        view = expanded(net, sub)
        sub_p = params[net] if sub is None else {sub: params[net][sub]}
        sub_s = (stats.get(net, {}) if sub is None
                 else {sub: stats.get(net, {}).get(sub, {})})
        new_p, new_s, missing = import_params(
            {net: sub_p}, {net: sub_s}, view, strict=False)
        if sub is None:
            params[net] = new_p[net]
            if stats.get(net):
                stats[net] = new_s[net]
        else:
            params[net] = {**params[net], sub: new_p[net][sub]}
            if stats.get(net):
                stats[net] = {**stats[net], sub: new_s[net][sub]}
        all_missing += missing
    return state.replace(params=params, batch_stats=stats), all_missing
