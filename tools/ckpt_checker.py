"""Checkpoint surgery & comparison utilities (reference tools/ckpt_checker.py).

- ``rename``: fix historical key typos in reference torch checkpoints
  (``encdec_mode.`` -> ``encdec_model.``, reference ckpt_checker.py:82-95)
  and save the repaired file.
- ``compare``: diff two checkpoints' parameter sets/values (param_comp,
  :96-104) — supports torch .pth/.pth.tar and this framework's .msgpack.
- ``import``: convert a reference torch checkpoint into a vae2_tpu msgpack
  checkpoint given a config (uses vae2_tpu.utils.torch_import).

    python tools/ckpt_checker.py rename --src old.pth.tar --dst fixed.pth.tar
    python tools/ckpt_checker.py compare --src a.pth.tar --dst b.msgpack
    python tools/ckpt_checker.py import --cfg exp.yaml --src ref.pth.tar --dst out.msgpack
"""

import argparse

import numpy as np

import _init_paths  # noqa: F401


def _load_any(path):
    """Load either a torch checkpoint or a vae2_tpu msgpack into a flat
    {name: ndarray} dict."""
    if path.endswith(".msgpack"):
        from flax import serialization

        with open(path, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        flat = {}

        def walk(node, prefix):
            if isinstance(node, dict):
                for k, v in node.items():
                    walk(v, f"{prefix}.{k}" if prefix else str(k))
            else:
                flat[prefix] = np.asarray(node)

        walk(raw, "")
        return flat
    from vae2_tpu.utils.torch_import import load_torch_state_dict

    return load_torch_state_dict(path)


def cmd_rename(args):
    import torch

    ckpt = torch.load(args.src, map_location="cpu", weights_only=False)
    sd = ckpt["state_dict"] if isinstance(ckpt, dict) and "state_dict" in ckpt \
        else ckpt
    renamed = {k.replace(args.old, args.new): v for k, v in sd.items()}
    changed = sum(1 for k in sd if args.old in k)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt["state_dict"] = renamed
    else:
        ckpt = renamed
    torch.save(ckpt, args.dst)
    print(f"renamed {changed} keys ({args.old!r} -> {args.new!r}) "
          f"-> {args.dst}")


def cmd_compare(args):
    a = _load_any(args.src)
    b = _load_any(args.dst)
    only_a = sorted(set(a) - set(b))
    only_b = sorted(set(b) - set(a))
    print(f"{len(a)} params in src, {len(b)} in dst; "
          f"{len(only_a)} only-src, {len(only_b)} only-dst")
    for k in only_a[:20]:
        print("  only src:", k)
    for k in only_b[:20]:
        print("  only dst:", k)
    n_diff = 0
    for k in sorted(set(a) & set(b)):
        va, vb = a[k], b[k]
        if va.shape != vb.shape:
            print(f"  shape diff {k}: {va.shape} vs {vb.shape}")
            n_diff += 1
        elif not np.allclose(va, vb, atol=args.atol):
            print(f"  value diff {k}: max|d|="
                  f"{np.max(np.abs(va.astype(np.float64) - vb.astype(np.float64)))}")
            n_diff += 1
    print(f"{n_diff} differing common params")


def cmd_import(args):
    import jax
    import jax.numpy as jnp

    from vae2_tpu.config import config, update_config
    from vae2_tpu.core.builder import build_system
    from vae2_tpu.utils.checkpoint import save_checkpoint
    from vae2_tpu.utils.torch_import import import_reference_checkpoint

    class _A:
        cfg = args.cfg
        opts = []

    update_config(config, _A)
    system = build_system(config)
    h_img, w_img = config.TRAIN.IMAGE_SIZE[1], config.TRAIN.IMAGE_SIZE[0]
    c = 3 * config.TRAIN.CLIP_LENGTH
    batch = {k: jnp.zeros((1, h_img, w_img, c), jnp.float32)
             for k in ("xt", "x2t", "x3t")}
    state = system.init(jax.random.PRNGKey(0), batch)
    state, missing = import_reference_checkpoint(state, args.src)
    print(f"imported with {len(missing)} unmatched leaves")
    for m in missing[:20]:
        print("  missing:", m)
    save_checkpoint(args.dst, state, epoch=0)
    print(f"wrote {args.dst}")


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("rename")
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--old", default="encdec_mode.")
    p.add_argument("--new", default="encdec_model.")
    p.set_defaults(fn=cmd_rename)

    p = sub.add_parser("compare")
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--atol", type=float, default=0.0)
    p.set_defaults(fn=cmd_compare)

    p = sub.add_parser("import")
    p.add_argument("--cfg", required=True)
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.set_defaults(fn=cmd_import)

    args = parser.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
