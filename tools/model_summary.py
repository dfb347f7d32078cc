"""Per-layer FLOPs/params model summary (reference lib/utils/modelsummary.py
:19-135, logged at train startup by reference tools/train.py:92-98).

Prints a per-layer table — path, module, input/output shapes, FLOPs, params —
for every subnetwork (encz, encdec, d_seq, d_frame) of the configured model,
computed from flax's module tracer + XLA cost analysis.

FLOPs are only available from the CPU backend's cost analysis, so this tool
re-execs itself onto JAX_PLATFORMS=cpu when launched under the TPU platform
(shapes are platform-independent; no weights are touched).

    python tools/model_summary.py --cfg experiments/.../recipe.yaml [KEY V ...]
"""

import argparse
import os
import subprocess
import sys


def parse_args():
    parser = argparse.ArgumentParser(description="per-layer model summary")
    parser.add_argument(
        "--cfg",
        default="experiments/cityscapes/vae2_hrnet_w18_small_v2_128x256.yaml",
        type=str)
    parser.add_argument("--depth", default=3, type=int,
                        help="module nesting depth shown in the table")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return parser.parse_args()


def _reexec_on_cpu():
    from vae2_tpu.utils.cpuenv import force_cpu_env

    env = force_cpu_env()
    env["VAE2_TPU_SUMMARY_CPU"] = "1"
    raise SystemExit(subprocess.run(
        [sys.executable] + sys.argv, env=env).returncode)


def main():
    args = parse_args()
    if (os.environ.get("JAX_PLATFORMS", "") != "cpu"
            and not os.environ.get("VAE2_TPU_SUMMARY_CPU")):
        _reexec_on_cpu()

    import numpy as np

    import _init_paths  # noqa: F401
    from vae2_tpu.config import config, update_config
    from vae2_tpu.core.builder import build_system
    from vae2_tpu.core.infer_loop import prior_z_shapes
    from vae2_tpu.utils.summary import model_summary_table

    update_config(config, args)
    system = build_system(config)
    if system.hyper.family == "toy":
        raise SystemExit(
            "toy family uses vector inputs; per-layer tables target the "
            "image models (param counts are in the train log)")

    # a small crop keeps per-layer lowering cheap; params/FLOPs-per-pixel
    # scale linearly so the table stays representative
    h = min(32, config.TRAIN.IMAGE_SIZE[1])
    w = min(64, config.TRAIN.IMAGE_SIZE[0])
    c = 3 * config.TRAIN.CLIP_LENGTH
    xt = np.zeros((1, h, w, c), np.float32)
    x3t = np.zeros((1, h, w, c), np.float32)

    zs = prior_z_shapes(system.hyper, h, w)
    if zs is None:
        z = None
    elif system.hyper.hd_z:
        z = [np.zeros((1,) + s, np.float32) for s in zs]
    else:
        z = np.zeros((1,) + zs[0], np.float32)

    enc_in = np.concatenate([xt, x3t], -1) if system.hyper.is_baseline else xt
    if "encz" in system.modules:
        q_in = np.concatenate([enc_in, x3t], axis=-1)
        print("== encz ==")
        print(model_summary_table(
            system.modules["encz"], q_in, train=False, depth=args.depth))
    print("== encdec ==")
    print(model_summary_table(
        system.modules["encdec"], enc_in, z, train=False, depth=args.depth))
    for d in ("d_seq", "d_frame"):
        if d in system.modules:
            print(f"== {d} ==")
            print(model_summary_table(
                system.modules[d], x3t, train=False, depth=args.depth))


if __name__ == "__main__":
    main()
