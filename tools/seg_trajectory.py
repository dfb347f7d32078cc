"""Segmentation north-star mini-loop: train -> test -> MeanIU trajectory.

Drives the seg family end to end through the SHIPPED CLIs (reference
workflow: tools/train.py for seg_hrnet then tools/test.py,
/root/reference/lib/core/function.py:16-121 + tools/test.py:86-135):
evaluates the untrained init (epoch-0 baseline row), trains N epochs,
re-evaluates, and records the MeanIU/Pixel-Acc trajectory proving the seg
chain is closed (checkpoints round-trip, metrics improve with training).

    python tools/seg_trajectory.py --epochs 8 \
        [--trajectory-out docs/seg_trajectory.json]

Exit code is non-zero if the trained row does not beat the init row.
"""

import argparse
import json
import os
import re
import subprocess
import sys

import _init_paths  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.dirname(os.path.abspath(__file__))


def run(cmd):
    print("+", " ".join(cmd), flush=True)
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    if proc.returncode != 0:
        raise SystemExit(
            f"stage failed ({proc.returncode}): {' '.join(cmd)}\n"
            f"{proc.stderr[-3000:]}")
    return proc.stdout + proc.stderr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg",
                    default="experiments/cityscapes/debug_seg_tiny_32x64.yaml")
    ap.add_argument("--epochs", default=8, type=int)
    ap.add_argument("--data", default="data/synthetic_seg")
    ap.add_argument("--out", default="output_northstar_seg")
    ap.add_argument("--trajectory-out", default="")
    args = ap.parse_args()

    cfg_name = os.path.basename(args.cfg).split(".")[0]
    final_dir = os.path.join(REPO, args.out, "cityscapes", cfg_name)
    common = ["OUTPUT_DIR", args.out, "DATASET.ROOT", args.data,
              "DATASET.TRAIN_SET", f"{args.data}/train.lst",
              "DATASET.TEST_SET", f"{args.data}/val.lst"]

    def train(end_epoch):
        run([sys.executable, os.path.join(TOOLS, "train_seg.py"),
             "--cfg", args.cfg] + common
            + ["TRAIN.END_EPOCH", str(end_epoch)])

    def evaluate(epochs_trained):
        out = run([sys.executable, os.path.join(TOOLS, "test.py"),
                   "--cfg", args.cfg] + common
                  + ["TEST.MODEL_FILE",
                     os.path.join(final_dir, "seg_final_state.msgpack")])
        m = re.search(r"MeanIU:\s*([\d.]+),\s*Pixel_Acc:\s*([\d.]+),"
                      r"\s*Mean_Acc:\s*([\d.]+)", out)
        if not m:
            raise SystemExit(f"no MeanIU line in test output:\n{out[-3000:]}")
        row = {"epochs": epochs_trained, "mean_iu": float(m.group(1)),
               "pixel_acc": float(m.group(2)), "mean_acc": float(m.group(3))}
        print(json.dumps(row), flush=True)
        return row

    # untrained-init baseline: END_EPOCH 0 saves the seeded init and
    # trains nothing (train_seg always starts from the seeded init —
    # there is no resume — so the final row retrains from scratch)
    train(0)
    rows = [evaluate(0)]
    train(args.epochs)
    rows.append(evaluate(args.epochs))

    if args.trajectory_out:
        with open(os.path.join(REPO, args.trajectory_out), "w") as f:
            json.dump(rows, f, indent=2)

    first, last = rows[0], rows[-1]
    improved = (last["mean_iu"] > first["mean_iu"]
                and last["pixel_acc"] > first["pixel_acc"])
    print(f"improved init->trained: {improved} "
          f"(MeanIU {first['mean_iu']:.4f}->{last['mean_iu']:.4f}, "
          f"Pixel_Acc {first['pixel_acc']:.4f}->{last['pixel_acc']:.4f})")
    if not improved:
        raise SystemExit("seg trajectory: metrics did not improve")


if __name__ == "__main__":
    main()
