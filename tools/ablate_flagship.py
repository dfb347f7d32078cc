"""Controlled ablations for the flagship-resolution learning failure.

Round-3 observation (docs/northstar_flagship.json): at 128x256 the dual
decoders learn (x1/x3 recon fall ~20x) while the middle-clip PREDICTION
loss ``loss_x2t_recon`` barely moves — the model uses x2p as a feature
carrier instead of a prediction. Candidate causes: the reference's
x2 lambda=0.1 (tuned on real Cityscapes with pretrained stems and ~1.5M
SGD steps, reference lib/config/default.py:69-76) is drowned by the
decoder/GAN pulls in a short from-scratch synthetic run; GAN terms
dominating; LR too low for the step budget.

Runs the SAME full W18 flagship model at half resolution (64x128 — ~4x
cheaper steps, same architecture regime) over a small grid of recipes via
the shipped train CLI, then reports the train-log x2/x1/x3 recon
trajectories so the winning recipe can be promoted to the 128x256
north-star run.

    python tools/ablate_flagship.py --epochs 40 [--out docs/ablation_x2.json]
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

ABLATIONS = {
    # control: the (failing) r3 flagship recipe at half res
    "control_lam0.1": [],
    # hypothesis 1: x2 supervision underweighted for from-scratch short runs
    "x2lam1": ["TRAIN.X2RECON_LAMBDA", "1.0"],
    # hypothesis 2: GAN pull dominates the prediction
    "x2lam1_gan0": ["TRAIN.X2RECON_LAMBDA", "1.0", "TRAIN.GAN_LAMBDA", "0.0"],
    # hypothesis 3: LR too conservative for the step budget
    "x2lam1_lr3e-4": ["TRAIN.X2RECON_LAMBDA", "1.0", "TRAIN.LR", "0.0003"],
    # hypothesis 4 (from tools/grad_diagnosis.py: decoder-recon terms pull
    # on x2p 1135-1603x harder than the 0.1-weighted direct L1 at init,
    # GAN terms 100-160x — docs/grad_diag_init_64x128.json): the direct
    # supervision needs to be within an order of magnitude of the
    # competing pulls for a short from-scratch run
    "x2lam10": ["TRAIN.X2RECON_LAMBDA", "10.0"],
}

LOG_RE = re.compile(
    r"Epoch: \[(\d+)/\d+\] Iter:\[(\d+)/(\d+)\].*"
    r"loss_xt_recon: ([\d.eE+-]+), loss_x2t_recon: ([\d.eE+-]+), "
    r"loss_x3t_recon: ([\d.eE+-]+), loss_z_KL: ([\d.eE+-]+)")


def parse_log(log_path):
    rows = []
    with open(log_path) as f:
        for line in f:
            m = LOG_RE.search(line)
            if m:
                e, it, per = int(m.group(1)), int(m.group(2)), int(m.group(3))
                rows.append({
                    "step": e * per + it,
                    "x1": float(m.group(4)),
                    "x2": float(m.group(5)),
                    "x3": float(m.group(6)),
                    "kl": float(m.group(7)),
                })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg",
                    default="experiments/cityscapes/"
                            "northstar_flagship_128x256.yaml")
    ap.add_argument("--data", default="data/synthetic_flagship")
    ap.add_argument("--epochs", default=40, type=int)
    ap.add_argument("--width", default=128, type=int)
    ap.add_argument("--height", default=64, type=int)
    ap.add_argument("--only", default="",
                    help="comma-separated subset of ablation names")
    ap.add_argument("--out", default="docs/ablation_x2.json")
    args = ap.parse_args()

    names = [n for n in ABLATIONS
             if not args.only or n in args.only.split(",")]
    results = {}
    for name in names:
        out_dir = f"output_ablate_{name}"
        cmd = [sys.executable, os.path.join(TOOLS, "train.py"),
               "--cfg", args.cfg,
               "OUTPUT_DIR", out_dir,
               "DATASET.ROOT", args.data,
               "DATASET.TRAIN_SET", f"{args.data}/train_list.txt",
               "DATASET.TEST_SET", f"{args.data}/test_list.txt",
               "TRAIN.IMAGE_SIZE", f"({args.width},{args.height})",
               "TEST.IMAGE_SIZE", f"({args.width},{args.height})",
               "TRAIN.BASE_SIZE", str(args.width),
               "TEST.BASE_SIZE", str(args.width),
               "TRAIN.END_EPOCH", str(args.epochs),
               "TPU.LAYER_SUMMARY", "False",
               "PRINT_FREQ", "5",
               "AUTO_RESUME", "True",
               ] + ABLATIONS[name]
        print(f"\n=== ablation {name}: {' '.join(ABLATIONS[name]) or '(control)'}",
              flush=True)
        proc = subprocess.run(cmd, cwd=REPO)
        if proc.returncode != 0:
            print(f"!! ablation {name} failed rc={proc.returncode}", flush=True)
            continue
        cfg_name = os.path.basename(args.cfg).split(".")[0]
        log_dir = os.path.join(REPO, out_dir, "cityscapessequence", cfg_name)
        logs = sorted(
            f for f in os.listdir(log_dir) if f.endswith("_train.log"))
        rows = []
        for lg in logs:
            rows.extend(parse_log(os.path.join(log_dir, lg)))
        rows.sort(key=lambda r: r["step"])
        results[name] = {"opts": ABLATIONS[name], "rows": rows}
        if rows:
            first, last = rows[0], rows[-1]
            print(f"--- {name}: x2 {first['x2']:.0f}->{last['x2']:.0f} "
                  f"({last['x2'] / max(first['x2'], 1e-9):.3f}x)  "
                  f"x1 {first['x1']:.0f}->{last['x1']:.0f}  "
                  f"x3 {first['x3']:.0f}->{last['x3']:.0f}  "
                  f"kl {first['kl']:.0f}->{last['kl']:.0f}", flush=True)
        if args.out:
            with open(os.path.join(REPO, args.out), "w") as f:
                json.dump(results, f, indent=2)

    print("\n=== summary (train-log recon losses, first->last print) ===")
    for name, res in results.items():
        rows = res["rows"]
        if not rows:
            continue
        first, last = rows[0], rows[-1]
        print(f"{name:<18} x2: {first['x2']:9.0f} -> {last['x2']:9.0f} "
              f"({last['x2'] / max(first['x2'], 1e-9):.3f}x)   "
              f"x1: {last['x1']:8.0f}  x3: {last['x3']:8.0f}  "
              f"kl: {last['kl']:7.0f}")


if __name__ == "__main__":
    main()
