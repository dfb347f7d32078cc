"""Post-process the per-sample metric dumps from tools/inference.py
(reference tools/statistic.py).

Modes (pick with --mode; the reference toggles by editing main()):
  meanvar     — per-frame mean/std of SSIM/MS-SSIM/PSNR/L1 over all samples
                (stat_meanvar_cityscapes, reference :13-33)
  bestsample  — best-of-{1,3,5,20,50,100} sampling curves
                (stat_bestsample, :36-59)
  toy         — toy L1 mean/std from the axis txts
                (stat_meanvar_numpredict, :62-88)
  flowstd     — per-pixel std over trial images -> heatmaps + std.txt
                (stat_flow_std, :91-113)

    python tools/statistic.py --root output/.../vis/epoch0 --mode meanvar \
        --candidate x2t
"""

import argparse
import glob
import json
import os
from os import path as osp

import numpy as np

METRIC_KEYS = [
    f"{frame}_{name}"
    for frame in (0, 1, 2)
    for name in ("msssimloss", "psnrloss", "ssimloss", "reconloss")
]


def stat_meanvar(root, candidates):
    """Per-video then overall mean/std for each frame/metric (reference :13-33)."""
    result = {k: [] for k in METRIC_KEYS}
    for v in sorted(glob.glob(osp.join(root, "*"))):
        for c in candidates:
            cur = osp.join(v, c + "predict")
            if not osp.isdir(cur):
                continue
            for k in METRIC_KEYS:
                path = osp.join(cur, f"{c}_{k}.txt")
                if not osp.isfile(path):
                    continue
                val = np.loadtxt(path, usecols=(0,), unpack=True, ndmin=1)
                result[k].append((float(np.mean(val)), float(np.std(val))))
    out = {}
    for k, vals in result.items():
        if vals:
            out[k] = (sum(v[0] for v in vals) / len(vals),
                      sum(v[1] for v in vals) / len(vals))
    return out


def stat_bestsample(root, candidates, points=(1, 3, 5, 20, 50, 100)):
    """Best-of-K curves: min over first K samples for recon loss, max for the
    similarity metrics (reference :36-59)."""
    result = {k: {str(p): [] for p in points} for k in METRIC_KEYS}
    for v in sorted(glob.glob(osp.join(root, "*"))):
        for c in candidates:
            cur = osp.join(v, c + "predict")
            if not osp.isdir(cur):
                continue
            for k in METRIC_KEYS:
                path = osp.join(cur, f"{c}_{k}.txt")
                if not osp.isfile(path):
                    continue
                val = np.loadtxt(path, usecols=(0,), unpack=True, ndmin=1)
                for p in points:
                    best = (np.min(val[:p]) if "reconloss" in k
                            else np.max(val[:p]))
                    result[k][str(p)].append(float(best))
    out = {}
    for k, by_p in result.items():
        out[k] = {p: (sum(v) / len(v) if v else None)
                  for p, v in by_p.items()}
    return out


def stat_toy(root, candidates=("x3t",), limit=40):
    """Toy L1 mean / per-point std vs the gt axis dumps (reference :62-88)."""
    dirs = sorted(glob.glob(osp.join(root, "*")))[:limit]
    means, stds = [], []
    for v in dirs:
        gt_path = osp.join(v, "gt_axis.txt")
        if not osp.isfile(gt_path):
            continue
        gt = np.expand_dims(np.loadtxt(gt_path, unpack=True), axis=1)
        for c in candidates:
            path = osp.join(v, f"{c}_axis.txt")
            if not osp.isfile(path):
                continue
            val = np.loadtxt(path, unpack=True)
            l1 = np.abs(val - gt)
            means.append(float(np.mean(l1)))
            stds.append(float(np.mean(np.std(l1, axis=1))))
    if not means:
        return {}
    return {"l1_mean": sum(means) / len(means),
            "l1_standardDeviation": sum(stds) / len(stds)}


def stat_flow_std(root):
    """Per-pixel std over trial images -> grayscale heatmap + std.txt per dir
    (reference :91-113)."""
    from PIL import Image

    items = [d for d in glob.glob(osp.join(root, "*")) if osp.isdir(d)]
    flow_max = 0.0
    pending = []
    for item in items:
        images = []
        for s in sorted(glob.glob(osp.join(item, "*.png")) +
                        sorted(glob.glob(osp.join(item, "*.jpg")))):
            im = Image.open(s).convert("RGB").resize((256, 128))
            images.append(np.asarray(im, np.float32)[None])
        if not images:
            continue
        stack = np.concatenate(images, axis=0)
        std = np.mean(np.std(stack, axis=0), axis=2)
        flow_max = max(flow_max, float(np.max(std)))
        with open(osp.join(item, "std.txt"), "w") as f:
            print(float(np.mean(std)), file=f)
        pending.append((osp.join(item, "flowstd.jpg"), std))
    for pth, std in pending:
        norm = std / max(flow_max, 1e-8) * 255
        Image.fromarray(norm.astype(np.uint8), mode="L").save(pth)
    return {"num_items": len(pending), "max_std": flow_max}


def main():
    parser = argparse.ArgumentParser(description="VAE^2 metric aggregator")
    parser.add_argument("--root", type=str, required=True,
                        help="vis/epochN directory")
    parser.add_argument("--mode", default="meanvar",
                        choices=["meanvar", "bestsample", "toy", "flowstd"])
    parser.add_argument("--candidate", default="x2t",
                        help="prediction tag: x2t or x3t (comma-separated)")
    parser.add_argument("--points", default="1,3,5,20,50,100")
    parser.add_argument("--out", default="", help="optional JSON output path")
    args = parser.parse_args()

    candidates = args.candidate.split(",")
    if args.mode == "meanvar":
        result = stat_meanvar(args.root, candidates)
    elif args.mode == "bestsample":
        points = tuple(int(p) for p in args.points.split(","))
        result = stat_bestsample(args.root, candidates, points)
    elif args.mode == "toy":
        result = stat_toy(args.root, candidates)
    else:
        result = stat_flow_std(args.root)

    text = json.dumps(result, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)


if __name__ == "__main__":
    main()
