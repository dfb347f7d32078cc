"""Rasterize PASCAL-Context 59-class label PNGs from trainval_merged.json.

The torch-free replacement for the reference's Detail-API preprocessing
(reference lib/datasets/pascal_ctx.py:52-96): decodes the COCO-style
segmentations, paints category ids, maps to the 59-class indices, and
writes uint8 PNGs the PASCALContext dataset (and its list files) consume.

    python tools/gen_pascal_ctx_masks.py --root data --phase train
    python tools/gen_pascal_ctx_masks.py --root data --phase val
"""

import argparse

import _init_paths  # noqa: F401
from vae2_tpu.data.pascal_detail import preprocess_masks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data",
                    help="dataset root containing pascal_ctx/VOCdevkit/...")
    ap.add_argument("--phase", default="train", choices=("train", "val"))
    ap.add_argument("--out", default="", help="output dir override")
    args = ap.parse_args()
    out = preprocess_masks(args.root, args.phase, args.out or None)
    print(f"masks -> {out}")


if __name__ == "__main__":
    main()
