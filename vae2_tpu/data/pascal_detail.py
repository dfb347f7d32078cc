"""Minimal Detail-API replacement for PASCAL-Context mask rasterization.

The reference preprocesses PASCAL-Context labels through the external
``detail`` package (reference lib/datasets/pascal_ctx.py:52-96): it calls
``Detail(annots_json, img_folder, phase).getImgs()`` and
``detail.getMask(img)``, maps the 459 raw category ids onto the 59-class
subset, and caches the masks. The ``detail`` package isn't installable
here, so this module re-implements the two calls it makes from the raw
``trainval_merged.json`` with numpy/cv2:

- images are filtered by phase (the json marks each image's splits),
- per-image masks are painted by iterating its segmentation annotations
  in file order and writing ``category_id`` wherever the decoded mask is
  set (getMask semantics for semantic segmentation),
- segmentations decode from COCO-style compressed RLE strings,
  uncompressed RLE lists, or polygon lists.

The 59-class mapping itself stays in the dataset (pascal_ctx.py:65-84).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np


def decode_rle_counts(counts, h: int, w: int) -> np.ndarray:
    """Decode COCO RLE into an (h, w) uint8 mask.

    ``counts`` is either the uncompressed run-length list or the compressed
    LEB128-style string (pycocotools maskApi rleFrString). Runs are
    column-major and alternate background/foreground starting with
    background.
    """
    if isinstance(counts, (bytes, str)):
        s = counts.encode() if isinstance(counts, str) else counts
        cnts: List[int] = []
        p = 0
        while p < len(s):
            x = 0
            k = 0
            more = True
            while more:
                c = s[p] - 48
                x |= (c & 0x1F) << (5 * k)
                more = bool(c & 0x20)
                p += 1
                k += 1
                if not more and (c & 0x10):
                    x |= -1 << (5 * k)
            if len(cnts) > 2:
                x += cnts[-2]
            cnts.append(x)
    else:
        cnts = list(counts)
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for run in cnts:
        if val:
            flat[pos: pos + run] = 1
        pos += run
        val ^= 1
    return flat.reshape(w, h).T  # column-major


def _paint_segmentation(mask: np.ndarray, segm, category_id: int) -> None:
    h, w = mask.shape
    if isinstance(segm, dict):  # RLE
        sh, sw = segm["size"]
        m = decode_rle_counts(segm["counts"], sh, sw)
        if (sh, sw) != (h, w):  # defensive; annotations match image size
            import cv2

            m = cv2.resize(m, (w, h), interpolation=cv2.INTER_NEAREST)
        mask[m > 0] = category_id
    else:  # polygon list [[x0, y0, x1, y1, ...], ...]
        import cv2

        polys = [np.asarray(p, np.float64).reshape(-1, 2).round().astype(
            np.int32) for p in segm if len(p) >= 6]
        if polys:
            m = np.zeros((h, w), np.uint8)
            cv2.fillPoly(m, polys, 1)
            mask[m > 0] = category_id


class DetailLite:
    """Subset of the ``detail`` API used by the reference dataset."""

    def __init__(self, annots_json: str, img_folder: str, phase: str):
        self.img_folder = img_folder
        self.phase = phase
        with open(annots_json) as f:
            data = json.load(f)
        self._images = [
            img for img in data["images"]
            if phase in str(img.get("phase", img.get("split", "")))
        ]
        self._annos: Dict[int, list] = {}
        for ann in data.get("annos_segmentation", data.get("annotations", [])):
            self._annos.setdefault(ann["image_id"], []).append(ann)

    def getImgs(self) -> List[dict]:
        return self._images

    def getMask(self, img: dict) -> np.ndarray:
        h, w = int(img["height"]), int(img["width"])
        mask = np.zeros((h, w), np.uint16)  # category ids go up to 459
        for ann in self._annos.get(img["image_id"], []):
            _paint_segmentation(mask, ann["segmentation"],
                                int(ann["category_id"]))
        return mask


# The 60 raw Detail category ids kept by the 59-class PASCAL-Context
# protocol, sorted (reference pascal_ctx.py:65-71). Index 0 is background.
PASCAL_CTX_59_MAPPING = np.sort(np.array([
    0, 2, 259, 260, 415, 324, 9, 258, 144, 18, 19, 22,
    23, 397, 25, 284, 158, 159, 416, 33, 162, 420, 454, 295, 296,
    427, 44, 45, 46, 308, 59, 440, 445, 31, 232, 65, 354, 424,
    68, 326, 72, 458, 34, 207, 80, 355, 85, 347, 220, 349, 360,
    98, 187, 104, 105, 366, 189, 368, 113, 115]))


def class_to_index(mask: np.ndarray) -> np.ndarray:
    """Map raw Detail category ids to 0..59 indices (0 = background).

    Reference pascal_ctx.py:78-84 — note the reference's ``self._key`` is
    never assigned there (a latent bug inherited from upstream HRNet, where
    ``_key = arange(len(_mapping))``); this implements that working
    definition. Ids outside the 59-class subset map to background."""
    mapping = PASCAL_CTX_59_MAPPING
    flat = mask.ravel()
    index = np.digitize(flat, mapping, right=True)
    # digitize returns len(mapping) for values > max; values not exactly in
    # the table belong to dropped categories -> background
    index = np.where(
        (index < len(mapping)) & np.isin(flat, mapping), index, 0)
    return index.astype(np.uint8).reshape(mask.shape)


def preprocess_masks(root: str, phase: str,
                     out_dir: Optional[str] = None) -> str:
    """Rasterize every mask of a split to 59-class-indexed PNGs (once),
    returning the dir.

    The reference caches index masks to a torch .pth (pascal_ctx.py:86-96);
    uint8 PNGs keep the pipeline torch-free and let the list files point
    straight at them (the PASCALContext dataset's convert_label then does
    the -1 / ignore shift)."""
    import cv2

    voc = os.path.join(root, "pascal_ctx", "VOCdevkit", "VOC2010")
    detail = DetailLite(os.path.join(voc, "trainval_merged.json"),
                        os.path.join(voc, "JPEGImages"), phase)
    out_dir = out_dir or os.path.join(voc, f"context_masks_{phase}")
    os.makedirs(out_dir, exist_ok=True)
    for img in detail.getImgs():
        stem = os.path.splitext(img["file_name"])[0]
        out = os.path.join(out_dir, stem + ".png")
        if os.path.exists(out):
            continue
        cv2.imwrite(out, class_to_index(detail.getMask(img)))
    return out_dir
