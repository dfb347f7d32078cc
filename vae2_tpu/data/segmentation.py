"""Legacy semantic-segmentation datasets (reference lib/datasets/
base_dataset.py, cityscapes.py:1-204, lip.py, pascal_ctx.py).

Host side: cv2 decode, BGR->RGB, /255 + ImageNet normalize
(base_dataset.py:41-46), multi-scale + flip augmentation with pad/rand-crop
(base_dataset.py:51-147). Samples are returned as float32 NHWC images and
int32 label maps with ignore_label=-1 padding. Eval-time TTA lives in
vae2_tpu/core/seg_loop.py (jitted fixed-size window inference).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import cv2
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

# 34-class -> 19-class training id mapping (standard Cityscapes label defs;
# reference cityscapes.py:256-267)
CITYSCAPES_LABEL_MAP = {
    -1: -1, 0: -1, 1: -1, 2: -1, 3: -1, 4: -1, 5: -1, 6: -1,
    7: 0, 8: 1, 9: -1, 10: -1, 11: 2, 12: 3, 13: 4, 14: -1, 15: -1,
    16: -1, 17: 5, 18: -1, 19: 6, 20: 7, 21: 8, 22: 9, 23: 10, 24: 11,
    25: 12, 26: 13, 27: 14, 28: 15, 29: -1, 30: -1, 31: 16, 32: 17, 33: 18,
}

# per-class loss weights (reference cityscapes.py:236-240)
CITYSCAPES_CLASS_WEIGHTS = np.array(
    [0.8373, 0.918, 0.866, 1.0345, 1.0166, 0.9969, 0.9754, 1.0489,
     0.8786, 1.0023, 0.9539, 0.9843, 1.1116, 0.9037, 1.0865, 1.0955,
     1.0865, 1.1529, 1.0507], np.float32)


class SegDataset:
    """Base segmentation dataset with the reference augmentation pipeline."""

    def __init__(self, root: str, list_path: str, num_classes: int = 19,
                 multi_scale: bool = True, flip: bool = True,
                 ignore_label: int = -1, base_size: int = 2048,
                 crop_size: Tuple[int, int] = (512, 1024),
                 downsample_rate: float = 1, scale_factor: int = 16,
                 num_samples: Optional[int] = None, seed: int = 0):
        self.root = root
        self.list_path = list_path
        self.num_classes = num_classes
        self.multi_scale = multi_scale
        self.flip = flip
        self.ignore_label = ignore_label
        self.base_size = base_size
        self.crop_size = tuple(crop_size)
        self.downsample_rate = downsample_rate
        self.scale_factor = scale_factor
        self.rng = np.random.RandomState(seed)
        self.files = self.read_files()
        if num_samples:
            self.files = self.files[:num_samples]
        self.class_weights: Optional[np.ndarray] = None
        # (left, right) class pairs whose logits swap under flip TTA
        self.flip_pairs: Optional[list] = None

    def read_files(self) -> List[dict]:
        files = []
        with open(self.list_path) as f:
            for line in f:
                parts = line.strip().split()
                if not parts:
                    continue
                if len(parts) == 1:  # test split: image only
                    files.append({"img": parts[0],
                                  "name": os.path.splitext(
                                      os.path.basename(parts[0]))[0]})
                else:
                    files.append({"img": parts[0], "label": parts[1],
                                  "name": os.path.splitext(
                                      os.path.basename(parts[0]))[0]})
        return files

    def __len__(self) -> int:
        return len(self.files)

    # -- transforms (base_dataset.py:41-147) --------------------------------

    def input_transform(self, image: np.ndarray) -> np.ndarray:
        image = image.astype(np.float32)[:, :, ::-1]  # BGR -> RGB
        image = image / 255.0
        return (image - IMAGENET_MEAN) / IMAGENET_STD

    def label_transform(self, label: np.ndarray) -> np.ndarray:
        return np.array(label).astype(np.int32)

    def pad_image(self, image, h, w, size, padvalue):
        pad_h = max(size[0] - h, 0)
        pad_w = max(size[1] - w, 0)
        if pad_h > 0 or pad_w > 0:
            image = cv2.copyMakeBorder(image, 0, pad_h, 0, pad_w,
                                       cv2.BORDER_CONSTANT, value=padvalue)
        return image

    def rand_crop(self, image, label):
        h, w = image.shape[:2]
        image = self.pad_image(image, h, w, self.crop_size, (0.0, 0.0, 0.0))
        label = self.pad_image(label, h, w, self.crop_size,
                               (self.ignore_label,))
        new_h, new_w = label.shape
        x = self.rng.randint(0, new_w - self.crop_size[1] + 1)
        y = self.rng.randint(0, new_h - self.crop_size[0] + 1)
        return (image[y: y + self.crop_size[0], x: x + self.crop_size[1]],
                label[y: y + self.crop_size[0], x: x + self.crop_size[1]])

    def multi_scale_aug(self, image, label=None, rand_scale=1.0,
                        rand_crop=True):
        long_size = int(self.base_size * rand_scale + 0.5)
        h, w = image.shape[:2]
        if h > w:
            new_h, new_w = long_size, int(w * long_size / h + 0.5)
        else:
            new_w, new_h = long_size, int(h * long_size / w + 0.5)
        image = cv2.resize(image, (new_w, new_h),
                           interpolation=cv2.INTER_LINEAR)
        if label is None:
            return image
        label = cv2.resize(label, (new_w, new_h),
                           interpolation=cv2.INTER_NEAREST)
        if rand_crop:
            image, label = self.rand_crop(image, label)
        return image, label

    def gen_sample(self, image, label, multi_scale=True, is_flip=True,
                   center_crop_test=False):
        if multi_scale:
            rand_scale = 0.5 + self.rng.randint(0, self.scale_factor) / 10.0
            image, label = self.multi_scale_aug(image, label, rand_scale)
        image = self.input_transform(image)
        label = self.label_transform(label)
        if is_flip:
            flip = self.rng.choice([-1, 1])
            image = image[:, ::flip, :]
            label = label[:, ::flip]
        if self.downsample_rate != 1:
            label = cv2.resize(
                label.astype(np.float32), None, fx=self.downsample_rate,
                fy=self.downsample_rate,
                interpolation=cv2.INTER_NEAREST).astype(np.int32)
        return np.ascontiguousarray(image), np.ascontiguousarray(label)

    def convert_label(self, label, inverse=False):
        return label

    def __getitem__(self, index: int):
        item = self.files[index]
        image = cv2.imread(os.path.join(self.root, item["img"]),
                           cv2.IMREAD_COLOR)
        size = image.shape
        if "label" not in item:
            image = self.input_transform(image)
            return image, np.array(size), item["name"]
        label = cv2.imread(os.path.join(self.root, item["label"]),
                           cv2.IMREAD_GRAYSCALE)
        label = self.convert_label(label)
        image, label = self.gen_sample(image, label, self.multi_scale,
                                       self.flip)
        return image, label, np.array(size), item["name"]


class CityscapesSeg(SegDataset):
    """19-class Cityscapes segmentation (reference cityscapes.py:22-204)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.class_weights = CITYSCAPES_CLASS_WEIGHTS

    def convert_label(self, label, inverse=False):
        # int32 working copy: the ignore label is -1 and raw labels arrive as
        # uint8 from cv2 (would overflow on assignment)
        label = label.astype(np.int32)
        temp = label.copy()
        if inverse:
            for v, k in CITYSCAPES_LABEL_MAP.items():
                label[temp == k] = v
        else:
            for k, v in CITYSCAPES_LABEL_MAP.items():
                label[temp == k] = v
        return label

    @staticmethod
    def get_palette(n: int) -> List[int]:
        """Bit-interleaved PASCAL-style palette (cityscapes.py:380-394)."""
        palette = [0] * (n * 3)
        for j in range(n):
            lab = j
            i = 0
            while lab:
                palette[j * 3 + 0] |= (((lab >> 0) & 1) << (7 - i))
                palette[j * 3 + 1] |= (((lab >> 1) & 1) << (7 - i))
                palette[j * 3 + 2] |= (((lab >> 2) & 1) << (7 - i))
                i += 1
                lab >>= 3
        return palette

    def save_pred(self, preds: np.ndarray, sv_path: str, names: List[str]):
        from PIL import Image

        palette = self.get_palette(256)
        preds = np.asarray(np.argmax(preds, axis=-1), dtype=np.uint8)
        for i in range(preds.shape[0]):
            pred = self.convert_label(preds[i], inverse=True)
            pred = np.clip(pred, 0, 255).astype(np.uint8)
            save_img = Image.fromarray(pred)
            save_img.putpalette(palette)
            save_img.save(os.path.join(sv_path, names[i] + ".png"))


# left/right paired part labels for flip handling (reference lip.py:87-99)
LIP_RIGHT_IDX = [15, 17, 19]
LIP_LEFT_IDX = [14, 16, 18]


class LIP(SegDataset):
    """LIP human-parsing dataset (reference lip.py:16-131): 20 classes,
    left/right label swap when flipping."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        # flip-TTA channel swap at inference (lip.py:107-130)
        self.flip_pairs = list(zip(LIP_LEFT_IDX, LIP_RIGHT_IDX))

    def read_files(self) -> List[dict]:
        files = []
        with open(self.list_path) as f:
            for line in f:
                parts = line.strip().split()
                if not parts:
                    continue
                files.append({
                    "img": parts[0],
                    "label": parts[1] if len(parts) > 1 else None,
                    "name": os.path.splitext(os.path.basename(parts[0]))[0],
                })
        return files

    def gen_sample(self, image, label, multi_scale=True, is_flip=True,
                   center_crop_test=False):
        if multi_scale:
            rand_scale = 0.5 + self.rng.randint(0, self.scale_factor) / 10.0
            image, label = self.multi_scale_aug(image, label, rand_scale)
        image = self.input_transform(image)
        label = self.label_transform(label)
        if is_flip and self.rng.choice([0, 1]):
            image = image[:, ::-1, :]
            label = label[:, ::-1]
            # swap left/right part labels (lip.py:92-97)
            tmp = label.copy()
            for r, l in zip(LIP_RIGHT_IDX, LIP_LEFT_IDX):
                label[tmp == r] = l
                label[tmp == l] = r
        return np.ascontiguousarray(image), np.ascontiguousarray(label)

    def __getitem__(self, index: int):
        item = self.files[index]
        image = cv2.imread(os.path.join(self.root, item["img"]),
                           cv2.IMREAD_COLOR)
        size = image.shape
        if item.get("label") is None:
            image = self.input_transform(image)
            return image, np.array(size), item["name"]
        label = cv2.imread(os.path.join(self.root, item["label"]),
                           cv2.IMREAD_GRAYSCALE)
        image, label = self.gen_sample(image, label, self.multi_scale,
                                       self.flip)
        return image, label, np.array(size), item["name"]


class PASCALContext(SegDataset):
    """PASCAL-Context 59/60-class segmentation (reference pascal_ctx.py).

    The reference depends on the external ``detail`` API to rasterize masks
    and caches them to a .pth (pascal_ctx.py:86-96). Here labels come as
    59-class-indexed PNGs listed in the list file, produced once by
    ``tools/gen_pascal_ctx_masks.py`` (vae2_tpu/data/pascal_detail.py — the
    in-repo Detail-lite rasterizer); everything else follows the base
    pipeline.
    """

    def __init__(self, *args, mode: int = 59, **kwargs):
        self.mode = mode
        super().__init__(*args, **kwargs)

    def convert_label(self, label, inverse=False):
        if self.mode == 59:
            # class 0 (background of the 60-class set) -> ignore; shift by -1
            label = label.astype(np.int32)
            if inverse:
                return label + 1
            label = label - 1
            label[label == -1] = self.ignore_label
        return label


def make_seg_dataset(config, list_path: str, train: bool = True,
                     num_samples: Optional[int] = None):
    """Instantiate by config alias (reference lib/datasets/__init__.py)."""
    name = config.DATASET.DATASET.lower()
    crop = (config.TRAIN.IMAGE_SIZE[1], config.TRAIN.IMAGE_SIZE[0]) if train \
        else (config.TEST.IMAGE_SIZE[1], config.TEST.IMAGE_SIZE[0])
    common = dict(
        root=config.DATASET.ROOT,
        list_path=list_path,
        num_classes=config.DATASET.NUM_CLASSES,
        multi_scale=config.TRAIN.MULTI_SCALE if train else False,
        flip=config.TRAIN.FLIP if train else False,
        ignore_label=config.TRAIN.IGNORE_LABEL,
        base_size=config.TRAIN.BASE_SIZE if train else config.TEST.BASE_SIZE,
        crop_size=crop,
        downsample_rate=config.TRAIN.DOWNSAMPLERATE if train else 1,
        scale_factor=config.TRAIN.SCALE_FACTOR,
        num_samples=num_samples,
    )
    if name == "cityscapes":
        return CityscapesSeg(**common)
    if name == "lip":
        return LIP(**common)
    if name == "pascal_ctx":
        return PASCALContext(**common)
    raise KeyError(f"Unknown segmentation dataset: {name}")
