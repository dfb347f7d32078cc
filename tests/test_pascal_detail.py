"""Detail-lite PASCAL-Context rasterization (reference pascal_ctx.py:52-96,
re-implemented without the `detail` package)."""

import json
import os

import numpy as np
import pytest

from vae2_tpu.data.pascal_detail import (DetailLite, PASCAL_CTX_59_MAPPING,
                                         class_to_index, decode_rle_counts,
                                         preprocess_masks)


def _encode_rle(mask: np.ndarray) -> str:
    """COCO rleToString (pycocotools maskApi.c), for round-trip testing."""
    flat = mask.T.ravel()  # column-major
    cnts = []
    run = 0
    val = 0
    for v in flat:
        if v == val:
            run += 1
        else:
            cnts.append(run)
            run = 1
            val = v
    cnts.append(run)
    out = []
    for i, c in enumerate(cnts):
        x = int(c) - (int(cnts[i - 2]) if i > 2 else 0)
        more = True
        while more:
            ch = x & 0x1F
            x >>= 5
            more = (x != -1) if (ch & 0x10) else (x != 0)
            if more:
                ch |= 0x20
            out.append(chr(ch + 48))
    return "".join(out)


def test_decode_fixed_vector():
    # column-major runs [1, 2, 1] over a 2x2 grid -> [[0,1],[1,0]]
    got = decode_rle_counts("121", 2, 2)
    np.testing.assert_array_equal(got, [[0, 1], [1, 0]])


def test_decode_uncompressed_list():
    got = decode_rle_counts([1, 2, 1], 2, 2)
    np.testing.assert_array_equal(got, [[0, 1], [1, 0]])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_rle_roundtrip_random_masks(seed):
    rs = np.random.RandomState(seed)
    mask = (rs.rand(23, 17) > 0.6).astype(np.uint8)
    s = _encode_rle(mask)
    got = decode_rle_counts(s, 23, 17)
    np.testing.assert_array_equal(got, mask)


def test_class_to_index_maps_raw_ids():
    raw = np.array([[0, 2, 259], [415, 9, 999]], np.uint16)
    idx = class_to_index(raw)
    assert idx.dtype == np.uint8
    assert idx[0, 0] == 0  # background
    assert idx[0, 1] == int(np.searchsorted(PASCAL_CTX_59_MAPPING, 2))
    assert idx[0, 2] == int(np.searchsorted(PASCAL_CTX_59_MAPPING, 259))
    assert idx[1, 2] == 0  # unknown raw id -> background


def test_detail_lite_end_to_end(tmp_path):
    """Synthetic trainval_merged.json: one image, one RLE annotation and one
    polygon annotation -> rasterized 59-class PNG."""
    import cv2

    h, w = 12, 10
    rle_mask = np.zeros((h, w), np.uint8)
    rle_mask[2:5, 3:7] = 1
    data = {
        "images": [{"image_id": 7, "file_name": "2008_000001.jpg",
                    "height": h, "width": w, "phase": "train"}],
        "annos_segmentation": [
            {"image_id": 7, "category_id": 2,
             "segmentation": {"size": [h, w],
                              "counts": _encode_rle(rle_mask)}},
            {"image_id": 7, "category_id": 259,
             "segmentation": [[0.0, 8.0, 4.0, 8.0, 4.0, 11.0, 0.0, 11.0]]},
        ],
    }
    voc = tmp_path / "pascal_ctx" / "VOCdevkit" / "VOC2010"
    os.makedirs(voc / "JPEGImages")
    with open(voc / "trainval_merged.json", "w") as f:
        json.dump(data, f)

    d = DetailLite(str(voc / "trainval_merged.json"),
                   str(voc / "JPEGImages"), "train")
    assert len(d.getImgs()) == 1
    mask = d.getMask(d.getImgs()[0])
    assert mask[3, 4] == 2          # RLE region
    assert mask[9, 2] == 259        # polygon region
    assert mask[0, 0] == 0

    out_dir = preprocess_masks(str(tmp_path), "train")
    png = cv2.imread(os.path.join(out_dir, "2008_000001.png"),
                     cv2.IMREAD_UNCHANGED)
    assert png is not None
    idx2 = int(np.searchsorted(PASCAL_CTX_59_MAPPING, 2))
    idx259 = int(np.searchsorted(PASCAL_CTX_59_MAPPING, 259))
    assert png[3, 4] == idx2
    assert png[9, 2] == idx259
