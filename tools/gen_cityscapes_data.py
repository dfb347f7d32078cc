"""Build the Cityscapes video-clip dataset from raw leftImg8bit_sequence
frames (reference tools/gen_cityscapes_data.py).

Groups raw frames into 30-frame per-video clips (splitting longer sequences
into 'Reorg' chunks), resizes to --width x --height, and writes one zip per
video with frames named ``{:06d}_<suffix>.png`` plus train/test list files —
the layout CityscapesSequence consumes.

    python tools/gen_cityscapes_data.py --root /data/cityscapes/leftImg8bit_sequence \
        --out-zips data/cityscapes_sequence --width 512 --height 256
"""

import argparse
import glob
import io
import os
import zipfile
from collections import defaultdict

from PIL import Image

FRAMES_PER_VIDEO = 30


def group_videos(split_dirs):
    """Group frame files by <city>_<seq> key into 30-frame videos, chunking
    longer sequences (reference gen_cityscapes_data.py:10-58)."""
    files = []
    for d in split_dirs:
        files += glob.glob(os.path.join(d, "*", "*"))
    by_key = defaultdict(list)
    for f in files:
        key = "_".join(os.path.basename(f).split("_")[0:2])
        by_key[key].append(f)

    videos = {}
    for key, items in by_key.items():
        items = sorted(items)
        videos[key] = items[:FRAMES_PER_VIDEO]
        for i in range(1, len(items) // FRAMES_PER_VIDEO):
            new_key = "".join(key.split("_")) + f"Reorg_{i - 1:06d}"
            videos[new_key] = items[i * FRAMES_PER_VIDEO:
                                    (i + 1) * FRAMES_PER_VIDEO]
    return {k: v for k, v in videos.items() if len(v) == FRAMES_PER_VIDEO}


def write_zips(videos, out_dir, width, height):
    os.makedirs(out_dir, exist_ok=True)
    names = []
    for idx, (key, files) in enumerate(sorted(videos.items())):
        zip_name = key + ".zip"
        with zipfile.ZipFile(os.path.join(out_dir, zip_name), "w") as zf:
            for n, item in enumerate(files):
                try:
                    im = Image.open(item).resize((width, height))
                except Exception:
                    print(f"\nFailed to open/resize {key}/{item}")
                    continue
                suffix = os.path.basename(item).split("_")[-1]
                arcname = f"{n:06d}_{suffix}"
                buf = io.BytesIO()
                im.save(buf, format="PNG")
                zf.writestr(arcname, buf.getvalue())
        names.append(zip_name)
        print(f"\r{idx + 1}/{len(videos)}", end="", flush=True)
    print()
    return names


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True,
                    help="leftImg8bit_sequence root (train/val/test subdirs)")
    ap.add_argument("--out-zips", required=True)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=256)
    args = ap.parse_args()

    trainval = group_videos([os.path.join(args.root, "train"),
                             os.path.join(args.root, "val")])
    test = group_videos([os.path.join(args.root, "test")])

    train_names = write_zips(trainval, args.out_zips, args.width, args.height)
    test_names = write_zips(test, args.out_zips, args.width, args.height)

    with open(os.path.join(args.out_zips, "trainval_list.text"), "w") as f:
        f.write("\n".join(train_names) + "\n")
    with open(os.path.join(args.out_zips, "test_list.text"), "w") as f:
        f.write("\n".join(test_names) + "\n")
    print(f"{len(train_names)} train / {len(test_names)} test videos")


if __name__ == "__main__":
    main()
