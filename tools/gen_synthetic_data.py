"""Generate a synthetic video dataset in the Cityscapes-sequence zip layout.

Creates N "videos" of 30 frames each — moving colored rectangles over a
gradient background with deterministic per-video motion — packaged exactly
like the output of gen_cityscapes_data.py (one zip per video with frames
named ``{:06d}_leftImg8bit.png`` plus train/test list files), so the full
clip pipeline, training, and inference stack can run end-to-end without the
real Cityscapes download.

    python tools/gen_synthetic_data.py --out data/synthetic --num-videos 32 \
        --width 256 --height 128
"""

import argparse
import io
import os
import zipfile

import numpy as np
from PIL import Image


def render_frame(t: int, h: int, w: int, rng_params: dict) -> np.ndarray:
    """A frame with smooth, learnable motion: drifting background gradient
    plus two moving rectangles."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    phase = rng_params["phase"]
    img = np.zeros((h, w, 3), np.float32)
    img[..., 0] = 0.5 + 0.4 * np.sin(2 * np.pi * (xx / w + 0.02 * t + phase))
    img[..., 1] = 0.5 + 0.4 * np.cos(2 * np.pi * (yy / h - 0.015 * t + phase))
    img[..., 2] = 0.5 + 0.3 * np.sin(2 * np.pi * (xx / w + yy / h + 0.01 * t))

    for rect in rng_params["rects"]:
        cx = (rect["x0"] + rect["vx"] * t) % w
        cy = (rect["y0"] + rect["vy"] * t) % h
        x0, x1 = int(cx), int(min(cx + rect["w"], w))
        y0, y1 = int(cy), int(min(cy + rect["h"], h))
        img[y0:y1, x0:x1] = rect["color"]

    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def make_video_params(seed: int) -> dict:
    rng = np.random.RandomState(seed)
    rects = []
    for _ in range(2):
        rects.append({
            "x0": rng.uniform(0, 1) * 200,
            "y0": rng.uniform(0, 1) * 100,
            "vx": rng.uniform(1.0, 4.0),
            "vy": rng.uniform(-1.5, 1.5),
            "w": rng.randint(10, 30),
            "h": rng.randint(8, 24),
            "color": rng.uniform(0, 1, size=3).astype(np.float32),
        })
    return {"phase": rng.uniform(0, 1), "rects": rects}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/synthetic")
    ap.add_argument("--num-videos", type=int, default=32)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--test-fraction", type=float, default=0.25)
    ap.add_argument("--layout", choices=["cityscapes", "ucf"],
                    default="cityscapes",
                    help="cityscapes: one zip of 30 PNGs per video; "
                         "ucf: per-video dir with RGB_frames.zip of "
                         "1-indexed JPEGs + '<dir> <length>' list lines")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    names = []
    for v in range(args.num_videos):
        params = make_video_params(seed=1234 + v)
        if args.layout == "cityscapes":
            zip_name = f"synthetic_{v:04d}.zip"
            with zipfile.ZipFile(os.path.join(args.out, zip_name), "w") as zf:
                for t in range(args.frames):
                    frame = render_frame(t, args.height, args.width, params)
                    buf = io.BytesIO()
                    Image.fromarray(frame).save(buf, format="PNG")
                    zf.writestr(f"{t:06d}_leftImg8bit.png", buf.getvalue())
            names.append(zip_name)
        else:
            vid_dir = f"v_synth_{v:04d}"
            os.makedirs(os.path.join(args.out, vid_dir), exist_ok=True)
            with zipfile.ZipFile(
                    os.path.join(args.out, vid_dir, "RGB_frames.zip"),
                    "w") as zf:
                for t in range(args.frames):
                    frame = render_frame(t, args.height, args.width, params)
                    buf = io.BytesIO()
                    Image.fromarray(frame).save(buf, format="JPEG", quality=90)
                    zf.writestr(f"image_{t + 1:05d}.jpg", buf.getvalue())
            names.append(f"{vid_dir} {args.frames}")

    n_test = max(1, int(len(names) * args.test_fraction))
    with open(os.path.join(args.out, "train_list.txt"), "w") as f:
        f.write("\n".join(names[:-n_test]) + "\n")
    with open(os.path.join(args.out, "test_list.txt"), "w") as f:
        f.write("\n".join(names[-n_test:]) + "\n")
    print(f"Wrote {len(names) - n_test} train / {n_test} test videos to {args.out}")


if __name__ == "__main__":
    main()
