"""Inception Score core (reference tools/inception_score.py). CLI in
tools/inception_score.py.

Collects images matching a filename pattern (the reference copies matches
into an ImageFolder first, :23-29; we just glob), runs the torchvision-style
InceptionV3 classifier in JAX, and computes exp(E[KL(p(y|x) || p(y))]) over
N splits (:32-97).

Weights: pass --weights inception_v3_google-*.pth for comparable numbers;
random init otherwise (no egress in this container).

    python tools/inception_score.py --path <dir> --pattern '*x3t*' --splits 10
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image
from scipy.stats import entropy

from ..models.inception import get_inception, inception_forward


def collect_files(path, pattern):
    """Recursively gather matching images (replaces the reference's
    move_files staging step, :23-29)."""
    files = sorted(glob.glob(os.path.join(path, "**", pattern), recursive=True))
    return [f for f in files
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))]


def inception_score(files, weights="", batch_size=32, splits=10,
                    resize=(256, 128)):
    """exp(mean over splits of E[KL(p(y|x) || p(y))]) (reference :32-97)."""
    n = len(files)
    assert batch_size > 0 and n > batch_size, (
        f"need more than batch_size={batch_size} images, got {n}")

    params = get_inception(weights, with_fc=True)
    if not (weights and os.path.isfile(weights)):
        print("WARNING: no inception weights; IS uses a randomly initialized "
              "classifier and is NOT comparable to published numbers.")

    forward = jax.jit(lambda x: jax.nn.softmax(
        inception_forward(params, x, fid_variant=False, with_logits=True),
        axis=-1))

    preds = np.zeros((n, 1000), np.float32)
    for start in range(0, n, batch_size):
        chunk = files[start: start + batch_size]
        imgs = np.stack([
            np.asarray(Image.open(f).convert("RGB").resize(resize),
                       np.float32)[..., :3] / 255.0
            for f in chunk])
        m = imgs.shape[0]
        if m < batch_size:
            imgs = np.concatenate(
                [imgs, np.zeros((batch_size - m,) + imgs.shape[1:], np.float32)])
        p = np.asarray(forward(jnp.asarray(imgs)))
        preds[start: start + m] = p[:m]

    split_scores = []
    for k in range(splits):
        part = preds[k * (n // splits): (k + 1) * (n // splits)]
        py = np.mean(part, axis=0)
        scores = [entropy(pyx, py) for pyx in part]
        split_scores.append(np.exp(np.mean(scores)))
    return float(np.mean(split_scores)), float(np.std(split_scores))


