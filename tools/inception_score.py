"""Inception Score CLI (reference tools/inception_score.py). Core in
vae2_tpu.eval.is_score.

    python tools/inception_score.py --path <dir> --pattern '*x3t*' --splits 10
"""

import argparse

import _init_paths  # noqa: F401
from vae2_tpu.eval.is_score import collect_files, inception_score


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--path", type=str, required=True)
    parser.add_argument("--pattern", type=str, default="*.png",
                        help="filename glob to select generated frames")
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--splits", type=int, default=10)
    parser.add_argument("--weights", type=str, default="")
    args = parser.parse_args()

    files = collect_files(args.path, args.pattern)
    print(f"Computing Inception Score over {len(files)} images...")
    mean, std = inception_score(files, args.weights, args.batch_size,
                                args.splits)
    print(f"IS: {mean} +/- {std}")


if __name__ == "__main__":
    main()
