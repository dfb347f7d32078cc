"""Frechet Inception Distance CLI (reference tools/fid_score.py).

Core lives in vae2_tpu.eval.fid; see that module for semantics and the
weights-file requirement for bit-comparable numbers.

    python tools/fid_score.py --path gen_dir real_dir \
        [--path_patterns 'a/*' 'b/*'] [--weights pt_inception-....pth]
"""

import argparse

import _init_paths  # noqa: F401
from vae2_tpu.eval.fid import calculate_fid_given_paths


def main():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--path", type=str, nargs=2, required=True,
                        help="Two image dirs (or .npz stats files)")
    parser.add_argument("--path_patterns", type=str, nargs=2, default=None,
                        help="Optional glob patterns inside each path")
    parser.add_argument("--batch-size", type=int, default=50)
    parser.add_argument("--dims", type=int, default=2048,
                        help="kept for reference-CLI compat; pool3 only")
    parser.add_argument("--weights", type=str, default="",
                        help="pt_inception .pth for bit-comparable FID")
    args = parser.parse_args()

    patterns = tuple(args.path_patterns) if args.path_patterns else (None, None)
    fid = calculate_fid_given_paths(args.path, args.batch_size, patterns,
                                    args.weights)
    print("FID: ", fid)


if __name__ == "__main__":
    main()
