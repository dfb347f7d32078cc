"""North-star verification loop: train -> inference -> statistic -> FID.

Drives the full reference workflow (SURVEY §3.2; reference tools/train.py ->
tools/inference.py -> tools/statistic.py -> tools/fid_score.py) end to end
through the SHIPPED CLIs — each stage is a subprocess invocation, exactly as a
user would run it — and records a per-epoch metric trajectory proving the
chain is closed: checkpoints round-trip between train and inference, metric
dumps parse through the aggregator, and the metrics improve as training
progresses.

By default uses the tiny 32x64 synthetic recipe so the whole loop runs in
minutes. FID uses the random-init inception fallback (no weights file in this
container — vae2_tpu/eval/fid.py) which is self-consistent: lower still means
"closer to the real-frame distribution under a fixed random feature map".

    python tools/northstar_loop.py --epochs 4 --num-samples 8 \
        [--trajectory-out docs/northstar_tiny.json]

Exit code is non-zero if the last epoch does not improve on the first
(x2 prediction L1 down AND MS-SSIM up).
"""

import argparse
import json
import os
import subprocess
import sys

import _init_paths  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.dirname(os.path.abspath(__file__))


def run(cmd, **kw):
    print("+", " ".join(cmd), flush=True)
    proc = subprocess.run(cmd, cwd=REPO, **kw)
    if proc.returncode != 0:
        raise SystemExit(f"stage failed ({proc.returncode}): {' '.join(cmd)}")
    return proc


def run_is(root, pattern):
    """Inception Score of the generated frames (random-init inception
    fallback in this container — the key carries the tag, like FID's).

    IS is an auxiliary metric: any failure (e.g. --num-samples below the
    IS batch size, a transient error) records None rather than aborting
    the multi-hour trajectory loop."""
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(TOOLS, "inception_score.py"),
             "--path", root, "--pattern", pattern, "--batch-size", "16",
             "--splits", "2"],
            cwd=REPO, capture_output=True, text=True)
        if proc.returncode != 0:
            raise RuntimeError(f"rc={proc.returncode}: {proc.stderr[-2000:]}")
        for line in proc.stdout.splitlines():
            if line.startswith("IS:"):
                return float(line.split()[1])
        raise RuntimeError(f"no IS line in output:\n{proc.stdout[-2000:]}")
    except Exception as e:  # noqa: BLE001
        print(f"# inception_score skipped for this row: {e}", flush=True)
        return None


def run_fid(gen_root, real_root, gen_pattern, real_pattern):
    proc = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "fid_score.py"),
         "--path", gen_root, real_root,
         "--path_patterns", gen_pattern, real_pattern,
         "--batch-size", "16"],
        cwd=REPO, capture_output=True, text=True)
    if proc.returncode != 0:
        raise SystemExit(f"fid_score failed: {proc.stderr[-2000:]}")
    for line in proc.stdout.splitlines():
        if line.startswith("FID:"):
            return float(line.split()[-1])
    raise SystemExit(f"no FID line in output:\n{proc.stdout[-2000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg",
                    default="experiments/cityscapes/debug_tiny_32x64.yaml")
    ap.add_argument("--epochs", default=4, type=int)
    ap.add_argument("--num-samples", default=8, type=int,
                    help="prior samples per eval clip at inference")
    ap.add_argument("--eval-clips", default=4, type=int,
                    help="TEST.NUM_SAMPLES: eval clips per epoch")
    ap.add_argument("--data", default="data/synthetic")
    ap.add_argument("--out", default="output_northstar",
                    help="OUTPUT_DIR override (isolated from other runs)")
    ap.add_argument("--trajectory-out", default="")
    ap.add_argument("--eval-epoch0", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="evaluate the untrained init as the epoch-0 row")
    ap.add_argument("--one-shot", action="store_true",
                    help="train all epochs in ONE process (snapshots every "
                         "epochs/eval-points), then evaluate every snapshot "
                         "in ONE inference process — one train compile + one "
                         "inference compile for the whole trajectory, vs one "
                         "of each per epoch in the default mode")
    ap.add_argument("--eval-points", default=4, type=int,
                    help="number of trajectory points in --one-shot mode")
    ap.add_argument("--resume", action="store_true",
                    help="continue an interrupted --one-shot run: keep the "
                         "existing checkpoint dir, skip the epoch-0 "
                         "(re)train, and let AUTO_RESUME pick training up "
                         "from checkpoint.msgpack")
    ap.add_argument("opts", nargs=argparse.REMAINDER,
                    help="extra KEY VALUE config overrides forwarded to "
                         "every train/inference stage (e.g. PRINT_FREQ 3 "
                         "TRAIN.LR_SCHEDULE poly)")
    args = ap.parse_args()
    if args.opts and args.opts[0] == "--":
        args.opts = args.opts[1:]
    if len(args.opts) % 2:
        raise SystemExit(f"opts must be KEY VALUE pairs, got {args.opts}")

    cfg_name = os.path.basename(args.cfg).split(".")[0]

    # create_logger nests output under DATASET.DATASET — read it from the
    # cfg so UCF (ucfsequence) recipes drive the same loop
    import yaml
    with open(os.path.join(REPO, args.cfg)) as f:
        dataset_name = (yaml.safe_load(f).get("DATASET") or {}).get(
            "DATASET", "cityscapessequence")
    if not os.path.isfile(os.path.join(REPO, args.data, "train_list.txt")):
        run([sys.executable, os.path.join(TOOLS, "gen_synthetic_data.py"),
             "--out", args.data, "--num-videos", "16",
             "--width", "64", "--height", "32"])

    common_opts = ["OUTPUT_DIR", args.out, "DATASET.ROOT", args.data,
                   "DATASET.TRAIN_SET", f"{args.data}/train_list.txt",
                   "DATASET.TEST_SET", f"{args.data}/test_list.txt",
                   "TPU.LAYER_SUMMARY", "False"] + list(args.opts)
    # create_logger: OUTPUT_DIR / dataset / cfg_name
    final_dir = os.path.join(REPO, args.out, dataset_name, cfg_name)

    import shutil

    def run_train(end_epoch, extra=()):
        cmd = [sys.executable, os.path.join(TOOLS, "train.py"),
               "--cfg", args.cfg] + common_opts \
            + ["TRAIN.END_EPOCH", str(end_epoch), "AUTO_RESUME", "True"]
        if end_epoch == 0:
            # the untrained-init run must train NOTHING (END_EPOCH +
            # EXTRA_EPOCH epochs would run otherwise)
            cmd += ["TRAIN.EXTRA_EPOCH", "0"]
        run(cmd + list(extra))

    def run_inference_cli(ckpt=""):
        cmd = [sys.executable, os.path.join(TOOLS, "inference.py"),
               "--cfg", args.cfg, "--num-samples", str(args.num_samples)]
        if ckpt:
            cmd += ["--checkpoint", ckpt]
        run(cmd + common_opts + ["TEST.NUM_SAMPLES", str(args.eval_clips)])

    if args.eval_epoch0 and not args.resume and os.path.isfile(
            os.path.join(final_dir, "checkpoint.msgpack")):
        raise SystemExit(
            f"{final_dir} already holds a checkpoint — the epoch-0 baseline "
            "would silently evaluate trained weights. Use a fresh --out "
            "(or --resume to continue an interrupted one-shot run).")
    if args.resume:
        if not args.one_shot:
            raise SystemExit("--resume only applies to --one-shot runs")
        if args.eval_epoch0 and not os.path.isfile(
                os.path.join(final_dir, "checkpoint_epoch0000.msgpack")):
            raise SystemExit(
                f"--resume with epoch-0 row needs "
                f"{final_dir}/checkpoint_epoch0000.msgpack from the "
                "interrupted run")

    trajectory = []

    def eval_epoch(epoch):
        """stats + FID over the inference dump of one epoch -> one row."""
        vis = os.path.join(final_dir, "vis", f"epoch{epoch}")
        if not os.path.isdir(vis):
            raise SystemExit(f"inference produced no dump at {vis}")
        meanvar = {}
        for cand in ("x2t", "x3t"):
            stats_json = os.path.join(vis, f"meanvar_{cand}.json")
            run([sys.executable, os.path.join(TOOLS, "statistic.py"),
                 "--root", vis, "--mode", "meanvar", "--candidate", cand,
                 "--out", stats_json], stdout=subprocess.DEVNULL)
            with open(stats_json) as f:
                meanvar[cand] = json.load(f)
        best_json = os.path.join(vis, "bestsample.json")
        run([sys.executable, os.path.join(TOOLS, "statistic.py"),
             "--root", vis, "--mode", "bestsample", "--candidate", "x2t",
             "--points", f"1,{args.num_samples}", "--out", best_json],
            stdout=subprocess.DEVNULL)
        fid = run_fid(vis, vis, "*/x2tpredict/*.png", "*/x2t_*.png")
        is_mean = run_is(vis, "x2tpredict/*.png")
        row = {
            "epoch": epoch,
            "x2_l1": meanvar["x2t"]["1_reconloss"][0],
            "x2_msssim": meanvar["x2t"]["1_msssimloss"][0],
            "x2_psnr": meanvar["x2t"]["1_psnrloss"][0],
            "x3_l1": meanvar["x3t"]["1_reconloss"][0],
            "fid_x2_random_inception": fid,
            "is_x2_random_inception": is_mean,
        }
        trajectory.append(row)
        print(json.dumps(row), flush=True)
        if args.trajectory_out:  # write incrementally — survive cutoffs
            with open(os.path.join(REPO, args.trajectory_out), "w") as f:
                json.dump(trajectory, f, indent=2)

    if args.one_shot:
        stride = max(1, args.epochs // args.eval_points)
        points = sorted(set(range(stride, args.epochs + 1, stride))
                        | {args.epochs})
        if args.eval_epoch0:
            if not args.resume:
                # untrained init snapshot (epoch 0)
                run_train(0)
                shutil.copy(
                    os.path.join(final_dir, "model_final_state.msgpack"),
                    os.path.join(final_dir, "checkpoint_epoch0000.msgpack"))
            points = [0] + points
        # the whole training run, snapshotting every ``stride`` epochs
        run_train(args.epochs, ["TRAIN.SNAPSHOT_EVERY", str(stride)])
        ckpts = []
        for e in points:
            p = os.path.join(final_dir, f"checkpoint_epoch{e:04d}.msgpack")
            if not os.path.isfile(p):
                if e != args.epochs:
                    # fail BEFORE the expensive inference pass: a substitute
                    # checkpoint would dump under its own stored epoch and
                    # eval_epoch(e) would die afterwards
                    raise SystemExit(f"missing snapshot {p}")
                p = os.path.join(final_dir, "checkpoint.msgpack")
            ckpts.append(p)
        run_inference_cli(",".join(ckpts))
        for e in points:
            eval_epoch(e)
    else:
        epochs = ([0] if args.eval_epoch0 else []) + \
            list(range(1, args.epochs + 1))
        for epoch in epochs:
            # one more epoch, resuming from the previous checkpoint. Epoch 0
            # trains nothing and saves the untrained init — the baseline row
            # that makes improvement across the trajectory measurable.
            run_train(epoch)
            if epoch == 0:
                # inference reads checkpoint.msgpack; epoch 0 only writes
                # model_final_state.msgpack
                shutil.copy(
                    os.path.join(final_dir, "model_final_state.msgpack"),
                    os.path.join(final_dir, "checkpoint.msgpack"))
            run_inference_cli()
            eval_epoch(epoch)

    print("\nepoch |   x2 L1  | x2 MS-SSIM | x2 PSNR |   FID")
    for r in trajectory:
        print(f"{r['epoch']:5d} | {r['x2_l1']:8.3f} | {r['x2_msssim']:10.4f} "
              f"| {r['x2_psnr']:7.3f} | {r['fid_x2_random_inception']:8.3f}")

    if args.trajectory_out:
        with open(os.path.join(REPO, args.trajectory_out), "w") as f:
            json.dump(trajectory, f, indent=2)

    first, last = trajectory[0], trajectory[-1]
    improved = (last["x2_l1"] < first["x2_l1"]
                and last["x2_msssim"] > first["x2_msssim"])
    print(f"\nimproved first->last: {improved} "
          f"(L1 {first['x2_l1']:.3f}->{last['x2_l1']:.3f}, "
          f"MS-SSIM {first['x2_msssim']:.4f}->{last['x2_msssim']:.4f}, "
          f"FID {first['fid_x2_random_inception']:.3f}->"
          f"{last['fid_x2_random_inception']:.3f})")
    if not improved:
        raise SystemExit("north-star loop: metrics did not improve")


if __name__ == "__main__":
    main()
