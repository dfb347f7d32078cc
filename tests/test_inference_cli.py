"""End-to-end CLI test for the 5-clip momentum-sampling inference path.

Drives the SHIPPED tools/inference.py with ``--clip-num 5
--sampling-mode momentum_sampling`` (reference tools/inference.py eval
windows, lib/core/function.py:109-115: the posterior is conditioned on the
PREVIOUS window's clips) against the committed synthetic fixture and a
fresh-init checkpoint, asserting the full chain — 5-clip dataset layout,
loader split, momentum sampler, metric txt dumps — runs and produces
finite metrics.
"""

import glob
import os
import subprocess
import sys

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = "experiments/cityscapes/debug_tiny_32x64.yaml"
DATA = "data/synthetic64"


def test_inference_cli_momentum_5clip(tmp_path):
    from vae2_tpu.config import get_default_config
    from vae2_tpu.core.builder import build_system
    from vae2_tpu.utils.checkpoint import save_checkpoint

    # fresh-init checkpoint compatible with the tiny debug config
    cfg = get_default_config()
    cfg.merge_from_file(os.path.join(REPO, CFG))
    system = build_system(cfg)
    batch = {k: jnp.zeros((1, 32, 64, 9), jnp.float32)
             for k in ("xt", "x2t", "x3t")}
    state = system.init(jax.random.PRNGKey(0), batch)
    ckpt = str(tmp_path / "init.msgpack")
    save_checkpoint(ckpt, state, epoch=0)

    out_dir = str(tmp_path / "out")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "inference.py"),
         "--cfg", CFG, "--checkpoint", ckpt,
         "--num-samples", "2", "--clip-num", "5",
         "--sampling-mode", "momentum_sampling", "--no-images",
         "OUTPUT_DIR", out_dir,
         "DATASET.ROOT", DATA,
         "DATASET.TRAIN_SET", f"{DATA}/train_list.txt",
         "DATASET.TEST_SET", f"{DATA}/test_list.txt",
         "TEST.NUM_SAMPLES", "1", "TEST.BATCH_SIZE_PER_GPU", "1",
         "TPU.INFER_SAMPLE_BATCH", "2", "WORKERS", "1",
         "TPU.LAYER_SUMMARY", "False"],
        cwd=REPO, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-3000:]

    txts = glob.glob(os.path.join(
        out_dir, "cityscapessequence", "debug_tiny_32x64", "vis", "epoch0",
        "*", "x2tpredict", "x2t_*_*.txt"))
    assert txts, "momentum inference produced no metric txt dumps"
    vals = [float(line) for line in open(txts[0])]
    assert len(vals) == 2, "expected one metric row per prior sample"
    assert all(v == v for v in vals), f"NaN metric in {txts[0]}"
