"""Legacy segmentation evaluation CLI (reference tools/test.py).

Builds the seg HRNet, loads a checkpoint (msgpack, or a reference torch
.pth via the import bridge), and runs ``testval`` (mIoU with optional
multi-scale/flip TTA) or ``test`` (save predictions for label-free splits).

    python tools/test.py --cfg experiments/cityscapes/seg_hrnet_w48_...yaml \
        TEST.MODEL_FILE output/.../seg_final_state.msgpack
"""

import argparse
import os
import pprint

import jax
import jax.numpy as jnp

import _init_paths  # noqa: F401
from vae2_tpu.config import config, update_config
from vae2_tpu.core.seg_loop import seg_test, seg_testval
from vae2_tpu.data.segmentation import make_seg_dataset
from vae2_tpu.models.seg_hrnet import get_seg_model
from vae2_tpu.utils.checkpoint import load_checkpoint
from vae2_tpu.utils.logging import create_logger


def parse_args():
    parser = argparse.ArgumentParser(description="Test segmentation network")
    parser.add_argument("--cfg", required=True, type=str)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()
    update_config(config, args)
    return args


def main():
    args = parse_args()
    logger, final_output_dir, _ = create_logger(config, args.cfg, "test")
    logger.info(pprint.pformat(vars(args)))

    model = get_seg_model(config)
    h = config.TEST.IMAGE_SIZE[1]
    w = config.TEST.IMAGE_SIZE[0]
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, h, w, 3), jnp.float32), True)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}

    model_file = config.TEST.MODEL_FILE or os.path.join(
        final_output_dir, "seg_final_state.msgpack")
    if model_file.endswith((".pth", ".pth.tar", ".tar")):
        # reference torch checkpoint: import the trunk+head weights
        from vae2_tpu.utils.torch_import import (import_params,
                                                 load_torch_state_dict)
        sd = load_torch_state_dict(model_file)
        # seg checkpoints have no composite prefix; reuse the d_seq mapping
        # (trunk + single last_layer head share the naming scheme)
        sd = {f"D_model_sequence.{k}": v for k, v in sd.items()}
        params, stats, missing = import_params(
            {"d_seq": variables["params"]},
            {"d_seq": variables["batch_stats"]}, sd)
        logger.info("imported torch seg checkpoint (%d unmatched)", len(missing))
        variables = {"params": params["d_seq"], "batch_stats": stats["d_seq"]}
    elif os.path.isfile(model_file):
        template = variables
        variables, _ = load_checkpoint(model_file, template)
        logger.info("loaded %s", model_file)
    else:
        logger.warning("no checkpoint found at %s — evaluating random init",
                       model_file)

    test_dataset = make_seg_dataset(config, config.DATASET.TEST_SET,
                                    train=False,
                                    num_samples=config.TEST.NUM_SAMPLES or None)

    if "test" in os.path.basename(config.DATASET.TEST_SET).lower():
        seg_test(config, test_dataset, model, variables, final_output_dir)
    else:
        mean_iou, iou_array, pixel_acc, mean_acc = seg_testval(
            config, test_dataset, model, variables, final_output_dir,
            sv_pred=False)
        logger.info("MeanIU: %.4f, Pixel_Acc: %.4f, Mean_Acc: %.4f",
                    mean_iou, pixel_acc, mean_acc)
        logger.info("%s", iou_array)


if __name__ == "__main__":
    main()
