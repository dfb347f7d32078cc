"""Legacy segmentation path: train step convergence, validate, testval, and
the metric helpers — on synthetic data (the reference's seg engine,
lib/core/function.py:607-780, had no tests either; we add them)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vae2_tpu.config import get_default_config
from vae2_tpu.core.seg_loop import (flip_tta, make_infer_fn,
                                    make_seg_train_step, multi_scale_inference,
                                    seg_testval, seg_validate)
from vae2_tpu.core.system import make_optimizer
from vae2_tpu.models.seg_hrnet import get_seg_model
from vae2_tpu.utils.metric import (get_confusion_matrix, miou_from_confusion,
                                   scores)

pytestmark = pytest.mark.slow  # heavyweight jit compiles; excluded from the cold-container smoke tier


def _seg_config():
    cfg = get_default_config()
    cfg.MODEL.NAME = "seg_hrnet"
    cfg.DATASET.NUM_CLASSES = 4
    cfg.TPU.DTYPE = "float32"
    cfg.TRAIN.OPTIMIZER = "adam"
    cfg.TRAIN.LR = 1e-3
    cfg.TEST.IMAGE_SIZE = [64, 32]
    for i, (blocks, chans, block) in enumerate(
        [([1], [8], "BOTTLENECK"), ([1, 1], [4, 8], "BASIC"),
         ([1, 1, 1], [4, 8, 16], "BASIC"),
         ([1, 1, 1, 1], [4, 8, 16, 32], "BASIC")], start=1):
        node = cfg.MODEL.EXTRA[f"STAGE{i}"]
        node.NUM_MODULES = 1
        node.NUM_BLOCKS = blocks
        node.NUM_CHANNELS = chans
        node.BLOCK = block
        node.NUM_BRANCHES = len(blocks)
    return cfg


def _synthetic_seg_batch(n=4, h=32, w=64, classes=4, seed=0):
    """Images whose class is recoverable from the dominant color channel."""
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, classes, (n, h, w)).astype(np.int32)
    images = rng.rand(n, h, w, 3).astype(np.float32) * 0.1
    for c in range(classes):
        images[..., c % 3] += (labels == c) * (0.5 + 0.2 * c)
    return images, labels


@pytest.fixture(scope="module")
def seg_setup():
    cfg = _seg_config()
    model = get_seg_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 64, 3), jnp.float32), True)
    return cfg, model, variables


def test_seg_model_output_shape(seg_setup):
    cfg, model, variables = seg_setup
    logits = model.apply(variables, jnp.zeros((2, 32, 64, 3)), False)
    assert logits.shape == (2, 8, 16, 4)  # stride-2 stem x2 -> 1/4 res


def test_seg_train_step_loss_decreases(seg_setup):
    cfg, model, variables = seg_setup
    optimizer = make_optimizer(cfg.TRAIN)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    step = make_seg_train_step(model, optimizer)
    images, labels = _synthetic_seg_batch()
    first = None
    for _ in range(12):
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, jnp.asarray(images),
            jnp.asarray(labels))
        if first is None:
            first = float(loss)
    assert np.isfinite(float(loss))
    assert float(loss) < first


def test_flip_tta_consistency(seg_setup):
    cfg, model, variables = seg_setup
    infer = make_infer_fn(model, variables)
    images, _ = _synthetic_seg_batch(n=1)
    tta = flip_tta(infer, jnp.asarray(images))
    assert tta.shape == (1, 32, 64, 4)
    # flipping the input flips the TTA logits
    tta_f = flip_tta(infer, jnp.asarray(images[:, :, ::-1, :]))
    np.testing.assert_allclose(np.asarray(tta), np.asarray(tta_f)[:, :, ::-1],
                               atol=1e-4)


def test_multi_scale_inference_shapes(seg_setup):
    cfg, model, variables = seg_setup
    infer = make_infer_fn(model, variables)
    image = np.random.RandomState(1).rand(48, 80, 3).astype(np.float32)
    logits = multi_scale_inference(infer, image, crop_size=(32, 64),
                                   num_classes=4, scales=(1.0,), flip=True)
    assert logits.shape == (48, 80, 4)
    assert np.isfinite(logits).all()


def test_flip_pairs_channel_swap(seg_setup):
    """LIP-style flip TTA swaps paired class logits when un-flipping
    (reference lip.py:107-130)."""
    cfg, model, variables = seg_setup
    calls = []

    def fake_infer(x):
        calls.append(np.asarray(x))
        # logits: channel c == c everywhere, plus a spatial marker
        b, h, w, _ = x.shape
        base = jnp.broadcast_to(jnp.arange(4.0), (b, h, w, 4))
        return base + x[..., :1] * 0.0

    out = flip_tta(fake_infer, jnp.zeros((1, 4, 4, 3)),
                   flip_pairs=[(1, 2)])
    # constant-channel logits: swap(1,2) then average -> channels 1,2 = 1.5
    got = np.asarray(out)[0, 0, 0]
    np.testing.assert_allclose(got, [0.0, 1.5, 1.5, 3.0], atol=1e-6)
    assert len(calls) == 2


def test_metric_helpers():
    # perfect prediction -> mIoU 1
    labels = np.random.RandomState(0).randint(0, 3, (2, 8, 8))
    logits = np.eye(3, dtype=np.float32)[labels]  # one-hot as logits
    conf = get_confusion_matrix(labels, logits, 3)
    miou, iou = miou_from_confusion(conf)
    assert miou == pytest.approx(1.0)
    s = scores([labels.reshape(-1)], [labels.reshape(-1)], 3)
    assert s["Overall Acc"] == pytest.approx(1.0)
    assert s["Mean IoU"] == pytest.approx(1.0)

    # ignore label excluded
    labels2 = labels.copy()
    labels2[0, 0, 0] = -1
    conf2 = get_confusion_matrix(labels2, logits, 3, ignore=-1)
    assert conf2.sum() == labels.size - 1


def test_whole_image_logits_buckets_shapes():
    """Mixed-size images must map to a handful of static buckets (<=
    #distinct 32-multiple shapes), and logits crop back to the input size
    (reference base_dataset.py:149-154 runs any shape; TPU pads+crops)."""
    from vae2_tpu.core.seg_loop import whole_image_logits

    seen = []

    def fake_infer(x):
        seen.append(tuple(x.shape))
        return jnp.zeros(x.shape[:3] + (4,))

    for hw in [(33, 65), (40, 70), (62, 60), (64, 96)]:
        img = np.random.RandomState(0).rand(*hw, 3).astype(np.float32)
        out = whole_image_logits(fake_infer, img)
        assert out.shape == hw + (4,)
    # (33,65)/(40,70)/(64,96) -> (64,96); (62,60) -> (64,64): 2 programs
    assert len(set(seen)) == 2


def test_whole_image_logits_identity_when_bucket_aligned(seg_setup):
    """A bucket-aligned image must produce bit-identical logits to direct
    inference (no padding inserted)."""
    from vae2_tpu.core.seg_loop import make_infer_fn, whole_image_logits

    _, model, variables = seg_setup
    infer = make_infer_fn(model, variables)
    img = np.random.RandomState(1).rand(32, 64, 3).astype(np.float32)
    direct = np.asarray(infer(jnp.asarray(img[None])))[0]
    bucketed = whole_image_logits(infer, img)
    np.testing.assert_array_equal(direct, bucketed)
