"""Checkpoint save/restore for the functional train state.

Replaces the reference's ``torch.save({'epoch', 'state_dict', 'optimizer'})``
per-epoch checkpoints (reference tools/train.py:317-348) with msgpack-encoded
pytrees written atomically. Restore is shape-checked against a template state
(reference tools/train.py:270-290 resume path).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, state: Any, epoch: int) -> None:
    """Atomically write {epoch, state} to ``path``."""
    host_state = jax.device_get(state)
    payload = {
        "epoch": np.int64(epoch),
        "state": serialization.to_state_dict(host_state),
    }
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str, template_state: Any,
                    restore_opt: bool = True) -> Tuple[Any, int]:
    """Restore a state saved by ``save_checkpoint``; returns (state, epoch).

    ``restore_opt=False`` restores only params/batch_stats/step and keeps the
    template's optimizer state — for inference/eval, where the checkpoint may
    have been trained with a different optimizer than the current config
    (optax opt-state pytrees are optimizer-specific namedtuples).
    """
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    epoch = int(raw["epoch"])
    sd = raw["state"]
    if restore_opt or not hasattr(template_state, "replace"):
        state = serialization.from_state_dict(template_state, sd)
    else:
        # optimizer state is dropped entirely (empty pytrees) — eval paths
        # never read it, and leaving eval_shape placeholders in the state
        # would break jit argument tracing.
        state = template_state.replace(
            step=serialization.from_state_dict(template_state.step,
                                               sd["step"]),
            params=serialization.from_state_dict(template_state.params,
                                                 sd["params"]),
            batch_stats=serialization.from_state_dict(
                template_state.batch_stats, sd["batch_stats"]),
            opt_state_g=(),
            opt_state_d=(),
        )
    return state, epoch


def template_from_init(system, rng, example_batch) -> Any:
    """Build a checkpoint-restore template WITHOUT compiling/running the init
    graph: ``jax.eval_shape`` gives the state pytree as ShapeDtypeStructs,
    which ``from_state_dict`` fills with the stored arrays."""
    return jax.eval_shape(lambda: system.init(rng, example_batch))


def maybe_resume(final_output_dir: str, template_state: Any,
                 filename: str = "checkpoint.msgpack"
                 ) -> Tuple[Optional[Any], int]:
    """Resume from ``final_output_dir/filename`` if present (train.py:270-290)."""
    path = os.path.join(final_output_dir, filename)
    if os.path.isfile(path):
        return load_checkpoint(path, template_state)
    return None, 0
