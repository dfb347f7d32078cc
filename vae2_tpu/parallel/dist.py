"""Multi-host initialization.

The TPU-native replacement for the reference's Philly/NCCL rendezvous
(reference setup.sh:1-34 exporting NODE_RANK/MASTER_IP/MASTER_PORT for
``torch.distributed.init_process_group(backend='nccl', init_method='env://')``,
tools/train.py:107-111): a single call to ``jax.distributed.initialize``,
which on TPU pods autodetects the coordinator from the TPU metadata, and off
TPU reads ``COORDINATOR_ADDRESS`` / ``PROCESS_ID`` / ``NUM_PROCESSES``
(same env:// spirit, no shell parsing).

After initialization every host runs the same SPMD program; per-host data
sharding is handled by ClipLoader(process_index, process_count) and global
arrays by jax.make_array_from_process_local_data where needed.
"""

from __future__ import annotations

import logging
import os

import jax

logger = logging.getLogger("vae2_tpu")


_ENV_VARS = ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID")


def initialize_distributed(strict: bool = True) -> None:
    """Initialize multi-host JAX if the environment asks for it.

    No-ops for single-process runs (none of COORDINATOR_ADDRESS /
    NUM_PROCESSES / PROCESS_ID set, not on a TPU pod). Safe to call
    unconditionally from the CLIs.

    ``strict`` (default): a half-set environment or a failed initialize
    raises instead of silently continuing single-process — a pod job that
    degrades to one process would train on 1/N of the data with no error.
    Set strict=False (or VAE2_TPU_ALLOW_SINGLE_PROCESS=1) to downgrade
    both to warnings.
    """
    # NOTE: must run before anything initializes the XLA backend — do not
    # query jax.process_count()/jax.devices() before initialize().
    strict = strict and not os.environ.get("VAE2_TPU_ALLOW_SINGLE_PROCESS")
    env = {k: os.environ.get(k) for k in _ENV_VARS}
    n_set = sum(v is not None for v in env.values())
    if 0 < n_set < len(_ENV_VARS):
        missing = sorted(k for k, v in env.items() if v is None)
        msg = (f"distributed env half-set: missing {missing} "
               f"(have {sorted(k for k, v in env.items() if v)})")
        if strict:
            raise RuntimeError(msg)
        logger.warning("%s; continuing single-process", msg)
        return
    on_pod = os.environ.get("TPU_WORKER_HOSTNAMES", "") not in ("", "localhost")
    try:
        if n_set == len(_ENV_VARS):
            jax.distributed.initialize(
                coordinator_address=env["COORDINATOR_ADDRESS"],
                num_processes=int(env["NUM_PROCESSES"]),
                process_id=int(env["PROCESS_ID"]),
            )
            logger.info("jax.distributed initialized: process %s/%s @ %s",
                        env["PROCESS_ID"], env["NUM_PROCESSES"],
                        env["COORDINATOR_ADDRESS"])
        elif on_pod:
            # TPU pod: autodetect coordinator from the TPU metadata
            jax.distributed.initialize()
            logger.info("jax.distributed initialized from TPU metadata: "
                        "process %d/%d", jax.process_index(),
                        jax.process_count())
    except Exception as e:  # pragma: no cover - depends on cluster env
        if strict:
            raise RuntimeError(
                "jax.distributed.initialize failed for an explicitly "
                f"distributed environment: {e}") from e
        logger.warning("jax.distributed.initialize failed (%s); continuing "
                       "single-process", e)
