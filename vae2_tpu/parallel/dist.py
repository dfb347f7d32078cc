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


def initialize_distributed() -> None:
    """Initialize multi-host JAX if the environment asks for it.

    No-ops for single-process runs. Safe to call unconditionally from the
    CLIs.
    """
    # NOTE: must run before anything initializes the XLA backend — do not
    # query jax.process_count()/jax.devices() before initialize().
    coord = os.environ.get("COORDINATOR_ADDRESS")
    nproc = os.environ.get("NUM_PROCESSES")
    pid = os.environ.get("PROCESS_ID")
    try:
        if coord and nproc and pid:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(nproc),
                process_id=int(pid),
            )
            logger.info("jax.distributed initialized: process %s/%s @ %s",
                        pid, nproc, coord)
        elif os.environ.get("TPU_WORKER_HOSTNAMES", "") not in ("", "localhost"):
            # TPU pod: autodetect from metadata
            jax.distributed.initialize()
            logger.info("jax.distributed initialized from TPU metadata: "
                        "process %d/%d", jax.process_index(),
                        jax.process_count())
    except Exception as e:  # pragma: no cover - depends on cluster env
        logger.warning("jax.distributed.initialize failed (%s); continuing "
                       "single-process", e)
