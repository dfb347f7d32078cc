"""Model summary: parameter counts per subnetwork plus an optional
per-layer FLOPs/params table (reference lib/utils/modelsummary.py:19-135)."""

from __future__ import annotations

import jax
import numpy as np


def count_params(tree) -> int:
    return int(sum(np.prod(l.shape) for l in jax.tree.leaves(tree)))


def model_summary_table(module, *args, depth: int = 3, **kwargs) -> str:
    """Per-layer table of input/output shapes, params, and FLOPs for one
    flax module — the reference's forward-hook layer table
    (modelsummary.py:19-135), built from flax's own tracer instead of
    torch hooks. ``args`` are example inputs to ``module.__call__``."""
    import flax.linen as nn

    table_fn = nn.tabulate(
        module, jax.random.PRNGKey(0), depth=depth, compute_flops=True,
        console_kwargs={"width": 120, "force_terminal": False})
    return table_fn(*args, **kwargs)


def log_model_summary(logger, state, detail: bool = False) -> None:
    """Startup parameter summary; ``detail`` adds a per-submodule breakdown
    (the role of the reference's forward-hook layer table,
    modelsummary.py:19-135)."""
    total = 0
    for name, sub in state.params.items():
        n = count_params(sub)
        total += n
        logger.info("model %-8s: %10.2fM params", name, n / 1e6)
        if detail and isinstance(sub, dict):
            for mod_name, mod in sorted(sub.items()):
                logger.info("  %-24s %10.3fM", mod_name,
                            count_params(mod) / 1e6)
    logger.info("model total   : %10.2fM params", total / 1e6)
