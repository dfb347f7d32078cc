"""Per-layer model summary tool (reference lib/utils/modelsummary.py)."""

import os
import re
import subprocess
import sys
import pytest

pytestmark = pytest.mark.slow  # heavyweight jit compiles; excluded from the cold-container smoke tier

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_model_summary_tool_emits_flops_and_params():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "model_summary.py"),
         "--cfg", "experiments/cityscapes/debug_tiny_32x64.yaml",
         "--depth", "1"],
        capture_output=True, text=True, cwd=REPO, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("Total Parameters") >= 3  # encz, encdec, d_*
    # at least one real per-layer FLOPs number (CPU cost analysis)
    flops = [int(m) for m in re.findall(r"\b(\d{6,})\b", out.stdout)]
    assert flops and max(flops) > 1e6
