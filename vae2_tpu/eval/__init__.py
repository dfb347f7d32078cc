"""Evaluation stack: FID, Inception Score (reference tools/fid_score.py,
tools/inception_score.py as importable library code; the tools/ scripts are
thin CLIs over this package)."""

from .fid import (calculate_activation_statistics, calculate_fid_given_paths,
                  calculate_frechet_distance, get_activations, list_images)
from .is_score import collect_files, inception_score

__all__ = [
    "calculate_activation_statistics", "calculate_fid_given_paths",
    "calculate_frechet_distance", "get_activations", "list_images",
    "collect_files", "inception_score",
]
