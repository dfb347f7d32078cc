"""Runtime utilities: logging, meters, checkpointing, schedules."""

from .logging import AverageMeter, create_logger
from .schedule import adjust_learning_rate, dynamic_coeff

__all__ = ["AverageMeter", "create_logger", "adjust_learning_rate", "dynamic_coeff"]
