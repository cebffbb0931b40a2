"""Training subsystem: jitted steps, metrics, evaluation, checkpointing,
and the end-to-end workflow runner."""

from .checkpoint import load_checkpoint, save_checkpoint
from .evaluate import estimate_loss, modality_display_name
from .metrics import ModalityMetricSpec, batch_directional_metrics, build_metric_specs
from .runner import run_training
from .steps import EvalStats, Trainer, make_optimizer

__all__ = [
    "load_checkpoint",
    "save_checkpoint",
    "estimate_loss",
    "modality_display_name",
    "ModalityMetricSpec",
    "batch_directional_metrics",
    "build_metric_specs",
    "run_training",
    "EvalStats",
    "Trainer",
    "make_optimizer",
]
