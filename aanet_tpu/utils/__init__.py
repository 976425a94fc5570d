"""Cross-cutting utilities: checkpointing, logging, summaries, profiling."""

from aanet_tpu.utils.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    resume_latest,
    load_pretrained_params,
)
from aanet_tpu.utils.logging_util import get_logger

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "resume_latest",
    "load_pretrained_params",
    "get_logger",
]
