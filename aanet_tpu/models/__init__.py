"""Flax model modules for the five-stage stereo pipeline."""

from aanet_tpu.models.aanet import AANet
from aanet_tpu.models import layers, feature, aggregation, refinement

__all__ = ["AANet", "layers", "feature", "aggregation", "refinement"]
