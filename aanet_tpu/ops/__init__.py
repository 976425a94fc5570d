"""Core compute ops: pure-JAX reference implementations + TPU kernels.

Each op has a `*_reference` (naive, always-correct, CPU-testable) form and
a default form that picks the fastest formulation for the current backend.
"""

from aanet_tpu.ops.resize import (
    resize_bilinear,
    resize_nearest,
    upsample_disparity,
)
from aanet_tpu.ops.cost_volume import (
    correlation_cost_volume,
    difference_cost_volume,
    concat_cost_volume,
    cost_volume,
    cost_volume_pyramid,
)
from aanet_tpu.ops.softargmin import soft_argmin
from aanet_tpu.ops.warp import disp_warp
from aanet_tpu.ops.deform import (
    modulated_deform_conv2d,
    deform_conv2d,
)

__all__ = [
    "resize_bilinear",
    "resize_nearest",
    "upsample_disparity",
    "correlation_cost_volume",
    "difference_cost_volume",
    "concat_cost_volume",
    "cost_volume",
    "cost_volume_pyramid",
    "soft_argmin",
    "disp_warp",
    "modulated_deform_conv2d",
    "deform_conv2d",
]
