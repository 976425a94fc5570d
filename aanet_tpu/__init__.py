"""aanet_tpu — a TPU-native stereo disparity estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
wuzhongwulidong/aanet (AANet: Adaptive Aggregation Network for Efficient
Stereo Matching, CVPR 2020 + DDP-training fork additions):

  * five-stage stereo pipeline: feature extraction -> cost volume ->
    adaptive aggregation -> soft-argmin disparity -> refinement
  * model families: AANet, AANet+ and the StereoNet/PSMNet/GCNet/GANet
    "-AA" ablations
  * train / evaluate / inference / predict workflows on SceneFlow and
    KITTI 2012/2015 with the reference's filename-list data format

Everything is designed TPU-first: NHWC layouts, static shapes, MXU-sized
contractions, sharding via `jax.sharding.Mesh` + jit (data parallelism and
cross-replica batch-norm fall out of XLA's global-view compilation), and
Pallas kernels for the irregular hot ops.
"""

__version__ = "0.1.0"

from aanet_tpu import ops  # noqa: F401
