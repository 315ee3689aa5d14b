"""Inverse rendering: gradient-based scene optimization.

The reference has no training capability at all — it is a forward
renderer only. This package delivers the north-star capability from
BASELINE.json: the whole light-transport estimate (fixed-depth
``lax.scan``, branchless shading) is differentiable w.r.t. sphere
positions/radii, triangle vertices, material albedo/emission/reflectance
and camera pose, so a photometric loss against a target image can be
minimized with a first-order optimizer. Scene-parameter gradients are
reduced across the device mesh with the same ``psum`` as the forward
sample sums (SURVEY.md §5.8), overlapped with the backward scan by XLA.
"""

from raytpu.train.inverse import (
    TrainState,
    combine_scene,
    make_train_step,
    partition_scene,
    photometric_loss,
)

__all__ = [
    "TrainState",
    "partition_scene",
    "combine_scene",
    "photometric_loss",
    "make_train_step",
]
