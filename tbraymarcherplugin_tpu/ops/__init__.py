"""Compute kernels: the TPU-native equivalents of the reference's HLSL layer."""

from . import (
    compositing,
    cpu_reference,
    lighting,
    march,
    octree,
    rays,
    sampling,
    synthetic,
    transfer,
)
from .march import march_intensity, march_lit, march_lit_blocked, march_lit_tiled
from .octree import Octree, build_octree, march_octree
from .rays import RayBatch, setup_rays
from .transfer import default_grayscale_tf, sample_tf, tf_from_keypoints

__all__ = [
    "Octree",
    "RayBatch",
    "build_octree",
    "compositing",
    "cpu_reference",
    "default_grayscale_tf",
    "lighting",
    "march",
    "march_intensity",
    "march_lit",
    "march_lit_blocked",
    "march_lit_tiled",
    "march_octree",
    "octree",
    "rays",
    "sample_tf",
    "sampling",
    "setup_rays",
    "synthetic",
    "tf_from_keypoints",
    "transfer",
]
