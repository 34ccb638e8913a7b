"""Utilities: volume data model, configuration, profiling, checkpointing."""

from .volume_info import (
    VolumeInfo,
    VoxelFormat,
    WindowingParameters,
    normalize_array,
    to_normalized_float,
)

__all__ = [
    "VolumeInfo",
    "VoxelFormat",
    "WindowingParameters",
    "normalize_array",
    "to_normalized_float",
]
