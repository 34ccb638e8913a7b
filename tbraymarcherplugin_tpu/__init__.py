"""TBRaymarcherPlugin-TPU: a TPU-native differentiable volume raymarcher.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`tommybazar/TBRaymarcherPlugin` (UE5 C++/HLSL): front-to-back windowed
emission-absorption volume rendering with a 1D transfer function, DICOM-style
windowing, clipping planes, and Sundén–Ropinski-style incremental per-light
illumination volumes — differentiable end to end and sharded over TPU meshes.

Layer map (mirrors SURVEY.md §1 with TPU-native substitutions):

- ``ops``       — kernels: ray setup, sampling, march, lighting, octree
                  (jnp reference path + Pallas performance path).
- ``models``    — renderer variants (lit / intensity / octree) and the
                  differentiable-fit training loop.
- ``parallel``  — device meshes, ray-tile sharding, volume slab sharding,
                  collectives.
- ``utils``     — volume data model, config, profiling, checkpointing.
- ``io``        — loaders (MHD, DICOM, raw/zlib), assets, persistence.
- ``renderer``  — scene orchestration with dirty-flag reactivity
                  (the `ARaymarchVolume` equivalent).
- ``scene``     — lights, clip planes, transforms, cameras.
"""

from . import ops, scene, utils
from .scene import Camera, ClipPlane, DirLight, VolumeTransform, orbit_camera
from .utils.volume_info import VolumeInfo, VoxelFormat, WindowingParameters

__version__ = "0.1.0"

__all__ = [
    "Camera",
    "ClipPlane",
    "DirLight",
    "VolumeInfo",
    "VolumeTransform",
    "VoxelFormat",
    "WindowingParameters",
    "ops",
    "orbit_camera",
    "scene",
    "utils",
]
