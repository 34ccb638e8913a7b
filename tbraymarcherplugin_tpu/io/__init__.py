"""I/O: volume loaders (MHD / DICOM / raw+zlib) and persistent assets."""

from .loaders import (
    DICOMLoader,
    LoadedVolume,
    MHDLoader,
    RawLoader,
    VolumeLoader,
    load_volume,
)
from .volume_asset import VolumeAsset

__all__ = [
    "DICOMLoader",
    "LoadedVolume",
    "MHDLoader",
    "RawLoader",
    "VolumeAsset",
    "VolumeLoader",
    "load_volume",
]
