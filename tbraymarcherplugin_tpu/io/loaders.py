"""Volume loaders: MHD, raw/zlib, DICOM.

TPU-native equivalent of the reference's VolumeTextureToolkit loader stack
(SURVEY §2.4):

- :class:`VolumeLoader`  <- `IVolumeLoader`
  (`Public/VolumeAsset/Loaders/VolumeLoader.h:25-73`): parse header ->
  :class:`VolumeInfo`, then load + convert data.
- :class:`MHDLoader`     <- `UMHDLoader` (`Private/.../MHDLoader.cpp:18-261`):
  MetaImage header tags `NDims/DimSize/ElementSpacing/ElementSize/
  ElementType/CompressedData/CompressedDataSize/ElementDataFile`.
- :class:`RawLoader`     <- `LoadRawFileIntoArray` /
  `LoadZLibCompressedFileIntoArray` (`TextureUtilities.cpp:223-302`).
- :class:`DICOMLoader`   <- `UDCMTKLoader` (`Private/.../DCMTKLoader.cpp`),
  re-implemented on pydicom (gated import): series-UID grouping, slice
  ordering by InstanceNumber, pixel-spacing / slice-thickness read +
  calculate + verify with irregular tolerance, multi-frame support.

Conversion semantics follow `IVolumeLoader::ConvertData`
(`VolumeLoader.cpp:97-128`): either min/max-normalize to an integer UNORM
format (storing min/max for round-trip) or convert to float32.

Arrays are returned with shape (X, Y, Z) — axis order matches UVW sampling.
"""

from __future__ import annotations

import abc
import dataclasses
import logging
import os
import zlib
from typing import Optional

import numpy as np

from ..utils.volume_info import (
    MET_TYPE_TO_FORMAT,
    VolumeInfo,
    VoxelFormat,
    WindowingParameters,
    normalize_array,
    to_normalized_float,
)

log = logging.getLogger("tbraymarcher.loaders")


@dataclasses.dataclass
class LoadedVolume:
    """A parsed + converted volume ready to render."""

    data: np.ndarray  # (X, Y, Z), float32 normalized or raw float
    info: VolumeInfo


class VolumeLoader(abc.ABC):
    """Abstract loader (`IVolumeLoader`)."""

    @abc.abstractmethod
    def parse_volume_info(self, path: str) -> VolumeInfo:
        """Parse the header/metadata into a :class:`VolumeInfo`."""

    @abc.abstractmethod
    def load_raw_data(self, path: str, info: VolumeInfo) -> np.ndarray:
        """Load the raw voxel payload as a flat array of ``info.original_format``."""

    def load(self, path: str, normalize: bool = True) -> LoadedVolume:
        """Full pipeline: parse -> load -> convert (`CreateVolumeFromFile`).

        ``normalize=True`` min/max-normalizes to [0, 1] float32 (storing
        min/max in the info); ``False`` converts to raw float32 values.
        The min/max scan, conversion and axis transpose run in the threaded
        native library when built (`native/tbrnative.cpp`), matching the
        reference's ParallelFor conversion path (`TextureUtilities.h:153-178`).
        """
        from ..utils import native as N

        info = self.parse_volume_info(path)
        raw = self.load_raw_data(path, info)
        x, y, z = info.dimensions
        lo, hi = N.minmax(raw) if raw.size else (0.0, 1.0)
        if normalize:
            flat = N.normalize_to_f32(raw, lo, hi)
            info.min_value, info.max_value = lo, hi
            info.is_normalized = True
        else:
            flat = np.asarray(raw, np.float32)
            info.min_value, info.max_value = lo, hi
            info.is_normalized = False
        info.actual_format = VoxelFormat.FLOAT32
        # Files store slices as [z][y][x] C-order; transpose to (X, Y, Z).
        data = N.transpose_zyx_to_xyz(flat.reshape(z, y, x))
        return LoadedVolume(data=np.ascontiguousarray(data), info=info)


def load_raw_file(path: str, expected_bytes: Optional[int] = None) -> bytes:
    """Read a raw volume payload, size-checked (`LoadRawFileIntoArray`)."""
    with open(path, "rb") as f:
        blob = f.read()
    if expected_bytes is not None and len(blob) < expected_bytes:
        raise ValueError(
            f"{path}: file has {len(blob)} bytes, expected >= {expected_bytes}"
        )
    return blob[:expected_bytes] if expected_bytes else blob


def load_zlib_file(path: str, compressed_size: int, expected_bytes: int) -> bytes:
    """Read + decompress a zlib payload (`LoadZLibCompressedFileIntoArray`)."""
    with open(path, "rb") as f:
        blob = f.read(compressed_size)
    out = zlib.decompress(blob)
    if len(out) < expected_bytes:
        raise ValueError(
            f"{path}: decompressed {len(out)} bytes, expected {expected_bytes}"
        )
    return out[:expected_bytes]


class MHDLoader(VolumeLoader):
    """MetaImage (.mhd) loader (`UMHDLoader`)."""

    def parse_volume_info(self, path: str) -> VolumeInfo:
        info = VolumeInfo(data_file_name=os.path.basename(path))
        tags: dict[str, str] = {}
        with open(path, "r", errors="replace") as f:
            for line in f:
                if "=" not in line:
                    continue
                key, _, value = line.partition("=")
                tags[key.strip()] = value.strip()

        ndims = int(tags.get("NDims", "3"))
        if ndims != 3:
            raise ValueError(f"{path}: NDims={ndims}, only 3D supported")
        dims = [int(v) for v in tags["DimSize"].split()]
        info.dimensions = tuple(dims)

        spacing_tag = tags.get("ElementSpacing") or tags.get("ElementSize")
        if spacing_tag:
            info.spacing = tuple(float(v) for v in spacing_tag.split())
        else:
            info.spacing = (1.0, 1.0, 1.0)

        met = tags.get("ElementType", "MET_UCHAR")
        if met not in MET_TYPE_TO_FORMAT:
            raise ValueError(f"{path}: unsupported ElementType {met}")
        info.original_format = MET_TYPE_TO_FORMAT[met]
        info.actual_format = info.original_format

        if tags.get("CompressedData", "").lower() == "true":
            info.is_compressed = True
            info.compressed_byte_size = int(tags.get("CompressedDataSize", "0"))

        data_file = tags.get("ElementDataFile", "")
        if not data_file or data_file.upper() == "LOCAL":
            raise ValueError(f"{path}: inline (LOCAL) payloads not supported")
        self._data_file = data_file
        info.default_windowing = WindowingParameters()
        return info

    def load_raw_data(self, path: str, info: VolumeInfo) -> np.ndarray:
        data_path = os.path.join(os.path.dirname(path), self._data_file)
        nbytes = info.total_voxels * info.original_format.byte_size
        if info.is_compressed:
            blob = load_zlib_file(
                data_path, info.compressed_byte_size or os.path.getsize(data_path),
                nbytes,
            )
        else:
            blob = load_raw_file(data_path, nbytes)
        return np.frombuffer(blob, dtype=info.original_format.dtype).copy()


class RawLoader(VolumeLoader):
    """Raw-blob loader: dimensions/format supplied by the caller."""

    def __init__(
        self,
        dimensions: tuple[int, int, int],
        voxel_format: VoxelFormat = VoxelFormat.UINT8,
        spacing: tuple[float, float, float] = (1.0, 1.0, 1.0),
        compressed: bool = False,
    ):
        self.dimensions = tuple(dimensions)
        self.voxel_format = voxel_format
        self.spacing = tuple(spacing)
        self.compressed = compressed

    def parse_volume_info(self, path: str) -> VolumeInfo:
        return VolumeInfo(
            data_file_name=os.path.basename(path),
            dimensions=self.dimensions,
            spacing=self.spacing,
            original_format=self.voxel_format,
            actual_format=self.voxel_format,
            is_compressed=self.compressed,
        )

    def load_raw_data(self, path: str, info: VolumeInfo) -> np.ndarray:
        nbytes = info.total_voxels * info.original_format.byte_size
        if self.compressed:
            blob = load_zlib_file(path, os.path.getsize(path), nbytes)
        else:
            blob = load_raw_file(path, nbytes)
        return np.frombuffer(blob, dtype=info.original_format.dtype).copy()


def _dicom_backend():
    """pydicom when installed (full codec support), else the vendored
    pure-Python reader (`.minidicom`) — the same ownership move as the
    reference bundling DCMTK (`VolumeTextureToolkit.Build.cs:38-66`)."""
    try:
        import pydicom

        return pydicom
    except ImportError:
        from . import minidicom

        return minidicom


class DICOMLoader(VolumeLoader):
    """DICOM folder/series loader (`UDCMTKLoader` semantics) on pydicom or
    the vendored :mod:`.minidicom` backend.

    Flags mirror `DCMTKLoader.h:19-47`: slice-thickness read / calculate /
    set + verify with tolerance for irregular spacing.
    """

    def __init__(
        self,
        read_slice_thickness: bool = True,
        calculate_slice_thickness: bool = True,
        verify_slice_thickness: bool = True,
        ignore_irregular_thickness: bool = False,
        set_pixel_spacing: Optional[tuple[float, float]] = None,
        set_slice_thickness: Optional[float] = None,
        thickness_tolerance: float = 0.1,
    ):
        self._dicom = _dicom_backend()
        self.read_slice_thickness = read_slice_thickness
        self.calculate_slice_thickness = calculate_slice_thickness
        self.verify_slice_thickness = verify_slice_thickness
        self.ignore_irregular_thickness = ignore_irregular_thickness
        self.set_pixel_spacing = set_pixel_spacing
        self.set_slice_thickness = set_slice_thickness
        self.thickness_tolerance = thickness_tolerance

    # -- helpers -----------------------------------------------------------

    def _series_files(self, path: str):
        """All files in the folder sharing the reference file's SeriesInstanceUID
        (`ParseVolumeInfoFromHeader`, `DCMTKLoader.cpp:84-263`)."""
        pydicom = self._dicom

        folder = os.path.dirname(path) or "."
        ref = pydicom.dcmread(path, stop_before_pixels=True)
        uid = getattr(ref, "SeriesInstanceUID", None)
        files = []
        for name in sorted(os.listdir(folder)):
            fp = os.path.join(folder, name)
            if not os.path.isfile(fp):
                continue
            try:
                ds = pydicom.dcmread(fp, stop_before_pixels=True)
            except Exception:
                continue
            if uid is None or getattr(ds, "SeriesInstanceUID", None) == uid:
                files.append((fp, ds))
        # Order by InstanceNumber offset from the min slice
        # (`LoadSingleFrameDICOMFolder`, `DCMTKLoader.cpp:434-544`).
        files.sort(key=lambda t: int(getattr(t[1], "InstanceNumber", 0)))
        return ref, files

    def parse_volume_info(self, path: str) -> VolumeInfo:
        ref, files = self._series_files(path)
        info = VolumeInfo(data_file_name=os.path.basename(path))

        rows = int(ref.Rows)
        cols = int(ref.Columns)
        n_frames = int(getattr(ref, "NumberOfFrames", 0) or 0)
        if n_frames > 1:
            depth = n_frames
            self._multi_frame = True
        else:
            depth = len(files)
            self._multi_frame = False
        info.dimensions = (cols, rows, depth)

        # Pixel spacing "%lf\%lf" (`DCMTKLoader.cpp` pixel-spacing parse).
        if self.set_pixel_spacing is not None:
            sx, sy = self.set_pixel_spacing
        else:
            ps = getattr(ref, "PixelSpacing", [1.0, 1.0])
            sy, sx = float(ps[0]), float(ps[1])  # DICOM: row spacing first

        thickness = self._slice_thickness(ref, files)
        info.spacing = (sx, sy, thickness)

        bits = int(getattr(ref, "BitsAllocated", 16))
        signed = int(getattr(ref, "PixelRepresentation", 0)) == 1
        fmt = {
            (8, False): VoxelFormat.UINT8,
            (8, True): VoxelFormat.INT8,
            (16, False): VoxelFormat.UINT16,
            (16, True): VoxelFormat.INT16,
            (32, False): VoxelFormat.UINT32,
            (32, True): VoxelFormat.INT32,
        }.get((bits, signed))
        if fmt is None:
            raise ValueError(f"unsupported DICOM BitsAllocated={bits}")
        info.original_format = fmt
        info.actual_format = fmt

        for _, ds in files:
            num = getattr(ds, "InstanceNumber", None)
            if num is not None:
                info.update_min_max_slice_number(int(num))
        self._files = files
        return info

    def _slice_thickness(self, ref, files) -> float:
        """Read / calculate / verify slice thickness
        (`LoadSingleFrameDICOMFolder`, `DCMTKLoader.cpp:502-541`)."""
        if self.set_slice_thickness is not None:
            return float(self.set_slice_thickness)
        thickness = None
        if self.read_slice_thickness:
            t = getattr(ref, "SliceThickness", None)
            if t:
                thickness = float(t)
        positions = []
        for _, ds in files:
            ipp = getattr(ds, "ImagePositionPatient", None)
            if ipp is not None:
                positions.append(float(ipp[2]))
        if (thickness is None or self.calculate_slice_thickness) and len(positions) > 1:
            gaps = np.diff(sorted(positions))
            calc = float(np.median(np.abs(gaps))) if len(gaps) else 1.0
            if thickness is None:
                thickness = calc
            if self.verify_slice_thickness and len(gaps):
                irregular = np.abs(np.abs(gaps) - calc) > self.thickness_tolerance
                if irregular.any() and not self.ignore_irregular_thickness:
                    raise ValueError(
                        f"irregular slice spacing (max deviation "
                        f"{float(np.abs(np.abs(gaps) - calc).max()):.3f} mm); "
                        "pass ignore_irregular_thickness=True to override"
                    )
                thickness = calc
        return thickness if thickness is not None else 1.0

    def load_raw_data(self, path: str, info: VolumeInfo) -> np.ndarray:
        pydicom = self._dicom

        if self._multi_frame:
            ds = pydicom.dcmread(path)
            arr = ds.pixel_array  # (frames, rows, cols)
        else:
            slices = [pydicom.dcmread(fp).pixel_array for fp, _ in self._files]
            arr = np.stack(slices, axis=0)  # (z, rows, cols) = (z, y, x)
        return arr.astype(info.original_format.dtype).ravel()


LOADERS_BY_EXTENSION = {
    ".mhd": MHDLoader,
    ".dcm": DICOMLoader,
    "": DICOMLoader,  # extension-less DICOM files, like the editor factory
}


def load_volume(path: str, normalize: bool = True, **loader_kwargs) -> LoadedVolume:
    """Pick a loader by extension and load
    (`LoadVolumeFromFileDialog`, `VolumeTextureToolkitBPLibrary.cpp:23-70`)."""
    ext = os.path.splitext(path)[1].lower()
    cls = LOADERS_BY_EXTENSION.get(ext)
    if cls is None:
        raise ValueError(f"no loader for extension {ext!r} ({path})")
    return cls(**loader_kwargs).load(path, normalize=normalize)
