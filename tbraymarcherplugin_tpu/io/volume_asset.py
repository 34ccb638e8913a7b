"""Volume assets: data + TF + metadata bundles with on-disk persistence.

TPU-native equivalent of `UVolumeAsset`
(`Public/VolumeAsset/VolumeAsset.h:25-59`) and its persistence story
(SURVEY §5 "checkpoint/resume"): a volume asset pairs the voxel data with a
transfer function and the :class:`VolumeInfo`, saved as a single ``.npz``.
Unlike the reference (which cannot persist F32 volumes, `VolumeInfo.cpp:114`),
any dtype round-trips.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional

import numpy as np

from ..utils.volume_info import VolumeInfo, VoxelFormat, WindowingParameters


@dataclasses.dataclass
class VolumeAsset:
    """Data + transfer function + metadata (`UVolumeAsset`)."""

    data: np.ndarray  # (X, Y, Z)
    info: VolumeInfo
    tf_table: Optional[np.ndarray] = None  # (R, 4)

    @staticmethod
    def create_transient(data, info: Optional[VolumeInfo] = None, tf_table=None):
        data = np.asarray(data)
        if info is None:
            info = VolumeInfo(
                dimensions=tuple(data.shape),
                actual_format=VoxelFormat.from_dtype(data.dtype)
                if data.dtype != np.float32
                else VoxelFormat.FLOAT32,
                is_normalized=True,
                min_value=0.0,
                max_value=1.0,
            )
        return VolumeAsset(data=data, info=info, tf_table=tf_table)

    def save(self, path: str) -> None:
        """Persist to ``.npz`` — includes current TF + windowing, the analogue
        of `SaveCurrentParamsToVolumeAsset` (`RaymarchVolume.cpp:579-594`)."""
        meta = dataclasses.asdict(self.info)
        meta["original_format"] = self.info.original_format.value
        meta["actual_format"] = self.info.actual_format.value
        meta["default_windowing"] = dataclasses.asdict(self.info.default_windowing)
        arrays = {"data": self.data, "meta_json": np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8
        )}
        if self.tf_table is not None:
            arrays["tf_table"] = np.asarray(self.tf_table)
        np.savez_compressed(path, **arrays)

    @staticmethod
    def load(path: str) -> "VolumeAsset":
        with np.load(path, allow_pickle=False) as z:
            data = z["data"]
            meta = json.loads(bytes(z["meta_json"].tobytes()).decode())
            tf = z["tf_table"] if "tf_table" in z.files else None
        win = meta.pop("default_windowing")
        info = VolumeInfo(
            data_file_name=meta["data_file_name"],
            original_format=VoxelFormat(meta["original_format"]),
            actual_format=VoxelFormat(meta["actual_format"]),
            dimensions=tuple(meta["dimensions"]),
            spacing=tuple(meta["spacing"]),
            default_windowing=WindowingParameters(
                center=win["center"],
                width=win["width"],
                low_cutoff=win["low_cutoff"],
                high_cutoff=win["high_cutoff"],
            ),
            is_normalized=meta["is_normalized"],
            min_value=meta["min_value"],
            max_value=meta["max_value"],
            is_compressed=meta["is_compressed"],
            compressed_byte_size=meta["compressed_byte_size"],
            min_slice_number=meta.get("min_slice_number"),
            max_slice_number=meta.get("max_slice_number"),
        )
        return VolumeAsset(data=data, info=info, tf_table=tf)
