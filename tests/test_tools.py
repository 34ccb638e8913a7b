"""Render CLI + viewer control-layer tests (SURVEY §2.6 equivalent)."""

import io
import json

import numpy as np
import pytest

from tbraymarcherplugin_tpu.tools import render_cli
from tbraymarcherplugin_tpu.tools.viewer import ViewerState


@pytest.fixture(scope="module")
def mhd_volume(tmp_path_factory):
    d = tmp_path_factory.mktemp("vol")
    dims = (24, 20, 16)
    x, y, z = np.meshgrid(*[np.linspace(-1, 1, n) for n in dims],
                          indexing="ij")
    v = ((x**2 + y**2 + z**2) < 0.6).astype("<u2") * 50000
    raw = d / "ball.raw"
    v.tofile(raw)
    mhd = d / "ball.mhd"
    mhd.write_text(
        "ObjectType = Image\nNDims = 3\n"
        f"DimSize = {dims[0]} {dims[1]} {dims[2]}\n"
        "ElementSpacing = 1 1 1\nElementType = MET_USHORT\n"
        "ElementDataFile = ball.raw\n"
    )
    return str(mhd)


def test_render_cli_single_frame(mhd_volume, tmp_path):
    out = tmp_path / "frame.png"
    rc = render_cli.main([
        mhd_volume, str(out), "--size", "48x40", "--steps", "24",
        "--tf", "grayscale", "--march-impl", "blocked",
    ])
    assert rc == 0 and out.exists()
    import matplotlib.image as mpimg

    img = np.asarray(mpimg.imread(str(out)))
    assert img.shape[:2] == (40, 48)
    assert img.max() > 0.1  # the ball rendered


def test_render_cli_turntable_and_modes(mhd_volume, tmp_path):
    out = tmp_path / "turn.png"
    rc = render_cli.main([
        mhd_volume, str(out), "--size", "32x32", "--steps", "16",
        "--frames", "2", "--mode", "intensity",
    ])
    assert rc == 0
    assert (tmp_path / "turn000.png").exists()
    assert (tmp_path / "turn001.png").exists()


def test_render_cli_clip_and_window(mhd_volume, tmp_path):
    a = tmp_path / "a.png"
    b = tmp_path / "b.png"
    common = [mhd_volume, "--size", "32x32", "--steps", "16",
              "--march-impl", "blocked"]
    assert render_cli.main([common[0], str(a)] + common[1:]) == 0
    assert render_cli.main(
        [common[0], str(b)] + common[1:]
        + ["--clip", "0.5,0.5,0.5,0,0,1", "--window-center", "0.9"]
    ) == 0
    ia = np.asarray(__import__("matplotlib.image", fromlist=["imread"])
                    .imread(str(a)))
    ib = np.asarray(__import__("matplotlib.image", fromlist=["imread"])
                    .imread(str(b)))
    assert not np.allclose(ia, ib)  # clip + window changed the image


def test_render_cli_unknown_tf_errors(mhd_volume, tmp_path):
    with pytest.raises(SystemExit):
        render_cli.main([mhd_volume, str(tmp_path / "x.png"), "--tf", "nope"])


def test_render_cli_world_scaled_volume_stays_in_frame(tmp_path):
    """--distance is in cube units: a volume whose metadata gives it a
    large world transform (e.g. 64 voxels at 1 mm spacing -> 6.4 world
    units after the reference's mm->cm scaling) must still be rendered
    from OUTSIDE — the absolute-distance bug put the camera inside the
    proxy cube and every default render of a real CT was a black
    interior frame."""
    dims = (64, 64, 64)
    x, y, z = np.meshgrid(*[np.linspace(-1, 1, n) for n in dims],
                          indexing="ij")
    v = ((x**2 + y**2 + z**2) < 0.36).astype(np.uint8) * 200
    (tmp_path / "big.raw").write_bytes(v.tobytes())
    (tmp_path / "big.mhd").write_text(
        "ObjectType = Image\nNDims = 3\nDimSize = 64 64 64\n"
        "ElementSpacing = 1 1 1\nElementType = MET_UCHAR\n"
        "ElementDataFile = big.raw\n"
    )
    out = tmp_path / "big.png"
    rc = render_cli.main([
        str(tmp_path / "big.mhd"), str(out), "--size", "48x48",
        "--steps", "24", "--march-impl", "blocked",
        "--background", "1,1,1",
    ])
    assert rc == 0
    import matplotlib.image as mpimg

    img = np.asarray(mpimg.imread(str(out)))[..., :3]
    # Camera outside: corner rays MISS the proxy cube and show the white
    # background; rays through the volume composite its (dark, opaque
    # default-TF) silhouette. Inside the volume, every ray was opaque ->
    # a uniform frame with no background anywhere.
    assert img.max() > 0.9, "no background visible - camera inside volume"
    assert img.min() < 0.5, "volume silhouette missing"


@pytest.fixture(scope="module")
def viewer_state():
    s = ViewerState(volume_path=None, image_size=32,
                    synthetic_dims=(32, 32, 32))
    s.renderer.config.step_count = 16
    s.renderer.config.march_impl = "blocked"
    return s


def test_viewer_state_roundtrip(viewer_state):
    st = viewer_state.state()
    assert st["tf"] == "grayscale"
    assert "ct_bone" in st["tf_options"]
    assert 0.0 <= st["window_center"] <= 1.0


def _decode(png_bytes):
    import matplotlib.image as mpimg

    return np.asarray(mpimg.imread(io.BytesIO(png_bytes)))


def test_viewer_controls_drive_renderer(viewer_state):
    s = viewer_state
    png0 = s.frame_png(30, 15, 2.2)
    assert png0[:4] == b"\x89PNG"
    img0 = _decode(png0)
    assert img0.max() > 0.05  # phantom renders
    # TF change invalidates lighting (dirty flag) and changes the image.
    s.update({"tf": "ct_bone", "window_center": 0.45, "window_width": 0.7})
    assert s.state()["tf"] == "ct_bone"
    assert abs(s.state()["window_center"] - 0.45) < 1e-6
    img1 = _decode(s.frame_png(30, 15, 2.2))
    assert not np.allclose(img1, img0)
    # Light move takes the selective-update path.
    s.update({"light_az": -60.0, "light_el": 10.0})
    img2 = _decode(s.frame_png(30, 15, 2.2))
    assert not np.allclose(img2, img1)
    # Clip plane (back to friendly windowing first).
    s.update({"window_center": 0.5, "window_width": 1.0, "tf": "grayscale"})
    imgw = _decode(s.frame_png(30, 15, 2.2))
    s.update({"clip_enabled": True, "clip_offset": 0.35})
    img3 = _decode(s.frame_png(30, 15, 2.2))
    assert not np.allclose(img3, imgw)
    # Mode switch.
    s.update({"mode": "intensity", "clip_enabled": False})
    img4 = _decode(s.frame_png(30, 15, 2.2))
    assert not np.allclose(img4, img3)


def test_viewer_save_asset(viewer_state, tmp_path):
    """`/api/save` analogue: live TF + windowing written back into the asset
    (`RaymarchVolume.cpp:579-594`; save button `TransferFuncMenu.h:21-105`),
    and the saved npz reloads with the edited values."""
    from tbraymarcherplugin_tpu.io.volume_asset import VolumeAsset

    s = viewer_state
    s.update({"tf": "ct_bone", "window_center": 0.37, "window_width": 0.61})
    path = s.save(str(tmp_path / "edited.npz"))
    asset = VolumeAsset.load(path)
    assert asset.tf_table is not None
    np.testing.assert_allclose(
        asset.tf_table, np.asarray(s.renderer.tf_table), atol=1e-7
    )
    assert abs(asset.info.default_windowing.center - 0.37) < 1e-6
    assert abs(asset.info.default_windowing.width - 0.61) < 1e-6
    assert asset.data.shape == tuple(s.renderer.volume.shape)


def test_viewer_load_volume(viewer_state, tmp_path):
    dims = (12, 12, 12)
    v = np.full(dims, 30000, "<u2")
    (tmp_path / "c.raw").write_bytes(v.tobytes())
    (tmp_path / "c.mhd").write_text(
        "ObjectType = Image\nNDims = 3\nDimSize = 12 12 12\n"
        "ElementType = MET_USHORT\nElementDataFile = c.raw\n"
    )
    viewer_state.load(str(tmp_path / "c.mhd"))
    assert "c.mhd" in viewer_state.state()["volume_info"]
    assert viewer_state.renderer.volume.shape == dims
