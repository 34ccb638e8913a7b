"""Render CLI: volume file in -> PNG out, no Python required from the user.

The command-line equivalent of loading a volume through the reference's
import dialog and viewing it in the showcase map (`VolumeLoadMenu.cpp:54-78`
+ `M_Raymarch`): pick a loader by extension, build a scene with a directional
light, orbit camera, optional clip plane, and write PNG frames.

Examples::

    python -m tbraymarcherplugin_tpu.tools.render_cli scan.mhd out.png
    python -m tbraymarcherplugin_tpu.tools.render_cli scan.mhd out.png \
        --tf ct_bone --window-center 0.55 --window-width 0.4 \
        --size 1024x768 --orbit 30 --elevation 15 --steps 200
    python -m tbraymarcherplugin_tpu.tools.render_cli scan.mhd turn_.png \
        --frames 8   # orbit turntable: turn_000.png ... turn_007.png
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import numpy as np


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="render_cli",
        description="Render a volume file (.mhd/.raw/.dcm/DICOM dir) to PNG.",
    )
    p.add_argument("volume", help="volume path (.mhd, .raw, .dcm, DICOM dir)")
    p.add_argument("output", help="output PNG path (suffix _NNN for --frames)")
    p.add_argument("--tf", default="grayscale",
                   help="stock TF name (grayscale, ct_bone, ct_soft_tissue, "
                        "rainbow) or a .npy file with a (256, 4) RGBA table")
    p.add_argument("--mode", default="lit",
                   choices=("lit", "intensity", "octree"))
    p.add_argument("--size", default="512x512", help="WxH image size")
    p.add_argument("--steps", type=int, default=150,
                   help="raymarch step count (reference default 150)")
    p.add_argument("--window-center", type=float, default=None)
    p.add_argument("--window-width", type=float, default=None)
    p.add_argument("--no-low-cutoff", action="store_true")
    p.add_argument("--no-high-cutoff", action="store_true")
    p.add_argument("--orbit", type=float, default=0.0,
                   help="camera azimuth in degrees")
    p.add_argument("--elevation", type=float, default=10.0,
                   help="camera elevation in degrees")
    p.add_argument("--distance", type=float, default=2.2,
                   help="camera distance in cube units")
    p.add_argument("--fov", type=float, default=40.0)
    p.add_argument("--light", default="0.3,0.2,-0.93",
                   help="light direction x,y,z")
    p.add_argument("--light-intensity", type=float, default=1.0)
    p.add_argument("--clip", default=None,
                   help="clip plane as cx,cy,cz,nx,ny,nz (UVW space)")
    p.add_argument("--frames", type=int, default=1,
                   help="N>1: render an N-frame orbit turntable")
    p.add_argument("--half-res-light", action="store_true",
                   help="half-resolution light volume (the reference's "
                        "'massive speedup' knob, Readme.md:214)")
    p.add_argument("--march-impl", default="auto",
                   choices=("auto", "shearwarp", "pallas", "blocked", "scan"))
    p.add_argument("--background", default="0,0,0",
                   help="background rgb for compositing")
    p.add_argument("--dump-dicom", action="store_true",
                   help="print the DICOM file structure and exit (the "
                        "reference's DumpFileStructure, DCMTKLoader.cpp:67-82)")
    p.add_argument("-v", "--verbose", action="store_true")
    return p


def _orbit_camera(azimuth_deg, elevation_deg, distance, fov):
    from ..scene import Camera

    az = np.radians(azimuth_deg)
    el = np.radians(elevation_deg)
    pos = np.array([
        distance * np.cos(el) * np.sin(az),
        -distance * np.cos(el) * np.cos(az),
        distance * np.sin(el),
    ])
    return Camera.look_at(pos, [0.0, 0.0, 0.0], fov_degrees=fov)


def _write_png(path: str, rgba: np.ndarray, background):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rgb = np.clip(rgba[..., :3], 0.0, 1.0)
    a = np.clip(rgba[..., 3:4], 0.0, 1.0)
    bg = np.asarray(background, np.float32).reshape(1, 1, 3)
    plt.imsave(path, np.clip(rgb + (1.0 - a) * bg, 0.0, 1.0))


def _resolve_tf(name: str):
    from ..ops.transfer import STOCK_TRANSFER_FUNCTIONS

    if name in STOCK_TRANSFER_FUNCTIONS:
        return STOCK_TRANSFER_FUNCTIONS[name]()
    if os.path.exists(name) and name.endswith(".npy"):
        table = np.load(name)
        if table.shape != (256, 4):
            raise SystemExit(f"TF table {name} must be (256, 4), got {table.shape}")
        return table
    raise SystemExit(
        f"unknown TF {name!r}: pick one of "
        f"{sorted(STOCK_TRANSFER_FUNCTIONS)} or pass a .npy file"
    )


def main(argv=None) -> int:
    args = _build_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(levelname)s %(name)s: %(message)s",
    )
    log = logging.getLogger("tbraymarcher.render_cli")

    from ..io import load_volume
    from ..renderer import Renderer, RendererConfig
    from ..scene import ClipPlane, DirLight

    if args.dump_dicom:
        from ..io.minidicom import dump_file_structure

        paths = [args.volume]
        if os.path.isdir(args.volume):
            paths = sorted(
                os.path.join(args.volume, f)
                for f in os.listdir(args.volume)
                if f.lower().endswith(".dcm")
            )
        for path in paths:
            print(dump_file_structure(path))
        return 0

    w, h = (int(v) for v in args.size.lower().split("x"))
    loaded = load_volume(args.volume)
    log.info("loaded %s: dims=%s range=[%g, %g]", args.volume,
             loaded.info.dimensions, loaded.info.min_value,
             loaded.info.max_value)

    cfg = RendererConfig(
        step_count=args.steps,
        render_mode=args.mode,
        light_volume_half_resolution=args.half_res_light,
        march_impl=args.march_impl,
    )
    renderer = Renderer(loaded.data, info=loaded.info,
                        tf_table=_resolve_tf(args.tf), config=cfg)
    if args.window_center is not None:
        renderer.set_window_center(args.window_center)
    if args.window_width is not None:
        renderer.set_window_width(args.window_width)
    if args.no_low_cutoff:
        renderer.set_low_cutoff(False)
    if args.no_high_cutoff:
        renderer.set_high_cutoff(False)
    if args.clip:
        vals = [float(v) for v in args.clip.split(",")]
        renderer.set_clip_plane(ClipPlane.create(vals[:3], vals[3:]))

    light_dir = [float(v) for v in args.light.split(",")]
    renderer.add_light("main", DirLight.create(light_dir, args.light_intensity))

    background = [float(v) for v in args.background.split(",")]
    # --distance is documented in CUBE units: with real metadata the
    # renderer scales the proxy cube to world dimensions (mm -> cm,
    # `RaymarchVolume.cpp:547`), so an absolute 2.2 would sit INSIDE any
    # volume wider than ~4 world units and render a black interior frame.
    # Multiply by the cube's world size (1.0 for bare arrays — behavior
    # there is unchanged).
    world_size = float(np.max(np.asarray(renderer.transform.scale)))
    cam_distance = args.distance * world_size
    n = max(1, args.frames)
    base, ext = os.path.splitext(args.output)
    for i in range(n):
        az = args.orbit + (360.0 * i / n if n > 1 else 0.0)
        cam = _orbit_camera(az, args.elevation, cam_distance, args.fov)
        frame = np.asarray(renderer.render(cam, w, h))
        path = args.output if n == 1 else f"{base}{i:03d}{ext}"
        _write_png(path, frame, background)
        log.info("wrote %s (azimuth %.1f deg, alpha max %.3f)", path, az,
                 frame[..., 3].max())
    return 0


if __name__ == "__main__":
    sys.exit(main())
