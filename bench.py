"""Headline benchmark: rays/s/chip, 256³ volume at 1080p lit forward march.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` is measured throughput divided by the BASELINE target of 90%
of the speed-of-light sampling bound for this chip (BASELINE.md: ">=90% of
speed-of-light sampling throughput per chip, 256^3 CT volume @ 1080p").
The speed-of-light model: every march sample must move 8 data-volume corners,
8 light-volume corners and 2 TF texels through HBM at the chip's memory
bandwidth — the march is gather/bandwidth-bound, not FLOP-bound.

Run with --quick for a small CPU-friendly configuration (CI smoke).
"""

import argparse
import json
import sys
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true", help="small config")
    parser.add_argument("--frames", type=int, default=None)
    parser.add_argument("--phases", action="store_true",
                        help="also run the perf-test phase suite to stderr")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tbraymarcherplugin_tpu.models import LightPlan, RenderParams, render_lit_scene
    from tbraymarcherplugin_tpu.ops import synthetic
    from tbraymarcherplugin_tpu.ops import transfer as T
    from tbraymarcherplugin_tpu.ops.rays import setup_rays
    from tbraymarcherplugin_tpu.scene import Camera, ClipPlane, VolumeTransform

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    if args.quick or not on_tpu:
        dims, width, height, step_count = (64, 64, 64), 320, 180, 64
        frames = args.frames or 3
    else:
        dims, width, height, step_count = (256, 256, 256), 1920, 1080, 150
        frames = args.frames or 3

    volume = jnp.asarray(synthetic.ct_like_phantom(dims, seed=0))
    params = RenderParams(
        volume=volume,
        tf_table=T.tf_ct_bone(),
        window_center=jnp.asarray(0.5),
        window_width=jnp.asarray(0.8),
        light_intensities=jnp.asarray([1.0]),
    )
    clip = ClipPlane.disabled()
    cam = Camera.look_at([0.1, -2.3, 0.4], [0.0, 0.0, 0.0], fov_degrees=40.0)
    rays = setup_rays(cam, VolumeTransform.create(), width, height)
    plans = (LightPlan.create([0.3, 0.1, -0.95], dims),)

    def frame(params, rays):
        return render_lit_scene(
            params, rays, clip.center, clip.direction, plans, dims,
            step_count=step_count,
        )

    # Warm up / compile.
    out = frame(params, rays)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(frames):
        out = frame(params, rays)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / frames

    n_rays = width * height
    rays_per_s = n_rays / dt

    # Speed-of-light model (per chip).
    thickness = np.asarray(rays.thickness)
    total_samples = float(np.floor(step_count * thickness).sum())
    bytes_per_sample = (8 + 8) * 4 + 2 * 16  # two trilinear fetches + TF f32x4
    hbm_bw = {
        "TPU v5 lite": 819e9,  # v5e
        "TPU v4": 1228e9,
        "TPU v5p": 2765e9,
        "TPU v6 lite": 1640e9,
    }
    dev_kind = jax.devices()[0].device_kind
    bw = next((v for k, v in hbm_bw.items() if dev_kind.startswith(k)), 819e9)
    sol_time = total_samples * bytes_per_sample / bw
    sol_rays_per_s = n_rays / sol_time if sol_time > 0 else float("inf")
    target = 0.9 * sol_rays_per_s

    print(
        json.dumps(
            {
                "metric": f"rays/s/chip lit fwd {dims[0]}^3 {width}x{height} {step_count}st",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_s / target, 4),
            }
        )
    )

    if args.phases:
        from benchmarks.perf_phases import run_phases

        run_phases(file=sys.stderr)


if __name__ == "__main__":
    main()
