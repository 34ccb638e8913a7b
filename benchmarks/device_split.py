"""Device-time vs dispatch-latency split for the headline frame.

The axon tunnel adds a fixed per-frame round-trip (~25-30 ms) that no
directly-attached deployment would pay. This script renders the cached-light
shear-warp frame under an XProf trace, sums TPU-lane op durations per frame,
and prints wall vs device so the direct-hardware throughput is derivable
(VERDICT r3 ask #2). Usage: python benchmarks/device_split.py [--quick]
"""

import argparse
import glob
import gzip
import json
import os
import shutil
import time


def parse_device_ms(trace_dir):
    """Sum TPU device-lane op durations from a perfetto trace (ms)."""
    paths = glob.glob(
        os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz")
    )
    if not paths:
        return None, None
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # Sum ONLY the device "XLA Modules" thread — the "XLA Ops" thread holds
    # the same intervals at op granularity (summing both double-counts).
    pids = {}
    tids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    total = 0.0
    n = 0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pids.get(e["pid"], "")
        tname = tids.get((e["pid"], e.get("tid")), "")
        if "/device:" in pname and tname == "XLA Modules":
            total += e.get("dur", 0.0)
            n += 1
    return total / 1e3, n  # us -> ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--trace-dir", default="/tmp/tbr_split_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tbraymarcherplugin_tpu.models import LightPlan, RenderParams
    from tbraymarcherplugin_tpu.models.pipeline import compute_illumination
    from tbraymarcherplugin_tpu.ops import shearwarp as SWM
    from tbraymarcherplugin_tpu.ops import synthetic
    from tbraymarcherplugin_tpu.ops import transfer as T
    from tbraymarcherplugin_tpu.ops.pallas_warp import warp_to_screen_fused
    from tbraymarcherplugin_tpu.ops.shearwarp_pallas import (
        shearwarp_intermediate_fused,
    )
    from tbraymarcherplugin_tpu.scene import Camera, ClipPlane, VolumeTransform

    if args.quick:
        dims, width, height, steps = (64, 64, 64), 320, 180, 64
    else:
        dims, width, height, steps = (256, 256, 256), 1920, 1080, 150
    volume = jnp.asarray(synthetic.ct_like_phantom(dims, seed=0))
    tf = T.tf_ct_bone()
    cam = Camera.look_at([0.1, -2.3, 0.4], [0, 0, 0], fov_degrees=40.0)
    tr = VolumeTransform.create()
    clip = ClipPlane.disabled()
    plan = SWM.plan_shearwarp(cam, tr, dims, dims, width, height,
                              max_planes=steps)
    params = RenderParams(
        volume=volume, tf_table=tf, window_center=jnp.asarray(0.5),
        window_width=jnp.asarray(0.8), light_intensities=jnp.asarray([1.0]),
    )
    plans = (LightPlan.create([0.3, 0.1, -0.95], dims),)
    lv = jax.block_until_ready(jax.jit(lambda p: compute_illumination(
        p, plans, clip.center, clip.direction, dims, scan_impl="pallas",
    ))(params))

    @jax.jit
    def frame(center):
        win = jnp.stack([center, jnp.float32(0.8), jnp.float32(1.0),
                         jnp.float32(1.0)])
        inter = shearwarp_intermediate_fused(
            volume, tf, lv, plan, win, clip.center, clip.direction,
            compute_dtype=jnp.bfloat16,
        )
        return warp_to_screen_fused(inter, plan, width, height)

    jax.block_until_ready(frame(jnp.float32(0.5)))
    shutil.rmtree(args.trace_dir, ignore_errors=True)
    walls = []
    jax.profiler.start_trace(args.trace_dir)
    for i in range(args.frames):
        c = jnp.float32(0.5 + 1e-4 * (i + 1))
        t0 = time.perf_counter()
        jax.block_until_ready(frame(c))
        walls.append(time.perf_counter() - t0)
    jax.profiler.stop_trace()

    dev_ms, n_ops = parse_device_ms(args.trace_dir)
    wall_ms = float(np.median(walls)) * 1e3
    out = {
        "wall_ms_per_frame": round(wall_ms, 2),
        "device_ms_total": None if dev_ms is None else round(dev_ms, 2),
        "frames": args.frames,
        "device_ms_per_frame": None if dev_ms is None else round(
            dev_ms / args.frames, 2
        ),
        "dispatch_latency_ms": None if dev_ms is None else round(
            wall_ms - dev_ms / args.frames, 2
        ),
        "n_device_ops": n_ops,
        "rays_per_s_wall": round(width * height / (wall_ms / 1e3), 0),
        "rays_per_s_device": None if dev_ms is None else round(
            width * height / (dev_ms / args.frames / 1e3), 0
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
