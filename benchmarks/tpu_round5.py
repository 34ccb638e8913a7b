"""Round-5 fwd+bwd decomposition: trace the differentiated frame and
aggregate device op times from the XLA Ops lane.

Usage (on the TPU):  python benchmarks/tpu_round5.py [--quick] [--top 25]
"""

import argparse
import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_ops(trace_dir):
    paths = glob.glob(
        os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz")
    )
    if not paths:
        return {}
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pids, tids = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    agg = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        if "/device:" not in pids.get(e["pid"], ""):
            continue
        if tids.get((e["pid"], e.get("tid")), "") != "XLA Ops":
            continue
        name = e.get("name", "?")
        agg[name] = agg.get(name, 0.0) + e.get("dur", 0.0) / 1e3
    return agg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--trace-dir", default="/tmp/tbr_r5_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tbraymarcherplugin_tpu.models import (
        LightPlan, RenderParams, render_lit_scene,
    )
    from tbraymarcherplugin_tpu.ops import shearwarp as SWM
    from tbraymarcherplugin_tpu.ops import synthetic
    from tbraymarcherplugin_tpu.ops import transfer as T
    from tbraymarcherplugin_tpu.ops.rays import setup_rays
    from tbraymarcherplugin_tpu.scene import Camera, ClipPlane, VolumeTransform

    if args.quick:
        dims, width, height, step_count = (64, 64, 64), 320, 180, 64
    else:
        dims, width, height, step_count = (256, 256, 256), 1920, 1080, 150

    volume = jnp.asarray(synthetic.ct_like_phantom(dims, seed=0))
    clip = ClipPlane.disabled()
    cam = Camera.look_at([0.1, -2.3, 0.4], [0.0, 0.0, 0.0], fov_degrees=40.0)
    rays = setup_rays(cam, VolumeTransform.create(), width, height)
    plans = (LightPlan.create([0.3, 0.1, -0.95], dims),)
    sw_plan = SWM.plan_shearwarp(
        cam, VolumeTransform.create(), dims, dims, width, height,
        max_planes=step_count,
    )

    def params_with(c):
        return RenderParams(
            volume=volume, tf_table=T.tf_ct_bone(),
            window_center=jnp.asarray(c, jnp.float32),
            window_width=jnp.asarray(0.8),
            light_intensities=jnp.asarray([1.0]),
        )

    def fwd(p):
        return render_lit_scene(
            p, rays, clip.center, clip.direction, plans, dims,
            step_count=step_count, march_impl="shearwarp",
            shearwarp_plan=sw_plan, shearwarp_stop_early=False,
            shearwarp_tf_unit="fused", shearwarp_dtype=jnp.bfloat16,
            illumination_scan_impl="pallas",
            illumination_tf_impl="pallas_vjp",
        )

    target = jax.block_until_ready(jax.lax.stop_gradient(fwd(params_with(0.5))))

    def loss_fn(p):
        return jnp.mean((fwd(p) - target) ** 2)

    vg = jax.jit(jax.value_and_grad(loss_fn))
    out = vg(params_with(0.55))
    jax.block_until_ready(out)
    import time
    t0 = time.perf_counter()
    jax.block_until_ready(vg(params_with(0.56)))
    wall = time.perf_counter() - t0

    shutil.rmtree(args.trace_dir, ignore_errors=True)
    jax.profiler.start_trace(args.trace_dir)
    jax.block_until_ready(vg(params_with(0.57)))
    jax.profiler.stop_trace()

    agg = parse_ops(args.trace_dir)
    total = sum(agg.values())
    print(f"wall {wall * 1e3:.1f} ms; device total {total:.1f} ms "
          f"({len(agg)} distinct ops)")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {ms:9.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
