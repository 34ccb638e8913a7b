"""Round-3 on-chip measurement suite (run serially in ONE process).

Measures, with the memoization-safe protocol (varied inputs, per-step
block_until_ready, checksum verification):

  1. shear-warp fwd frame @256^3/1080p (bf16 + stop_early)   [headline]
  2. ditto f32 / no-stop-early variants                      [ablation]
  3. illumination rebuild: pallas scan vs XLA scan           [VERDICT #6]
  4. pallas march fwd (direction-aware window)               [comparison]
  5. fwd+bwd ms/frame via shear-warp + pallas illumination   [headline #2]
  6. device trace of one shear-warp frame                    [profile artifact]

Usage: python benchmarks/tpu_round3.py [--trace-dir DIR] [--skip ...]
"""

import argparse
import json
import sys
import time

import numpy as np


def timed(fn_make, frames=4, tag=""):
    """fn_make(i) -> blocked output; returns (median_s, times, checks)."""
    import jax

    out = fn_make(0)
    jax.block_until_ready(out)
    times, sums = [], []
    for i in range(1, frames + 1):
        t0 = time.perf_counter()
        out = fn_make(i)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
        s = out
        while isinstance(s, (tuple, list)):
            s = s[0]
        sums.append(s.sum())
    checks = [float(jax.device_get(s)) for s in sums]
    stale = len(set(checks)) == 1 and frames > 1
    med = float(np.median(times))
    print(json.dumps({
        "bench": tag, "median_s": round(med, 5),
        "times": [round(t, 5) for t in times], "stale": stale,
    }), flush=True)
    return med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/tbr_trace")
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--only", default=None,
                    help="comma list: sw,ablate,illum,pallas,bwd,trace")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    def want(k):
        return only is None or k in only

    import jax
    import jax.numpy as jnp

    from tbraymarcherplugin_tpu.models import (
        LightPlan, RenderParams, render_lit_scene,
    )
    from tbraymarcherplugin_tpu.models.pipeline import compute_illumination
    from tbraymarcherplugin_tpu.ops import shearwarp as SWM
    from tbraymarcherplugin_tpu.ops import synthetic
    from tbraymarcherplugin_tpu.ops import transfer as T
    from tbraymarcherplugin_tpu.ops.rays import setup_rays
    from tbraymarcherplugin_tpu.scene import Camera, ClipPlane, VolumeTransform

    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    dims, W, H, steps = (256, 256, 256), 1920, 1080, 150
    n_rays = W * H

    volume = jnp.asarray(synthetic.ct_like_phantom(dims, seed=0))

    def params_with(c):
        return RenderParams(
            volume=volume, tf_table=T.tf_ct_bone(),
            window_center=jnp.asarray(0.5 + 1e-4 * c, jnp.float32),
            window_width=jnp.asarray(0.8),
            light_intensities=jnp.asarray([1.0]),
        )

    clip = ClipPlane.disabled()
    cam = Camera.look_at([0.1, -2.3, 0.4], [0.0, 0.0, 0.0], fov_degrees=40.0)
    tr = VolumeTransform.create()
    rays = setup_rays(cam, tr, W, H)
    plans = (LightPlan.create([0.3, 0.1, -0.95], dims),)
    sw_plan = SWM.plan_shearwarp(cam, tr, dims, dims, W, H)
    print(json.dumps({"sw_grid": [sw_plan.n1, sw_plan.n2, sw_plan.k]}),
          flush=True)

    def frame(i, impl="shearwarp", dtype=jnp.bfloat16, stop=True,
              scan="pallas"):
        return render_lit_scene(
            params_with(i), rays, clip.center, clip.direction, plans, dims,
            step_count=steps, march_impl=impl,
            shearwarp_plan=sw_plan if impl == "shearwarp" else None,
            shearwarp_dtype=dtype, shearwarp_stop_early=stop,
            illumination_scan_impl=scan,
        )

    if want("sw"):
        dt = timed(lambda i: frame(i), frames=args.frames,
                   tag="sw bf16 stop pallas-illum")
        print(json.dumps({"rays_per_s": round(n_rays / dt, 1)}), flush=True)

    if want("ablate"):
        from tbraymarcherplugin_tpu.ops.pallas_warp import (
            warp_to_screen_fused,
        )
        from tbraymarcherplugin_tpu.ops.shearwarp_pallas import (
            shearwarp_intermediate_fused,
        )
        lvz = jnp.ones(dims, jnp.float32)

        def fused_only(i, **kw):
            win = jnp.asarray([0.5 + 1e-4 * i, 0.8, 1.0, 1.0], jnp.float32)
            inter = shearwarp_intermediate_fused(
                volume, T.tf_ct_bone(), lvz, sw_plan, win, clip.center,
                clip.direction, **kw,
            )
            return warp_to_screen_fused(inter, sw_plan, W, H)

        timed(lambda i: fused_only(i), frames=3, tag="fused ess+et on")
        timed(lambda i: fused_only(i, debug_no_skip=True), frames=3,
              tag="fused ess off")
        timed(lambda i: fused_only(i, debug_no_skip=True,
                                   early_termination=2.0), frames=3,
              tag="fused ess+et off")
        timed(lambda i: frame(i, dtype=jnp.float32), frames=2,
              tag="sw f32 stop")

    if want("illum"):
        for scan in ("pallas", "xla"):
            f = jax.jit(lambda p, s=scan: compute_illumination(
                p, plans, clip.center, clip.direction, dims, scan_impl=s))
            timed(lambda i, f=f: f(params_with(i)), frames=3,
                  tag=f"illumination {scan}")
        # half-res light volume: the reference's "massive speedup" knob
        half = tuple(d // 2 for d in dims)
        hplans = (LightPlan.create([0.3, 0.1, -0.95], half),)
        fh = jax.jit(lambda p: compute_illumination(
            p, hplans, clip.center, clip.direction, half,
            scan_impl="pallas"))
        timed(lambda i: fh(params_with(i)), frames=3,
              tag="illumination pallas half-res")

    if want("pallas"):
        from tbraymarcherplugin_tpu.ops import pallas_march as PM

        cw = PM.choose_window(rays, dims, steps, light_dims=dims)
        print(json.dumps({"pallas_window": cw[0] if cw else None}),
              flush=True)
        if cw:
            timed(lambda i: frame(i, impl="pallas"), frames=3,
                  tag="pallas march fwd")

    if want("bwd"):
        target = jax.lax.stop_gradient(
            frame(0, stop=False))
        target = jax.block_until_ready(target)

        def loss(p):
            img = render_lit_scene(
                p, rays, clip.center, clip.direction, plans, dims,
                step_count=steps, march_impl="shearwarp",
                shearwarp_plan=sw_plan, shearwarp_stop_early=False,
                shearwarp_tf_unit="pallas",  # custom-VJP TF unit
                illumination_scan_impl="pallas",
                illumination_tf_impl="pallas_vjp",
            )
            return jnp.mean((img - target) ** 2)

        vg = jax.jit(jax.value_and_grad(loss))
        dt = timed(lambda i: vg(params_with(i)), frames=3,
                   tag="fwd+bwd shearwarp f32")
        print(json.dumps({"fwd_bwd_ms": round(dt * 1e3, 2)}), flush=True)

    if want("trace"):
        from tbraymarcherplugin_tpu.utils.profiling import device_trace

        jax.block_until_ready(frame(0))
        with device_trace(args.trace_dir, name="sw_frame"):
            for i in (91, 92):
                jax.block_until_ready(frame(i))
        print(json.dumps({"trace_dir": args.trace_dir}), flush=True)

    return 0


if __name__ == "__main__":
    sys.exit(main())
