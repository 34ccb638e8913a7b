"""Round-5 backward-composite ablations: stream dtype x histogram.

Times fused_composite (the custom-VJP pair alone, pre-sheared fields built
once outside the timer) under the K-frame amortized protocol.

Usage: python benchmarks/r5_bwd_ablation.py [--quick]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--k", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tbraymarcherplugin_tpu.ops import shearwarp as SWM
    from tbraymarcherplugin_tpu.ops import shearwarp_grad as G
    from tbraymarcherplugin_tpu.ops import synthetic
    from tbraymarcherplugin_tpu.ops import transfer as T
    from tbraymarcherplugin_tpu.scene import Camera, ClipPlane, VolumeTransform

    if args.quick:
        dims, width, height, step_count = (64, 64, 64), 320, 180, 64
    else:
        dims, width, height, step_count = (256, 256, 256), 1920, 1080, 150

    volume = jnp.asarray(synthetic.ct_like_phantom(dims, seed=0))
    tf = T.tf_ct_bone()
    clip = ClipPlane.disabled()
    cam = Camera.look_at([0.1, -2.3, 0.4], [0.0, 0.0, 0.0], fov_degrees=40.0)
    plan = SWM.plan_shearwarp(
        cam, VolumeTransform.create(), dims, dims, width, height,
        max_planes=step_count,
    )
    lv = jnp.ones(dims, jnp.float32) * 0.7

    def run_case(dtype, k=args.k):
        # hist on/off is controlled by TBR_DISABLE_HIST in a FRESH process
        # (trace-time global, not part of the jit cache key).

        def one(c):
            win = jnp.stack([c, jnp.float32(0.8), jnp.float32(1.0),
                             jnp.float32(1.0)])

            def loss(t):
                img = G.shearwarp_intermediate_fused_diff(
                    volume, t, lv, plan, win, clip.center, clip.direction,
                    compute_dtype=dtype,
                )
                return jnp.mean(img * img)

            l, g = jax.value_and_grad(loss)(tf)
            return jnp.stack([l, jnp.sum(jnp.abs(g))])

        batched = jax.jit(lambda cs: jax.lax.map(one, cs))
        base = np.linspace(0.46, 0.54, k, dtype=np.float32)
        jax.block_until_ready(batched(jnp.asarray(base)))
        times, checks = [], []
        for r in range(3):
            cs = base + (r + 1) * 1e-3
            t0 = time.perf_counter()
            out = jax.block_until_ready(batched(jnp.asarray(cs)))
            times.append((time.perf_counter() - t0) / k)
            checks.append(np.asarray(out))
        ok = all(len(set(map(float, c[:, 0]))) == k for c in checks)
        return float(np.median(times)) * 1e3, ok, checks[0][0]

    for dtype in (jnp.float32, jnp.bfloat16):
        try:
            ms, ok, chk = run_case(dtype)
            print(f"dtype={jnp.dtype(dtype).name:9s} "
                  f"hist={not G._DISABLE_HIST!s:5s} "
                  f"-> {ms:8.2f} ms/frame  checksums_ok={ok} "
                  f"loss={chk[0]:.6f} gsum={chk[1]:.4f}", flush=True)
        except Exception as e:
            print(f"dtype={jnp.dtype(dtype).name} FAILED "
                  f"{type(e).__name__}: {e}"[:300], flush=True)


if __name__ == "__main__":
    main()
