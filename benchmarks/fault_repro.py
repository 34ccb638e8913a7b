"""Minimal repro / bisection for the two axon-runtime faults (VERDICT r2 #3).

Round-2 catalogued, but never reduced:
  (a) the XLA blocked march with FLAT 128k-ray tiles at 256^3/1080p faults
      the TPU ("TPU device error — kernel fault");
  (b) the tiled2d (32x32) march's fwd+bwd faults at the same scale.

This script bisects each along one axis at a time (rays per tile, step-block
size, volume size) and prints the smallest failing configuration. Run ONE
level per process (a fault can wedge the runtime for subsequent dispatches):

    python benchmarks/fault_repro.py flat --rays 131072
    python benchmarks/fault_repro.py bwd  --rays 4096

Exit code 0 = ran clean, 2 = device fault (the interesting outcome).
"""

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["flat", "bwd"])
    ap.add_argument("--rays", type=int, default=131072)
    ap.add_argument("--dims", type=int, default=256)
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--block", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tbraymarcherplugin_tpu.ops import march as M
    from tbraymarcherplugin_tpu.ops import synthetic
    from tbraymarcherplugin_tpu.ops import transfer as T
    from tbraymarcherplugin_tpu.ops.rays import RayBatch, setup_rays
    from tbraymarcherplugin_tpu.scene import Camera, VolumeTransform

    dims = (args.dims,) * 3
    vol = jnp.asarray(synthetic.ct_like_phantom(dims, seed=0))
    lv = jnp.ones(dims, jnp.float32)
    tf = T.tf_ct_bone()
    cam = Camera.look_at([0.1, -2.3, 0.4], [0, 0, 0], fov_degrees=40.0)
    rays = setup_rays(cam, VolumeTransform.create(), 1920, 1080)
    n = args.rays
    total = rays.thickness.size
    start = max(0, total // 2 - n // 2)  # center rays: they hit the volume
    flat = RayBatch(
        rays.entry.reshape(-1, 3)[start:start + n],
        rays.direction.reshape(-1, 3)[start:start + n],
        rays.thickness.reshape(-1)[start:start + n],
    )
    win = jnp.asarray([0.5, 0.8, 1.0, 1.0], jnp.float32)
    cc = jnp.asarray([0.0, 0.0, -1e6], jnp.float32)
    cd = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)

    print(f"mode={args.mode} rays={n} dims={dims} block={args.block}",
          flush=True)
    try:
        if args.mode == "flat":
            out = M.march_lit_blocked(
                vol, tf, lv, flat, win, cc, cd, step_count=args.steps,
                block_size=args.block,
            )
            out = jax.block_until_ready(out)
            print("OK checksum", float(np.asarray(out).sum()), flush=True)
        else:
            target = jnp.zeros(flat.thickness.shape + (4,), jnp.float32)

            def loss(v):
                img = M.march_lit_blocked(
                    v, tf, lv, flat, win, cc, cd, step_count=args.steps,
                    block_size=args.block,
                )
                return jnp.mean((img - target) ** 2)

            val, grad = jax.value_and_grad(loss)(vol)
            jax.block_until_ready((val, grad))
            print("OK loss", float(val), "gradsum",
                  float(jnp.abs(grad).sum()), flush=True)
        return 0
    except Exception as e:  # noqa: BLE001
        print(f"FAULT {type(e).__name__}: {e}"[:500], flush=True)
        return 2


if __name__ == "__main__":
    sys.exit(main())
