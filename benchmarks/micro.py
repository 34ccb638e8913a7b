"""Primitive-throughput microbenchmarks for the march redesign.

Measures, on the current JAX default device, the rates that decide the
fast-march architecture (SURVEY §7 "hard parts" #1):

  a. march-only / illumination-only split of the bench frame
  b. jnp.take scalar gather rate vs table size (the round-1 march primitive)
  c. one-hot matmul lookup rate (MXU-based gather for small tables)
  d. elementwise HBM bandwidth (streaming bound)
  e. MXU matmul TFLOP/s
  f. Pallas per-lane VMEM gather (if supported on this device)

Every timed step is block_until_ready'd individually (axon runtime rule).
Prints one human-readable line per measurement.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=5, vary=0):
    """Median time of fn(*args), varying args[vary] each call.

    The axon runtime appears to serve repeated identical dispatches without
    re-executing (round-1 VERDICT "stale results" suspicion confirmed by
    impossible bandwidth numbers) — so the varied argument, a float array, is
    scaled by a fresh factor every iteration to force real execution.
    """
    variants = []
    for k in range(n + 1):
        a = list(args)
        if a and hasattr(a[vary], "dtype") and a[vary].dtype.kind == "f":
            a[vary] = a[vary] * (1.0 + 1e-6 * k)
        variants.append(tuple(a))
    jax.block_until_ready(variants)
    out = fn(*variants[0])
    jax.block_until_ready(out)
    ts = []
    for k in range(n):
        t0 = time.perf_counter()
        out = fn(*variants[k + 1])
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    key = jax.random.PRNGKey(0)

    # --- d. elementwise HBM bandwidth
    x = jax.random.normal(key, (64 * 1024 * 1024,))  # 256 MB
    f = jax.jit(lambda x: x * 1.0001 + 0.5)
    dt = timeit(f, x)
    print(f"elementwise 256MB r+w: {dt*1e3:.3f} ms -> {2*x.nbytes/dt/1e9:.1f} GB/s",
          flush=True)

    # --- e. MXU matmul
    a = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
    b = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
    mm = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32))
    dt = timeit(mm, a, b)
    print(f"matmul 4096^3 bf16: {dt*1e3:.3f} ms -> {2*4096**3/dt/1e12:.1f} TFLOP/s",
          flush=True)

    # --- b. jnp.take gather rate vs table size
    n_idx = 16 * 1024 * 1024
    for table_elems in (256, 64**3, 256**3):
        table = jax.random.normal(key, (table_elems,))
        idx = jax.random.randint(key, (n_idx,), 0, table_elems)
        g = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum())
        dt = timeit(g, table, idx)
        print(f"take gather {n_idx/1e6:.0f}M idx from {table_elems} elems: "
              f"{dt*1e3:.3f} ms -> {n_idx/dt/1e9:.3f} G gathers/s", flush=True)

    # --- b2. vector take: gather rows of (table, 128) — lane-aligned
    table = jax.random.normal(key, (8192, 128))
    idx = jax.random.randint(key, (131072,), 0, 8192)
    g = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum())
    dt = timeit(g, table, idx)
    print(f"row gather 131072 rows x128 from (8192,128): {dt*1e3:.3f} ms -> "
          f"{131072*128/dt/1e9:.3f} G elems/s", flush=True)

    # --- c. one-hot matmul lookup (N,256)@(256,4)
    n = 4 * 1024 * 1024
    pos = jax.random.uniform(key, (n,))
    tf = jax.random.normal(key, (256, 4))

    def onehot_lookup(pos, tf):
        p = pos * 255.0
        i0 = jnp.floor(p)
        frac = p - i0
        i0 = i0.astype(jnp.int32)
        # two-hot interp matrix via comparison against iota
        cols = jnp.arange(256)[None, :]
        w = (jnp.maximum(0.0, 1.0 - jnp.abs(cols - (i0[:, None] + frac[:, None]))))
        return jnp.dot(w.astype(jnp.bfloat16), tf.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32).sum()

    dt = timeit(jax.jit(onehot_lookup), pos, tf)
    print(f"one-hot matmul lookup {n/1e6:.0f}M from (256,4): {dt*1e3:.3f} ms -> "
          f"{n/dt/1e9:.3f} G lookups/s", flush=True)

    # --- a. march vs illumination split (quick config)
    from tbraymarcherplugin_tpu.models import (LightPlan, RenderParams,
                                               compute_illumination)
    from tbraymarcherplugin_tpu.ops import march as M
    from tbraymarcherplugin_tpu.ops import synthetic
    from tbraymarcherplugin_tpu.ops import transfer as T
    from tbraymarcherplugin_tpu.ops.rays import setup_rays
    from tbraymarcherplugin_tpu.scene import Camera, ClipPlane, VolumeTransform

    dims, width, height, step_count = (64, 64, 64), 320, 180, 64
    volume = jnp.asarray(synthetic.ct_like_phantom(dims, seed=0))
    params = RenderParams(
        volume=volume, tf_table=T.tf_ct_bone(),
        window_center=jnp.asarray(0.5), window_width=jnp.asarray(0.8),
        light_intensities=jnp.asarray([1.0]),
    )
    clip = ClipPlane.disabled()
    cam = Camera.look_at([0.1, -2.3, 0.4], [0.0, 0.0, 0.0], fov_degrees=40.0)
    rays = setup_rays(cam, VolumeTransform.create(), width, height)
    plans = (LightPlan.create([0.3, 0.1, -0.95], dims),)
    win = jnp.asarray([0.5, 0.8, 1.0, 1.0])

    import dataclasses

    illum = jax.jit(lambda c: compute_illumination(
        dataclasses.replace(params, window_center=c),
        plans, clip.center, clip.direction, dims))
    dt = timeit(illum, jnp.asarray(0.5))
    print(f"illumination only 64^3: {dt*1e3:.3f} ms", flush=True)
    lv = illum(jnp.asarray(0.5))

    m = jax.jit(lambda v, t, l, r: M.march_lit_blocked(
        v, t, l, r, win, clip.center, clip.direction, step_count=step_count))
    dt = timeit(m, params.volume, params.tf_table, lv, rays)
    n_rays = width * height
    print(f"march_lit_blocked only 320x180x64st: {dt*1e3:.3f} ms "
          f"({n_rays/dt/1e6:.2f} Mrays/s)", flush=True)

    # --- f. Pallas VMEM per-lane gather probe
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kern(tab_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

        tab = jax.random.normal(key, (65536,))
        idx = jax.random.randint(key, (8, 131072), 0, 65536)

        def run(tab, idx):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(idx.shape, tab.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(tab, idx)

        dt = timeit(jax.jit(run), tab, idx)
        n = idx.size
        print(f"pallas VMEM take {n/1e6:.1f}M from 64K elems: {dt*1e3:.3f} ms "
              f"-> {n/dt/1e9:.3f} G gathers/s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"pallas VMEM take unsupported: {type(e).__name__}: {e}",
              flush=True)


if __name__ == "__main__":
    main()
