"""Microbenchmarks for the shear-warp renderer design (round 3).

WARNING — HISTORICAL / UNSAFE TIMING: these loops time repeated identical
dispatches, which the axon tunnel MEMOIZES — the numbers this script
produced during round 3 were off by orders of magnitude (e.g. "6 PFLOP/s
matmuls") and misled the early design. Kept as a cautionary record; use
`benchmarks/tpu_round3.py`'s varied-input + checksum protocol for any real
measurement.

Originally intended to measure, on the real chip:
  1. small-table gather: jnp.take(256-entry TF, N indices)  [composite TF lookup]
  2. small-bin scatter-add: N values into 256 bins          [dTF histogram]
  3. batched bf16/f32 matmul at pre-shear shapes            [slice resampling]
  4. slice fetch: jnp.take of B slices from a (K, D, D) volume
  5. elementwise composite block (window+lerp-free TF stand-in + blend)

Usage: python benchmarks/micro3.py [--n N_SAMPLES]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=5, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print(f"{name:42s} {dt*1e3:9.3f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=18_662_400)  # 1080*1080*16
    args = ap.parse_args()
    n = args.n
    key = jax.random.PRNGKey(0)

    print(f"device: {jax.devices()[0].device_kind}, n={n}")

    tf = jax.random.uniform(key, (256, 4))
    idx = jax.random.randint(key, (n,), 0, 256)
    fidx = jax.random.uniform(key, (n,), minval=0.0, maxval=1.0)

    @jax.jit
    def take_tf(tf, idx):
        return jnp.take(tf, idx, axis=0).sum()

    dt = timed(take_tf, tf, idx, name="take(256x4 table, N) [TF lookup]")
    print(f"    -> {n/dt/1e9:.2f} G elem/s")

    @jax.jit
    def take_tf_flat(tfflat, idx):
        # 4 channel gathers from flat (256,) tables
        s = 0.0
        for c in range(4):
            s = s + jnp.take(tfflat[c], idx)
        return s.sum()

    tfflat = jnp.transpose(tf)
    dt = timed(take_tf_flat, tfflat, idx, name="4x take(256 flat, N)")
    print(f"    -> {4*n/dt/1e9:.2f} G elem/s")

    g = jax.random.normal(key, (n,))

    @jax.jit
    def scat(idx, g):
        return jnp.zeros((256,), jnp.float32).at[idx].add(g)

    dt = timed(scat, idx, g, name="scatter-add N -> 256 bins [dTF]")
    print(f"    -> {n/dt/1e9:.2f} G elem/s")

    @jax.jit
    def seg(idx, g):
        return jax.ops.segment_sum(g, idx, num_segments=256)

    dt = timed(seg, idx, g, name="segment_sum N -> 256 bins")
    print(f"    -> {n/dt/1e9:.2f} G elem/s")

    # one-hot matmul histogram, chunked so the one-hot stays small
    @jax.jit
    def onehot_hist(idx, g):
        def body(c, x):
            i, v = x
            oh = (i[:, None] == jnp.arange(256)[None, :]).astype(jnp.bfloat16)
            return c + jnp.dot(v.astype(jnp.bfloat16)[None, :], oh,
                               preferred_element_type=jnp.float32)[0], None

        m = idx.shape[0] // (1 << 16) * (1 << 16)
        chunks = idx[:m].reshape(-1, 1 << 16), g[:m].reshape(-1, 1 << 16)
        out, _ = jax.lax.scan(body, jnp.zeros((256,), jnp.float32),
                              (chunks[0], chunks[1]))
        return out

    dt = timed(onehot_hist, idx, g, name="one-hot matmul hist N -> 256")
    print(f"    -> {n/dt/1e9:.2f} G elem/s")

    # pre-shear matmul shapes: (B, D, N) x (B, D, D) batched
    B, D, N = 16, 256, 1152
    s1 = jax.random.normal(key, (B, D, N), jnp.bfloat16)
    v = jax.random.normal(key, (B, D, D), jnp.bfloat16)
    s2 = jax.random.normal(key, (B, D, N), jnp.bfloat16)

    @jax.jit
    def preshear(s1, v, s2):
        t1 = jnp.einsum("bdn,bde->bne", s1, v,
                        preferred_element_type=jnp.float32)
        return jnp.einsum("bne,bem->bnm", t1.astype(jnp.bfloat16), s2,
                          preferred_element_type=jnp.float32)

    dt = timed(preshear, s1, v, s2, name=f"pre-shear matmuls bf16 B={B}")
    fl = 2 * B * (N * D * D + N * D * N)
    print(f"    -> {fl/dt/1e12:.1f} TFLOP/s; full frame ~{dt*256/B*1e3:.1f} ms")

    s1f, vf, s2f = (x.astype(jnp.float32) for x in (s1, v, s2))

    @jax.jit
    def preshear_f32(s1, v, s2):
        t1 = jnp.einsum("bdn,bde->bne", s1, v)
        return jnp.einsum("bne,bem->bnm", t1, s2)

    dt = timed(preshear_f32, s1f, vf, s2f, name=f"pre-shear matmuls f32 B={B}")
    print(f"    -> {fl/dt/1e12:.1f} TFLOP/s; full frame ~{dt*256/B*1e3:.1f} ms")

    # slice fetch: take B rows of (K, D, D)
    K = 256
    vol = jax.random.normal(key, (K, D, D))
    rows = jnp.arange(B, dtype=jnp.int32) * 3 % K

    @jax.jit
    def slab(vol, rows):
        return jnp.take(vol, rows, axis=0).sum()

    dt = timed(slab, vol, rows, name="take B slices of (256,256,256)")
    print(f"    -> {B*D*D*4/dt/1e9:.1f} GB/s")

    # elementwise composite stand-in on (B, N, N): window + exp/log + blend
    x = jax.random.uniform(key, (B, N, N))
    sw = jax.random.uniform(key, (N, N)) + 0.5

    @jax.jit
    def composite(x, sw):
        tfp = (x - 0.4) / 0.7
        cut = (tfp < 0) | (tfp > 1)
        a = jnp.clip(tfp, 0.0, 1.0)
        a = 1.0 - jnp.exp(sw * jnp.log(jnp.maximum(1.0 - a, 1e-10)))
        a = jnp.where(cut, 0.0, a)
        t = jnp.cumprod(1.0 - a, axis=0)
        te = jnp.concatenate([jnp.ones_like(t[:1]), t[:-1]], axis=0)
        w = te * a
        rgb = jnp.sum(w[..., None] * x[..., None], axis=0)
        return rgb.sum() + t[-1].sum()

    dt = timed(composite, x, sw, name=f"composite algebra (no TF) B={B}")
    print(f"    -> full frame ~{dt*256/B*1e3:.1f} ms")


if __name__ == "__main__":
    main()
