"""In-program chained microbenchmarks (axon-safe timing).

Single-dispatch timing on the axon platform is unreliable (micro.py measures
1.5 PFLOP/s matmuls on a v5e — impossible), but long single programs time
correctly.  So each primitive is iterated N times inside one jitted
`lax.scan` with a data dependency between iterations, and per-iteration cost
is (t_N - t_1) / (N - 1).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(make_fn, n_hi=64, n_lo=2):
    """Per-iteration seconds from two chain lengths (removes fixed overhead)."""
    ts = {}
    for n in (n_lo, n_hi):
        fn = jax.jit(make_fn(n))
        out = fn(jnp.asarray(1.0))
        jax.block_until_ready(out)
        reps = []
        for k in range(3):
            seed = jnp.asarray(1.0 + 1e-6 * (k + 1))
            t0 = time.perf_counter()
            out = fn(seed)
            jax.block_until_ready(out)
            reps.append(time.perf_counter() - t0)
        ts[n] = float(np.median(reps))
    return (ts[n_hi] - ts[n_lo]) / (n_hi - n_lo)


def main():
    which = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else {
        "ew", "mm", "take", "coherent", "ds", "onehot"}
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    key = jax.random.PRNGKey(0)

    if "ew" in which:
        _bench_ew(key)
    if "mm" in which:
        _bench_mm(key)
    if "take" in which:
        _bench_take(key)
    if "coherent" in which:
        _bench_coherent(key)
    if "ds" in which:
        _bench_ds(key)
    if "onehot" in which:
        _bench_onehot(key)
    if "rowgather" in which:
        _bench_rowgather(key)
    if "warp" in which:
        _bench_warp(key)
    if "banded" in which:
        _bench_banded(key)


def _bench_ew(key):
    # --- elementwise HBM bandwidth
    big = jax.random.normal(key, (32 * 1024 * 1024,))  # 128 MB

    def make_ew(n):
        def fn(seed):
            def body(c, _):
                return c * 1.000001 + seed * 1e-9, None
            c, _ = jax.lax.scan(body, big * seed, None, length=n)
            return c[0]
        return fn

    dt = chain_time(make_ew)
    print(f"elementwise 128MB r+w: {dt*1e3:.4f} ms/iter -> "
          f"{2*big.nbytes/dt/1e9:.1f} GB/s", flush=True)


def _bench_mm(key):
    # --- MXU matmul
    a0 = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
    b0 = jax.random.normal(key, (4096, 4096), jnp.bfloat16) * 0.01

    def make_mm(n):
        def fn(seed):
            def body(c, _):
                c = jnp.dot(c, b0, preferred_element_type=jnp.float32)
                c = (c * 0.001).astype(jnp.bfloat16)
                return c, None
            c, _ = jax.lax.scan(body, a0 * seed.astype(jnp.bfloat16), None,
                                length=n)
            return c[0, 0]
        return fn

    dt = chain_time(make_mm, n_hi=16)
    print(f"matmul 4096^3 bf16: {dt*1e3:.4f} ms/iter -> "
          f"{2*4096**3/dt/1e12:.1f} TFLOP/s", flush=True)


def _bench_take(key):
    # --- jnp.take scalar gather, table sizes
    n_idx = 16 * 1024 * 1024
    idx0 = jax.random.randint(key, (n_idx,), 0, 256)
    for table_elems in (256, 64**3, 256**3):
        table = jax.random.normal(key, (table_elems,))
        idx = jax.random.randint(key, (n_idx,), 0, table_elems)

        def make_g(n, table=table, idx=idx, table_elems=table_elems):
            def fn(seed):
                def body(c, _):
                    i = (idx + c.astype(jnp.int32)) % table_elems
                    v = jnp.take(table, i, axis=0)
                    return v.max(), None
                c, _ = jax.lax.scan(body, seed, None, length=n)
                return c
            return fn

        dt = chain_time(make_g, n_hi=16)
        print(f"take gather {n_idx/1e6:.0f}M idx from {table_elems}: "
              f"{dt*1e3:.4f} ms/iter -> {n_idx/dt/1e9:.3f} G gathers/s",
              flush=True)


def _bench_coherent(key):
    # --- gather with 2D spatially-coherent indices (march-like)
    n_idx = 16 * 1024 * 1024
    vol = jax.random.normal(key, (256 ** 3,))
    base = jnp.arange(n_idx) % (256 ** 3 - 260)

    def make_gc(n):
        def fn(seed):
            def body(c, k):
                i = base + k
                v = jnp.take(vol, i, axis=0)
                return c + v.max(), None
            c, _ = jax.lax.scan(body, seed, jnp.arange(n))
            return c
        return fn

    dt = chain_time(make_gc, n_hi=16)
    print(f"coherent take {n_idx/1e6:.0f}M idx from 256^3: "
          f"{dt*1e3:.4f} ms/iter -> {n_idx/dt/1e9:.3f} G gathers/s", flush=True)


def _bench_ds(key):
    # --- dynamic_slice rate (per-tile volume staging alternative)
    vol = jax.random.normal(key, (256 ** 3,))
    def make_ds(n):
        def fn(seed):
            def body(c, k):
                s = jax.lax.dynamic_slice(vol, (k * 1024,), (65536,))
                return c + s.max(), None
            c, _ = jax.lax.scan(body, seed, jnp.arange(n))
            return c
        return fn

    dt = chain_time(make_ds, n_hi=64)
    print(f"dynamic_slice 64K elems: {dt*1e3:.4f} ms/iter -> "
          f"{65536*4/dt/1e9:.1f} GB/s", flush=True)


def _bench_onehot(key):
    # --- one-hot matmul lookup
    npos = 4 * 1024 * 1024
    pos0 = jax.random.uniform(key, (npos,))
    tf = jax.random.normal(key, (256, 4))

    def make_oh(n):
        def fn(seed):
            def body(c, _):
                p = (pos0 + c * 1e-9) * 255.0
                i0 = jnp.floor(p)
                frac = p - i0
                cols = jnp.arange(256, dtype=jnp.float32)[None, :]
                w = jnp.maximum(
                    0.0, 1.0 - jnp.abs(cols - (i0[:, None] + frac[:, None]))
                )
                v = jnp.dot(w.astype(jnp.bfloat16), tf.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                return v.max(), None
            c, _ = jax.lax.scan(body, seed, None, length=n)
            return c
        return fn

    dt = chain_time(make_oh, n_hi=16)
    print(f"one-hot matmul lookup {npos/1e6:.0f}M from (256,4): "
          f"{dt*1e3:.4f} ms/iter -> {npos/dt/1e9:.3f} G lookups/s", flush=True)




def _bench_rowgather(key):
    # --- row gather: take full (128,) lanes rows from a 2D table
    table = jax.random.normal(key, (65536, 128))
    n_rows = 131072
    idx = jax.random.randint(key, (n_rows,), 0, 65536)

    def make(n):
        def fn(seed):
            def body(c, _):
                i = (idx + c.astype(jnp.int32)) % 65536
                v = jnp.take(table, i, axis=0)
                return v.max(), None
            c, _ = jax.lax.scan(body, seed, None, length=n)
            return c
        return fn

    dt = chain_time(make, n_hi=16)
    print(f"row gather {n_rows} rows x128 from (65536,128): "
          f"{dt*1e3:.4f} ms/iter -> {n_rows*128*4/dt/1e9:.1f} GB/s "
          f"({n_rows/dt/1e6:.1f} M rows/s)", flush=True)


def _bench_warp(key):
    # --- full-image bilinear warp via scalar takes (2M px, 4 corners)
    img = jax.random.normal(key, (1024, 1024))
    h, w = 1080, 1920
    yy = jnp.linspace(10.0, 1000.0, h)[:, None] + jnp.zeros((1, w))
    xx = jnp.linspace(10.0, 1000.0, w)[None, :] + jnp.zeros((h, 1))
    yy = yy + 3.0 * jnp.sin(xx * 0.01)

    def make(n):
        def fn(seed):
            def body(c, _):
                y = yy + c * 1e-6
                x = xx
                y0 = jnp.floor(y).astype(jnp.int32)
                x0 = jnp.floor(x).astype(jnp.int32)
                fy, fx = y - y0, x - x0
                flat = img.reshape(-1)

                def g(dy, dx):
                    lin = (y0 + dy) * 1024 + (x0 + dx)
                    return jnp.take(flat, lin.reshape(-1), axis=0).reshape(h, w)

                v = ((g(0, 0) * (1 - fy) + g(1, 0) * fy) * (1 - fx)
                     + (g(0, 1) * (1 - fy) + g(1, 1) * fy) * fx)
                return v.max(), None
            c, _ = jax.lax.scan(body, seed, None, length=n)
            return c
        return fn

    dt = chain_time(make, n_hi=8)
    print(f"bilinear warp 1080p from 1024^2: {dt*1e3:.4f} ms/iter "
          f"({h*w/dt/1e6:.1f} M px/s)", flush=True)


def _bench_banded(key):
    # --- banded-resample matmul: (512,256)@(256,256)@(256,512) per slice
    s = jax.random.normal(key, (256, 256), jnp.bfloat16)
    wx = jax.random.normal(key, (512, 256), jnp.bfloat16)
    wy = jax.random.normal(key, (256, 512), jnp.bfloat16)

    def make(n):
        def fn(seed):
            def body(c, _):
                out = jnp.dot(jnp.dot(wx, c, preferred_element_type=jnp.float32
                                      ).astype(jnp.bfloat16), wy,
                              preferred_element_type=jnp.float32)
                return (out[:256, :256] * 1e-3).astype(jnp.bfloat16), None
            c, _ = jax.lax.scan(body, s * seed.astype(jnp.bfloat16), None,
                                length=n)
            return c[0, 0]
        return fn

    dt = chain_time(make, n_hi=64)
    flops = 2 * (512 * 256 * 256 + 256 * 512 * 256)
    print(f"slice resample 2x matmul (512,256,256): {dt*1e3:.4f} ms/iter -> "
          f"{flops/dt/1e12:.1f} TFLOP/s", flush=True)

if __name__ == "__main__":
    main()
