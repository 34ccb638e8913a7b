"""Elementwise windowed-TF-alpha Pallas kernel.

`occluder_opacity_volume` evaluates the windowed TF alpha for every light
voxel; XLA's ~90M elem/s scalarized table gathers made that the illumination
rebuild's dominant cost (~130 ms at 256^3). This kernel does the 256-texel
alpha lookup with packed lane shuffles (`pallas_march._sample_tf_packed`'s
channel-3 path) — a few vector ops per 1024 voxels.

Matches `sample_windowed_transfer_function(...)[..., 3]` exactly (same
cutoff semantics, same clamp, same step-size correction).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_march import _pack_tf


def _ceil_to(n: int, m: int) -> int:
    return -(-n // m) * m


def _alpha_kernel(sc_ref, tf_ref, val_ref, out_ref):
    center = sc_ref[0, 0]
    width = sc_ref[0, 1]
    low_c = sc_ref[0, 2]
    high_c = sc_ref[0, 3]
    step = sc_ref[0, 4]

    v = val_ref[:]
    tf_pos = (v - center + width * 0.5) / width
    cut = ((tf_pos < 0.0) & (low_c > 0.0)) | ((tf_pos > 1.0) & (high_c > 0.0))

    x = tf_pos * 256.0 - 0.5
    i0f = jnp.floor(x)
    frac = x - i0f
    i0 = jnp.clip(i0f, 0.0, 255.0).astype(jnp.int32)
    i1 = jnp.clip(i0f + 1.0, 0.0, 255.0).astype(jnp.int32)
    tfp = tf_ref[:]

    def chan_a(idx):
        li = idx & 127
        hi = idx >> 7
        r0 = jnp.take_along_axis(
            jnp.broadcast_to(tfp[6:7, :], idx.shape), li, axis=1
        )
        r1 = jnp.take_along_axis(
            jnp.broadcast_to(tfp[7:8, :], idx.shape), li, axis=1
        )
        return jnp.where(hi == 0, r0, r1)

    a0 = chan_a(i0)
    a1 = chan_a(i1)
    alpha = jnp.clip(a0 + (a1 - a0) * frac, 0.0, 1.0)
    alpha = 1.0 - jnp.exp(step * jnp.log(jnp.maximum(1.0 - alpha, 1e-10)))
    out_ref[:] = jnp.where(cut, 0.0, alpha)


@partial(jax.jit, static_argnames=("interpret",))
def windowed_tf_alpha(
    values: jnp.ndarray,
    tf_table: jnp.ndarray,
    windowing_vec4: jnp.ndarray,
    step_size,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Step-corrected windowed TF alpha per element (any shape).

    Drop-in for ``sample_windowed_transfer_function(values, step_size,
    tf_table, windowing_vec4)[..., 3]`` with a scalar ``step_size``.
    Forward-only (callers needing gradients use the XLA path).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    shape = values.shape
    n = 1
    for d in shape:
        n *= int(d)
    rows = _ceil_to(max(n, 1), 1024) // 128
    flat = jnp.pad(values.reshape(-1), (0, rows * 128 - n)).reshape(rows, 128)
    win = jnp.asarray(windowing_vec4, jnp.float32)
    sc = jnp.stack([
        win[0], win[1], win[2], win[3],
        jnp.asarray(step_size, jnp.float32),
    ]).reshape(1, 5)
    out = pl.pallas_call(
        _alpha_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        grid=(rows // 8,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(sc, _pack_tf(tf_table), flat)
    return out.reshape(-1)[:n].reshape(shape)
