"""P2/P4: volume slab sharding — the sequence-parallel analogue.

For volumes too large (or too bandwidth-hungry) for one chip, the volume is
sharded into slabs along its Z axis over the ``"slab"`` mesh axis
(SURVEY §2.9 P2). Two components:

- **Slab-sharded march** (:func:`march_lit_slab_sharded`): every device
  marches the full ray batch against only its slab, accumulating the ray
  *segment* that falls inside its Z interval; segments are then composed
  front-to-back per ray. The over operator is associative, so per-slab segment
  compositing is exact. A ray crosses a Z interval at most once (its Z
  coordinate is monotone along the ray), so each segment is contiguous and
  slab order is simply Z order, reversed where the ray points down.
  Trilinear continuity across slab boundaries uses a one-plane halo exchanged
  via `ppermute` — the ring hand-off of the BASELINE north star.
  Early termination is disabled here: segment compositing is exact only
  without the mid-ray alpha snap (single-chip path keeps it).

- **Sharded illumination** (:func:`compute_illumination_sharded`): the
  gather-heavy occluder-opacity field is computed shard-wise, then
  all-gathered; the slice scan itself (bandwidth-trivial, sequential along
  its axis) runs replicated. This keeps the expensive volume gathers local to
  the slab owner for every propagation face uniformly.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.pipeline import LightPlan, RenderParams, _windowing_vec4
from ..ops import lighting as L
from ..ops import march as M
from ..ops.compositing import accumulate, compose_segments
from ..ops.rays import RayBatch
from ..ops.sampling import (
    VOLUME_DENSITY,
    clip_soft_alpha_weight,
    is_clipped,
    sample_windowed_transfer_function,
    trilinear_sample,
)


def _halo_exchange_z(slab, axis_name: str):
    """Append the next device's first Z plane as a +1 halo (last device
    duplicates its own last plane — clamp-to-edge at the volume boundary)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    first_plane = slab[:, :, :1]
    # Shift planes one step "down" the ring: device d receives d+1's plane.
    received = jax.lax.ppermute(
        first_plane, axis_name, [((i + 1) % n, i) for i in range(n)]
    )
    own_last = slab[:, :, -1:]
    halo = jnp.where(idx == n - 1, own_last, received)
    return jnp.concatenate([slab, halo], axis=2)


def _trilinear_slab(slab_halo, uvw, global_dims, z_start):
    """Trilinear sample at global UVW using a local Z slab (+1 halo).

    Valid only where floor(global voxel z) lies in this slab; the caller masks
    contributions by ownership, so out-of-slab lanes may read clamped garbage.
    """
    dims = jnp.asarray(global_dims, jnp.float32)
    p = uvw * dims - 0.5
    i0 = jnp.floor(p)
    frac = p - i0
    i0 = i0.astype(jnp.int32)

    ix0 = jnp.clip(i0[..., 0], 0, global_dims[0] - 1)
    ix1 = jnp.clip(i0[..., 0] + 1, 0, global_dims[0] - 1)
    iy0 = jnp.clip(i0[..., 1], 0, global_dims[1] - 1)
    iy1 = jnp.clip(i0[..., 1] + 1, 0, global_dims[1] - 1)
    # Z: clamp globally, then rebase into the slab (+halo) index space.
    z_len = slab_halo.shape[2] - 1
    iz0 = jnp.clip(jnp.clip(i0[..., 2], 0, global_dims[2] - 1) - z_start, 0, z_len)
    iz1 = jnp.clip(iz0 + 1, 0, z_len)

    flat = slab_halo.reshape(-1)
    sy = slab_halo.shape[1] * slab_halo.shape[2]
    sz = slab_halo.shape[2]

    def corner(ix, iy, iz):
        return jnp.take(flat, ix * sy + iy * sz + iz, axis=0)

    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    c00 = corner(ix0, iy0, iz0) * (1 - fz) + corner(ix0, iy0, iz1) * fz
    c01 = corner(ix0, iy1, iz0) * (1 - fz) + corner(ix0, iy1, iz1) * fz
    c10 = corner(ix1, iy0, iz0) * (1 - fz) + corner(ix1, iy0, iz1) * fz
    c11 = corner(ix1, iy1, iz0) * (1 - fz) + corner(ix1, iy1, iz1) * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx


def _march_segment(
    slab_halo,
    z_start,
    z_count,
    global_dims,
    tf_table,
    light_volume,
    rays: RayBatch,
    windowing_vec4,
    clip_center,
    clip_direction,
    step_count: int,
    compat_final_step: bool = True,
):
    """March all rays, accumulating only samples owned by this slab."""
    step_size = 1.0 / step_count
    step_vec = rays.direction * step_size
    float_actual = step_count * rays.thickness
    n_full = jnp.floor(float_actual)
    final_frac = float_actual - n_full
    step_world = VOLUME_DENSITY * step_size
    n_steps = M.max_march_steps(step_count)

    z_dim = global_dims[2]

    def owned(pos):
        pz = pos[..., 2] * z_dim - 0.5
        iz = jnp.clip(jnp.floor(pz), 0, z_dim - 1)
        return (iz >= z_start) & (iz < z_start + z_count)

    def sample(pos, step_sz):
        value = _trilinear_slab(slab_halo, pos, global_dims, z_start)
        rgba = sample_windowed_transfer_function(
            value, step_sz, tf_table, windowing_vec4
        )
        light = trilinear_sample(light_volume, jnp.clip(pos, 0.0, 1.0))
        return jnp.concatenate(
            [rgba[..., :3] * light[..., None], rgba[..., 3:]], -1
        )

    def body(carry, i):
        pos, energy = carry
        in_range = i < n_full
        pos = jnp.where(in_range[..., None], pos + step_vec, pos)
        active = (
            in_range
            & owned(pos)
            & ~is_clipped(pos, clip_center, clip_direction)
        )
        energy = jnp.where(
            active[..., None], accumulate(energy, sample(pos, step_world)), energy
        )
        return (pos, energy), None

    init = (rays.entry, jnp.zeros(rays.thickness.shape + (4,), jnp.float32))
    (pos, energy), _ = jax.lax.scan(body, init, jnp.arange(n_steps))

    pos_f = pos + step_vec * final_frac[..., None]
    active_f = (
        (final_frac > 0.0)
        & owned(pos_f)
        & ~is_clipped(pos_f, clip_center, clip_direction)
    )
    fs_world = (
        VOLUME_DENSITY * final_frac
        if compat_final_step
        else VOLUME_DENSITY * step_size * final_frac
    )
    energy = jnp.where(
        active_f[..., None], accumulate(energy, sample(pos_f, fs_world)), energy
    )
    return energy


def march_lit_slab_sharded(
    mesh: Mesh,
    volume,  # (X, Y, Z) — sharded as P(None, None, "slab") or replicated input
    tf_table,
    light_volume,
    rays: RayBatch,  # replicated
    windowing_vec4,
    clip_center,
    clip_direction,
    step_count: int = 150,
    axis: str = "slab",
    compat_final_step: bool = True,
):
    """Slab-sharded lit march. Returns (..., 4) image like `march_lit` with
    early termination disabled (see module docstring)."""
    n_shards = mesh.shape[axis]
    global_dims = tuple(volume.shape)
    assert global_dims[2] % n_shards == 0, "Z must divide the slab axis"
    z_count = global_dims[2] // n_shards
    img_shape = rays.thickness.shape
    flat = RayBatch(
        rays.entry.reshape(-1, 3),
        rays.direction.reshape(-1, 3),
        rays.thickness.reshape(-1),
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None, axis), P(), P(), RayBatch(P(), P(), P())),
        out_specs=P(),
        check_vma=False,
    )
    def run(vol_slab, tf, lv, rays_rep):
        my = jax.lax.axis_index(axis)
        slab_halo = _halo_exchange_z(vol_slab, axis)
        seg = _march_segment(
            slab_halo, my * z_count, z_count, global_dims, tf, lv, rays_rep,
            windowing_vec4, clip_center, clip_direction, step_count,
            compat_final_step,
        )
        # Gather all segments: (S, N, 4) everywhere, then compose in Z order
        # (flipped for rays pointing toward -Z).
        segs = jax.lax.all_gather(seg, axis)
        dir_z = rays_rep.direction[..., 2]
        fwd = dir_z >= 0.0

        energy = jnp.zeros(rays_rep.thickness.shape + (4,), jnp.float32)
        n = segs.shape[0]
        for i in range(n):
            idx_fwd = i
            idx_bwd = n - 1 - i
            seg_i = jnp.where(
                fwd[..., None], segs[idx_fwd], segs[idx_bwd]
            )
            energy = compose_segments(energy, seg_i)
        return energy

    out = run(volume, tf_table, light_volume, flat)
    return out.reshape(*img_shape, 4)


def compute_illumination_sharded(
    mesh: Mesh,
    params: RenderParams,
    light_plans: Sequence[LightPlan],
    clip_center,
    clip_direction,
    light_dims,
    axis: str = "slab",
    low_cutoff: bool = True,
    high_cutoff: bool = True,
):
    """Illumination with the occluder-opacity gathers sharded along Z.

    Each device evaluates the opacity field only for its Z slab of the light
    grid (sampling its volume slab + halo), the slabs are all-gathered, and
    the cheap 2D-carry scan runs replicated. Matches
    :func:`~tbraymarcherplugin_tpu.models.pipeline.compute_illumination`.
    """
    n_shards = mesh.shape[axis]
    light_dims = tuple(int(d) for d in light_dims)
    vol_dims = tuple(params.volume.shape)
    assert light_dims[2] % n_shards == 0 and vol_dims[2] % n_shards == 0
    lz = light_dims[2] // n_shards
    win = _windowing_vec4(params, low_cutoff, high_cutoff)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None, axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    def opacity_for_plan(vol_slab, plan_args):
        uvw_off, step_size = plan_args
        my = jax.lax.axis_index(axis)
        slab_halo = _halo_exchange_z(vol_slab, axis)
        # Light-grid coordinates for my Z slab.
        gx = jnp.arange(light_dims[0], dtype=jnp.float32)
        gy = jnp.arange(light_dims[1], dtype=jnp.float32)
        gz = jnp.arange(lz, dtype=jnp.float32) + (my * lz).astype(jnp.float32)
        res = jnp.asarray(light_dims, jnp.float32)
        uvw = (
            jnp.stack(jnp.meshgrid(gx, gy, gz, indexing="ij"), axis=-1) + 0.5
        ) / res + uvw_off
        from ..ops.sampling import clip_soft_alpha_weight

        aw = clip_soft_alpha_weight(uvw, clip_center, clip_direction, res)
        inside = jnp.all((uvw >= 0.0) & (uvw <= 1.0), axis=-1)
        # Volume-slab Z offset: voxel z of my slab start in the data volume.
        value = _trilinear_slab(
            slab_halo, uvw, vol_dims, my * (vol_dims[2] // n_shards)
        )
        opacity = sample_windowed_transfer_function(
            value, step_size * VOLUME_DENSITY, params.tf_table, win
        )[..., 3]
        opac = jnp.where(inside & (aw > 0.0), opacity * aw, 0.0)
        return jax.lax.all_gather(opac, axis, axis=2, tiled=True)

    lv = jnp.zeros(light_dims, jnp.float32)
    for li, plan in enumerate(light_plans):
        intensity = params.light_intensities[li]
        for fp in plan.face_plans:
            opacity = opacity_for_plan(
                params.volume,
                (
                    jnp.asarray(fp.uvw_offset, jnp.float32),
                    jnp.asarray(fp.step_size, jnp.float32),
                ),
            )
            # Replicated scan, same as the single-device path.
            ax = L.transposed_axes(fp.face)
            tdims = (light_dims[ax[0]], light_dims[ax[1]], light_dims[ax[2]])
            opacity_t = jnp.transpose(opacity, ax)
            if L.face_direction(fp.face) == -1:
                opacity_t = jnp.flip(opacity_t, axis=2)
            light_alpha = intensity * fp.light_alpha
            off_px = fp.uv_offset[0] * tdims[0]
            off_py = fp.uv_offset[1] * tdims[1]

            def slice_step(carry, sl):
                prev = L.shift_2d_bilinear_border(carry, off_px, off_py, light_alpha)
                cur = prev * (1.0 - sl)
                return cur, cur

            init = jnp.full((tdims[0], tdims[1]), light_alpha, jnp.float32)
            _, slices = jax.lax.scan(slice_step, init, jnp.moveaxis(opacity_t, 2, 0))
            result_t = jnp.moveaxis(slices, 0, 2)
            if L.face_direction(fp.face) == -1:
                result_t = jnp.flip(result_t, axis=2)
            inv = [0, 0, 0]
            for i, a in enumerate(ax):
                inv[a] = i
            lv = lv + jnp.transpose(result_t, inv)
    return lv


def _trilinear_slab_z_owner(pos_z, z_dim, z_start, z_count):
    iz = jnp.clip(jnp.floor(pos_z * z_dim - 0.5), 0, z_dim - 1)
    return (iz >= z_start) & (iz < z_start + z_count)


def _halo_z_k(slab, axis_name: str, k: int):
    """k-plane Z halo on both sides (ring `ppermute`; global edges replicate
    the boundary plane, matching clamp-to-edge sampling)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    recv_lo = jax.lax.ppermute(
        slab[:, :, -k:], axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    edge_lo = jnp.repeat(slab[:, :, :1], k, axis=2)
    lo = jnp.where(idx == 0, edge_lo, recv_lo)
    recv_hi = jax.lax.ppermute(
        slab[:, :, :k], axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    edge_hi = jnp.repeat(slab[:, :, -1:], k, axis=2)
    hi = jnp.where(idx == n - 1, edge_hi, recv_hi)
    return jnp.concatenate([lo, slab, hi], axis=2)


def _local_const_shift_trilinear(slab_halo, k, vd, ld, lz, off):
    """Slab-local version of `lighting._const_shift_trilinear`.

    ``slab_halo``: my volume Z slab with a k-plane halo each side; the local
    Z start of corner dz is ``k + floor(c_z) + dz`` independent of the shard
    index (light and volume slabs are aligned). x/y are full axes (edge-pad
    like the global path).
    """
    r = tuple(v // l for v, l in zip(vd, ld))
    pads = tuple(
        r[a] + 2 + -(-r[a] * ld[a] // min(ld)) for a in range(3)
    )
    vp = jnp.pad(
        slab_halo, ((pads[0], pads[0]), (pads[1], pads[1]), (0, 0)),
        mode="edge",
    )
    i0, frac = [], []
    for a in range(3):
        c = 0.5 * r[a] - 0.5 + off[a] * vd[a]
        f = jnp.floor(c)
        frac.append(c - f)
        base = pads[a] if a < 2 else k
        hi = (2 * pads[a] if a < 2 else 2 * k) + r[a] - 2
        i0.append(jnp.clip(f.astype(jnp.int32) + base, 0, hi))
    lz_counts = (ld[0], ld[1], lz)
    sizes = tuple((lz_counts[a] - 1) * r[a] + 1 for a in range(3))

    def corner(dx, dy, dz):
        sl = jax.lax.dynamic_slice(
            vp, (i0[0] + dx, i0[1] + dy, i0[2] + dz), sizes
        )
        return sl[:: r[0], :: r[1], :: r[2]]

    fx, fy, fz = frac
    c00 = corner(0, 0, 0) * (1 - fz) + corner(0, 0, 1) * fz
    c01 = corner(0, 1, 0) * (1 - fz) + corner(0, 1, 1) * fz
    c10 = corner(1, 0, 0) * (1 - fz) + corner(1, 0, 1) * fz
    c11 = corner(1, 1, 0) * (1 - fz) + corner(1, 1, 1) * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx


def compute_illumination_sharded_v2(
    mesh: Mesh,
    params: RenderParams,
    light_plans: Sequence[LightPlan],
    clip_center,
    clip_direction,
    light_dims,
    axis: str = "slab",
    low_cutoff: bool = True,
    high_cutoff: bool = True,
):
    """Fully-sharded illumination: no all-gather of any 3D field.

    v1 (:func:`compute_illumination_sharded`) computes the occluder opacity
    shard-wise but then `all_gather`s the full opacity volume and scans it
    replicated — O(volume) communication and replicated memory. v2 keeps
    everything slab-sharded (SURVEY P4, the sharded-scan-with-boundary-
    exchange design):

    - the occluder field is computed per Z slab from a k-plane halo
      (`ppermute` ring, edge replication at global boundaries) with the
      gather-free constant-shift sampling;
    - Z-propagating faces run the slice scan as a **device ring**: the 2D
      carry hops owner-to-owner in propagation order (the march ring's shape,
      `AddDirLightShader.usf:68-128` lifted to the mesh axis);
    - X/Y-propagating faces scan their (unsharded) axis locally; only the
      current 2D slice is all-gathered inside each step (KBs, vs the full
      volume), and each device keeps only its Z chunk of the result.

    Returns the light volume as a global array sharded ``P(None, None,
    axis)``; values match :func:`...models.pipeline.compute_illumination`.
    """
    n_shards = mesh.shape[axis]
    ld = tuple(int(d) for d in light_dims)
    vd = tuple(int(d) for d in params.volume.shape)
    assert ld[2] % n_shards == 0 and vd[2] % n_shards == 0
    assert all(v % l == 0 for v, l in zip(vd, ld)), (
        "v2 needs integer volume/light resolution ratios"
    )
    lz = ld[2] // n_shards
    vz = vd[2] // n_shards
    rz = vd[2] // ld[2]
    win = _windowing_vec4(params, low_cutoff, high_cutoff)
    # Halo must cover the worst-case constant shift (see pads in
    # _local_const_shift_trilinear) plus one stride of corner advance.
    # Halo depth: worst-case |c_z| = 0.5*rz - 0.5 + |off_z|*vd_z with
    # |off_z| <= 1/min(ld), plus one trilinear corner and rz-1 of stride end.
    import math as _math

    k = (
        int(_math.ceil(0.5 * rz - 0.5 + rz * ld[2] / min(ld)))
        + 1
        + (rz - 1)
    )
    assert k <= vz, (
        "Z slab thinner than the occluder-offset halo reach; use fewer "
        "shards or compute_illumination_sharded (v1)"
    )

    face_args = []
    for li, plan in enumerate(light_plans):
        for fp in plan.face_plans:
            face_args.append((li, fp))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None, axis), P()),
        out_specs=P(None, None, axis),
        check_vma=False,
    )
    def run(vol_slab, intensities):
        my = jax.lax.axis_index(axis)
        slab_halo = _halo_z_k(vol_slab, axis, k)
        lv_local = jnp.zeros((ld[0], ld[1], lz), jnp.float32)
        res = jnp.asarray(ld, jnp.float32)

        for li, fp in face_args:
            light_alpha = intensities[li] * fp.light_alpha
            off = jnp.asarray(fp.uvw_offset, jnp.float32)
            # --- local occluder opacity for my light-grid Z slab.
            gx = jnp.arange(ld[0], dtype=jnp.float32)
            gy = jnp.arange(ld[1], dtype=jnp.float32)
            gz = jnp.arange(lz, dtype=jnp.float32) + (my * lz).astype(
                jnp.float32
            )
            uvw = (
                jnp.stack(jnp.meshgrid(gx, gy, gz, indexing="ij"), axis=-1)
                + 0.5
            ) / res + off
            aw = clip_soft_alpha_weight(uvw, clip_center, clip_direction, res)
            inside = jnp.all((uvw >= 0.0) & (uvw <= 1.0), axis=-1)
            value = _local_const_shift_trilinear(slab_halo, k, vd, ld, lz, off)
            opac = sample_windowed_transfer_function(
                value, fp.step_size * VOLUME_DENSITY, params.tf_table, win
            )[..., 3]
            opac = jnp.where(inside & (aw > 0.0), opac * aw, 0.0)

            ax = L.transposed_axes(fp.face)
            a = L.face_axis(fp.face)
            direction = L.face_direction(fp.face)
            tdims = (ld[ax[0]], ld[ax[1]], ld[ax[2]])
            off_px = fp.uv_offset[0] * tdims[0]
            off_py = fp.uv_offset[1] * tdims[1]

            opac_t = jnp.transpose(opac, ax)  # local: 3rd/2nd dim partial

            def slice_update(carry, sl):
                prev = L.shift_2d_bilinear_border(
                    carry, off_px, off_py, light_alpha
                )
                cur = prev * (1.0 - sl)
                return cur, cur

            if a == 2:
                # Ring scan along the sharded axis: carry hops in
                # propagation order.
                if direction == -1:
                    opac_t = jnp.flip(opac_t, axis=2)
                xs = jnp.moveaxis(opac_t, 2, 0)  # (lz, b0, b1)
                carry = jnp.full((tdims[0], tdims[1]), light_alpha, jnp.float32)
                out_local = jnp.zeros_like(xs)
                for t in range(n_shards):
                    owner = t if direction == 1 else n_shards - 1 - t

                    def my_turn(c):
                        return jax.lax.scan(slice_update, c, xs)

                    carry, emitted = jax.lax.cond(
                        my == owner, my_turn,
                        lambda c: (c, jnp.zeros_like(xs)), carry,
                    )
                    out_local = jnp.where(my == owner, emitted, out_local)
                    if t < n_shards - 1:
                        shift = 1 if direction == 1 else -1
                        carry = jax.lax.ppermute(
                            carry, axis,
                            [(i, (i + shift) % n_shards) for i in range(n_shards)],
                        )
                res_t = jnp.moveaxis(out_local, 0, 2)
                if direction == -1:
                    res_t = jnp.flip(res_t, axis=2)
            else:
                # Scan axis is unsharded; buffer dim 1 is the sharded Z.
                if direction == -1:
                    opac_t = jnp.flip(opac_t, axis=2)
                xs = jnp.moveaxis(opac_t, 2, 0)  # (n_slices, b0, lz)

                def sharded_step(carry, sl_local):
                    sl_full = jax.lax.all_gather(
                        sl_local, axis, axis=1, tiled=True
                    )
                    cur, _ = slice_update(carry, sl_full)
                    mine = jax.lax.dynamic_slice_in_dim(
                        cur, my * lz, lz, axis=1
                    )
                    return cur, mine

                carry = jnp.full((tdims[0], tdims[1]), light_alpha, jnp.float32)
                _, slices_local = jax.lax.scan(sharded_step, carry, xs)
                res_t = jnp.moveaxis(slices_local, 0, 2)
                if direction == -1:
                    res_t = jnp.flip(res_t, axis=2)
            inv = [0, 0, 0]
            for i, axv in enumerate(ax):
                inv[axv] = i
            lv_local = lv_local + jnp.transpose(res_t, inv)
        return lv_local

    return run(params.volume, params.light_intensities)


def _ring_march_turn(
    slab_halo,
    z_start,
    z_count,
    global_dims,
    tf_table,
    light_volume,
    rays: RayBatch,
    windowing_vec4,
    clip_center,
    clip_direction,
    energy,
    terminated,
    class_mask,
    step_count: int,
    early_termination: float,
    compat_final_step: bool,
    jitter=None,
):
    """One device's turn in the ray-state ring: march the carried (energy,
    terminated) state through this slab with exact single-chip semantics —
    the step loop mirrors `march.march_lit.one_step` (ownership-masked), so
    early termination (alpha snap at 0.95, `WindowedRaymarchMaterials.usf:
    75-79`) carries across slab boundaries bit-exactly."""
    step_size = 1.0 / step_count
    step_vec = rays.direction * step_size
    float_actual = step_count * rays.thickness
    n_full = jnp.floor(float_actual)
    final_frac = float_actual - n_full
    pos0 = rays.entry
    if jitter is not None:
        pos0 = pos0 - step_vec * jitter[..., None]
    step_world = VOLUME_DENSITY * step_size
    n_steps = M.max_march_steps(step_count)
    z_dim = global_dims[2]

    def owned(pos):
        return _trilinear_slab_z_owner(pos[..., 2], z_dim, z_start, z_count)

    def sample(pos, step_sz):
        value = _trilinear_slab(slab_halo, pos, global_dims, z_start)
        rgba = sample_windowed_transfer_function(
            value, step_sz, tf_table, windowing_vec4
        )
        light = trilinear_sample(light_volume, jnp.clip(pos, 0.0, 1.0))
        return jnp.concatenate(
            [rgba[..., :3] * light[..., None], rgba[..., 3:]], -1
        )

    def body(carry, i):
        pos, energy, term = carry
        in_range = i < n_full
        pos = jnp.where(in_range[..., None], pos + step_vec, pos)
        clipped = is_clipped(pos, clip_center, clip_direction)
        active = class_mask & in_range & ~term & ~clipped & owned(pos)
        energy = jnp.where(
            active[..., None], accumulate(energy, sample(pos, step_world)), energy
        )
        hit = active & (energy[..., 3] > early_termination)
        energy = energy.at[..., 3].set(jnp.where(hit, 1.0, energy[..., 3]))
        term = term | hit
        return (pos, energy, term), None

    (pos, energy, terminated), _ = jax.lax.scan(
        body, (pos0, energy, terminated), jnp.arange(n_steps)
    )

    # Final fractional step: applied exactly once, by the slab owning pos_f
    # (the furthest-z slab the ray touches, hence the last turn that sees it).
    pos_f = pos + step_vec * final_frac[..., None]
    active_f = (
        class_mask
        & ~terminated
        & (final_frac > 0.0)
        & owned(pos_f)
        & ~is_clipped(pos_f, clip_center, clip_direction)
    )
    fs_world = (
        VOLUME_DENSITY * final_frac
        if compat_final_step
        else VOLUME_DENSITY * step_size * final_frac
    )
    energy = jnp.where(
        active_f[..., None], accumulate(energy, sample(pos_f, fs_world)), energy
    )
    return energy, terminated


def march_lit_slab_ring(
    mesh: Mesh,
    volume,  # (X, Y, Z) — sharded P(None, None, "slab") or replicated input
    tf_table,
    light_volume,
    rays: RayBatch,  # replicated
    windowing_vec4,
    clip_center,
    clip_direction,
    step_count: int = 150,
    early_termination: float = 0.95,
    axis: str = "slab",
    compat_final_step: bool = True,
    jitter=None,
):
    """Slab-sharded lit march v2: the SURVEY-P2 ray-state ring.

    Instead of per-slab segments + `all_gather` (:func:`march_lit_slab_sharded`,
    which must disable early termination), the live per-ray carry
    (rgb, alpha, terminated) hops between slab owners via `ppermute` in each
    ray's Z traversal order — the same hand-off shape as the reference's
    slice scan (`AddDirLightShader.usf:68-128`) lifted to the device ring.
    Rays pointing +Z ride the ring 0→1→…→S-1; rays pointing −Z ride it
    S-1→…→0, so with two slabs both devices march on every turn.

    Per-hop communication is O(N_rays) (one 4-vector + flag per ray), and
    early termination is exact: the carried alpha crosses slab boundaries, so
    images match the single-chip :func:`~..ops.march.march_lit` bit-for-bit
    semantics (same masked step loop, same 0.95 snap, same fractional final
    step applied by the owner of its position).

    Trade-off: the ring serializes slab turns (latency ≈ S sequential slab
    marches, 2/S device utilization for S > 2) — it is the exactness-first
    path for volumes too large for one chip; the segment-compositing variant
    remains the throughput path when mid-ray termination may be forfeited.
    """
    n_shards = mesh.shape[axis]
    global_dims = tuple(volume.shape)
    assert global_dims[2] % n_shards == 0, "Z must divide the slab axis"
    z_count = global_dims[2] // n_shards
    img_shape = rays.thickness.shape
    flat = RayBatch(
        rays.entry.reshape(-1, 3),
        rays.direction.reshape(-1, 3),
        rays.thickness.reshape(-1),
    )
    jit_flat = None if jitter is None else jitter.reshape(-1)
    n_rays = flat.thickness.shape[0]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None, axis), P(), P(), RayBatch(P(), P(), P())),
        out_specs=P(),
        check_vma=False,
    )
    def run(vol_slab, tf, lv, rays_rep):
        my = jax.lax.axis_index(axis)
        slab_halo = _halo_exchange_z(vol_slab, axis)
        z_start = my * z_count
        fwd_mask = rays_rep.direction[..., 2] >= 0.0

        def turn(state, class_mask):
            energy, term = state
            return _ring_march_turn(
                slab_halo, z_start, z_count, global_dims, tf, lv, rays_rep,
                windowing_vec4, clip_center, clip_direction,
                energy, term, class_mask, step_count, early_termination,
                compat_final_step, jit_flat,
            )

        zero = (
            jnp.zeros((n_rays, 4), jnp.float32),
            jnp.zeros((n_rays,), bool),
        )
        carry_f, carry_b = zero, zero
        for t in range(n_shards):
            carry_f = jax.lax.cond(
                my == t, lambda c: turn(c, fwd_mask), lambda c: c, carry_f
            )
            carry_b = jax.lax.cond(
                my == n_shards - 1 - t,
                lambda c: turn(c, ~fwd_mask), lambda c: c, carry_b,
            )
            if t < n_shards - 1:
                down = [(i, (i + 1) % n_shards) for i in range(n_shards)]
                up = [(i, (i - 1) % n_shards) for i in range(n_shards)]
                carry_f = jax.tree.map(
                    lambda x: jax.lax.ppermute(x, axis, down), carry_f
                )
                carry_b = jax.tree.map(
                    lambda x: jax.lax.ppermute(x, axis, up), carry_b
                )
        # Final fwd state lives on device S-1, bwd on device 0; one-hot + psum
        # replicates them without a gather.
        e_f = jax.lax.psum(
            jnp.where(my == n_shards - 1, carry_f[0], 0.0), axis
        )
        e_b = jax.lax.psum(jnp.where(my == 0, carry_b[0], 0.0), axis)
        return jnp.where(fwd_mask[..., None], e_f, e_b)

    out = run(volume, tf_table, light_volume, flat)
    return out.reshape(*img_shape, 4)
