"""Multi-device sharding tests on the virtual 8-device CPU mesh
(BASELINE config 5 semantics; scaling numbers come from real hardware)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tbraymarcherplugin_tpu.models import LightPlan, RenderParams, render_lit_scene
from tbraymarcherplugin_tpu.ops import march as M
from tbraymarcherplugin_tpu.ops import synthetic
from tbraymarcherplugin_tpu.ops import transfer as T
from tbraymarcherplugin_tpu.ops.rays import setup_rays
from tbraymarcherplugin_tpu.parallel import (
    compute_illumination_sharded,
    make_mesh,
    make_sharded_train_step,
    march_lit_slab_sharded,
    render_lit_sharded,
)
from tbraymarcherplugin_tpu.models.pipeline import compute_illumination
from tbraymarcherplugin_tpu.scene import Camera, ClipPlane, VolumeTransform

NO_CLIP = ClipPlane.disabled()

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _scene(dims=(16, 16, 16), img=12):
    volume = synthetic.sphere_volume(dims, radius=0.35)
    tf = T.tf_from_keypoints([0, 1], [[0, 0, 0, 0], [1, 1, 1, 1]])
    cam = Camera.look_at([0.3, -2.4, 0.5], [0.0, 0.0, 0.0], fov_degrees=30.0)
    rays = setup_rays(cam, VolumeTransform.create(), img, img)
    params = RenderParams(
        volume=volume,
        tf_table=tf,
        window_center=jnp.asarray(0.5),
        window_width=jnp.asarray(1.0),
        light_intensities=jnp.asarray([1.0]),
    )
    plans = (LightPlan.create([0.2, 0.1, -0.97], dims),)
    return params, rays, plans, dims


def test_ray_sharded_render_matches_single_device():
    params, rays, plans, dims = _scene()
    mesh = make_mesh({"rays": 8})
    sharded = np.asarray(
        render_lit_sharded(
            mesh, params, rays, NO_CLIP.center, NO_CLIP.direction,
            plans, dims, step_count=24,
        )
    )
    single = np.asarray(
        render_lit_scene(
            params, rays, NO_CLIP.center, NO_CLIP.direction, plans, dims,
            step_count=24,
        )
    )
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)


def test_ray_sharded_padding_odd_count():
    # 13x7 = 91 rays, not divisible by 8 -> padding path.
    params, _, plans, dims = _scene()
    cam = Camera.look_at([0.0, -2.5, 0.0], [0.0, 0.0, 0.0], fov_degrees=30.0)
    rays = setup_rays(cam, VolumeTransform.create(), 13, 7)
    mesh = make_mesh({"rays": 8})
    sharded = np.asarray(
        render_lit_sharded(
            mesh, params, rays, NO_CLIP.center, NO_CLIP.direction,
            plans, dims, step_count=16,
        )
    )
    single = np.asarray(
        render_lit_scene(
            params, rays, NO_CLIP.center, NO_CLIP.direction, plans, dims,
            step_count=16,
        )
    )
    assert sharded.shape == (7, 13, 4)
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_sharded_train_step_matches_single_device_grads():
    params, rays, plans, dims = _scene(img=8)
    mesh = make_mesh({"rays": 8})

    def loss_from_image(img, target):
        return jnp.sum((img - target) ** 2)

    flat_rays, _ = __import__(
        "tbraymarcherplugin_tpu.parallel.ray_sharding", fromlist=["pad_rays_for_mesh"]
    ).pad_rays_for_mesh(rays, 8)
    target = render_lit_scene(
        params, flat_rays, NO_CLIP.center, NO_CLIP.direction, plans, dims,
        step_count=16,
    )
    target = target + 0.05  # make the loss nonzero

    step, opt = make_sharded_train_step(
        mesh, loss_from_image, NO_CLIP.center, NO_CLIP.direction, plans, dims,
        step_count=16, optimizer=optax.sgd(1e-3),
    )
    opt_state = opt.init(params)
    p1, _, loss_sharded = step(params, opt_state, flat_rays, target)

    # Single-device reference gradients.
    def full_loss(p):
        img = render_lit_scene(
            p, flat_rays, NO_CLIP.center, NO_CLIP.direction, plans, dims,
            step_count=16,
        )
        return jnp.sum((img - target) ** 2)

    loss_ref, grads_ref = jax.value_and_grad(full_loss)(params)
    np.testing.assert_allclose(
        float(loss_sharded), float(loss_ref), rtol=1e-5
    )
    updates = jax.tree_util.tree_map(lambda g: -1e-3 * g, grads_ref)
    p_ref = optax.apply_updates(params, updates)
    np.testing.assert_allclose(
        np.asarray(p1.tf_table), np.asarray(p_ref.tf_table), rtol=1e-4, atol=1e-7
    )
    np.testing.assert_allclose(
        float(p1.window_center), float(p_ref.window_center), rtol=1e-5
    )


@pytest.mark.slow
def test_slab_sharded_march_matches_single_device():
    params, rays, plans, dims = _scene()
    mesh = make_mesh({"slab": 8})
    lv = compute_illumination(
        params, plans, NO_CLIP.center, NO_CLIP.direction, dims
    )
    win = jnp.array([0.5, 1.0, 1.0, 1.0])
    sharded = np.asarray(
        march_lit_slab_sharded(
            mesh, params.volume, params.tf_table, lv, rays, win,
            NO_CLIP.center, NO_CLIP.direction, step_count=24,
        )
    )
    # Single-device with early termination disabled (the sharded path's
    # documented semantics).
    single = np.asarray(
        M.march_lit(
            params.volume, params.tf_table, lv, rays, win,
            NO_CLIP.center, NO_CLIP.direction, step_count=24,
            early_termination=2.0,
        )
    )
    np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_sharded_illumination_matches_single_device():
    params, rays, plans, dims = _scene()
    mesh = make_mesh({"slab": 8})
    got = np.asarray(
        compute_illumination_sharded(
            mesh, params, plans, NO_CLIP.center, NO_CLIP.direction, dims
        )
    )
    want = np.asarray(
        compute_illumination(
            params, plans, NO_CLIP.center, NO_CLIP.direction, dims
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_2d_mesh_rays_and_slab():
    # Combined mesh: rays DP on one axis, slab sharding available on the other.
    params, rays, plans, dims = _scene()
    mesh = make_mesh({"rays": 4, "slab": 2})
    sharded = np.asarray(
        render_lit_sharded(
            mesh, params, rays, NO_CLIP.center, NO_CLIP.direction,
            plans, dims, step_count=16,
        )
    )
    single = np.asarray(
        render_lit_scene(
            params, rays, NO_CLIP.center, NO_CLIP.direction, plans, dims,
            step_count=16,
        )
    )
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_slab_ring_march_matches_single_device_with_early_termination():
    """The v2 ray-state ring: early termination ON, exact vs march_lit.

    Uses a dense scene (wide opaque sphere + unit-alpha TF) so many rays
    cross the 0.95 snap mid-volume — the case march_lit_slab_sharded cannot
    reproduce.
    """
    from tbraymarcherplugin_tpu.parallel import march_lit_slab_ring

    dims = (16, 16, 16)
    volume = synthetic.sphere_volume(dims, radius=0.45)
    tf = T.tf_from_keypoints([0, 1], [[0, 0, 0, 0.2], [1, 1, 1, 1]])
    cam = Camera.look_at([0.3, -2.4, 0.5], [0.0, 0.0, 0.0], fov_degrees=30.0)
    rays = setup_rays(cam, VolumeTransform.create(), 12, 12)
    lv = jnp.ones(dims, jnp.float32)
    win = jnp.array([0.5, 1.0, 1.0, 1.0])
    mesh = make_mesh({"slab": 8})
    ring = np.asarray(
        march_lit_slab_ring(
            mesh, volume, tf, lv, rays, win,
            NO_CLIP.center, NO_CLIP.direction, step_count=24,
        )
    )
    single = np.asarray(
        M.march_lit(
            volume, tf, lv, rays, win,
            NO_CLIP.center, NO_CLIP.direction, step_count=24,
        )
    )
    # Sanity: the scene actually terminates rays early.
    assert (single[..., 3] == 1.0).any(), "scene never hits the alpha snap"
    np.testing.assert_allclose(ring, single, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_slab_ring_march_negative_z_rays():
    """Rays marching toward -Z ride the ring in reverse slab order."""
    from tbraymarcherplugin_tpu.parallel import march_lit_slab_ring

    dims = (16, 16, 16)
    volume = synthetic.sphere_volume(dims, radius=0.45)
    tf = T.tf_from_keypoints([0, 1], [[0, 0, 0, 0.2], [1, 1, 1, 1]])
    # Camera above looking down: dir_z < 0 for all rays.
    cam = Camera.look_at([0.1, 0.3, 2.4], [0.0, 0.0, 0.0], fov_degrees=30.0)
    rays = setup_rays(cam, VolumeTransform.create(), 10, 10)
    lv = jnp.ones(dims, jnp.float32)
    win = jnp.array([0.5, 1.0, 1.0, 1.0])
    mesh = make_mesh({"slab": 8})
    ring = np.asarray(
        march_lit_slab_ring(
            mesh, volume, tf, lv, rays, win,
            NO_CLIP.center, NO_CLIP.direction, step_count=24,
        )
    )
    single = np.asarray(
        M.march_lit(
            volume, tf, lv, rays, win,
            NO_CLIP.center, NO_CLIP.direction, step_count=24,
        )
    )
    np.testing.assert_allclose(ring, single, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_sharded_illumination_v2_matches_single_device():
    """v2: fully-sharded scan (ring for Z faces, slice-gather for X/Y) — no
    3D all_gather — matches the replicated reference."""
    from tbraymarcherplugin_tpu.parallel import compute_illumination_sharded_v2

    params, rays, plans, dims = _scene()
    # Two lights with different dominant axes so both the ring (Z) and the
    # slice-gather (X/Y) code paths execute.
    plans = (
        LightPlan.create([0.2, 0.1, -0.97], dims),
        LightPlan.create([-0.9, 0.3, 0.3], dims),
    )
    params = dataclasses.replace(
        params, light_intensities=jnp.asarray([1.0, 0.7])
    )
    mesh = make_mesh({"slab": 8})
    got = np.asarray(
        compute_illumination_sharded_v2(
            mesh, params, plans, NO_CLIP.center, NO_CLIP.direction, dims
        )
    )
    want = np.asarray(
        compute_illumination(
            params, plans, NO_CLIP.center, NO_CLIP.direction, dims
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize(
    "vdims,ldims",
    [
        ((32, 32, 32), (16, 16, 16)),  # half-res light: rz == 2 halo math
        ((32, 16, 16), (32, 16, 16)),  # anisotropic dims, min(ld) bounds
    ],
)
def test_sharded_illumination_v2_nonuniform_light_dims(vdims, ldims):
    """ADVICE r2: lock in the k-plane halo sizing and the local
    const-shift trilinear index math for rz > 1 and anisotropic dims —
    the committed v2 test only exercised ld == vd."""
    from tbraymarcherplugin_tpu.parallel import compute_illumination_sharded_v2

    volume = synthetic.ct_like_phantom(vdims, seed=2)
    params = RenderParams(
        volume=jnp.asarray(volume),
        tf_table=T.tf_from_keypoints(
            [0, 1], [[0.2, 0.2, 0.2, 0.1], [1, 1, 1, 0.9]]
        ),
        window_center=jnp.asarray(0.5),
        window_width=jnp.asarray(1.0),
        light_intensities=jnp.asarray([1.0, 0.6]),
    )
    plans = (
        LightPlan.create([0.2, 0.1, -0.97], ldims),
        LightPlan.create([-0.9, 0.3, 0.3], ldims),
    )
    import jax as _jax

    mesh = make_mesh({"slab": 4}, devices=_jax.devices()[:4])
    got = np.asarray(
        compute_illumination_sharded_v2(
            mesh, params, plans, NO_CLIP.center, NO_CLIP.direction, ldims
        )
    )
    want = np.asarray(
        compute_illumination(
            params, plans, NO_CLIP.center, NO_CLIP.direction, ldims
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_overlapped_allreduce_grads_match():
    """Overlap mode (per-use psum_cotangent markers, no bulk psum) must give
    exactly the same gradients/updates as the bulk all-reduce."""
    import optax

    from tbraymarcherplugin_tpu.parallel.ray_sharding import (
        pad_rays_for_mesh,
    )

    params, rays, plans, dims = _scene()
    mesh = make_mesh({"rays": 8})
    flat, _ = pad_rays_for_mesh(rays, 8)
    target = jnp.zeros(flat.thickness.shape + (4,), jnp.float32)

    def loss_fn(img, tgt):
        return jnp.sum((img - tgt) ** 2)

    outs = {}
    for overlap in (False, True):
        step, opt = make_sharded_train_step(
            mesh, loss_fn, NO_CLIP.center, NO_CLIP.direction, plans, dims,
            step_count=8, optimizer=optax.sgd(1e-2),
            overlap_allreduce=overlap,
        )
        opt_state = opt.init(params)
        new_params, _, loss = step(params, opt_state, flat, target)
        outs[overlap] = (np.asarray(loss), new_params)
    np.testing.assert_allclose(outs[False][0], outs[True][0], rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(outs[False][1]),
        jax.tree_util.tree_leaves(outs[True][1]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_sharded_shearwarp_matches_single_device():
    from tbraymarcherplugin_tpu.ops import shearwarp as SW
    from tbraymarcherplugin_tpu.parallel import shearwarp_lit_sharded

    dims = (16, 16, 16)
    vol = jnp.asarray(synthetic.ct_like_phantom(dims, seed=1))
    lv = jnp.ones(dims, jnp.float32)
    tf = T.tf_ct_bone()
    cam = Camera.look_at([0.15, -2.3, 0.35], [0, 0, 0], fov_degrees=35.0)
    tr = VolumeTransform.create()
    win = jnp.asarray([0.5, 0.9, 1.0, 1.0], jnp.float32)
    W, H = 64, 48
    plan = SW.plan_shearwarp(cam, tr, dims, dims, W, H, max_n=128, align=8)
    assert plan is not None and plan.n2 % 8 == 0
    single = np.asarray(
        SW.shearwarp_lit(vol, tf, lv, plan, win, NO_CLIP.center,
                         NO_CLIP.direction, W, H)
    )
    mesh = make_mesh({"rays": 8})
    sharded = np.asarray(
        shearwarp_lit_sharded(
            mesh, vol, tf, lv, plan, win, NO_CLIP.center, NO_CLIP.direction,
            W, H,
        )
    )
    assert single[..., 3].max() > 0.1
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_sharded_diff_shearwarp_grads_match_single_device(rng):
    """The differentiable sharded shear-warp (fused custom-VJP composite
    per column slab + all_gather + banded-warp adjoint, grads inside the
    shard_map with one psum): loss AND gradients must equal the
    single-device fused path."""
    from tbraymarcherplugin_tpu.ops import shearwarp as SW
    from tbraymarcherplugin_tpu.ops.pallas_warp import warp_to_screen_fused
    from tbraymarcherplugin_tpu.ops.shearwarp_grad import (
        shearwarp_intermediate_fused_diff,
    )
    from tbraymarcherplugin_tpu.parallel import (
        make_mesh, shearwarp_lit_sharded_diff,
    )
    from tbraymarcherplugin_tpu.scene import Camera, ClipPlane, VolumeTransform

    dims = (16, 16, 16)
    W, H = 48, 32
    vol = jnp.asarray(synthetic.ct_like_phantom(dims, seed=0))
    lv = jnp.full(dims, 0.7, jnp.float32)
    tf = T.tf_ct_bone()
    cam = Camera.look_at([0.2, -2.3, 0.4], [0, 0, 0], fov_degrees=40.0)
    tr = VolumeTransform.create()
    plan = SW.plan_shearwarp(cam, tr, dims, dims, W, H, max_n=256, align=256)
    assert plan is not None and plan.n2 % 256 == 0
    mesh = make_mesh({"rays": 2, "aux": 4})  # 2-way column slabs
    clip = ClipPlane.disabled()
    win = jnp.asarray([0.45, 0.8, 1.0, 1.0], jnp.float32)
    target = jnp.asarray(rng.random((H, W, 4), dtype=np.float32))

    # forward-only render equals the single-device fused path
    img_sh = np.asarray(shearwarp_lit_sharded_diff(
        mesh, vol, tf, lv, plan, win, clip.center, clip.direction, W, H,
    ))
    inter = shearwarp_intermediate_fused_diff(
        vol, tf, lv, plan, win, clip.center, clip.direction,
    )
    img_1 = np.asarray(warp_to_screen_fused(inter, plan, W, H))
    np.testing.assert_allclose(img_sh, img_1, rtol=1e-5, atol=1e-6)

    # loss + grads (computed inside the shard_map, psum over the axis)
    ls, gs = shearwarp_lit_sharded_diff(
        mesh, vol, tf, lv, plan, win, clip.center, clip.direction, W, H,
        target=target,
    )

    def loss_single(v, t, w):
        it = shearwarp_intermediate_fused_diff(
            v, t, lv, plan, w, clip.center, clip.direction,
        )
        img = warp_to_screen_fused(it, plan, W, H)
        return jnp.sum((img - target) ** 2)

    l1, g1 = jax.value_and_grad(loss_single, argnums=(0, 1, 2))(
        vol, tf, win
    )
    np.testing.assert_allclose(float(ls), float(l1), rtol=1e-5)
    # psum of per-device partial sums reorders the f32 accumulation vs the
    # single-device sequential sum — tolerance reflects that, not algebra
    for name, a, b in zip(("dvol", "dtf", "dwin"), gs, g1):
        b_ = np.asarray(b)
        np.testing.assert_allclose(
            np.asarray(a), b_, rtol=5e-3,
            atol=1e-5 * max(np.abs(b_).max(), 1.0), err_msg=name,
        )
