"""Octree (max-mip pyramid) tests (SURVEY §2.3)."""

import numpy as np
import jax.numpy as jnp

from tbraymarcherplugin_tpu.ops import octree as O
from tbraymarcherplugin_tpu.ops import synthetic
from tbraymarcherplugin_tpu.ops import transfer as T
from tbraymarcherplugin_tpu.ops.rays import setup_rays
from tbraymarcherplugin_tpu.scene import Camera, ClipPlane, VolumeTransform

NO_CLIP = ClipPlane.disabled()


def test_build_octree_shapes_pow2_padding():
    vol = jnp.ones((24, 16, 10), jnp.float32)
    oc = O.build_octree(vol)
    assert oc.mips[0].shape == (32, 16, 16)
    assert oc.mips[1].shape == (16, 8, 8)
    assert oc.mips[3].shape == (4, 2, 2)
    assert oc.data_dims == (24, 16, 10)


def test_octree_max_reduction(rng):
    vol = jnp.asarray(rng.random((16, 16, 16), dtype=np.float32))
    oc = O.build_octree(vol, max_value=1.0)
    v = np.asarray(vol)
    m1 = np.asarray(oc.mips[1])
    # Each mip-1 cell is the max of its 2x2x2 block.
    want = v.reshape(8, 2, 8, 2, 8, 2).max(axis=(1, 3, 5))
    np.testing.assert_allclose(m1, want, rtol=1e-6)
    m3 = np.asarray(oc.mips[3])
    np.testing.assert_allclose(m3.max(), v.max(), rtol=1e-6)


def test_octree_max_value_scaling(rng):
    vol = jnp.asarray(rng.random((8, 8, 8), dtype=np.float32))
    oc = O.build_octree(vol, max_value=0.5)
    np.testing.assert_allclose(
        np.asarray(oc.mips[0]), np.asarray(vol) * 0.5, rtol=1e-6
    )


def test_load_mip_nearest(rng):
    vol = jnp.asarray(rng.random((8, 8, 8), dtype=np.float32))
    oc = O.build_octree(vol)
    got = float(O.load_mip_nearest(oc.mips[0], jnp.array([2.7, 3.2, 4.9])))
    assert np.isclose(got, float(vol[2, 3, 4]))


# Alpha-ramp TF: the reference's default TF has alpha == 1 everywhere
# (`RaymarchUtils.cpp:128`), which saturates the first empty-space sample to
# opaque black and hides any mip/occupancy differences in these tests.
RAMP_TF = T.tf_from_keypoints([0, 1], [[0, 0, 0, 0], [1, 1, 1, 1]])


def test_octree_march_mip0_close_to_nearest_render():
    volume = synthetic.sphere_volume((32, 32, 32))
    tf = RAMP_TF
    oc = O.build_octree(volume)
    cam = Camera.look_at([0.0, -2.5, 0.0], [0.0, 0.0, 0.0], fov_degrees=30.0)
    rays = setup_rays(cam, VolumeTransform.create(), 16, 16)
    win = jnp.array([0.5, 1.0, 1.0, 1.0])
    img0 = np.asarray(
        O.march_octree(oc, tf, rays, win, NO_CLIP.center, NO_CLIP.direction,
                       step_count=64, mip=0)
    )
    img2 = np.asarray(
        O.march_octree(oc, tf, rays, win, NO_CLIP.center, NO_CLIP.direction,
                       step_count=64, mip=2)
    )
    assert img0[..., 3].max() > 0.5
    # Coarser mip uses maxima -> at least as opaque in the sphere's interior.
    assert img2[..., 3].sum() >= img0[..., 3].sum() - 1e-3
    assert not np.allclose(img0, img2)


def test_occupancy_grid_marks_occupied_corner():
    vol = jnp.zeros((32, 32, 32), jnp.float32).at[0:8, 0:8, 0:8].set(0.9)
    oc = O.build_octree(vol)
    win = jnp.array([0.5, 1.0, 1.0, 1.0])
    og = O.occupancy_grid(oc, win, RAMP_TF, mip=2)
    grid = np.asarray(og.grid)
    assert grid.shape == (8, 8, 8)
    assert grid[0, 0, 0]
    # Far corner is all-zero values; zero maps to TF position 0 where the
    # ramp TF has alpha 0 -> unoccupied (after the 3^3 dilation margin).
    assert not grid[4:, 4:, 4:].any()
    assert og.cell_scale == (8.0, 8.0, 8.0)


def test_occupancy_grid_is_conservative(rng):
    """Any UVW position in an unoccupied cell must sample alpha exactly 0."""
    from tbraymarcherplugin_tpu.ops.sampling import (
        sample_windowed_transfer_function, trilinear_sample,
    )

    v = np.zeros((24, 20, 17), np.float32)
    for _ in range(4):  # a few scattered dense blobs in empty space
        x, y, z = (rng.integers(0, d - 3) for d in v.shape)
        v[x:x + 3, y:y + 3, z:z + 3] = rng.random((3, 3, 3), dtype=np.float32)
    vol = jnp.asarray(v)
    # Non-monotone TF: opaque band in the middle only.
    tf = T.tf_from_keypoints(
        [0.0, 0.3, 0.5, 0.7, 1.0],
        [[0, 0, 0, 0], [0, 0, 0, 0], [1, 1, 1, 1], [0, 0, 0, 0], [0, 0, 0, 0]],
    )
    win = jnp.array([0.55, 0.6, 1.0, 1.0])
    oc = O.build_octree(vol)
    og = O.occupancy_grid(oc, win, tf, mip=2)
    grid = np.asarray(og.grid)
    assert grid.any() and not grid.all()  # test must exercise both branches

    pts = jnp.asarray(rng.random((4096, 3)), jnp.float32)
    alpha = np.asarray(
        sample_windowed_transfer_function(
            trilinear_sample(vol, pts), 1.0, tf, win
        )[..., 3]
    )
    cells = np.minimum(
        np.floor(np.asarray(pts) * np.asarray(og.cell_scale)).astype(int),
        np.asarray(grid.shape) - 1,
    )
    occ_at_pt = grid[cells[:, 0], cells[:, 1], cells[:, 2]]
    assert (alpha[~occ_at_pt] == 0.0).all()


def test_occupancy_grid_cutoffs_cull():
    vol = jnp.full((16, 16, 16), 0.9, jnp.float32)
    oc = O.build_octree(vol)
    # Window centered far below the data: every TF position > 1.
    win_cut = jnp.array([0.2, 0.2, 1.0, 1.0])  # high cutoff active
    og = O.occupancy_grid(oc, win_cut, RAMP_TF, mip=2)
    assert not np.asarray(og.grid).any()
    # Same window with cutoffs off: positions clamp into the top TF texel.
    win_open = jnp.array([0.2, 0.2, 0.0, 0.0])
    og2 = O.occupancy_grid(oc, win_open, RAMP_TF, mip=2)
    assert np.asarray(og2.grid).all()
