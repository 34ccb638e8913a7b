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


def test_occupancy_tile_mask():
    vol = jnp.zeros((32, 32, 32), jnp.float32).at[0:8, 0:8, 0:8].set(0.9)
    oc = O.build_octree(vol)
    win = jnp.array([0.5, 1.0, 1.0, 1.0])
    mask = np.asarray(O.occupancy_tile_mask(oc, win, RAMP_TF, mip=2))
    assert mask.shape == (8, 8, 8)
    assert mask[0, 0, 0] and mask[0:2, 0:2, 0:2].any()
    assert not mask[4:, 4:, 4:].any()
