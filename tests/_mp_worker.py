"""Worker for the multi-process distributed smoke test (P3).

Run with env:
  MP_NPROCS     total processes (1 = single-process reference run)
  MP_PROC_ID    this process's id
  MP_COORD      coordinator address (host:port), required when MP_NPROCS > 1
  MP_OUT        path to write the result .npz

Each process owns 2 virtual CPU devices; the global mesh spans
MP_NPROCS * 2 devices on the "rays" axis. The psum'd sum-loss train step
(`parallel.ray_sharding.make_sharded_train_step`) is partition-invariant, so
every MP_NPROCS must produce identical losses and updated params — the test
asserts the 2-process run equals the 1-process run.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

nprocs = int(os.environ["MP_NPROCS"])
if nprocs > 1:
    jax.distributed.initialize(
        coordinator_address=os.environ["MP_COORD"],
        num_processes=nprocs,
        process_id=int(os.environ["MP_PROC_ID"]),
    )

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tbraymarcherplugin_tpu.models import LightPlan, RenderParams  # noqa: E402
from tbraymarcherplugin_tpu.ops import synthetic  # noqa: E402
from tbraymarcherplugin_tpu.ops import transfer as T  # noqa: E402
from tbraymarcherplugin_tpu.ops.rays import RayBatch, setup_rays  # noqa: E402
from tbraymarcherplugin_tpu.parallel import make_sharded_train_step  # noqa: E402
from tbraymarcherplugin_tpu.scene import Camera, ClipPlane, VolumeTransform  # noqa: E402


def main():
    dims = (8, 8, 8)
    volume = synthetic.sphere_volume(dims, radius=0.4)
    params = RenderParams(
        volume=volume,
        tf_table=T.tf_from_keypoints([0, 1], [[0, 0, 0, 0], [1, 1, 1, 1]]),
        window_center=jnp.asarray(0.5),
        window_width=jnp.asarray(1.0),
        light_intensities=jnp.asarray([1.0]),
    )
    clip = ClipPlane.disabled()
    cam = Camera.look_at([0.3, -2.4, 0.5], [0.0, 0.0, 0.0], fov_degrees=30.0)
    rays = setup_rays(cam, VolumeTransform.create(), 8, 8)
    plans = (LightPlan.create([0.2, 0.1, -0.97], dims),)

    n_dev = jax.device_count()
    mesh = Mesh(np.array(jax.devices()).reshape(n_dev), ("rays",))
    step, opt = make_sharded_train_step(
        mesh, lambda img, tgt: jnp.sum((img - tgt) ** 2),
        clip.center, clip.direction, plans, dims, step_count=8,
    )

    flat = RayBatch(
        rays.entry.reshape(-1, 3),
        rays.direction.reshape(-1, 3),
        rays.thickness.reshape(-1),
    )
    target = np.zeros((flat.thickness.shape[0], 4), np.float32)

    sh = NamedSharding(mesh, P("rays"))

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sh, lambda idx: x[idx]
        )

    flat = RayBatch(put(flat.entry), put(flat.direction), put(flat.thickness))
    target = put(target)

    opt_state = opt.init(params)
    params2, opt_state, loss = step(params, opt_state, flat, target)
    loss2 = None
    params3, _, loss2 = step(params2, opt_state, flat, target)

    if int(os.environ.get("MP_PROC_ID", "0")) == 0:
        np.savez(
            os.environ["MP_OUT"],
            loss=np.asarray(loss),
            loss2=np.asarray(loss2),
            tf=np.asarray(jax.device_get(params2.tf_table)),
            wc=np.asarray(jax.device_get(params2.window_center)),
            nprocs=nprocs,
            ndev=n_dev,
        )
    print(f"proc {os.environ.get('MP_PROC_ID', '0')}/{nprocs} done "
          f"loss={float(loss):.6f}", flush=True)


if __name__ == "__main__":
    main()
