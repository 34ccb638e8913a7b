"""Worker for the checkpoint-restart recovery test (run as a subprocess).

Runs a small fit with per-step checkpointing. With RECOVERY_KILL_AFTER set,
the process hard-exits (os._exit — no cleanup, simulating a crash) right
after that step's checkpoint lands. With RECOVERY_RESUME=1 it restarts from
the newest checkpoint. Per-step losses append to RECOVERY_OUT.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tbraymarcherplugin_tpu.models import (  # noqa: E402
    LightPlan, RenderParams, fitting,
)
from tbraymarcherplugin_tpu.ops import synthetic  # noqa: E402
from tbraymarcherplugin_tpu.ops import transfer as T  # noqa: E402
from tbraymarcherplugin_tpu.ops.rays import setup_rays  # noqa: E402
from tbraymarcherplugin_tpu.scene import (  # noqa: E402
    Camera, ClipPlane, VolumeTransform,
)


def main():
    ckpt_dir = os.environ["RECOVERY_CKPT"]
    out_path = os.environ["RECOVERY_OUT"]
    kill_after = int(os.environ.get("RECOVERY_KILL_AFTER", "-1"))
    resume = os.environ.get("RECOVERY_RESUME") == "1"

    dims = (12, 12, 12)
    volume = synthetic.sphere_volume(dims, radius=0.35)
    params = RenderParams(
        volume=jnp.asarray(volume),
        tf_table=T.default_grayscale_tf(),
        window_center=jnp.asarray(0.45),
        window_width=jnp.asarray(1.1),
        light_intensities=jnp.asarray([1.0]),
    )
    cam = Camera.look_at([0.2, -2.4, 0.3], [0, 0, 0], fov_degrees=35.0)
    rays = setup_rays(cam, VolumeTransform.create(), 12, 12)
    plans = (LightPlan.create([0.3, 0.1, -0.95], dims),)
    clip = ClipPlane.disabled()
    target = jnp.zeros(rays.thickness.shape + (4,), jnp.float32)

    def on_step(step, _params, loss):
        with open(out_path, "a") as f:
            f.write(f"{step} {loss:.10e}\n")
        if step == kill_after:
            f = open(out_path, "a")
            f.write("KILLED\n")
            f.flush()
            os._exit(17)  # simulated crash: no atexit, no cleanup

    cfg = fitting.FitConfig(steps=7, step_count=8, optimize_tf=True,
                            optimize_window=True, learning_rate=5e-2)
    fitting.fit(
        params, rays, target, clip.center, clip.direction, plans, dims,
        config=cfg, callback=on_step,
        checkpoint_dir=ckpt_dir, checkpoint_every=1, resume=resume,
    )


if __name__ == "__main__":
    main()
