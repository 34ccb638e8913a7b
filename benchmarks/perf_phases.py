"""Phase benchmark harness mirroring the reference's scripted perf test.

`APerformanceTest1` (`Source/Tests/Private/Actor/PerformanceTest1.cpp:51-208`)
drives the expensive paths in timed, trace-bookmarked phases: window-center
set, full light recompute (twice), a window-center sweep, a 360-degree camera
orbit, volume rotation, and clip-plane rotation — at 4K with uncapped FPS.
This harness reproduces that phase structure on the TPU renderer and reports
per-phase ms/frame via :class:`~tbraymarcherplugin_tpu.utils.profiling.PhaseTracer`.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_phases(
    dims=(128, 128, 128),
    width=960,
    height=540,
    step_count=150,
    orbit_frames=24,
    sweep_frames=12,
    file=sys.stdout,
):
    import jax
    import jax.numpy as jnp

    from tbraymarcherplugin_tpu.ops import synthetic
    from tbraymarcherplugin_tpu.ops import transfer as T
    from tbraymarcherplugin_tpu.renderer import Renderer, RendererConfig
    from tbraymarcherplugin_tpu.scene import (
        Camera,
        ClipPlane,
        DirLight,
        VolumeTransform,
        orbit_camera,
    )
    from tbraymarcherplugin_tpu.utils.profiling import PhaseTracer

    volume = synthetic.ct_like_phantom(dims, seed=0)
    r = Renderer(
        jnp.asarray(volume),
        tf_table=T.tf_ct_bone(),
        config=RendererConfig(step_count=step_count),
    )
    r.add_light("sun", DirLight.create([0.3, 0.2, -0.93], 1.0))
    r.add_light("fill", DirLight.create([-0.8, 0.1, -0.6], 0.4))
    cam = Camera.look_at([0.0, -2.4, 0.5], [0.0, 0.0, 0.0], fov_degrees=40.0)

    tracer = PhaseTracer()

    def frame(c=None):
        img = r.render(c or cam, width, height)
        jax.block_until_ready(img)
        tracer.frame()
        return img

    # Warm-up compile outside the timed phases.
    frame()

    with tracer.phase("SetWindowCenter"):
        r.set_window_center(0.55)
        frame()

    with tracer.phase("FullLightRecompute1"):
        r.set_transform(VolumeTransform.create())  # dirties lights
        frame()

    with tracer.phase("FullLightRecompute2"):
        r.set_transform(VolumeTransform.create(translation=(0.01, 0.0, 0.0)))
        frame()

    with tracer.phase("WindowCenterSweep"):
        # The reference sweeps center at -200/s from 300 (width 500) in raw
        # units (`PerformanceTest1.cpp:46-48`); normalized equivalent sweep.
        for c in np.linspace(0.6, 0.3, sweep_frames):
            r.set_window_center(float(c))
            frame()

    with tracer.phase("CameraOrbit"):
        for a in np.linspace(0.0, 2 * np.pi, orbit_frames, endpoint=False):
            frame(orbit_camera(a, 2.4, height=0.5, fov_degrees=40.0))

    with tracer.phase("VolumeRotation"):
        for a in np.linspace(0.0, np.pi / 2, sweep_frames):
            ca, sa = np.cos(a), np.sin(a)
            rot = np.array([[ca, sa, 0], [-sa, ca, 0], [0, 0, 1.0]])
            r.set_transform(VolumeTransform.create(rotation=rot))
            frame()

    with tracer.phase("ClipPlaneRotation"):
        for a in np.linspace(0.0, np.pi / 2, sweep_frames):
            n = [np.sin(a), 0.0, np.cos(a)]
            r.set_clip_plane(ClipPlane.create([0.0, 0.0, 0.0], n))
            frame()

    print(tracer.report(), file=file)
    return tracer


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    a = p.parse_args()
    if a.quick:
        run_phases(dims=(32, 32, 32), width=160, height=90, step_count=32,
                   orbit_frames=4, sweep_frames=3)
    else:
        run_phases()
