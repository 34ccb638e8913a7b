"""Headline benchmark: rays/s/chip, 256³ volume at 1080p lit forward render.

Prints ONE JSON line per metric (headline first):

  {"metric": "rays/s/chip ...", "value": N, "unit": "rays/s", "vs_baseline": N}
  {"metric": "fwd+bwd ms/frame ...", "value": N, "unit": "ms", "vs_baseline": N}

``vs_baseline`` is measured throughput divided by the BASELINE target of 90%
of the speed-of-light sampling bound for this chip (BASELINE.md: ">=90% of
speed-of-light sampling throughput per chip, 256^3 CT volume @ 1080p").
The speed-of-light model prices the *reference algorithm's* memory traffic:
every march sample moves 8 data-volume corners, 8 light-volume corners and
2 TF texels through HBM at the chip's bandwidth. The shear-warp renderer
(`ops/shearwarp.py`) restructures the computation to avoid that traffic
entirely, so `vs_baseline` can legitimately exceed 1.0.

Timing protocol (rounds 1-4, VERDICT.md): the axon TPU runtime memoizes
identical dispatches and wedges on unblocked pile-ups. Round 5 batches
K frames into ONE dispatch — `lax.map` over K *distinct* window centers,
returning K f32 device-side checksums (sum + second moment) — which
amortizes the tunnel's fixed ~24 ms dispatch round trip the same way the
reference's pipelined frame loop pays no per-frame CPU round trip
(`PerformanceTest1.cpp:51-208`). Each timed repetition uses a fresh center
array (distinct inputs), the call is blocked-on as a whole, and per-frame
checksums are verified to vary BOTH within a dispatch and across
repetitions; a collapse fails the metric (``"value": null``, non-zero exit)
instead of warning.

A missing headline metric is LOUD: it is emitted with ``"value": null`` and
the process exits non-zero.

Run with --quick for a small CPU-friendly configuration (CI smoke).
"""

import argparse
import json
import os
import sys
import time


def _emit(metric, value, unit, vs_baseline):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": None if value is None else round(float(value), 4),
                "unit": unit,
                "vs_baseline": None
                if vs_baseline is None
                else round(float(vs_baseline), 4),
            }
        ),
        flush=True,
    )


def _detail(**kw):
    print(json.dumps(kw), file=sys.stderr, flush=True)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true", help="small config")
    parser.add_argument("--kframes", type=int, default=None,
                        help="frames batched per dispatch (lax.map)")
    parser.add_argument("--reps", type=int, default=None,
                        help="timed dispatches per metric")
    parser.add_argument("--no-dp", action="store_true",
                        help="skip the virtual-mesh dp-scaling detail line")
    parser.add_argument("--fwd-only", action="store_true",
                        help="skip the fwd+bwd metric")
    parser.add_argument(
        "--impl", default="auto",
        choices=["auto", "shearwarp", "pallas", "tiled2d"],
        help="forward renderer for the headline metric",
    )
    parser.add_argument("--phases", action="store_true",
                        help="also run the perf-test phase suite to stderr")
    parser.add_argument("--dp", type=int, default=0,
                        help="ray-DP scaling harness over N devices")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tbraymarcherplugin_tpu.models import (
        LightPlan, RenderParams, render_lit_scene,
    )
    from tbraymarcherplugin_tpu.models.pipeline import compute_illumination
    from tbraymarcherplugin_tpu.ops import shearwarp as SWM
    from tbraymarcherplugin_tpu.ops import synthetic
    from tbraymarcherplugin_tpu.ops import transfer as T
    from tbraymarcherplugin_tpu.ops.rays import setup_rays
    from tbraymarcherplugin_tpu.scene import Camera, ClipPlane, VolumeTransform

    if args.dp:
        return _bench_dp_scaling(args.dp, quick=args.quick)

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    if args.quick or not on_tpu:
        dims, width, height, step_count = (64, 64, 64), 320, 180, 64
        kframes, reps, kbwd = (args.kframes or 4), (args.reps or 2), 2
    else:
        dims, width, height, step_count = (256, 256, 256), 1920, 1080, 150
        kframes, reps, kbwd = (args.kframes or 64), (args.reps or 3), 8

    volume = jnp.asarray(synthetic.ct_like_phantom(dims, seed=0))
    params = RenderParams(
        volume=volume,
        tf_table=T.tf_ct_bone(),
        window_center=jnp.asarray(0.5),
        window_width=jnp.asarray(0.8),
        light_intensities=jnp.asarray([1.0]),
    )
    clip = ClipPlane.disabled()
    cam = Camera.look_at([0.1, -2.3, 0.4], [0.0, 0.0, 0.0], fov_degrees=40.0)
    transform = VolumeTransform.create()
    rays = setup_rays(cam, transform, width, height)
    plans = (LightPlan.create([0.3, 0.1, -0.95], dims),)

    # --- ALL host-side inputs for the SOL model fetched BEFORE the timed
    # loop (round-1 wedge: D2H after unblocked dispatches hangs the runtime).
    thickness = np.asarray(jax.device_get(rays.thickness))
    n_rays = width * height
    total_samples = float(np.floor(step_count * thickness).sum())
    bytes_per_sample = (8 + 8) * 4 + 2 * 16  # two trilinear fetches + TF f32x4
    hbm_bw = {
        "TPU v5 lite": 819e9,  # v5e
        "TPU v4": 1228e9,
        "TPU v5p": 2765e9,
        "TPU v6 lite": 1640e9,
    }
    dev_kind = jax.devices()[0].device_kind
    bw = next((v for k, v in hbm_bw.items() if dev_kind.startswith(k)), 819e9)
    sol_time = total_samples * bytes_per_sample / bw
    sol_rays_per_s = n_rays / sol_time if sol_time > 0 else float("inf")
    target = 0.9 * sol_rays_per_s

    # --- renderer selection -------------------------------------------------
    impl = args.impl
    sw_plan = None
    pallas_window = None
    if impl in ("auto", "shearwarp"):
        # max_planes = step_count: the headline claims "<step_count>st", so
        # sample the slab with exactly that many planes (the reference's
        # RaymarchingSteps density), not one per voxel slice.
        sw_plan = SWM.plan_shearwarp(
            cam, transform, dims, dims, width, height,
            max_planes=step_count,
        )
        if sw_plan is not None:
            impl = "shearwarp"
        elif impl == "shearwarp":
            _emit("rays/s/chip lit fwd", None, "rays/s", None)
            _detail(error="shearwarp plan unavailable for this camera")
            return 1
    if impl in ("auto", "pallas"):
        from tbraymarcherplugin_tpu.ops import pallas_march as PM

        cw = PM.choose_window(
            rays, dims, step_count, light_dims=dims
        ) if on_tpu else None
        if cw:
            impl = "pallas"
            pallas_window = cw[0]
        elif impl == "pallas":
            impl = "tiled2d"
    if impl == "auto":
        impl = "tiled2d"
    _detail(detail="march_impl", impl=impl,
            shearwarp_grid=(sw_plan.n1, sw_plan.n2) if sw_plan else None,
            pallas_window=pallas_window)

    scan_impl = "pallas" if on_tpu else "xla"

    def make_frame(impl, scan, cached_light=True):
        """Per-frame render cost with REFERENCE frame semantics: the light
        volume is cached across frames (the reference's Tick recomputes
        illumination only when lights/TF/transform change,
        `RaymarchVolume.cpp:327-416` — camera orbit never rebuilds it; the
        perf test's orbit phase measures exactly this frame). The varying
        window-center input defeats the axon tunnel's dispatch memoization;
        `illumination ms/rebuild` is measured separately, and a detail line
        reports the combined rebuild+render frame too."""
        if not cached_light:
            def frame(params):
                return render_lit_scene(
                    params, rays, clip.center, clip.direction, plans, dims,
                    step_count=step_count, march_impl=impl,
                    pallas_window=pallas_window if impl == "pallas" else None,
                    shearwarp_plan=sw_plan if impl == "shearwarp" else None,
                    shearwarp_dtype=jnp.bfloat16
                    if (impl == "shearwarp" and on_tpu) else jnp.float32,
                    shearwarp_stop_early=(impl == "shearwarp"),
                    illumination_scan_impl=scan,
                )

            return frame

        lv = jax.block_until_ready(jax.jit(
            lambda p: compute_illumination(
                p, plans, clip.center, clip.direction, dims, scan_impl=scan,
            )
        )(params))

        def win_of(p):
            return jnp.stack([
                jnp.asarray(p.window_center, jnp.float32),
                jnp.asarray(p.window_width, jnp.float32),
                jnp.float32(1.0), jnp.float32(1.0),
            ])

        if impl == "shearwarp":
            if on_tpu:
                from tbraymarcherplugin_tpu.ops.pallas_warp import (
                    warp_to_screen_fused,
                )
                from tbraymarcherplugin_tpu.ops.shearwarp_pallas import (
                    shearwarp_intermediate_fused,
                )

                @jax.jit
                def frame(p):
                    inter = shearwarp_intermediate_fused(
                        p.volume, p.tf_table, lv, sw_plan, win_of(p),
                        clip.center, clip.direction,
                        compute_dtype=jnp.bfloat16, out_layout="chw",
                    )
                    return warp_to_screen_fused(
                        inter, sw_plan, width, height, channel_major=True
                    )

                return frame

            @jax.jit
            def frame(p):
                return SWM.shearwarp_lit(
                    p.volume, p.tf_table, lv, sw_plan, win_of(p),
                    clip.center, clip.direction, width, height,
                    stop_early=True,
                )

            return frame

        from tbraymarcherplugin_tpu.ops import march as M

        @jax.jit
        def frame(p):
            return M.march_lit_tiled(
                p.volume, p.tf_table, lv, rays, win_of(p),
                clip.center, clip.direction, step_count=step_count,
                tile2d=(32, 32) if rays.thickness.ndim == 2 else None,
            )

        return frame

    def with_center(c, w=None):
        return RenderParams(
            volume=params.volume,
            tf_table=params.tf_table,
            window_center=jnp.asarray(c, jnp.float32),
            window_width=(params.window_width if w is None
                          else jnp.asarray(w, jnp.float32)),
            light_intensities=params.light_intensities,
        )

    def _frame_checksum(fn):
        """Device-side f32 checksum pair (sum, second moment) of one frame.
        f32 accumulation over the full image is sensitive to the per-frame
        window-center deltas that bf16 output sums were not (round-4's
        staleness guard was inert on the intensity/octree loops)."""
        def body(cw):
            out = fn(with_center(cw[0], cw[1]))
            img = out[0] if isinstance(out, tuple) else out
            img32 = jnp.asarray(img, jnp.float32)
            return jnp.stack([jnp.sum(img32), jnp.sum(img32 * img32)])

        return body

    def _checks_vary(rep_checks):
        """Within each dispatch all K frame checksums distinct, and the
        dispatches distinct from each other."""
        firsts = []
        for arr in rep_checks:
            vals = [float(v) for v in arr[:, 0]]
            if len(set(vals)) != len(vals):
                return False
            firsts.append(vals[0])
        return len(set(firsts)) == len(firsts)

    class FrameTimer:
        """K frames per dispatch: `lax.map` over K distinct window centers,
        fetching K f32 checksums. Amortizes the axon tunnel's fixed ~24 ms
        per-dispatch round trip over K frames — matching the reference's
        pipelined frame loop, which pays no per-frame CPU round trip
        (`PerformanceTest1.cpp:51-208`) — while keeping the memoization
        defenses: every repetition is a distinct input array, the whole
        dispatch is blocked on, and checksum collapse FAILS the metric."""

        def __init__(self, fn, body=None):
            self.body = body if body is not None else _frame_checksum(fn)
            self.batched = jax.jit(lambda cs: jax.lax.map(self.body, cs))

        def run(self, k, reps, c0=0.5, spread=0.08, warm=True,
                w0=None, w1=None):
            """Returns (per-frame times in s, checksums_ok). Each frame gets
            a distinct (center, width) pair; width defaults to the scene's
            fixed 0.8 (headline comparability) and is swept `w0..w1` where
            center alone cannot move a clamp-saturated image (the
            intensity mode: d tf_pos / d width = -(v-c)/w^2 is nonzero for
            every non-constant pixel, and a wide window unsaturates all)."""
            centers = np.linspace(c0 - spread / 2, c0 + spread / 2, k,
                                  dtype=np.float32)
            if w0 is None:
                widths = np.full(k, float(jax.device_get(
                    params.window_width)), np.float32)
            else:
                widths = np.linspace(w0, w1, k, dtype=np.float32)
            base = np.stack([centers, widths], axis=1)
            if warm:
                jax.block_until_ready(self.batched(jnp.asarray(base)))
            step = spread / max(k - 1, 1)
            times, rep_checks = [], []
            for r in range(reps):
                cs = base.copy()
                cs[:, 0] += (r + 1) * step / (reps + 2)
                t0 = time.perf_counter()
                out = jax.block_until_ready(self.batched(jnp.asarray(cs)))
                times.append((time.perf_counter() - t0) / k)
                rep_checks.append(np.asarray(out))
            ok = _checks_vary(rep_checks)
            if not ok:
                print("CHECKSUM COLLAPSE: frame checksums did not vary "
                      "across distinct inputs — timing is stale, metric "
                      "failed", file=sys.stderr)
            return times, ok

    # Fallback chain: if the preferred implementation faults on this chip,
    # degrade to the next one instead of losing the headline entirely.
    chain = [(impl, scan_impl)]
    if impl == "shearwarp":
        chain += [("shearwarp", "xla")]
    if pallas_window is not None and impl != "pallas":
        chain += [("pallas", "xla")]
    if (impl, scan_impl) != ("tiled2d", "xla"):
        chain += [("tiled2d", "xla")]

    times = None
    checks_ok = True
    timer = None
    for use_impl, use_scan in chain:
        try:
            frame = make_frame(use_impl, use_scan,
                               cached_light=(use_impl != "pallas"))
            timer = FrameTimer(frame)
            times, checks_ok = timer.run(kframes, reps)
            impl, scan_impl = use_impl, use_scan
            break
        except Exception as e:  # noqa: BLE001 — try the next implementation
            _detail(detail="fwd impl failed", impl=use_impl, scan=use_scan,
                    error=f"{type(e).__name__}: {e}"[:300])
    if times is None or not checks_ok:
        _emit(
            f"rays/s/chip lit fwd {dims[0]}^3 {width}x{height} "
            f"{step_count}st",
            None, "rays/s", None,
        )
        return 1
    dt = float(np.median(times))
    rays_per_s = n_rays / dt

    _emit(
        f"rays/s/chip lit fwd {dims[0]}^3 {width}x{height} {step_count}st",
        round(rays_per_s, 1),
        "rays/s",
        rays_per_s / target,
    )
    _detail(detail="fwd frame times (s)", impl=impl, scan=scan_impl,
            times=[round(t, 5) for t in times], kframes=kframes,
            sol_rays_per_s=round(sol_rays_per_s, 1), device=dev_kind)
    # Device-time vs dispatch-latency split (VERDICT r3 ask #2): one traced
    # pass so the direct-attached-hardware number is derivable — the axon
    # tunnel adds a fixed ~25 ms round trip per frame that no production
    # deployment pays.
    if on_tpu:
        try:
            import shutil
            import sys as _sys

            _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from benchmarks.device_split import parse_device_ms

            tdir = "/tmp/tbr_bench_trace"
            shutil.rmtree(tdir, ignore_errors=True)
            jax.profiler.start_trace(tdir)
            ttimes, _ = timer.run(kframes, 1, c0=0.53, warm=False)
            jax.profiler.stop_trace()
            dev_ms, nmod = parse_device_ms(tdir)
            if dev_ms:
                dpf = dev_ms / kframes
                wall = float(np.median(ttimes)) * 1e3
                _detail(
                    detail="device vs dispatch split (traced)",
                    wall_ms_per_frame=round(wall, 2),
                    device_ms_per_frame=round(dpf, 2),
                    dispatch_latency_ms=round(wall - dpf, 2),
                    rays_per_s_device_only=round(n_rays / (dpf / 1e3), 0),
                    vs_baseline_device_only=round(
                        n_rays / (dpf / 1e3) / target, 4
                    ),
                )
        except Exception as e:  # noqa: BLE001 — diagnostic only
            _detail(detail="device split failed",
                    error=f"{type(e).__name__}: {e}"[:200])

    # Transparency split: the combined illumination-rebuild + render frame
    # (what a light/TF change costs) alongside the cached-light frame above.
    try:
        f2 = make_frame(impl, scan_impl, cached_light=False)
        t2, ok2 = FrameTimer(f2).run(max(4, kframes // 2), 2, c0=0.52)
        _detail(detail="frame incl. illumination rebuild (s)",
                times=[round(t, 5) for t in t2], checksums_ok=ok2)
    except Exception as e:  # noqa: BLE001
        _detail(detail="rebuild-frame split failed",
                error=f"{type(e).__name__}: {e}"[:200])

    # --- the other two render modes (intensity / octree), fused fast path ---
    if impl == "shearwarp" and on_tpu:
        try:
            from tbraymarcherplugin_tpu.ops import octree as O
            from tbraymarcherplugin_tpu.ops.pallas_warp import (
                warp_to_screen_fused,
            )
            from tbraymarcherplugin_tpu.ops.shearwarp_pallas import (
                shearwarp_intermediate_fused,
            )

            def win_of(p):
                return jnp.stack([
                    jnp.asarray(p.window_center, jnp.float32),
                    jnp.asarray(p.window_width, jnp.float32),
                    jnp.float32(1.0), jnp.float32(1.0),
                ])

            @jax.jit
            def frame_int(p):
                inter = shearwarp_intermediate_fused(
                    p.volume, p.tf_table, p.volume, sw_plan, win_of(p),
                    clip.center, clip.direction, mode="intensity",
                    compute_dtype=jnp.bfloat16, out_layout="chw",
                )
                return warp_to_screen_fused(inter, sw_plan, width, height,
                                            channel_major=True)

            oc = O.build_octree(params.volume, max_value=1.0)
            mip = oc.mips[0]
            z_eff = max(1, -(-mip.shape[2] * oc.data_dims[2]
                             // oc.mips[0].shape[2]))
            vol_oct = mip[:, :, :z_eff]
            oct_plan = SWM.plan_shearwarp(
                cam, transform, vol_oct.shape, vol_oct.shape, width, height,
                max_planes=step_count,
            )

            @jax.jit
            def frame_oct(p):
                inter = shearwarp_intermediate_fused(
                    vol_oct, p.tf_table, vol_oct, oct_plan, win_of(p),
                    clip.center, clip.direction, mode="unlit",
                    sample_nearest=True, compute_dtype=jnp.bfloat16,
                    out_layout="chw",
                )
                return warp_to_screen_fused(inter, oct_plan, width, height,
                                            channel_major=True)

            # Intensity mode's first-hit samples are cube-face values whose
            # clamped windowing can be exactly constant under center shifts
            # (faithful to usf:187-242; round-4's inert guard) — sweep the
            # window WIDTH too, which moves every unclamped pixel.
            for nm, fn in (("intensity", frame_int), ("octree", frame_oct)):
                tms, okm = FrameTimer(fn).run(max(4, kframes // 2), 2,
                                              c0=0.35, spread=0.3,
                                              w0=0.9, w1=1.8)
                _detail(detail=f"{nm} mode ms/frame (fused shear-warp)",
                        ms=(round(float(np.median(tms)) * 1e3, 2)
                            if okm else None),
                        checksums_ok=okm)
        except Exception as e:  # noqa: BLE001 — auxiliary metric
            _detail(detail="mode bench failed",
                    error=f"{type(e).__name__}: {e}"[:300])

    rc = 0
    # --- per-stage split: illumination rebuild alone (VERDICT r2 weak #5) ---
    try:
        illum = jax.jit(lambda p: compute_illumination(
            p, plans, clip.center, clip.direction, dims,
            scan_impl=scan_impl))
        itimes, oki = FrameTimer(illum).run(kframes, 2)
        if not oki:
            _emit(f"illumination ms/rebuild {dims[0]}^3", None, "ms", None)
            rc = 1
        else:
            _detail(detail="stage times (ms)",
                    illumination=round(float(np.median(itimes)) * 1e3, 3),
                    full_frame=round(dt * 1e3, 3))
            _emit(
                f"illumination ms/rebuild {dims[0]}^3",
                round(float(np.median(itimes)) * 1e3, 3),
                "ms",
                # No external baseline exists (the reference publishes no
                # illumination timings) — emit null rather than claiming
                # parity.
                None,
            )
    except Exception as e:  # noqa: BLE001 — auxiliary metric, stay alive
        _detail(detail="illumination bench failed",
                error=f"{type(e).__name__}: {e}"[:300])
    if not args.fwd_only:
        try:
            _bench_fwd_bwd(
                jax, jnp, np, render_lit_scene, params, with_center, rays,
                clip, plans, sw_plan, dims, width, height, step_count, kbwd,
                FrameTimer, fwd_ms=dt * 1e3,
            )
        except Exception as e:  # noqa: BLE001
            _emit(
                f"fwd+bwd ms/frame {dims[0]}^3 {width}x{height} "
                f"{step_count}st",
                None, "ms", None,
            )
            print(f"fwd+bwd bench FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr)
            rc = 1

    # --- dp-scaling harness artifact (VERDICT r4 ask #4): exercise the
    # ray-DP sharding arithmetic on an 8-device virtual CPU mesh every run.
    # These are harness-correctness numbers, NOT real ICI scaling (that
    # needs real multi-chip hardware, which this box does not have).
    if not args.no_dp:
        try:
            import subprocess

            env = dict(os.environ)
            env["JAX_PLATFORMS"] = "cpu"
            env.pop("XLA_FLAGS", None)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--dp", "8",
                 "--quick"],
                capture_output=True, text=True, timeout=900, env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            shown = 0
            for line in out.stderr.splitlines():
                if '"dp scaling"' in line:
                    print(line, file=sys.stderr, flush=True)
                    shown += 1
            for line in out.stdout.splitlines():
                if line.startswith("{"):
                    _detail(detail="dp scaling metric (virtual CPU mesh)",
                            line=line.strip())
            if out.returncode != 0 or not shown:
                _detail(detail="dp scaling subprocess failed",
                        rc=out.returncode, tail=out.stderr[-300:])
        except Exception as e:  # noqa: BLE001 — diagnostic only
            _detail(detail="dp scaling failed",
                    error=f"{type(e).__name__}: {e}"[:200])

    if args.phases:
        from benchmarks.perf_phases import run_phases

        run_phases(file=sys.stderr)
    return rc


def _bench_fwd_bwd(jax, jnp, np, render_lit_scene, params, with_center, rays,
                   clip, plans, sw_plan, dims, width, height, step_count,
                   kbwd, FrameTimer, fwd_ms=None):
    """BASELINE headline #2: fwd+bwd ms/frame — value_and_grad of an L2 loss
    against a fixed target image, grads w.r.t. the full differentiable
    surface (volume, TF table, window center/width, light intensities).

    Runs through the shear-warp path (dense ops end-to-end, plain autodiff
    with checkpointed composite blocks) when a plan exists; the XLA tiled
    march otherwise."""
    import time as _time

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    chain = []
    if sw_plan is not None:
        if on_tpu:
            chain.append(("shearwarp", "fused"))
            chain.append(("shearwarp", "pallas"))
        chain.append(("shearwarp", "xla"))
    chain.append(("tiled2d", "xla"))

    times = impl = None
    for use_impl, use_scan in chain:
        def fwd(p, _i=use_impl, _s=use_scan):
            return render_lit_scene(
                p, rays, clip.center, clip.direction, plans, dims,
                step_count=step_count, march_impl=_i,
                shearwarp_plan=sw_plan if _i == "shearwarp" else None,
                shearwarp_stop_early=False,
                # bf16 pre-sheared streams on TPU, like the forward
                # headline (the custom-VJP pair accumulates in f32;
                # measured 107.6 -> 99.4 ms on the composite fwd+bwd).
                shearwarp_dtype=jnp.bfloat16
                if (_i == "shearwarp" and on_tpu) else jnp.float32,
                # Differentiable fast units: pallas scan (adjoint shift-scan
                # VJP) + pallas TF unit (MXU-histogram VJP); the occluder
                # field's TF-alpha kernel is fwd-only, so it stays XLA.
                shearwarp_tf_unit=(
                    "fused" if _s == "fused"
                    else "pallas" if _s == "pallas" else "xla"
                ),
                illumination_scan_impl="pallas" if _s in ("pallas", "fused")
                else _s,
                illumination_tf_impl="pallas_vjp" if _s in ("pallas", "fused")
                else "xla",
            )

        try:
            target_img = jax.lax.stop_gradient(fwd(params))
            target_img = jax.block_until_ready(target_img)

            def loss_fn(p, _fwd=fwd, _t=target_img):
                return jnp.mean((_fwd(p) - _t) ** 2)

            vg = jax.jit(jax.value_and_grad(loss_fn))

            def body(cw, _vg=vg):
                loss, g = _vg(with_center(cw[0], cw[1]))
                # Loss + dTF-grad magnitude: both f32, both move with the
                # per-frame window-center deltas (staleness guard).
                return jnp.stack([
                    jnp.asarray(loss, jnp.float32),
                    jnp.asarray(jnp.sum(jnp.abs(g.tf_table)), jnp.float32),
                ])

            times, okb = FrameTimer(vg, body=body).run(kbwd, 2, c0=0.55)
            if not okb:
                raise RuntimeError("fwd+bwd checksum collapse")
            impl = use_impl
            break
        except Exception as e:  # noqa: BLE001 — degrade to the next impl
            print(json.dumps({
                "detail": "fwd+bwd impl failed", "impl": use_impl,
                "scan": use_scan, "error": f"{type(e).__name__}: {e}"[:300],
            }), file=sys.stderr, flush=True)
    if times is None:
        raise RuntimeError("all fwd+bwd implementations failed")
    dt_ms = float(np.median(times)) * 1e3
    _emit(
        f"fwd+bwd ms/frame {dims[0]}^3 {width}x{height} {step_count}st",
        round(dt_ms, 3),
        "ms",
        # Internal target (no external baseline exists): a differentiated
        # frame should cost <= 3x the forward frame. vs_baseline >= 1 means
        # the target is met; the gap is visible machine-readably either way.
        None if fwd_ms is None else (3.0 * fwd_ms) / dt_ms,
    )
    print(json.dumps({
        "detail": "fwd+bwd frame times (s)", "impl": impl,
        "times": [round(t, 5) for t in times],
    }), file=sys.stderr)


def _bench_dp_scaling(n_devices: int, quick: bool = True) -> int:
    """Ray-DP scaling harness (VERDICT r2 ask #8): rays/s over 1..N devices
    on whatever mesh exists (virtual CPU devices in CI, chips on a pod).
    Meaningful *numbers* need real chips; the harness itself must run
    anywhere."""
    import os

    if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""
    ):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tbraymarcherplugin_tpu.models import LightPlan, RenderParams
    from tbraymarcherplugin_tpu.ops import synthetic
    from tbraymarcherplugin_tpu.ops import transfer as T
    from tbraymarcherplugin_tpu.ops.rays import setup_rays
    from tbraymarcherplugin_tpu.parallel import make_mesh, render_lit_sharded
    from tbraymarcherplugin_tpu.scene import Camera, ClipPlane, VolumeTransform

    devs = jax.devices()
    if len(devs) < n_devices:
        devs = jax.devices("cpu")
    assert len(devs) >= n_devices, f"need {n_devices}, have {len(devs)}"

    dims = (64, 64, 64) if quick else (128, 128, 128)
    width, height, step_count = (320, 180, 32) if quick else (960, 540, 96)
    volume = jnp.asarray(synthetic.ct_like_phantom(dims, seed=0))
    cam = Camera.look_at([0.1, -2.3, 0.4], [0.0, 0.0, 0.0], fov_degrees=40.0)
    rays = setup_rays(cam, VolumeTransform.create(), width, height)
    clip = ClipPlane.disabled()
    plans = (LightPlan.create([0.3, 0.1, -0.95], dims),)

    def params_with(c):
        return RenderParams(
            volume=volume,
            tf_table=T.tf_ct_bone(),
            window_center=jnp.asarray(c, jnp.float32),
            window_width=jnp.asarray(0.8),
            light_intensities=jnp.asarray([1.0]),
        )

    results = {}
    n = 1
    while n <= n_devices:
        mesh = make_mesh({"rays": n}, devices=devs[:n])
        f = lambda p: render_lit_sharded(
            mesh, p, rays, clip.center, clip.direction, plans, dims,
            step_count=step_count,
        )
        jax.block_until_ready(f(params_with(0.5)))
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(params_with(0.5 + 1e-4 * (i + 1))))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        results[n] = width * height / dt
        n *= 2
    base = results[1]
    for n, rps in results.items():
        eff = rps / (base * n)
        _detail(detail="dp scaling", devices=n,
                rays_per_s=round(rps, 1), efficiency=round(eff, 3),
                mesh="virtual-cpu harness check; real scaling needs "
                     "multi-chip hardware")
    top = max(results)
    _emit(
        f"ray-DP scaling efficiency {top}x devices",
        results[top] / (base * top),
        "ratio",
        results[top] / (base * top) / 0.85,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
