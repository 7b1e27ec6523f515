"""Benchmark harness — BASELINE.json primary metric.

Prints ONE JSON line:
  {"metric": "rays_per_s_per_chip", "value": N, "unit": "rays/s", "vs_baseline": N}

Metric definition (BASELINE.json): rays/s/chip counting primary + bounce
path segments on a Sponza-class (~1M-triangle) scene at 1024², 4-bounce path
tracing with Russian roulette.  "Rays" = path segments actually traced
(primary + secondary + shadow), the same accounting the reference's writeup
used for its rays/s numbers (SURVEY.md §6).

vs_baseline: ratio against the recorded best-known value in BASELINE.md
(self-referential: the reference's own numbers are unavailable offline —
SURVEY.md §6).  The driver records the output in BENCH_r{N}.json.

Environment knobs:
  BENCH_BACKEND (default "cluster") cluster | packed | bvh
  BENCH_SCENE   (default "big-1m")  big=327k tris, big-1m=1.3M tris,
                                    atrium=1.04M-tri architectural interior
  BENCH_SIZE    (default 1024)      image side (config 3 headline = 1024)
  BENCH_SPP     (default 1)
  BENCH_QUEUE   (default 4096)
  BENCH_BVH     (default "sah")     sah (host native) | lbvh (device build)
  BENCH_GRAD=1  measure the DIFFERENTIABLE step instead (forward wavefront
                render + adjoint sweep + parameter grads, BASELINE config 4);
                reports grad_rays_per_s = path segments / (fwd+bwd seconds).
                Default size drops to 256 unless BENCH_SIZE is set.
"""

from __future__ import annotations

import json
import os
import time


# Recorded best (update when BASELINE.md changes): rays/s/chip on the bench
# config below, measured on 1 TPU v5e chip.  First round sets the bar.
BASELINE_RAYS_PER_S = 330628.0  # r1: cluster backend, big-1m 1024^2 spp1 d4 q4096, TPU v5e


def main() -> None:
    import jax

    # Persistent XLA compilation cache: the headline program compiles in
    # ~300 s cold (r4); cache hits cut repeat bench invocations to seconds
    # of compile, which also de-risks driver timeouts.  run_s (the metric)
    # is unaffected.  Shares the CLI's TPU_PT_CACHE_DIR/TPU_PT_NO_CACHE
    # convention (ADVICE r4: no hardcoded absolute path); BENCH_NO_CACHE=1
    # also opts out.
    if not os.environ.get("BENCH_NO_CACHE"):
        from tpu_pt.cli import _enable_compile_cache

        _enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from tpu_pt.config import RenderConfig
    from tpu_pt.render.wavefront import n_steps, render_wavefront_counts
    from tpu_pt.scene import meshes

    scene_name = os.environ.get("BENCH_SCENE", "big-1m")
    grad_mode = bool(os.environ.get("BENCH_GRAD"))
    size = int(os.environ.get("BENCH_SIZE", "256" if grad_mode else "1024"))
    spp = int(os.environ.get("BENCH_SPP", "1"))
    queue = int(os.environ.get("BENCH_QUEUE", str(1 << 12)))

    if scene_name == "atrium":
        # Architectural interior (~1M tris): colonnades, coffered ceiling,
        # skylight area lights — Sponza-class depth complexity.
        scene = meshes.atrium_scene()  # host (numpy) pytree
        cam = meshes.atrium_camera(size, size)
    else:
        subdiv = {"big": 7, "big-1m": 8}[scene_name]
        scene = meshes.big_scene(subdiv=subdiv)  # host (numpy) pytree
        cam = meshes.big_camera(size, size)
    cfg = RenderConfig(width=size, height=size, spp=spp, max_depth=4,
                       rr_start=2, rr_prob=0.7)

    backend = os.environ.get("BENCH_BACKEND", "cluster")
    if os.environ.get("BENCH_SPLIT") or os.environ.get("BENCH_SPLIT_ANYHIT"):
        # Intra-batch traversal split A/B (r5): override the measured
        # defaults in cluster.py.
        from tpu_pt.bvh import cluster as _cl

        if os.environ.get("BENCH_SPLIT"):
            _cl.SPLIT_CLOSEST = _cl.SPLIT_ANYHIT = int(
                os.environ["BENCH_SPLIT"])
        if os.environ.get("BENCH_SPLIT_ANYHIT"):
            _cl.SPLIT_ANYHIT = int(os.environ["BENCH_SPLIT_ANYHIT"])
    if os.environ.get("BENCH_STEP_SLICES"):
        from tpu_pt.render import wavefront as _wf

        _wf.STEP_SLICES = int(os.environ["BENCH_STEP_SLICES"])
    if os.environ.get("BENCH_ANYHIT_MULT"):
        from tpu_pt.bvh import cluster as _cl

        _cl.ANYHIT_MULT = int(os.environ["BENCH_ANYHIT_MULT"])
    if os.environ.get("BENCH_SCAN_REDUCE"):
        # A/B override for the Pallas segmented-scan pair reduce
        # (kernels/pair_scan.py, default ON): =0 reverts to the XLA
        # 3-key sort (closest) / scatter-add (any-hit).
        from tpu_pt.bvh import cluster as _cl

        _cl.USE_SCAN_REDUCE = os.environ["BENCH_SCAN_REDUCE"] != "0"
    if os.environ.get("BENCH_DEDUP"):
        # Cluster-major pair stage: cid-sorted pairs + masked-DMA Pallas
        # kernel (uniform groups fetch one tile for 8 pairs).
        from tpu_pt.bvh import cluster as _cl

        _cl.DEDUP_PAIRS = True

    bvh_kind = os.environ.get("BENCH_BVH", "sah")
    t0 = time.time()
    if backend == "cluster":
        pb = os.environ.get("BENCH_PB")
        pb = int(pb) if pb else None
        if bvh_kind == "lbvh":  # device Morton-chunk build (config 3)
            from tpu_pt.bvh.cluster import build_cluster_device

            scene = jax.device_put(scene)
            cs = float(os.environ.get("BENCH_LBVH_SCALE", "1.35"))
            tau = os.environ.get("BENCH_LBVH_TAU")  # "none" disables refine
            tau = (None if tau and tau.lower() == "none"
                   else float(tau) if tau else 0.5)
            packed = jax.jit(build_cluster_device,
                             static_argnames=("pair_budget", "cap_scale"))(
                scene, pair_budget=pb, cap_scale=cs, split_tau=tau)
            np.asarray(packed.tiles[0, 0, 0])  # fetch-sync
        elif os.environ.get("BENCH_AUTOTUNE"):
            # Frontier caps + pair budget sized from probe runs of the REAL
            # wavefront (warmed mixed-depth population across the image) —
            # VERDICT r3 task 1b (the r3 camera+random-ray tuner truncated
            # 171k candidates on the headline scene).  Exactness is then
            # enforced by the verify-then-retry loop below, not an
            # always-attached fallback.
            from tpu_pt.bvh.cluster import autotune_for_render

            packed = autotune_for_render(scene, cam, cfg, queue=queue,
                                         pair_budget=pb,
                                         exact_fallback=False)
            print(f"# autotuned frontiers: {packed.frontiers} "
                  f"pair_mults: {packed.pair_mults}")
        else:
            from tpu_pt.bvh.cluster import build_cluster_bvh

            tile = int(os.environ.get("BENCH_TILE", "128"))
            ds = int(os.environ.get("BENCH_DENSE_START", "512"))
            packed = build_cluster_bvh(scene, tile=tile, pair_budget=pb,
                                       dense_start=ds)
    elif bvh_kind == "lbvh":
        from tpu_pt.bvh.lbvh import build_lbvh

        packed = build_lbvh(scene)
        np.asarray(packed.table[0, 0])  # force completion (fetch-sync)
    else:
        from tpu_pt.bvh.native import build_packed_any

        packed = build_packed_any(scene)
    t_build = time.time() - t0

    pm_env = os.environ.get("BENCH_PAIR_MULTS")
    if pm_env and backend == "cluster":
        # A/B: rebuild the ClusterBVH with explicit pair mults, e.g.
        # BENCH_PAIR_MULTS=8,8,5,4 (top, mid, leaf, any-hit narrow).
        from tpu_pt.bvh.cluster import ClusterBVH

        pm = tuple(float(x) if "." in x else int(x)
                   for x in pm_env.split(","))
        packed = ClusterBVH(packed.levels, packed.tiles, packed.tile_gid,
                            packed.frontiers, packed.k_leaf,
                            packed.pair_budget, pair_mults=pm,
                            levels16=packed.levels16,
                            fallback=packed.fallback)
        print(f"# pair_mults override: {packed.pair_mults}")

    # One-shot host→HBM upload (the tunnel makes per-call transfers slow).
    scene_d = jax.device_put(scene)
    packed_d = jax.device_put(packed)
    key = jax.random.key(0)

    if grad_mode:
        # BASELINE config 4: the differentiable step through the production
        # path (remat-chunked wavefront scan + cluster intersector).
        from tpu_pt.diff.adjoint import loss_and_grad_wavefront
        from tpu_pt.diff.params import split

        params, _ = split(scene_d)
        target = jnp.zeros((cfg.n_pixels, 3), jnp.float32)

        # Measured forward path-segment counts (same accounting as the
        # forward bench); the adjoint revisits every segment.
        _, nc, ns_, _, n_iter = render_wavefront_counts(
            scene_d, cam, cfg, key, packed_d, queue=queue, backend=backend)
        n_closest = float(np.asarray(nc))
        n_shadow = float(np.asarray(ns_))
        # Tighter static scan bound from the MEASURED executed-step count
        # (VERDICT r3 task 5: the worst-case bound pads the grad scan
        # 2.8x).  +20% slack covers key-to-key variation; the done flag is
        # checked per run and a failed hint falls back to the full bound.
        hint = int(int(np.asarray(n_iter)) * 1.2) + cfg.max_depth + 2

        def run_grad(k):
            out = loss_and_grad_wavefront(
                params, scene_d, cam, cfg, k, target, packed_d,
                backend=backend, queue=queue, steps_hint=hint)
            loss, grads, done = out
            if not bool(np.asarray(done)):  # hint too small: full bound
                print("# note: steps_hint insufficient; full-bound rerun",
                      file=__import__("sys").stderr)
                loss, grads = loss_and_grad_wavefront(
                    params, scene_d, cam, cfg, k, target, packed_d,
                    backend=backend, queue=queue)
            # Sync by fetching the loss + one grad scalar.
            return (float(np.asarray(loss)),
                    float(np.asarray(grads["albedo"]).ravel()[0]))

        t0 = time.time()
        run_grad(key)
        t_compile_run = time.time() - t0
        # Median of 3 timed runs (headline must be reproducible, not a
        # best-in-session observation).
        times = []
        for i in range(1, 4):
            t0 = time.time()
            loss, g0 = run_grad(jax.random.key(i))
            times.append(time.time() - t0)
        dt = sorted(times)[1]
        rays = n_closest + n_shadow
        out = {
            "metric": "grad_rays_per_s_per_chip",
            "value": round(rays / dt, 1),
            "unit": "rays/s (fwd segments / fwd+bwd seconds)",
            "vs_baseline": round(rays / dt / BASELINE_RAYS_PER_S, 3),
            "detail": {
                "scene": scene_name, "tris": int(scene.n_tris),
                "size": size, "spp": spp, "queue": queue,
                "backend": backend, "loss": loss,
                "n_closest": int(n_closest), "n_shadow": int(n_shadow),
                "compile_plus_run_s": round(t_compile_run, 2),
                "run_s": round(dt, 3),
                "run_s_all": [round(t, 3) for t in times],
                "device": str(jax.devices()[0]),
            },
        }
        print(json.dumps(out))
        return

    # NOTE: over the remote-device tunnel ``jax.block_until_ready`` returns
    # without waiting (measured: 1e-4 s "runs" whose fetch then takes tens of
    # seconds), so ALL timing here synchronizes by fetching a scalar of the
    # result to the host.  Fetch cost of a single f32 is negligible vs the
    # render.
    def run(k):
        img, nc, ns, novf, ni = render_wavefront_counts(
            scene_d, cam, cfg, k, packed_d, queue=queue, backend=backend)
        # Sync on scalar fetches only (image download stays off the clock).
        return (img, float(np.asarray(nc)), float(np.asarray(ns)),
                int(np.asarray(novf)), int(np.asarray(ni)))

    # Warmup / compile.
    t0 = time.time()
    img, n_closest, n_shadow, n_ovf, n_iter = run(key)
    t_compile_run = time.time() - t0

    # Verify-then-retry exactness (VERDICT r3 task 1d): the warmup run
    # MEASURED the capacity contract end-to-end; only if it overflowed do
    # we pay for the exact path — re-render with the packed-walk fallback
    # attached (overflowed rays re-traced exactly).  An always-attached
    # fallback was measured at +266 s compile and -12% runtime on the
    # clean headline (BENCH r4 session log), all for a branch that never
    # fires when the caps hold.
    exact_retry = False
    if n_ovf and backend == "cluster":
        from tpu_pt.bvh.cluster import attach_fallback

        print(f"# note: {n_ovf} candidates overflowed; re-rendering with "
              "the exact fallback attached", file=__import__("sys").stderr)
        packed_d = jax.device_put(attach_fallback(packed, scene))
        exact_retry = True
        t0 = time.time()
        img, n_closest, n_shadow, n_ovf, n_iter = run(key)
        t_compile_run += time.time() - t0

    # Median of 3 timed runs (VERDICT r2: the headline must be the
    # reproducible number, with spread recorded, not the best observation).
    # Exactness is enforced PER TIMED RUN (VERDICT r4 weak #2: the retry
    # trigger used to fire on the warmup key only, so a key-dependent
    # overflow could taint the recorded headline): any timed run that
    # overflows without the fallback attached aborts the timing loop,
    # attaches the exact fallback, re-warms, and restarts timing.  With the
    # fallback attached overflow is corrected exactly in-run, so those
    # timings stand (and the cost of the correction is IN the number).
    while True:
        times = []
        ovf_runs = []
        for i in range(1, 4):
            t0 = time.time()
            img, n_closest, n_shadow, n_ovf, n_iter = run(jax.random.key(i))
            times.append(time.time() - t0)
            ovf_runs.append(n_ovf)
            if n_ovf and not exact_retry and backend == "cluster":
                break
        if not any(ovf_runs) or exact_retry or backend != "cluster":
            break
        from tpu_pt.bvh.cluster import attach_fallback

        print(f"# note: timed run overflowed ({ovf_runs[-1]} candidates); "
              "attaching the exact fallback and restarting timing",
              file=__import__("sys").stderr)
        packed_d = jax.device_put(attach_fallback(packed, scene))
        exact_retry = True
        t0 = time.time()
        img, n_closest, n_shadow, n_ovf, n_iter = run(key)  # re-warm
        t_compile_run += time.time() - t0
    dt = sorted(times)[1]
    n_ovf = max(ovf_runs)
    if n_ovf:
        assert exact_retry or backend != "cluster"
        print(f"# note: capacity-contract overflow: {n_ovf} candidates "
              "corrected exactly by the packed-walk fallback in-run",
              file=__import__("sys").stderr)

    # Path-segment accounting: MEASURED on device — n_closest = live lanes
    # entering each intersect, n_shadow = live non-delta hits × lights × ns
    # (the useful NEE occlusion rays), summed over all wavefront steps.
    rays = n_closest + n_shadow
    value = rays / dt
    steps = n_steps(cfg, min(queue, cfg.n_pixels * cfg.spp))

    out = {
        "metric": "rays_per_s_per_chip",
        "value": round(value, 1),
        "unit": "rays/s",
        "vs_baseline": round(value / BASELINE_RAYS_PER_S, 3),
        "detail": {
            "scene": scene_name,
            "tris": int(scene.n_tris),
            "size": size,
            "spp": spp,
            "max_depth": cfg.max_depth,
            "queue": queue,
            "backend": backend,
            "steps": int(steps),
            "steps_run": int(n_iter),
            "overflow": int(n_ovf),
            "exact_retry": exact_retry,
            "n_closest": int(n_closest),
            "n_shadow": int(n_shadow),
            "bvh_build_s": round(t_build, 2),
            "compile_plus_run_s": round(t_compile_run, 2),
            "run_s": round(dt, 3),
            "run_s_all": [round(t, 3) for t in times],
            "mean_radiance": round(float(np.asarray(img).mean()), 5),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
