"""A/B: Pallas segmented-scan pair reduce vs the XLA sort/scatter reduce.

Times the full closest / any-hit compact traversals (production split
settings) with cluster.USE_SCAN_REDUCE off and on, on the headline scene
at the bench queue shape.  Gate for flipping the default (same recipe as
the r4/r5 kernels: bit-identity test first — tests/test_cluster.py::
test_scan_reduce_matches_sort_reduce — then this stage profile, then
bench.py).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1500 python tools/profile_scan_reduce.py
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pt.bvh import cluster as C
from tpu_pt.scene import meshes


def timed_loop(stage, ro, rd, iters):
    @jax.jit
    def run(ro, rd):
        def body(carry, i):
            acc, ro_i = carry
            out = stage(ro_i, rd)
            ro_n = ro_i + (out * 1e-12 + 1e-9)
            return (acc + out, ro_n), None

        (acc, _), _ = jax.lax.scan(body, (jnp.float32(0.0), ro),
                                   jnp.arange(iters))
        return acc

    run(ro, rd)
    float(np.asarray(run(ro, rd)))
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(run(ro, rd)))
        ts.append(time.time() - t0)
    return min(ts) / iters


def main():
    from tpu_pt.cli import _enable_compile_cache

    _enable_compile_cache()
    Q = int(os.environ.get("PROF_QUEUE", "4096"))
    iters = int(os.environ.get("PROF_ITERS", "50"))
    scene = meshes.big_scene(subdiv=8)
    cam = meshes.big_camera(1024, 1024)
    cb = C.build_cluster_bvh(scene)
    print(f"tris={scene.n_tris} clusters={cb.n_clusters} Q={Q}")
    cb_d = jax.device_put(cb)

    from tpu_pt.core.camera import generate_rays, pixel_xy

    k1 = jax.random.key(0)
    pix = jax.random.randint(k1, (Q,), 0, 1024 * 1024)
    xy = pixel_xy(1024, 1024, pix, jnp.full((Q, 2), 0.5))
    ro, rd = generate_rays(cam, xy)
    ro = jax.device_put(jnp.asarray(ro, jnp.float32))
    rd = jax.device_put(jnp.asarray(rd, jnp.float32))
    tmin = jnp.zeros((Q, 1), jnp.float32)
    tmax = jnp.full((Q, 1), 1e30, jnp.float32)

    def closest(ro_, rd_):
        bt, g, u, v, _ = C._traverse_compact(cb_d, ro_, rd_, tmin, tmax)
        return jnp.sum(jnp.where(bt < C.INF, bt, 0.0)) \
            + 1e-6 * jnp.sum(g) + jnp.sum(u)

    def anyhit(ro_, rd_):
        occ, _ = C._traverse_compact_anyhit(cb_d, ro_, rd_, tmin, tmax)
        return jnp.sum(occ.astype(jnp.float32))

    for flag in (False, True):
        C.USE_SCAN_REDUCE = flag
        lab = "scan" if flag else "sort"
        dt_c = timed_loop(closest, ro, rd, iters)
        dt_a = timed_loop(anyhit, ro, rd, iters)
        print(f"reduce={lab}: closest {dt_c*1e3:8.3f} ms   "
              f"anyhit {dt_a*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
