"""Per-ray reduce alternatives at the PRODUCTION pair-list shapes.

r4 stage profile (tools/profile_stages.py, caps (34,59,69)): the compact
closest traversal costs 5.04 ms of which descent=1.73, flat sort=0.50,
tile tests=1.07 — leaving ~1.75 ms in `_reduce_pairs_closest`'s 5-operand
3-key sort, the single biggest stage; the anyhit scatter-add reduce holds
a similar residual.  This benchmark compares exact-equivalent reduces on
REAL descent output (ray-sorted pair list from the bench scene).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/microbench_reduce2.py
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pt.bvh import cluster as C
from tpu_pt.scene import meshes

Q = int(os.environ.get("MB_QUEUE", "4096"))
ITERS = 50


def timed(fn, *args):
    @jax.jit
    def loop(*a):
        def body(acc, _):
            return acc + fn(acc, *a), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return acc

    float(np.asarray(loop(*args)))
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(loop(*args)))
        ts.append(time.time() - t0)
    return min(ts) / ITERS


def main():
    scene = meshes.big_scene(subdiv=8)
    cam = meshes.big_camera(1024, 1024)
    cb = jax.device_put(C.build_cluster_bvh(scene))

    from tpu_pt.core.camera import generate_rays, pixel_xy

    pix = jax.random.randint(jax.random.key(0), (Q,), 0, 1024 * 1024)
    xy = pixel_xy(1024, 1024, pix, jnp.full((Q, 2), 0.5))
    ro, rd = generate_rays(cam, xy)
    ro = jnp.asarray(ro, jnp.float32)
    rd = jnp.asarray(rd, jnp.float32)
    t_min1 = jnp.zeros((Q,), jnp.float32)
    t_max1 = jnp.full((Q,), 1e30, jnp.float32)

    budget = cb.pair_mults[2] * Q
    cand, live, _ = jax.jit(lambda ro, rd: C._descend_compact(
        cb, ro, 1.0 / rd, t_min1[:, None], t_max1[:, None]))(ro, rd)
    rayP, cidP, _, cnt, right, _ = jax.jit(
        lambda c, l: C._flat_pairs(c, l, Q, budget))(cand, live)
    pair_ok = rayP < Q
    rayC = jnp.minimum(rayP, Q - 1)
    t_p, u_p, v_p, g_p = jax.jit(lambda: C._test_pair_batch(
        cb, ro, rd, t_min1, t_max1, rayC, cidP, pair_ok))()
    P = int(rayP.shape[0])
    print(f"P={P} live={int(jnp.sum(pair_ok))} "
          f"hits={int(jnp.sum(t_p < C.INF))}")
    INF = C.INF
    IMAX = jnp.int32(2**31 - 1)

    def jit_of(x):
        return x + jnp.float32(1e-30)  # tie data to acc to defeat CSE

    # A: production — 5-operand, 3-key sort + head gather.
    def var_a(acc):
        tp = t_p + acc * 1e-30
        g_key = jnp.where(tp < INF, g_p, IMAX)
        _, tS, gS, uS, vS = jax.lax.sort(
            (rayP, tp, g_key, u_p, v_p), dimension=0, num_keys=3)
        head = jnp.minimum(right - cnt, P - 1)
        return jnp.sum(tS[head] * (tS[head] < INF)) + jnp.sum(uS[:1] + vS[:1]) * 1e-20 + jnp.sum(gS[:1]).astype(jnp.float32) * 1e-20

    # D: 4-operand sort (pos payload), then pick u/v/g via pos gathers.
    def var_d(acc):
        tp = t_p + acc * 1e-30
        g_key = jnp.where(tp < INF, g_p, IMAX)
        pidx = jnp.arange(P, dtype=jnp.int32)
        _, tS, gS, posS = jax.lax.sort(
            (rayP, tp, g_key, pidx), dimension=0, num_keys=3)
        head = jnp.minimum(right - cnt, P - 1)
        wp = posS[head]
        return jnp.sum(tS[head] * (tS[head] < INF)) + jnp.sum(
            u_p[wp][:1] + v_p[wp][:1] + gS[:1].astype(jnp.float32)) * 1e-20

    # B: associative_scan segmented min over the ray-sorted list.
    def var_b(acc):
        tp = t_p + acc * 1e-30
        seg_start = jnp.concatenate(
            [jnp.ones((1,), bool), rayC[1:] != rayC[:-1]])
        mt, mi = C._seg_min(tp, seg_start, gid=jnp.where(tp < INF, g_p,
                                                        IMAX))
        endpos = jnp.clip(right - 1, 0, P - 1)
        has = cnt > 0
        bt = jnp.where(has, mt[endpos], INF)
        wp = mi[endpos]
        return jnp.sum(bt * (bt < INF)) + jnp.sum(
            u_p[wp][:1] + v_p[wp][:1]) * 1e-20

    # C: 3-pass scatter-min (t, then winning gid, then winning position).
    def var_c(acc):
        tp = t_p + acc * 1e-30
        bt = jnp.full((Q,), INF).at[rayC].min(
            jnp.where(pair_ok, tp, INF), mode="drop")
        at_min = pair_ok & (tp <= bt[rayC]) & (tp < INF)
        gmin = jnp.full((Q,), IMAX).at[rayC].min(
            jnp.where(at_min, g_p, IMAX), mode="drop")
        pidx = jnp.arange(P, dtype=jnp.int32)
        wp = jnp.full((Q,), P - 1).at[rayC].min(
            jnp.where(at_min & (g_p == gmin[rayC]), pidx, P - 1),
            mode="drop")
        return jnp.sum(bt * (bt < INF)) + jnp.sum(
            u_p[wp][:1] + v_p[wp][:1]) * 1e-20

    # H: 2-D scatter into a (Q, K) grid + dense row argmin.
    K = int(budget // Q) * 4  # per-ray slots; per-ray count can exceed mult
    def var_h(acc):
        tp = t_p + acc * 1e-30
        base = (right - cnt)[rayC]
        slot = jnp.clip(jnp.arange(P, dtype=jnp.int32) - base, 0, K - 1)
        grid_t = jnp.full((Q, K), INF).at[rayC, slot].min(
            jnp.where(pair_ok, tp, INF), mode="drop")
        grid_g = jnp.full((Q, K), IMAX).at[rayC, slot].min(
            jnp.where(pair_ok, g_p, IMAX), mode="drop")
        bt = jnp.min(grid_t, axis=1)
        return jnp.sum(bt * (bt < INF)) + jnp.sum(
            grid_g[:, :1]).astype(jnp.float32) * 1e-20

    # Anyhit reduces.
    def any_scatter(acc):
        tp = t_p + acc * 1e-30
        hit_pair = ((tp < INF) & pair_ok).astype(jnp.int32)
        occ = jnp.zeros((Q,), jnp.int32).at[rayC].add(hit_pair,
                                                      mode="drop") > 0
        return jnp.sum(occ.astype(jnp.float32))

    def any_scatter_max(acc):
        tp = t_p + acc * 1e-30
        hit_pair = ((tp < INF) & pair_ok).astype(jnp.int32)
        occ = jnp.zeros((Q,), jnp.int32).at[rayC].max(hit_pair,
                                                      mode="drop") > 0
        return jnp.sum(occ.astype(jnp.float32))

    for name, fn in [("A sort 5op/3key (prod)", var_a),
                     ("D sort 4op + pos-gather", var_d),
                     ("B assoc-scan seg-min   ", var_b),
                     ("C 3x scatter-min       ", var_c),
                     ("H 2-D scatter grid     ", var_h),
                     ("any: scatter-add (prod)", any_scatter),
                     ("any: scatter-max       ", any_scatter_max)]:
        dt = timed(lambda acc, f=fn: f(acc))
        print(f"{name}: {dt*1e3:8.3f} ms/iter")


if __name__ == "__main__":
    main()
