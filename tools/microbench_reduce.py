"""Microbench: per-ray segment reduce patterns over the flat pair table.

The compact traversal's reduce gathers each ray's (<= k_leaf) pair results
from the ray-sorted flat table.  Candidate lowerings:
  a) elementwise gather  t_p[base[:,None] + lane]         (r2 production)
  b) block gather        vmap(dynamic_slice)(t_p, base)   (contiguous span)
  c) one fused gather of a stacked (P, 4) payload table   (row gather)

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python tools/microbench_reduce.py
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

Q = int(os.environ.get("MB_Q", "4096"))
K = int(os.environ.get("MB_K", "69"))
P = int(os.environ.get("MB_P", str(6 * Q)))
ITERS = 50


def timed(fn, *args):
    @jax.jit
    def run(*a):
        def body(acc, _):
            out = fn(*a, acc)
            return out, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
        return acc

    run(*args)
    float(np.asarray(run(*args)))
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(run(*args)))
        ts.append(time.time() - t0)
    return min(ts) / ITERS


def main():
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    t_p = jax.random.uniform(k1, (P,), jnp.float32)
    g_p = jax.random.randint(k2, (P,), 0, 1 << 20, jnp.int32)
    cnt = jnp.clip(jax.random.poisson(k3, 2.0, (Q,)), 0, K).astype(jnp.int32)
    right = jnp.cumsum(cnt)
    base = (right - cnt).astype(jnp.int32)
    lane = jnp.arange(K, dtype=jnp.int32)[None, :]

    def a_elem(t_p, base, cnt, acc):
        tp = t_p + acc * 1e-20
        slots = jnp.clip(base[:, None] + lane, 0, P - 1)
        valid = lane < cnt[:, None]
        t_q = jnp.where(valid, tp[slots], jnp.inf)
        return jnp.sum(jnp.min(t_q, axis=1))

    def b_block(t_p, base, cnt, acc):
        tp = t_p + acc * 1e-20
        bc = jnp.minimum(base, P - K)
        t_q = jax.vmap(lambda b: jax.lax.dynamic_slice(tp, (b,), (K,)))(bc)
        valid = lane < cnt[:, None]
        t_q = jnp.where(valid, t_q, jnp.inf)
        return jnp.sum(jnp.min(t_q, axis=1))

    def c_fused(t_p, base, cnt, acc):
        tp = t_p + acc * 1e-20
        tbl = jnp.stack([tp, tp * 2, tp * 3, g_p.astype(jnp.float32)], -1)
        bc = jnp.minimum(base, P - K)
        rows = jax.vmap(
            lambda b: jax.lax.dynamic_slice(tbl, (b, 0), (K, 4)))(bc)
        valid = lane < cnt[:, None]
        t_q = jnp.where(valid, rows[..., 0], jnp.inf)
        return jnp.sum(jnp.min(t_q, axis=1))

    for name, fn in [("a elementwise gather", a_elem),
                     ("b block dynamic_slice", b_block),
                     ("c fused (P,4) rows   ", c_fused)]:
        dt = timed(fn, t_p, base, cnt)
        print(f"{name}: {dt*1e3:8.3f} ms/iter  (Q={Q} K={K} P={P})")


def main2():
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    t_p = jax.random.uniform(k1, (P,), jnp.float32)
    rayP = jnp.sort(jax.random.randint(k2, (P,), 0, Q, jnp.int32))

    def d_scatter_min(t_p, rayP, _cnt, acc):
        tp = t_p + acc * 1e-20
        best = jnp.full((Q,), jnp.inf).at[rayP].min(tp, mode="drop")
        return jnp.sum(jnp.where(jnp.isfinite(best), best, 0.0))

    def e_scatter_argmin(t_p, rayP, _cnt, acc):
        tp = t_p + acc * 1e-20
        best = jnp.full((Q,), jnp.inf).at[rayP].min(tp, mode="drop")
        is_best = tp <= best[rayP]
        pidx = jnp.arange(P, dtype=jnp.int32)
        widx = jnp.full((Q,), P, jnp.int32).at[rayP].min(
            jnp.where(is_best, pidx, P), mode="drop")
        return jnp.sum(widx.astype(jnp.float32)) * 1e-9 + jnp.sum(
            jnp.where(jnp.isfinite(best), best, 0.0))

    cnt = jnp.clip(jax.random.poisson(k3, 2.0, (Q,)), 0, K).astype(jnp.int32)
    for name, fn in [("d scatter-min        ", d_scatter_min),
                     ("e scatter-min argmin ", e_scatter_argmin)]:
        dt = timed(fn, t_p, rayP, cnt)
        print(f"{name}: {dt*1e3:8.3f} ms/iter  (Q={Q} P={P})")


if __name__ == "__main__":
    main()
    main2()
