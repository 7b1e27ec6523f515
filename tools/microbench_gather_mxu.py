"""Gather child-AABB rows via one-hot @ table MXU matmul vs jnp row gather.

Motivation (r4 step profile): the two per-step traversals spend ~3.5 ms in
XLA row gathers of the descent's child tables — (Q, cap) rows of 128 B
move at only ~13 GB/s (row-granularity random access).  But the INDEX
SPACES are tiny (level sizes 233 / 1864 on the bench scene), so the gather
can be phrased as onehot(P, N) @ table(N, 64): the one-hot build is P*N
cheap VPU compares and the data movement rides the MXU at matmul speed.
Exactness: a 0/1 bf16 one-hot times bf16-exact table values accumulated in
f32 reproduces the row EXACTLY (one nonzero per row, 1.0*x = x).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/microbench_gather_mxu.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=30):
    run = jax.jit(lambda acc, *a: fn(acc, *a))

    @jax.jit
    def loop(*a):
        def body(acc, _):
            return fn(acc, *a), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return acc

    float(np.asarray(loop(*args)))
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(loop(*args)))
        ts.append(time.time() - t0)
    return min(ts) / iters


def main():
    key = jax.random.key(0)
    # (P, N) cases mirroring the bench descent levels: L1 gather
    # P=Q*cap0=4096*34, N=233; leaf gather P=Q*cap1=4096*59, N=1864.
    for P, N in ((4096 * 34, 233), (4096 * 59, 1864), (4096 * 69, 1864)):
        k1, k2 = jax.random.split(jax.random.key(P % 977), 2)
        table16 = jax.random.normal(k1, (N, 64), jnp.float32).astype(
            jnp.bfloat16)
        idx = jax.random.randint(k2, (P,), 0, N, jnp.int32)

        def g_gather(acc, table16=table16, idx=idx):
            rows = table16[idx].astype(jnp.float32)      # (P, 64)
            return acc + jnp.sum(rows[:, 0]) * 1e-20 + acc * 0

        def g_mxu(acc, table16=table16, idx=idx, N=N):
            onehot = (idx[:, None] ==
                      jnp.arange(N, dtype=jnp.int32)[None, :]
                      ).astype(jnp.bfloat16)             # (P, N)
            rows = jax.lax.dot_general(
                onehot, table16, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (P, 64) f32
            return acc + jnp.sum(rows[:, 0]) * 1e-20 + acc * 0

        dt_g = timed(g_gather, ) * 1e3
        dt_m = timed(g_mxu, ) * 1e3
        mb = P * 128 / 1e6
        print(f"P={P:7d} N={N:5d} ({mb:6.1f} MB rows): "
              f"gather {dt_g:7.3f} ms ({mb/dt_g:6.1f} GB/s)   "
              f"mxu-onehot {dt_m:7.3f} ms ({mb/dt_m:6.1f} GB/s)")

        # exactness: bit-identical rows
        r_g = np.asarray(table16[idx].astype(jnp.float32))
        r_m = np.asarray(jax.lax.dot_general(
            (idx[:, None] == jnp.arange(N)[None, :]).astype(jnp.bfloat16),
            table16, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        assert np.array_equal(r_g, r_m), "MXU gather not exact!"
    print("MXU one-hot gather rows bit-identical: OK")


if __name__ == "__main__":
    main()
