"""Microbenchmark: candidate-selection strategies for the cluster descent.

The descent needs, per ray, the `cap` nearest (by entry-t) finite candidates
out of N lanes.  Current implementation: bf16 full sort (jax.lax.sort with
an i32 payload).  Alternatives measured here:

  a) sort     — bf16 round-down key + i32 payload sort (today's path)
  b) extract  — lax.scan of cap iterations of (min, argmin-first, mask-out):
                exact, t-ascending, O(cap*N) VPU passes, no sort
  c) extract8 — like (b) but pulls the min of each 8-lane GROUP first
                ((Q, N/8, 8) -> (Q, N/8)), then extracts from group mins;
                only valid when <= 1 finite candidate per group is NOT
                guaranteed — measured for cost reference only
  d) onehot   — unordered compaction of finite entries to cap slots via
                cumsum + one-hot matmul (bf16 MXU)

Shapes swept: the three descent sorts of the 1.3M-tri bench
(Q=4096; (233->23), (184->38), (304->69)) plus a wide (1864->38) level.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

INF = 1e30


def timed_loop(fn, args, iters=50):
    @jax.jit
    def run(*args):
        def body(carry, _):
            acc, a0 = carry
            out = fn(a0, *args[1:])
            a0 = a0 + out * 1e-12
            return (acc + out, a0), None

        (acc, _), _ = jax.lax.scan(body, (jnp.float32(0.0), args[0]),
                                   jnp.arange(iters))
        return acc

    run(*args)
    float(np.asarray(run(*args)))
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(run(*args)))
        ts.append(time.time() - t0)
    return min(ts) / iters


def make_te(Q, N, n_finite_mean):
    """Entry-t matrix: mostly INF with a few finite values per row."""
    k = jax.random.key(0)
    k1, k2 = jax.random.split(k)
    finite = jax.random.uniform(k1, (Q, N)) < (n_finite_mean / N)
    t = jax.random.uniform(k2, (Q, N), minval=0.1, maxval=100.0)
    return jnp.where(finite, t, INF)


def sel_sort(te, cap):
    te16 = jax.lax.convert_element_type(
        jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(te, jnp.int32)
            & jnp.int32(-65536), jnp.float32),
        jnp.bfloat16)
    idx = jnp.broadcast_to(
        jnp.arange(te.shape[1], dtype=jnp.int32)[None], te.shape)
    te16, idx = jax.lax.sort((te16, idx), dimension=1, num_keys=1)
    te_s = jax.lax.convert_element_type(te16, jnp.float32)
    return jnp.sum(te_s[:, :cap] * 1e-30) + jnp.sum(idx[:, :cap] * 1e-30)


def sel_extract(te, cap):
    Q, N = te.shape
    lanes = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (Q, N))

    def body(te, _):
        m = jnp.min(te, axis=1)                      # (Q,)
        is_min = te == m[:, None]
        a = jnp.min(jnp.where(is_min, lanes, N), axis=1)
        te = jnp.where(lanes == a[:, None], INF, te)
        return te, (m, a)

    _, (ms, as_) = jax.lax.scan(body, te, None, length=cap)
    return jnp.sum(ms * 1e-30) + jnp.sum(as_ * 1e-30)


def sel_extract8(te, cap):
    Q, N = te.shape
    g = te.reshape(Q, N // 8, 8)
    gm = jnp.min(g, axis=2)  # (Q, N/8) group mins
    return sel_extract(gm, cap)


def sel_onehot(te, cap):
    Q, N = te.shape
    mask = te < INF
    pos = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1   # target slot
    oh = ((pos[:, :, None] == jnp.arange(cap, dtype=jnp.int32)[None, None])
          & mask[:, :, None]).astype(jnp.bfloat16)          # (Q, N, cap)
    te_b = jnp.where(mask, te, 0.0).astype(jnp.bfloat16)
    out_t = jnp.einsum("qn,qnc->qc", te_b, oh)              # compacted t
    idx = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.float32)[None], te.shape).astype(jnp.bfloat16)
    out_i = jnp.einsum("qn,qnc->qc", idx, oh)
    return (jnp.sum(out_t.astype(jnp.float32)) * 1e-30
            + jnp.sum(out_i.astype(jnp.float32)) * 1e-30)


def sel_take(te, cap):
    """Exact unordered compaction: cumsum + per-row searchsorted + gather.
    Slot s takes the s-th finite lane (take_along_axis on the minor axis)."""
    Q, N = te.shape
    mask = te < INF
    csum = jnp.cumsum(mask.astype(jnp.int32), axis=1)       # (Q, N)
    targets = jnp.arange(1, cap + 1, dtype=jnp.int32)[None]  # (1, cap)
    pos = jax.vmap(jnp.searchsorted)(csum, jnp.broadcast_to(targets, (Q, cap)))
    pos_c = jnp.minimum(pos, N - 1)
    t_out = jnp.take_along_axis(te, pos_c, axis=1)
    valid = pos < N
    t_out = jnp.where(valid, t_out, INF)
    return jnp.sum(jnp.where(t_out < INF, t_out, 0.0) * 1e-30)


def sel_topsort(te, cap):
    """Order only the cap nearest AFTER exact unordered compaction: take
    (exact) then a narrow (Q, cap) sort for the t-ascending order the pair
    pruning needs."""
    Q, N = te.shape
    mask = te < INF
    csum = jnp.cumsum(mask.astype(jnp.int32), axis=1)
    targets = jnp.arange(1, cap + 1, dtype=jnp.int32)[None]
    pos = jax.vmap(jnp.searchsorted)(csum, jnp.broadcast_to(targets, (Q, cap)))
    pos_c = jnp.minimum(pos, N - 1)
    t_out = jnp.where(pos < N, jnp.take_along_axis(te, pos_c, axis=1), INF)
    i_out = jnp.where(pos < N, pos_c, 0)
    t_s, i_s = jax.lax.sort((t_out, i_out), dimension=1, num_keys=1)
    return jnp.sum(jnp.where(t_s < INF, t_s, 0.0) * 1e-30) \
        + jnp.sum(i_s * 1e-30)


def main():
    Q = int(os.environ.get("SEL_QUEUE", "4096"))
    cases = [(233, 23, 8.0), (184, 38, 12.0), (304, 69, 16.0),
             (1864, 38, 12.0)]
    for N, cap, nf in cases:
        te = make_te(Q, N, nf)
        row = [f"(Q={Q}, N={N:4d} -> cap={cap:3d})"]
        for name, fn in [("sort", sel_sort), ("extract", sel_extract),
                         ("extract8", sel_extract8), ("onehot", sel_onehot),
                         ("take", sel_take), ("topsort", sel_topsort)]:
            try:
                dt = timed_loop(lambda te, fn=fn: fn(te, cap), (te,))
                row.append(f"{name}={dt*1e3:7.3f}ms")
            except Exception as e:  # noqa
                row.append(f"{name}=FAIL({type(e).__name__})")
        print("  ".join(row))

    # Dense slab test + block-gather costs (descend budget components).
    from tpu_pt.bvh.cluster import _slab

    k = jax.random.key(7)
    for N in (233, 1864):
        lv = jax.random.uniform(k, (N, 8), jnp.float32)
        lo = lv[:, 0:3] * 10
        hi = lo + 1.0
        ro = jax.random.uniform(k, (Q, 3)) * 10
        rd = jax.random.normal(k, (Q, 3))

        def s_dense(ro, rd, lo=lo, hi=hi):
            te = _slab(lo[None], hi[None], ro[:, None, :],
                       (1.0 / rd)[:, None, :], jnp.zeros((Q, 1)),
                       jnp.full((Q, 1), INF))
            return jnp.sum(jnp.where(te < INF, te, 0.0) * 1e-30)

        dt = timed_loop(s_dense, (ro, rd))
        print(f"dense slab (Q,{N:5d}): {dt*1e3:7.3f}ms")

    for F, table_rows in ((23, 1864), (38, 14912)):
        child = jax.random.uniform(k, (table_rows // 8, 8, 8), jnp.float32)
        idx = jax.random.randint(k, (Q, F), 0, table_rows // 8)

        def s_gather(idxf, child=child):
            blk = child[idxf.astype(jnp.int32)]
            return jnp.sum(blk[..., 0] * 1e-30)

        dt = timed_loop(lambda i: s_gather(i), (idx.astype(jnp.float32),))
        mb = Q * F * 256 / 1e6
        print(f"block gather (Q,{F}) x 256B from {table_rows*32//1024}KB "
              f"({mb:.0f} MB): {dt*1e3:7.3f}ms ({mb/dt/1e3:.0f} GB/s)")


if __name__ == "__main__":
    main()
