"""Microbench: per-row lane-compaction strategies at the descent's real
shapes (Q=4096; N,cap per level of the 1.3M-tri bench pyramid).

Strategies:
  onehot  — cumsum rank + fused one-hot reduction (cluster._compact_lanes)
  scatter — cumsum rank + 2-D scatter of live lanes (rank-1 as column)
  sort    — 2-operand lax.sort along the lane axis, slice first cap

Also: segmented-reduce addressing for the flat pair batch —
  searchsorted — jnp.searchsorted(rayP, arange(Q)) left/right (current)
  scatteradd   — per-ray counts via .at[].add + cumsum

Run on TPU: PYTHONPATH=/root/.axon_site:/root/repo python tools/microbench_compact.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

Q = 4096
SHAPES = [(233, 23), (184, 38), (304, 69)]
ITERS = 50


def timed(fn, *args):
    run = jax.jit(fn)
    out = run(*args)
    jax.tree.map(lambda x: np.asarray(x), out)
    ts = []
    for _ in range(3):
        t0 = time.time()
        jax.tree.map(lambda x: np.asarray(x), run(*args))
        ts.append(time.time() - t0)
    return min(ts) / ITERS


def loop(stage, live, idx):
    def body(carry, _):
        l, acc = carry
        out, live_c = stage(l, idx)
        # data dependence so iterations can't be CSE'd
        l = l ^ (live_c[:, :1] & (acc % 2 == 1))
        return (l, acc + jnp.sum(out)), None

    def run(live, idx):
        (_, acc), _ = jax.lax.scan(body, (live, jnp.int32(0)), None,
                                   length=ITERS)
        return acc

    return run


def onehot(cap):
    def stage(live, idx):
        rank = jnp.cumsum(live.astype(jnp.int32), axis=1)
        total = rank[:, -1]
        oh = (live & (rank <= cap))[:, :, None] & (
            rank[:, :, None] == jnp.arange(1, cap + 1,
                                           dtype=jnp.int32)[None, None, :])
        out = jnp.sum(jnp.where(oh, idx[:, :, None], 0), axis=1)
        live_c = jnp.arange(cap, dtype=jnp.int32)[None, :] < total[:, None]
        return out, live_c
    return stage


def scatter(cap):
    def stage(live, idx):
        rank = jnp.cumsum(live.astype(jnp.int32), axis=1)
        total = rank[:, -1]
        col = jnp.where(live & (rank <= cap), rank - 1, cap)  # cap = dropped
        arq = jnp.arange(Q, dtype=jnp.int32)[:, None]
        out = jnp.zeros((Q, cap), jnp.int32).at[
            jnp.broadcast_to(arq, col.shape), col].set(idx, mode="drop")
        live_c = jnp.arange(cap, dtype=jnp.int32)[None, :] < total[:, None]
        return out, live_c
    return stage


def sortc(cap):
    def stage(live, idx):
        n = live.shape[1]
        key = jnp.where(live, jnp.arange(n, dtype=jnp.int32)[None, :],
                        jnp.int32(2 ** 30))
        ks, vs = jax.lax.sort((key, idx), dimension=1, num_keys=1)
        total = jnp.sum(live.astype(jnp.int32), axis=1)
        live_c = jnp.arange(cap, dtype=jnp.int32)[None, :] < total[:, None]
        return vs[:, :cap], live_c
    return stage


def cumsum_only(cap):
    def stage(live, idx):
        rank = jnp.cumsum(live.astype(jnp.int32), axis=1)
        return rank[:, -cap:], live[:, :cap]
    return stage


def onehot_given_rank(cap):
    """One-hot reduce with a FAKE rank (iota) — isolates the reduce cost."""
    def stage(live, idx):
        n = live.shape[1]
        rank = jnp.broadcast_to(
            jnp.arange(1, n + 1, dtype=jnp.int32)[None, :], live.shape)
        oh = (live & (rank <= cap))[:, :, None] & (
            rank[:, :, None] == jnp.arange(1, cap + 1,
                                           dtype=jnp.int32)[None, None, :])
        out = jnp.sum(jnp.where(oh, idx[:, :, None], 0), axis=1)
        return out, live[:, :cap]
    return stage


def select_via_searchsorted(cap):
    """rank rows are sorted: position of the j-th live lane =
    searchsorted(rank, j+1) — log N rounds of (Q, cap) gathers."""
    def stage(live, idx):
        rank = jnp.cumsum(live.astype(jnp.int32), axis=1)
        total = rank[:, -1]
        tgt = jnp.arange(1, cap + 1, dtype=jnp.int32)
        pos = jax.vmap(lambda r: jnp.searchsorted(r, tgt))(rank)
        pos = jnp.minimum(pos, live.shape[1] - 1)
        out = jnp.take_along_axis(idx, pos, axis=1)
        live_c = tgt[None, :] <= total[:, None]
        return out, live_c
    return stage


def logshift(cap):
    """Bit-serial left-shift compaction: element distances to their packed
    slot are nondecreasing along a row, which makes LSB-first staged
    shifting collision-free (validated exhaustively in numpy)."""
    def stage(live, idx):
        n = live.shape[1]
        pos = jnp.arange(n, dtype=jnp.int32)[None, :]
        rank = jnp.cumsum(live.astype(jnp.int32), axis=1) - live.astype(jnp.int32)
        d = jnp.where(live, pos - rank, 0)
        val, alive, dd = idx, live, d
        nb = max(1, (n - 1).bit_length())
        for b in range(nb):
            bit = 1 << b
            move = alive & ((dd & bit) != 0)
            val_s = jnp.roll(val, -bit, axis=1)
            dd_s = jnp.roll(dd, -bit, axis=1)
            arrive = jnp.roll(move, -bit, axis=1)
            arrive = arrive & (pos < n - bit)
            alive = (alive & ~move) | arrive
            val = jnp.where(arrive, val_s, val)
            dd = jnp.where(arrive, dd_s - bit, dd)
        total = jnp.sum(live.astype(jnp.int32), axis=1)
        live_c = jnp.arange(cap, dtype=jnp.int32)[None, :] < total[:, None]
        return val[:, :cap], live_c
    return stage


def flatten_sort(budget):
    """Direct global flatten of the (Q, N) live mask to a ray-sorted pair
    list (no per-row compaction at all): 1-D stable sort of Q*N keys
    (= _flatten_live at the wider pre-compaction shape)."""
    def stage(live, idx):
        n = live.shape[1]
        arq = jnp.arange(Q, dtype=jnp.int32)[:, None]
        key = jnp.where(live, arq, Q).reshape(-1)
        ks, vs = jax.lax.sort((key, idx.reshape(-1)), dimension=0,
                              num_keys=1, is_stable=True)
        dep = live[:, :1] & ((vs[0] % 2) == 0)
        return vs[:budget], dep
    return stage


def flatten_topk(budget):
    """Same flatten via lax.top_k: keep the `budget` smallest
    (ray-major position) keys of the live lanes."""
    def stage(live, idx):
        n = live.shape[1]
        flat_pos = jnp.arange(Q * n, dtype=jnp.int32)
        key = jnp.where(live.reshape(-1), -flat_pos, -(2 ** 30))
        topv, topi = jax.lax.top_k(key, budget)
        vs = idx.reshape(-1)[topi]
        dep = live[:, :1] & ((vs[0] % 2) == 0)
        return vs, dep
    return stage


def main():
    print(f"device={jax.devices()[0]} Q={Q} iters={ITERS}")
    key = jax.random.key(0)

    # ---- direct-flatten alternatives at the LEAF level: replace
    # (one-hot compact (Q,304)->(Q,69) THEN flatten (Q,69)->6Q pairs)
    # with one global flatten (Q,304) -> 6Q pairs. ----
    n, cap = 304, 69
    budget = 6 * Q
    live = jax.random.uniform(key, (Q, n)) < (6.0 / n)  # mean ~6 live/ray
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :],
                           (Q, n)).copy()
    for name, mk in [("flat-sort", flatten_sort), ("flat-topk", flatten_topk)]:
        dt = timed(loop(mk(budget), live, idx), live, idx)
        print(f"  N={n:4d} budget={budget} {name:10s} {dt*1e3:7.3f} ms/iter")
    # The incumbent two-stage pipeline at the same load:
    def two_stage(live, idx):
        out, live_c = onehot(cap)(live, idx)
        return flatten_sort(budget)(live_c, out)
    dt = timed(loop(lambda l, i: two_stage(l, i), live, idx), live, idx)
    print(f"  N={n:4d} budget={budget} {'oh+flat':10s} {dt*1e3:7.3f} ms/iter")

    for n, cap in SHAPES:
        live = jax.random.uniform(key, (Q, n)) < (cap / (2.0 * n))
        idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :],
                               (Q, n)).copy()
        for name, mk in [("onehot", onehot), ("logshift", logshift),
                         ("sort", sortc), ("cumsum", cumsum_only),
                         ("oh-rank", onehot_given_rank)]:
            dt = timed(loop(mk(cap), live, idx), live, idx)
            print(f"  N={n:4d} cap={cap:3d} {name:8s} {dt*1e3:7.3f} ms/iter")

    # ---- segmented addressing at the flat-pair shape ----
    P = 4 * Q
    rayP = jnp.sort(jax.random.randint(jax.random.key(1), (P,), 0, Q + 1,
                                       dtype=jnp.int32))
    arq = jnp.arange(Q, dtype=jnp.int32)

    def s_searchsorted(rayP):
        def body(c, _):
            r, acc = c
            left = jnp.searchsorted(r, arq, side="left")
            right = jnp.searchsorted(r, arq, side="right")
            acc = acc + jnp.sum(right - left)
            r = r + (acc % 2)
            return (r, acc), None
        (_, acc), _ = jax.lax.scan(body, (rayP, jnp.int32(0)), None,
                                   length=ITERS)
        return acc

    def s_scatteradd(rayP):
        def body(c, _):
            r, acc = c
            cnt = jnp.zeros((Q,), jnp.int32).at[r].add(1, mode="drop")
            right = jnp.cumsum(cnt)
            left = right - cnt
            acc = acc + jnp.sum(right - left)
            r = r + (acc % 2)
            return (r, acc), None
        (_, acc), _ = jax.lax.scan(body, (rayP, jnp.int32(0)), None,
                                   length=ITERS)
        return acc

    for name, fn in [("searchsorted", s_searchsorted),
                     ("scatteradd", s_scatteradd)]:
        run = jax.jit(fn)
        np.asarray(run(rayP))
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(run(rayP))
            ts.append(time.time() - t0)
        print(f"  P={P} {name:14s} {min(ts)/ITERS*1e3:7.3f} ms/iter")


if __name__ == "__main__":
    main()
