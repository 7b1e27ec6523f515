"""Pallas TPU kernel: fused cluster-tile fetch + intersection + reduction.

The cluster-BVH pair stage (tpu_pt/bvh/cluster.py ``_test_pair_batch``)
needs, for each (ray, cluster) pair, the cluster's (12, 128) tile tested
against the ray and reduced to the nearest hit.  In XLA that is a gather
that MATERIALIZES a (P, 12, 128) tensor in HBM (written once, read once —
~2x the tile bytes) followed by elementwise math.  This kernel streams each
tile HBM->VMEM directly by cluster id (scalar-prefetch index list), runs
the dense Möller–Trumbore / sphere test on the VPU while the next tiles are
in flight, and writes only the (P, 8) per-pair result — tile bytes cross
HBM exactly once and the intermediate never exists.

Pairs are processed GROUP=8 at a time so the math occupies all 8 VPU
sublanes ((8, 128) ops, not (1, 128)) and 8 DMAs ride concurrently,
double-buffered against the next group's 8.

Row layout of a tile (built by cluster.py): lane p holds primitive p as
rows [v0.xyz, e1.xyz, e2.xyz, type, 0, 0]; type 1 = sphere (v0=center,
e1.x=radius); all-zero lanes are padding and never hit.

Output row per pair: [t, lane, u, v, 0, 0, 0, 0] with t=INF on miss.

Reference parity: the production form of the reference's CUDA per-thread
intersection inner loop (SURVEY.md §2 rows 6, 14) — one (ray, 128-prim)
tile per lane-step instead of one (thread, prim) pair.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_pt.core.intersect import INF

B = 128      # pairs per program
GROUP = 8    # pairs per inner step (= VPU sublanes; DMAs in flight)
LANES = 128  # primitives per tile (cluster.py TILE)
ROWS = 12


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _mt_group(tiles, rays):
    """Dense test of GROUP rays against their GROUP tiles.

    tiles: (GROUP, ROWS, LANES); rays: (GROUP, 16) rows
    [ro(3), rd(3), t_min, t_max, live, pad...].  Returns (t, u, v) each
    (GROUP, LANES), INF on miss.  All (GROUP, LANES)-shaped VPU math."""
    def trow(r):
        return tiles[:, r, :]                      # (GROUP, LANES)

    def rcol(c):
        return rays[:, c:c + 1]                    # (GROUP, 1)

    v0x, v0y, v0z = trow(0), trow(1), trow(2)
    e1x, e1y, e1z = trow(3), trow(4), trow(5)
    e2x, e2y, e2z = trow(6), trow(7), trow(8)
    typ = trow(9)
    ox, oy, oz = rcol(0), rcol(1), rcol(2)
    dx, dy, dz = rcol(3), rcol(4), rcol(5)
    t_min, t_max, live = rcol(6), rcol(7), rcol(8)

    # pvec = rd x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    par = jnp.abs(det) < 1e-12
    inv_det = jnp.where(par, 0.0, 1.0 / jnp.where(par, 1.0, det))
    tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
    u = (tvx * px + tvy * py + tvz * pz) * inv_det
    # qvec = tvec x e1
    qx = tvy * e1z - tvz * e1y
    qy = tvz * e1x - tvx * e1z
    qz = tvx * e1y - tvy * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t_tri = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok_tri = (~par) & (u >= 0) & (v >= 0) & (u + v <= 1) \
        & (t_tri >= t_min) & (t_tri <= t_max)

    # Sphere lanes: v0 = center, e1.x = radius.
    a = dx * dx + dy * dy + dz * dz
    b = 2.0 * (tvx * dx + tvy * dy + tvz * dz)
    c = tvx * tvx + tvy * tvy + tvz * tvz - e1x * e1x
    disc = b * b - 4.0 * a * c
    has = disc >= 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv2a = 1.0 / jnp.maximum(2.0 * a, 1e-20)
    s0 = (-b - sq) * inv2a
    s1 = (-b + sq) * inv2a
    ok0 = has & (s0 >= t_min) & (s0 <= t_max)
    ok1 = has & (s1 >= t_min) & (s1 <= t_max)
    t_sph = jnp.where(ok0, s0, s1)
    ok_sph = ok0 | ok1

    is_sph = typ > 0.5
    # jnp.where over BOOL vectors trips Mosaic ("unsupported target
    # bitwidth for truncation") — boolean algebra instead.
    ok = ((is_sph & ok_sph) | (~is_sph & ok_tri)) & (live > 0.0)
    t = jnp.where(ok, jnp.where(is_sph, t_sph, t_tri), INF)
    return t, jnp.where(is_sph, 0.0, u), jnp.where(is_sph, 0.0, v)


def _kernel(cid_ref, rays_ref, tiles_hbm, out_ref, scratch, sems):
    i = pl.program_id(0)
    n_groups = B // GROUP

    # Launch ALL of this program's tile DMAs up front (B x 6KB = 768KB of
    # VMEM scratch) — the DMA engines drain the queue while the VPU chews
    # through earlier groups, hiding nearly all fetch latency.
    def start_group(g):
        base = i * B + g * GROUP
        for k in range(GROUP):
            pltpu.make_async_copy(
                tiles_hbm.at[cid_ref[base + k]], scratch.at[g, k],
                sems.at[g, k]).start()

    for g in range(n_groups):
        start_group(g)

    def body(g, _):
        base = i * B + g * GROUP
        for k in range(GROUP):
            pltpu.make_async_copy(
                tiles_hbm.at[cid_ref[base + k]], scratch.at[g, k],
                sems.at[g, k]).wait()

        tiles = scratch[g]                              # (GROUP, ROWS, LANES)
        rays = rays_ref[pl.ds(g * GROUP, GROUP), :]     # (GROUP, 16)
        t, u, v = _mt_group(tiles, rays)
        t_best = jnp.min(t, axis=1, keepdims=True)      # (GROUP, 1)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (GROUP, LANES), 1)
        is_best = t == t_best
        lane = jnp.min(jnp.where(is_best, lanes, LANES), axis=1,
                       keepdims=True)
        at_lane = is_best & (lanes == lane)
        found = t_best < INF
        u_b = jnp.where(found, jnp.max(jnp.where(at_lane, u, -jnp.inf),
                                       axis=1, keepdims=True), 0.0)
        v_b = jnp.where(found, jnp.max(jnp.where(at_lane, v, -jnp.inf),
                                       axis=1, keepdims=True), 0.0)
        # Mosaic can't concat (GROUP, 1) pieces on the lane axis
        # ("result/input offset mismatch") — select by column index.
        col = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 8), 1)
        row = jnp.where(col == 0, t_best,
              jnp.where(col == 1, lane.astype(jnp.float32),
              jnp.where(col == 2, u_b,
              jnp.where(col == 3, v_b, 0.0))))
        out_ref[pl.ds(g * GROUP, GROUP), :] = row
        return 0

    jax.lax.fori_loop(0, n_groups, body, 0)


def _kernel_dedup(cid_ref, rays_ref, tiles_hbm, out_ref, scratch, sems):
    """Like _kernel, but exploits CID-SORTED pair order: when all GROUP
    pairs of a group share one cluster id (the common case for coherent
    camera/bounce rays — measured 80% of groups on the 1.3M bench), only
    ONE tile DMA is issued and the tile is broadcast to all sublanes.
    Tile bytes crossing HBM drop toward the distinct-cluster count."""
    i = pl.program_id(0)
    n_groups = B // GROUP

    def uniform(g):
        base = i * B + g * GROUP
        u = cid_ref[base + 1] == cid_ref[base]
        for k in range(2, GROUP):
            u = jnp.logical_and(u, cid_ref[base + k] == cid_ref[base])
        return u

    def start_group(g):
        base = i * B + g * GROUP
        u = uniform(g)
        pltpu.make_async_copy(
            tiles_hbm.at[cid_ref[base]], scratch.at[g, 0],
            sems.at[g, 0]).start()

        @pl.when(jnp.logical_not(u))
        def _():
            for k in range(1, GROUP):
                pltpu.make_async_copy(
                    tiles_hbm.at[cid_ref[base + k]], scratch.at[g, k],
                    sems.at[g, k]).start()

    for g in range(n_groups):
        start_group(g)

    def body(g, _):
        base = i * B + g * GROUP
        u = uniform(g)
        pltpu.make_async_copy(
            tiles_hbm.at[cid_ref[base]], scratch.at[g, 0],
            sems.at[g, 0]).wait()

        @pl.when(jnp.logical_not(u))
        def _():
            for k in range(1, GROUP):
                pltpu.make_async_copy(
                    tiles_hbm.at[cid_ref[base + k]], scratch.at[g, k],
                    sems.at[g, k]).wait()

        tiles_all = scratch[g]                          # (GROUP, ROWS, LANES)
        tile0 = scratch[g, 0]                           # (ROWS, LANES)
        # Uniform group: every sublane tests tile 0 (slots 1.. are stale).
        tiles = jnp.where(u, jnp.broadcast_to(tile0[None], tiles_all.shape),
                          tiles_all)
        rays = rays_ref[pl.ds(g * GROUP, GROUP), :]     # (GROUP, 16)
        t, uu, vv = _mt_group(tiles, rays)
        t_best = jnp.min(t, axis=1, keepdims=True)      # (GROUP, 1)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (GROUP, LANES), 1)
        is_best = t == t_best
        lane = jnp.min(jnp.where(is_best, lanes, LANES), axis=1,
                       keepdims=True)
        at_lane = is_best & (lanes == lane)
        found = t_best < INF
        u_b = jnp.where(found, jnp.max(jnp.where(at_lane, uu, -jnp.inf),
                                       axis=1, keepdims=True), 0.0)
        v_b = jnp.where(found, jnp.max(jnp.where(at_lane, vv, -jnp.inf),
                                       axis=1, keepdims=True), 0.0)
        col = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 8), 1)
        row = jnp.where(col == 0, t_best,
              jnp.where(col == 1, lane.astype(jnp.float32),
              jnp.where(col == 2, u_b,
              jnp.where(col == 3, v_b, 0.0))))
        out_ref[pl.ds(g * GROUP, GROUP), :] = row
        return 0

    jax.lax.fori_loop(0, n_groups, body, 0)


@functools.partial(jax.jit, static_argnames=())
def pair_tile_isect_dedup(tiles, cid, rays):
    """Dedup variant of pair_tile_isect: cid MUST be sorted ascending (dead
    pairs' ids clipped into range).  Same I/O contract otherwise."""
    P = cid.shape[0]
    assert P % B == 0, P
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P // B,),
        in_specs=[
            pl.BlockSpec((B, 16), lambda i, cid_ref: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # tiles stay in HBM
        ],
        out_specs=pl.BlockSpec((B, 8), lambda i, cid_ref: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B // GROUP, GROUP, ROWS, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((B // GROUP, GROUP)),
        ],
    )
    return pl.pallas_call(
        _kernel_dedup,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, 8), jnp.float32),
        interpret=_interpret(),
    )(cid, rays, tiles)


@functools.partial(jax.jit, static_argnames=())
def pair_tile_isect(tiles, cid, rays):
    """tiles: (C, 12, 128) f32; cid: (P,) i32 (P % 128 == 0); rays: (P, 16)
    f32 rows [ro(3), rd(3), t_min, t_max, live, pad...].  Returns (P, 8)
    f32 rows [t, lane, u, v, 0...] (t=INF for dead/miss pairs)."""
    P = cid.shape[0]
    assert P % B == 0, P
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P // B,),
        in_specs=[
            pl.BlockSpec((B, 16), lambda i, cid_ref: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # tiles stay in HBM
        ],
        out_specs=pl.BlockSpec((B, 8), lambda i, cid_ref: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B // GROUP, GROUP, ROWS, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((B // GROUP, GROUP)),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, 8), jnp.float32),
        interpret=_interpret(),
    )(cid, rays, tiles)


def check_pair_out(out, rays, label: str = "pair_tile_isect"):
    """Sanitizer for the kernel's output contract (SURVEY.md §5: Pallas
    can't host checkify.check inside the kernel body, so invariants are
    asserted on the results).  Call under a checkify.checkify wrapper.

    Checks, per pair row [t, lane, u, v, ...] against rays [.., t_min,
    t_max, live, ..]: a reported hit has t inside [t_min, t_max], a finite
    lane index in [0, 128), and finite u/v; dead pairs report t = INF."""
    from jax.experimental import checkify

    t = out[:, 0]
    lane = out[:, 1]
    hit = t < INF
    t_min, t_max, live = rays[:, 6], rays[:, 7], rays[:, 8] > 0.5
    checkify.check(jnp.all(jnp.where(hit, (t >= t_min) & (t <= t_max),
                                     True)),
                   label + ": hit t outside the query range")
    checkify.check(jnp.all(jnp.where(hit, (lane >= 0) & (lane < LANES),
                                     True)),
                   label + ": lane index out of range")
    checkify.check(jnp.all(jnp.isfinite(jnp.where(hit[:, None],
                                                  out[:, 2:4], 0.0))),
                   label + ": non-finite barycentrics")
    checkify.check(jnp.all(jnp.where(live, True, ~hit)),
                   label + ": dead pair reported a hit")


def _check_pair_in(tiles, cid, label):
    """Input sanitation: NaN geometry silently MASKS hits (every NaN
    comparison is False → miss), so poisoned tiles are undetectable from
    the output alone — the guard must look at the operands."""
    from jax.experimental import checkify

    checkify.check(jnp.all(jnp.isfinite(tiles)),
                   label + ": non-finite tile geometry")
    checkify.check(
        jnp.all((cid >= 0) & (cid < tiles.shape[0])),
        label + ": cluster id out of range")


def pair_tile_isect_checked(tiles, cid, rays):
    """pair_tile_isect + input/output contract checks (under checkify)."""
    _check_pair_in(tiles, cid, "pair_tile_isect")
    out = pair_tile_isect(tiles, cid, rays)
    check_pair_out(out, rays)
    return out


def pair_tile_isect_dedup_checked(tiles, cid, rays):
    """pair_tile_isect_dedup + contract checks (under checkify)."""
    _check_pair_in(tiles, cid, "pair_tile_isect_dedup")
    out = pair_tile_isect_dedup(tiles, cid, rays)
    check_pair_out(out, rays, label="pair_tile_isect_dedup")
    return out
