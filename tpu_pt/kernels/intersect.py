"""Pallas TPU intersection kernel: dense ray-tile × primitive-tile testing.

BASELINE.json names a "Pallas intersection kernel" as a required subsystem.
This is the TPU-idiomatic form of the reference's per-thread intersection
inner loop (SURVEY.md §2 rows 6, 14): instead of a divergent per-ray walk,
rays are processed in (RBLK) blocks resident in VMEM, and ALL primitives
stream through VMEM in (128-row) tiles; every (ray, prim) pair is tested
with fully-dense (RBLK, 128) VPU ops — zero divergence, zero gathers.

Complexity is O(R·P), so this is the backend of choice for small-to-medium
primitive counts (the Cornell family, per-leaf candidate lists) where the
dense sweep beats the gather-latency-bound BVH walk; the packed BVH
traversal remains the big-scene path.  Correctness contract: identical hits
to render/brute.py (tests/test_pallas.py).

Row layout matches PackedBVH prim rows ((P, 16) f32):
  tri:    [v0, e1, e2, matf, 0(type), pad]
  sphere: [center, r, 0,0, 0,0,0, matf, 1(type), pad]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_pt.core.intersect import INF
from tpu_pt.render.brute import Hit
from tpu_pt.scene.types import Scene

RBLK = 128   # rays per program
TBLK = 128   # primitive rows per inner tile


def _interpret() -> bool:
    """Run in interpreter mode off-TPU (CPU tests; SURVEY.md §5 uses
    interpret=True as the 'sanitizer' for hand-written kernels)."""
    return jax.default_backend() != "tpu" 


def _pair_test(rows, ro, rd, t_min, t_max):
    """Dense (RBLK, TBLK) intersection of a ray block against a prim tile.

    rows: (TBLK, 16); ro/rd: (RBLK, 3); t_min/t_max: (RBLK, 1).
    Returns (hit, t, u, v) each (RBLK, TBLK).
    """
    v0 = rows[None, :, 0:3]
    e1 = rows[None, :, 3:6]
    e2 = rows[None, :, 6:9]
    is_sph = rows[None, :, 10] > 0.5
    o = ro[:, None, :]
    d = rd[:, None, :]

    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, -1)
    par = jnp.abs(det) < 1e-12
    inv_det = jnp.where(par, 0.0, 1.0 / jnp.where(par, 1.0, det))
    tvec = o - v0
    u = jnp.sum(tvec * pvec, -1) * inv_det
    qvec = jnp.cross(tvec, e1)
    vv = jnp.sum(d * qvec, -1) * inv_det
    t_tri = jnp.sum(e2 * qvec, -1) * inv_det
    hit_tri = (~par) & (u >= 0) & (vv >= 0) & (u + vv <= 1) \
        & (t_tri >= t_min) & (t_tri <= t_max)

    oc = o - v0
    radius = rows[None, :, 3]
    a = jnp.sum(d * d, -1)
    b = 2.0 * jnp.sum(oc * d, -1)
    c = jnp.sum(oc * oc, -1) - radius * radius
    disc = b * b - 4 * a * c
    has = disc >= 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv2a = 1.0 / jnp.maximum(2 * a, 1e-20)
    t0 = (-b - sq) * inv2a
    t1 = (-b + sq) * inv2a
    ok0 = has & (t0 >= t_min) & (t0 <= t_max)
    ok1 = has & (t1 >= t_min) & (t1 <= t_max)
    t_sph = jnp.where(ok0, t0, t1)
    hit_sph = ok0 | ok1

    hit = jnp.where(is_sph, hit_sph, hit_tri)
    t = jnp.where(is_sph, t_sph, t_tri)
    return hit, jnp.where(hit, t, INF), u, vv


def _closest_kernel(rays_ref, prims_ref, out_ref):
    """One program: RBLK rays vs ALL prim tiles; emits [t, u, v, slotf]."""
    ro = rays_ref[:, 0:3]
    t_min = rays_ref[:, 3:4]
    rd = rays_ref[:, 4:7]
    t_max = rays_ref[:, 7:8]
    n_tiles = prims_ref.shape[0] // TBLK

    def body(k, carry):
        best_t, best_u, best_v, best_slot = carry
        rows = prims_ref[pl.ds(k * TBLK, TBLK), :]
        hit, t, u, v = _pair_test(rows, ro, rd, t_min, jnp.minimum(t_max, best_t))
        tile_t = jnp.min(t, axis=1, keepdims=True)
        arg = jnp.argmin(t, axis=1)
        closer = tile_t < best_t
        slot = (k * TBLK + arg)[:, None].astype(jnp.float32)
        take = jnp.take_along_axis
        u_best = take(u, arg[:, None], axis=1)
        v_best = take(v, arg[:, None], axis=1)
        return (
            jnp.where(closer, tile_t, best_t),
            jnp.where(closer, u_best, best_u),
            jnp.where(closer, v_best, best_v),
            jnp.where(closer, slot, best_slot),
        )

    init = (
        jnp.full((RBLK, 1), INF, jnp.float32),
        jnp.zeros((RBLK, 1), jnp.float32),
        jnp.zeros((RBLK, 1), jnp.float32),
        jnp.zeros((RBLK, 1), jnp.float32),
    )
    best_t, best_u, best_v, best_slot = jax.lax.fori_loop(
        0, n_tiles, body, init
    )
    out_ref[:, 0:1] = best_t
    out_ref[:, 1:2] = best_u
    out_ref[:, 2:3] = best_v
    out_ref[:, 3:4] = best_slot


def _anyhit_kernel(rays_ref, prims_ref, out_ref):
    ro = rays_ref[:, 0:3]
    t_min = rays_ref[:, 3:4]
    rd = rays_ref[:, 4:7]
    t_max = rays_ref[:, 7:8]
    n_tiles = prims_ref.shape[0] // TBLK

    def body(k, occ):
        rows = prims_ref[pl.ds(k * TBLK, TBLK), :]
        hit, _, _, _ = _pair_test(rows, ro, rd, t_min, t_max)
        return occ | jnp.any(hit, axis=1, keepdims=True)

    occ = jax.lax.fori_loop(0, n_tiles, body, jnp.zeros((RBLK, 1), bool))
    out_ref[:] = occ.astype(jnp.float32)


def _pad_rays(ro, rd, t_min, t_max):
    r = ro.shape[0]
    rp = -(-r // RBLK) * RBLK
    rays = jnp.concatenate([ro, t_min, rd, t_max], axis=1)
    pad = jnp.zeros((rp - r, 8), jnp.float32).at[:, 7].set(-1.0)  # t_max<t_min
    return jnp.concatenate([rays, pad], axis=0), r, rp


@functools.partial(jax.jit, static_argnames=())
def _closest_call(rays, prims):
    rp = rays.shape[0]
    return pl.pallas_call(
        _closest_kernel,
        grid=(rp // RBLK,),
        in_specs=[
            pl.BlockSpec((RBLK, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RBLK, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, 4), jnp.float32),
        interpret=_interpret(),
    )(rays, prims)


@functools.partial(jax.jit, static_argnames=())
def _anyhit_call(rays, prims):
    rp = rays.shape[0]
    return pl.pallas_call(
        _anyhit_kernel,
        grid=(rp // RBLK,),
        in_specs=[
            pl.BlockSpec((RBLK, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RBLK, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, 1), jnp.float32),
        interpret=_interpret(),
    )(rays, prims)


@jax.tree_util.register_pytree_node_class
class PallasScene:
    """Prim rows + gid for the dense kernel (host-built, like PackedBVH).
    Registered pytree so it can ride through jit as an argument."""

    def __init__(self, scene: Scene = None, *, prims=None, n_prims=None):
        if scene is not None:
            from tpu_pt.bvh.native import _prim_rows

            pid = np.arange(scene.n_prims, dtype=np.int32)
            rows = _prim_rows(scene, pid)
            p = rows.shape[0]
            pp = -(-p // TBLK) * TBLK
            padded = np.zeros((pp, 16), np.float32)
            padded[:p] = rows
            # Padding rows: degenerate triangles (all-zero) never hit.
            prims, n_prims = padded, p
        self.prims = prims
        self.n_prims = n_prims

    def tree_flatten(self):
        return (self.prims,), self.n_prims

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(prims=children[0], n_prims=aux)


def intersect(ps: PallasScene, scene: Scene, ro, rd, t_min, t_max) -> Hit:
    rays, r, rp = _pad_rays(ro, rd, t_min, t_max)
    out = _closest_call(rays, jnp.asarray(ps.prims))[:r]
    t = out[:, 0:1]
    found = t < INF
    slot = jnp.clip(out[:, 3].astype(jnp.int32), 0, ps.n_prims - 1)
    return Hit(hit=found, t=t, prim=slot, u=out[:, 1:2], v=out[:, 2:3])


def occluded(ps: PallasScene, scene: Scene, ro, rd, t_max):
    t_min = jnp.zeros_like(t_max)
    rays, r, rp = _pad_rays(ro, rd, t_min, t_max)
    out = _anyhit_call(rays, jnp.asarray(ps.prims))[:r]
    return out > 0.5
