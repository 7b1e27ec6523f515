"""Axis-aligned bounding boxes: slab test + union helpers.

Counterpart of the reference's ``src/bbox.*`` (SURVEY.md §2 row 8:
``BBox::intersect(Ray, t0, t1)`` slab test, union/expand).  Batched over
rays and boxes with broadcasting; no branches.
"""

from __future__ import annotations

import jax.numpy as jnp


def slab_test(ro, rd_inv, bb_min, bb_max, t_min, t_max):
    """Ray-AABB slab test.

    ro:     (..., 3) ray origin
    rd_inv: (..., 3) 1/direction (precomputed; ±inf where d==0 is fine)
    bb_min, bb_max: (..., 3)
    t_min, t_max:   (..., 1)

    Returns (hit, t_near): hit (..., 1) bool; t_near (..., 1) entry distance
    (clamped to t_min) usable for front-to-back ordering.
    """
    lo = (bb_min - ro) * rd_inv
    hi = (bb_max - ro) * rd_inv
    # When rd_inv is ±inf and the origin coordinate sits exactly on the slab,
    # 0*inf = nan; replace nans conservatively.
    near = jnp.minimum(lo, hi)
    far = jnp.maximum(lo, hi)
    near = jnp.where(jnp.isnan(near), -jnp.inf, near)
    far = jnp.where(jnp.isnan(far), jnp.inf, far)
    t_near = jnp.maximum(jnp.max(near, axis=-1, keepdims=True), t_min)
    t_far = jnp.minimum(jnp.min(far, axis=-1, keepdims=True), t_max)
    hit = t_near <= t_far
    return hit, t_near


def union(bb_min_a, bb_max_a, bb_min_b, bb_max_b):
    return jnp.minimum(bb_min_a, bb_min_b), jnp.maximum(bb_max_a, bb_max_b)


def surface_area(bb_min, bb_max):
    d = jnp.maximum(bb_max - bb_min, 0.0)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0])
