"""Introspection renders: BVH traversal heatmap + wavefront statistics.

Headless replacement for the reference's interactive BVH-visualize mode
(SURVEY.md §3.4: 'V' navigates the tree in the viewer) and its stdout
timing counters (SURVEY.md §5 "Tracing / profiling").  The heatmap renders
per-pixel node-visit counts of the camera rays — the traversal-cost image —
which is both the debugging tool the reference's visualizer was and the key
perf signal for BVH quality tuning.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pt.bvh.packed import PackedBVH, _octant_of
from tpu_pt.config import RenderConfig
from tpu_pt.core.camera import generate_rays, pixel_xy


def _count_walk(table, n, n_tables, ro, rd):
    """Per-ray (visits, leaf_tests) of a full closest-hit-style walk."""
    R = ro.shape[0]
    rd_inv = 1.0 / rd
    base = (_octant_of(rd) % n_tables) * n

    def cond(s):
        return jnp.any(s[0] < n)

    def body(s):
        cur, best_t, visits, leafs = s
        active = cur < n
        node = table[base + jnp.where(active, cur, 0)]
        lo = (node[:, 0:3] - ro) * rd_inv
        hi = (node[:, 3:6] - ro) * rd_inv
        near = jnp.minimum(lo, hi)
        far = jnp.maximum(lo, hi)
        near = jnp.where(jnp.isnan(near), -jnp.inf, near)
        far = jnp.where(jnp.isnan(far), jnp.inf, far)
        tn = jnp.maximum(jnp.max(near, -1, keepdims=True), 0.0)
        tf = jnp.minimum(jnp.min(far, -1, keepdims=True), best_t)
        hit = (tn <= tf) & active[:, None]
        meta = jax.lax.bitcast_convert_type(node[:, 7], jnp.int32)
        skip = jax.lax.bitcast_convert_type(node[:, 6], jnp.int32)
        is_leaf = meta >= 0
        visits = visits + active.astype(jnp.int32)
        leafs = leafs + (hit[:, 0] & is_leaf).astype(jnp.int32)
        descend = hit[:, 0] & ~is_leaf
        nxt = jnp.where(descend, cur + 1, skip)
        nxt = jnp.where(active, nxt, n)
        return nxt, best_t, visits, leafs

    z = jnp.zeros((R,), jnp.int32)
    _, _, visits, leafs = jax.lax.while_loop(
        cond, body, (z, jnp.full((R, 1), 1e30), z, z)
    )
    return visits, leafs


@functools.partial(jax.jit, static_argnames=("width", "height", "n_tables", "n"))
def _heatmap_jit(table, n_tables: int, n: int, cam, width: int, height: int):
    pix = jnp.arange(width * height, dtype=jnp.int32)
    xy = pixel_xy(width, height, pix, jnp.full((width * height, 2), 0.5))
    ro, rd = generate_rays(cam, xy)
    visits, leafs = _count_walk(table, n, n_tables, ro, rd)
    return visits.reshape(height, width), leafs.reshape(height, width)


def bvh_heatmap(packed: PackedBVH, cam, width: int, height: int):
    """-> dict with per-pixel visit counts + summary stats (numpy)."""
    visits, leafs = _heatmap_jit(
        jnp.asarray(packed.table), packed.n_tables, packed.n_nodes, cam,
        width, height,
    )
    visits = np.asarray(visits)
    leafs = np.asarray(leafs)
    return dict(
        visits=visits,
        leaf_tests=leafs,
        mean_visits=float(visits.mean()),
        max_visits=int(visits.max()),
        mean_leaf_tests=float(leafs.mean()),
    )


def heatmap_image(visits: np.ndarray):
    """Visit counts -> (H, W, 3) false-color linear image (blue→red)."""
    v = visits.astype(np.float32)
    x = v / max(float(v.max()), 1.0)
    r = np.clip(2 * x - 0.5, 0, 1)
    g = 1.0 - np.abs(2 * x - 1.0)
    b = np.clip(1.0 - 2 * x, 0, 1)
    return np.stack([r, g, b], axis=-1)
