"""Unit tests for core math: Möller–Trumbore, AABB slab, ONB, samplers,
camera — SURVEY.md §4 item 2 (per-kernel unit tests vs closed-form cases)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pt.core import aabb, intersect, sampling, vecmath
from tpu_pt.core.camera import Camera, generate_rays, pixel_xy


def _col(x):
    return jnp.asarray(x, jnp.float32)[None, :]


class TestRayTriangle:
    def test_center_hit(self):
        ro = _col([0.25, 0.25, 1.0])
        rd = _col([0.0, 0.0, -1.0])
        v0 = _col([0.0, 0.0, 0.0])
        e1 = _col([1.0, 0.0, 0.0])
        e2 = _col([0.0, 1.0, 0.0])
        tmin = jnp.zeros((1, 1))
        tmax = jnp.full((1, 1), 1e30)
        hit, t, u, v = intersect.ray_triangle(ro, rd, v0, e1, e2, tmin, tmax)
        assert bool(hit[0, 0])
        np.testing.assert_allclose(t[0, 0], 1.0, rtol=1e-6)
        np.testing.assert_allclose(u[0, 0], 0.25, rtol=1e-5)
        np.testing.assert_allclose(v[0, 0], 0.25, rtol=1e-5)

    def test_miss_outside(self):
        ro = _col([0.9, 0.9, 1.0])  # u+v > 1
        rd = _col([0.0, 0.0, -1.0])
        v0 = _col([0.0, 0.0, 0.0])
        e1 = _col([1.0, 0.0, 0.0])
        e2 = _col([0.0, 1.0, 0.0])
        hit, t, _, _ = intersect.ray_triangle(
            ro, rd, v0, e1, e2, jnp.zeros((1, 1)), jnp.full((1, 1), 1e30)
        )
        assert not bool(hit[0, 0])
        assert float(t[0, 0]) >= 1e29

    def test_parallel_ray(self):
        ro = _col([0.25, 0.25, 1.0])
        rd = _col([1.0, 0.0, 0.0])  # parallel to the triangle plane
        v0 = _col([0.0, 0.0, 0.0])
        e1 = _col([1.0, 0.0, 0.0])
        e2 = _col([0.0, 1.0, 0.0])
        hit, _, _, _ = intersect.ray_triangle(
            ro, rd, v0, e1, e2, jnp.zeros((1, 1)), jnp.full((1, 1), 1e30)
        )
        assert not bool(hit[0, 0])

    def test_backface_still_hits(self):
        # No backface culling (glass interiors need it).
        ro = _col([0.25, 0.25, -1.0])
        rd = _col([0.0, 0.0, 1.0])
        v0 = _col([0.0, 0.0, 0.0])
        e1 = _col([1.0, 0.0, 0.0])
        e2 = _col([0.0, 1.0, 0.0])
        hit, t, _, _ = intersect.ray_triangle(
            ro, rd, v0, e1, e2, jnp.zeros((1, 1)), jnp.full((1, 1), 1e30)
        )
        assert bool(hit[0, 0])
        np.testing.assert_allclose(t[0, 0], 1.0, rtol=1e-6)

    def test_tmax_respected(self):
        ro = _col([0.25, 0.25, 1.0])
        rd = _col([0.0, 0.0, -1.0])
        v0 = _col([0.0, 0.0, 0.0])
        e1 = _col([1.0, 0.0, 0.0])
        e2 = _col([0.0, 1.0, 0.0])
        hit, _, _, _ = intersect.ray_triangle(
            ro, rd, v0, e1, e2, jnp.zeros((1, 1)), jnp.full((1, 1), 0.5)
        )
        assert not bool(hit[0, 0])


class TestRaySphere:
    def test_two_root_hit(self):
        ro = _col([0.0, 0.0, 3.0])
        rd = _col([0.0, 0.0, -1.0])
        c = _col([0.0, 0.0, 0.0])
        r = jnp.full((1, 1), 1.0)
        hit, t, n = intersect.ray_sphere(ro, rd, c, r, jnp.zeros((1, 1)),
                                         jnp.full((1, 1), 1e30))
        assert bool(hit[0, 0])
        np.testing.assert_allclose(t[0, 0], 2.0, rtol=1e-5)

    def test_inside_sphere_takes_far_root(self):
        ro = _col([0.0, 0.0, 0.0])
        rd = _col([0.0, 0.0, -1.0])
        c = _col([0.0, 0.0, 0.0])
        r = jnp.full((1, 1), 1.0)
        hit, t, _ = intersect.ray_sphere(ro, rd, c, r, jnp.zeros((1, 1)),
                                         jnp.full((1, 1), 1e30))
        assert bool(hit[0, 0])
        np.testing.assert_allclose(t[0, 0], 1.0, rtol=1e-5)

    def test_miss(self):
        ro = _col([3.0, 0.0, 3.0])
        rd = _col([0.0, 0.0, -1.0])
        c = _col([0.0, 0.0, 0.0])
        r = jnp.full((1, 1), 1.0)
        hit, _, _ = intersect.ray_sphere(ro, rd, c, r, jnp.zeros((1, 1)),
                                         jnp.full((1, 1), 1e30))
        assert not bool(hit[0, 0])


class TestAABB:
    def test_hit_and_tnear(self):
        ro = _col([0.0, 0.0, 2.0])
        rd_inv = 1.0 / _col([1e-30, 1e-30, -1.0])
        hit, t_near = aabb.slab_test(
            ro, rd_inv, _col([-1, -1, -1]), _col([1, 1, 1]),
            jnp.zeros((1, 1)), jnp.full((1, 1), 1e30),
        )
        assert bool(hit[0, 0])
        np.testing.assert_allclose(t_near[0, 0], 1.0, rtol=1e-5)

    def test_axis_parallel_on_slab_boundary(self):
        # Origin exactly on a slab plane with zero direction component:
        # the nan-guard must keep this a hit.
        ro = _col([1.0, 0.0, 2.0])
        rd = np.array([[0.0, 0.0, -1.0]], np.float32)
        rd_inv = jnp.asarray(1.0 / rd)
        hit, _ = aabb.slab_test(
            ro, rd_inv, _col([-1, -1, -1]), _col([1, 1, 1]),
            jnp.zeros((1, 1)), jnp.full((1, 1), 1e30),
        )
        assert bool(hit[0, 0])

    def test_miss(self):
        ro = _col([5.0, 5.0, 2.0])
        rd = np.array([[0.0, 0.0, -1.0]], np.float32)
        hit, _ = aabb.slab_test(
            ro, jnp.asarray(1.0 / rd), _col([-1, -1, -1]), _col([1, 1, 1]),
            jnp.zeros((1, 1)), jnp.full((1, 1), 1e30),
        )
        assert not bool(hit[0, 0])


class TestVecMath:
    def test_onb_orthonormal(self):
        key = jax.random.key(0)
        n = vecmath.normalize(jax.random.normal(key, (128, 3)))
        t, b = vecmath.make_coord_space(n)
        for pair in [(t, b), (t, n), (b, n)]:
            np.testing.assert_allclose(
                vecmath.dot(pair[0], pair[1])[:, 0], 0.0, atol=1e-5
            )
        np.testing.assert_allclose(vecmath.length(t)[:, 0], 1.0, rtol=1e-5)
        np.testing.assert_allclose(vecmath.length(b)[:, 0], 1.0, rtol=1e-5)
        # right-handed: t × b = n
        np.testing.assert_allclose(
            np.asarray(vecmath.cross(t, b)), np.asarray(n), atol=1e-5
        )

    def test_local_world_roundtrip(self):
        key = jax.random.key(1)
        n = vecmath.normalize(jax.random.normal(key, (64, 3)))
        t, b = vecmath.make_coord_space(n)
        w = vecmath.normalize(jax.random.normal(jax.random.key(2), (64, 3)))
        w2 = vecmath.to_world(vecmath.to_local(w, t, b, n), t, b, n)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-5)

    def test_reflect(self):
        wo = _col([0.3, 0.0, 0.9539392])
        n = _col([0.0, 0.0, 1.0])
        r = vecmath.reflect(wo, n)
        np.testing.assert_allclose(
            np.asarray(r)[0], [-0.3, 0.0, 0.9539392], atol=1e-6
        )


class TestSamplers:
    def test_cosine_hemisphere_distribution(self):
        # chi-square-lite: mean z of cosine-weighted samples = 2/3.
        u = jax.random.uniform(jax.random.key(3), (200_000, 2))
        d, pdf = sampling.cosine_hemisphere(u)
        assert float(jnp.min(d[:, 2])) >= 0.0
        np.testing.assert_allclose(float(jnp.mean(d[:, 2])), 2.0 / 3.0, atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(pdf[:, 0]), np.asarray(d[:, 2]) / np.pi, atol=1e-5
        )
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(d), axis=1), 1.0, atol=1e-5
        )

    def test_uniform_hemisphere_mean_z(self):
        u = jax.random.uniform(jax.random.key(4), (200_000, 2))
        d, pdf = sampling.uniform_hemisphere(u)
        np.testing.assert_allclose(float(jnp.mean(d[:, 2])), 0.5, atol=5e-3)
        np.testing.assert_allclose(float(pdf[0, 0]), 1 / (2 * np.pi), rtol=1e-6)

    def test_draws_order_invariant(self):
        key = jax.random.key(7)
        ids = jnp.arange(100, dtype=jnp.int32)
        a = sampling.draws(key, ids, 5, 2)
        perm = jnp.flip(ids)
        b = sampling.draws(key, perm, 5, 2)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b)[::-1])


class TestCamera:
    def test_center_ray_points_at_target(self):
        cam = Camera.look_at(eye=(0, 1, 3), target=(0, 1, 0), hfov=40, aspect=1.0)
        xy = jnp.array([[0.5, 0.5]], jnp.float32)
        ro, rd = generate_rays(cam, xy)
        np.testing.assert_allclose(np.asarray(ro)[0], [0, 1, 3], atol=1e-6)
        np.testing.assert_allclose(np.asarray(rd)[0], [0, 0, -1], atol=1e-6)

    def test_corner_ray_fov(self):
        cam = Camera.look_at(eye=(0, 0, 0), target=(0, 0, -1), hfov=90, aspect=1.0)
        xy = jnp.array([[1.0, 0.5]], jnp.float32)  # right edge
        _, rd = generate_rays(cam, xy)
        d = np.asarray(rd)[0]
        # 90° hfov → right edge at 45°: |dx| == |dz|
        np.testing.assert_allclose(abs(d[0]), abs(d[2]), rtol=1e-5)
        assert d[2] < 0 and d[0] > 0

    def test_pixel_xy_bounds(self):
        ids = jnp.arange(16, dtype=jnp.int32)
        jitter = jnp.full((16, 2), 0.5, jnp.float32)
        xy = pixel_xy(4, 4, ids, jitter)
        assert float(jnp.min(xy)) > 0.0 and float(jnp.max(xy)) < 1.0
        np.testing.assert_allclose(np.asarray(xy)[0], [0.125, 0.125], atol=1e-6)
