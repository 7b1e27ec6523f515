"""Light sampling unit tests (SURVEY.md §2 row 7: area / point / spot /
directional / hemisphere / environment)."""

import jax.numpy as jnp
import numpy as np

from tpu_pt.render.lights import sample_light
from tpu_pt.scene.types import (
    LIGHT_DIRECTIONAL, LIGHT_POINT, LIGHT_SPOT, make_lights,
)


def test_point_light_inverse_square():
    lights = make_lights([dict(kind=LIGHT_POINT, position=(0, 2, 0),
                               radiance=(8, 8, 8))])
    p = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    ls = sample_light(lights, 0, p, jnp.full((2, 2), 0.5))
    np.testing.assert_allclose(np.asarray(ls.radiance)[0], 8 / 4.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ls.radiance)[1], 8 / 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ls.wi)[0], [0, 1, 0], atol=1e-6)
    assert bool(np.asarray(ls.delta).all())


def test_spot_light_hard_cone():
    # Spot at y=2 shining straight down, 45-degree half-angle.
    lights = make_lights([dict(
        kind=LIGHT_SPOT, position=(0, 2, 0), normal=(0, -1, 0),
        edge_x=(np.cos(np.deg2rad(45.0)), 0, 0), radiance=(4, 4, 4))])
    p = jnp.asarray([
        [0.0, 0.0, 0.0],    # directly below: inside cone
        [0.5, 1.5, 0.0],    # 45 deg exactly: inside (>=)
        [3.0, 1.9, 0.0],    # nearly horizontal: outside
    ])
    ls = sample_light(lights, 0, p, jnp.full((3, 2), 0.5))
    r = np.asarray(ls.radiance)
    assert r[0, 0] > 0 and r[1, 0] > 0
    np.testing.assert_allclose(r[2], 0.0)
    np.testing.assert_allclose(r[0], 4 / 4.0, rtol=1e-6)  # inverse-square
    assert bool(np.asarray(ls.delta).all())


def test_directional_light_constant():
    lights = make_lights([dict(kind=LIGHT_DIRECTIONAL, normal=(0, -1, 0),
                               radiance=(2, 2, 2))])
    p = jnp.asarray([[0.0, 0.0, 0.0], [5.0, -3.0, 1.0]])
    ls = sample_light(lights, 0, p, jnp.full((2, 2), 0.5))
    np.testing.assert_allclose(np.asarray(ls.radiance), 2.0)
    np.testing.assert_allclose(np.asarray(ls.wi), [[0, 1, 0]] * 2, atol=1e-6)
    assert float(np.asarray(ls.dist).min()) > 1e29


def test_spot_light_falloff_exponent():
    """COLLADA <falloff_exponent>: inside the cone, radiance scales by
    cos(axis angle)^exponent (edge_x[1]); exponent 0 keeps the hard cone."""
    e = 3.0
    mk = lambda expo: make_lights([dict(
        kind=LIGHT_SPOT, position=(0, 2, 0), normal=(0, -1, 0),
        edge_x=(np.cos(np.deg2rad(45.0)), expo, 0), radiance=(4, 4, 4))])
    p = jnp.asarray([
        [0.0, 0.0, 0.0],    # on axis: cos=1, falloff 1 regardless of e
        [0.4, 1.0, 0.0],    # off-axis inside the cone
        [3.0, 1.9, 0.0],    # outside: still 0
    ])
    u = jnp.full((3, 2), 0.5)
    r0 = np.asarray(sample_light(mk(0.0), 0, p, u).radiance)
    re = np.asarray(sample_light(mk(e), 0, p, u).radiance)
    np.testing.assert_allclose(re[0], r0[0], rtol=1e-6)     # on-axis equal
    cos_axis = 1.0 / np.sqrt(1 + 0.4**2)
    np.testing.assert_allclose(re[1], r0[1] * cos_axis**e, rtol=1e-5)
    np.testing.assert_allclose(re[2], 0.0)
