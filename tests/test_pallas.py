"""Pallas intersection kernel vs the brute oracle (interpret mode on CPU;
compiled Mosaic on TPU).  BASELINE.json subsystem: "Pallas intersection
kernel"."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pt.kernels.intersect import PallasScene, intersect, occluded
from tpu_pt.render import brute
from tpu_pt.scene import cornell


@pytest.fixture(scope="module")
def setup():
    scene = cornell.cornell("spheres")
    return scene, PallasScene(scene)


def _rays(n, seed):
    k1, k2 = jax.random.split(jax.random.key(seed))
    ro = jax.random.uniform(k1, (n, 3), minval=-3, maxval=3).astype(jnp.float32)
    rd = jax.random.normal(k2, (n, 3))
    return ro, (rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)).astype(jnp.float32)


def test_intersect_matches_brute(setup):
    scene, ps = setup
    ro, rd = _rays(300, 3)  # non-multiple of RBLK: padding path exercised
    tmin = jnp.zeros((300, 1))
    tmax = jnp.full((300, 1), 1e30)
    h_ref = brute.intersect(scene, ro, rd, tmin, tmax)
    h_pl = intersect(ps, scene, ro, rd, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(h_ref.hit), np.asarray(h_pl.hit))
    m = np.asarray(h_ref.hit)[:, 0]
    np.testing.assert_allclose(
        np.asarray(h_ref.t)[m], np.asarray(h_pl.t)[m], rtol=1e-5, atol=1e-6
    )
    assert (np.asarray(h_ref.prim) == np.asarray(h_pl.prim))[m].mean() > 0.99


def test_occluded_matches_brute(setup):
    scene, ps = setup
    ro, rd = _rays(300, 4)
    tmax = jnp.full((300, 1), 2.0)
    o_ref = brute.occluded(scene, ro, rd, tmax)
    o_pl = occluded(ps, scene, ro, rd, tmax)
    np.testing.assert_array_equal(np.asarray(o_ref), np.asarray(o_pl))


def test_render_pallas_matches_oracle(setup):
    from tpu_pt.config import RenderConfig
    from tpu_pt.render.driver import render

    scene, ps = setup
    cam = cornell.camera(16, 16)
    cfg = RenderConfig(width=16, height=16, spp=2, max_depth=2)
    key = jax.random.key(5)
    ref = render(scene, cam, cfg, key, backend="brute")
    img = render(scene, cam, cfg, key, backend="pallas", bvh=ps)
    np.testing.assert_allclose(img, ref, rtol=1e-3, atol=1e-3)
