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


def test_checked_pair_kernel_passes_and_catches_poison():
    """Sanitizer coverage for the Pallas pair kernel (SURVEY.md §5,
    VERDICT r3 task 6): the output-contract checks pass on a healthy
    cluster BVH and FIRE on a NaN-poisoned tile tensor."""
    from jax.experimental import checkify

    from tpu_pt.bvh import cluster as C
    from tpu_pt.kernels.cluster_isect import B, pair_tile_isect_checked

    scene = cornell.cornell("spheres")
    cb = C.build_cluster_bvh(scene)  # tile=128 (kernel layout)
    P = 2 * B
    k1, k2 = jax.random.split(jax.random.key(5))
    ro = jax.random.uniform(k1, (P, 3), minval=-3, maxval=3)
    rd = jax.random.normal(k2, (P, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    rays = jnp.zeros((P, 16), jnp.float32)
    rays = rays.at[:, 0:3].set(ro).at[:, 3:6].set(rd)
    rays = rays.at[:, 7].set(1e30).at[:, 8].set(1.0)
    cid = jnp.zeros((P,), jnp.int32)

    err, out = checkify.checkify(
        pair_tile_isect_checked, errors=checkify.user_checks)(
        jnp.asarray(cb.tiles), cid, rays)
    err.throw()  # healthy: no error
    assert out.shape == (P, 8)

    poisoned = jnp.asarray(cb.tiles).at[0, 0:9, :].set(jnp.nan)
    err, _ = checkify.checkify(
        pair_tile_isect_checked, errors=checkify.user_checks)(
        poisoned, cid, rays)
    with pytest.raises(checkify.JaxRuntimeError):
        err.throw()


def test_render_wavefront_checked_passes_and_catches_poison():
    """debug_checks render: clean scene passes every invariant; a
    NaN-poisoned vertex trips the checkify error."""
    from jax.experimental import checkify

    from tpu_pt.bvh.native import build_packed_any
    from tpu_pt.config import RenderConfig
    from tpu_pt.render.wavefront import (render_wavefront,
                                         render_wavefront_checked)

    scene = cornell.cornell("spheres")
    pk = build_packed_any(scene)
    cfg = RenderConfig(width=16, height=16, spp=2, max_depth=2)
    cam = cornell.camera(16, 16)
    key = jax.random.key(0)
    img = render_wavefront_checked(scene, cam, cfg, key, pk, queue=256,
                                   backend="packed")
    ref = render_wavefront(scene, cam, cfg, key, pk, queue=256,
                           backend="packed", fast=False)
    np.testing.assert_array_equal(np.asarray(img), np.asarray(ref))

    bad = scene._replace(
        vertices=jnp.asarray(scene.vertices).at[0].set(jnp.nan))
    with pytest.raises(checkify.JaxRuntimeError):
        render_wavefront_checked(bad, cam, cfg, key, pk, queue=256,
                                 backend="packed")
