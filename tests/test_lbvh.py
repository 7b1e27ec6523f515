"""Device LBVH builder tests (BASELINE.json config 3): Morton codes, Karras
radix tree invariants, traversal equivalence vs the oracle (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pt.bvh import packed as pk
from tpu_pt.bvh.lbvh import build_lbvh, morton_codes
from tpu_pt.render import brute
from tpu_pt.scene import cornell, meshes
from tpu_pt.scene.types import make_lights, make_materials, make_scene


def test_morton_monotone_along_axis():
    """Morton codes increase along each axis when others fixed (SURVEY.md §4:
    'Morton codes monotone along Z-curve')."""
    n = 64
    for axis in range(3):
        pts = np.full((n, 3), 0.3, np.float32)
        pts[:, axis] = np.linspace(0.01, 0.99, n)
        codes = np.asarray(
            morton_codes(jnp.asarray(pts), jnp.zeros(3), jnp.ones(3))
        ).astype(np.uint64)
        assert (np.diff(codes.astype(np.int64)) > 0).all()


def test_morton_interleave_bits():
    # point with x=1 (high bit of x only): code bit pattern x gets bit 2.
    c = np.asarray(morton_codes(
        jnp.asarray([[1.0 - 1e-6, 0.0, 0.0]]), jnp.zeros(3), jnp.ones(3)
    ))[0]
    # all x bits set → 0b100100...100 repeated; check top bit position 29.
    assert (int(c) >> 29) & 1 == 1


@pytest.fixture(scope="module")
def scenes():
    v, f = meshes.icosphere(subdiv=2)
    mesh_scene = make_scene(v, f, np.zeros(len(f), np.int32),
                            make_materials([dict(albedo=(0.5, 0.5, 0.5))]),
                            make_lights([]))
    return {"cornell": cornell.cornell("spheres"), "mesh": mesh_scene}


@pytest.mark.parametrize("name", ["cornell", "mesh"])
def test_structure_invariants(scenes, name):
    scene = scenes[name]
    lb = build_lbvh(scene)
    p = scene.n_prims
    assert lb.n_nodes == 2 * p - 1
    nodes = lb.node_rows()[0]  # single table (N, 8)
    meta = nodes[:, 7].view(np.int32)
    skip = nodes[:, 6].view(np.int32)
    leaf = meta >= 0
    assert leaf.sum() == p
    # every sorted slot appears exactly once among leaves
    starts = meta[leaf] & ((1 << 26) - 1)
    assert sorted(starts.tolist()) == list(range(p))
    # prim_gid is a permutation
    assert sorted(np.asarray(lb.prim_gid).tolist()) == list(range(p))
    # skip pointers all in (i, N]
    ids = np.arange(2 * p - 1)
    assert (skip > ids).all() and (skip <= 2 * p - 1).all()
    # root box contains everything
    assert (nodes[0, 0:3] <= nodes[:, 0:3] + 1e-5).all()
    assert (nodes[0, 3:6] >= nodes[:, 3:6] - 1e-5).all()


@pytest.mark.parametrize("name", ["cornell", "mesh"])
def test_traversal_matches_brute(scenes, name):
    scene = scenes[name]
    lb = build_lbvh(scene)
    R = 1024
    k1, k2 = jax.random.split(jax.random.key(5))
    ro = jax.random.uniform(k1, (R, 3), minval=-3, maxval=3).astype(jnp.float32)
    rd = jax.random.normal(k2, (R, 3))
    rd = (rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)).astype(jnp.float32)
    tmin = jnp.zeros((R, 1))
    tmax = jnp.full((R, 1), 1e30)
    h_ref = brute.intersect(scene, ro, rd, tmin, tmax)
    h_lb = pk.intersect(lb, scene, ro, rd, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(h_ref.hit), np.asarray(h_lb.hit))
    m = np.asarray(h_ref.hit)[:, 0]
    np.testing.assert_allclose(
        np.asarray(h_ref.t)[m], np.asarray(h_lb.t)[m], rtol=1e-5, atol=1e-6
    )
    o_ref = brute.occluded(scene, ro, rd, jnp.full((R, 1), 2.0))
    o_lb = pk.occluded(lb, scene, ro, rd, jnp.full((R, 1), 2.0))
    np.testing.assert_array_equal(np.asarray(o_ref), np.asarray(o_lb))


def test_render_lbvh_matches_oracle(scenes):
    from tpu_pt.config import RenderConfig
    from tpu_pt.render.driver import render

    scene = scenes["cornell"]
    lb = build_lbvh(scene)
    cam = cornell.camera(16, 16)
    cfg = RenderConfig(width=16, height=16, spp=2, max_depth=2)
    key = jax.random.key(6)
    ref = render(scene, cam, cfg, key, backend="brute")
    img = render(scene, cam, cfg, key, backend="packed", bvh=lb)
    np.testing.assert_allclose(img, ref, rtol=1e-3, atol=1e-3)
