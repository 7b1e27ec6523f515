"""BVH build invariants + traversal equivalence vs the brute-force oracle.
SURVEY.md §4 item 2: every primitive in exactly one leaf; parent AABBs
contain children; flattened traversal == reference intersections."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pt.bvh import flat
from tpu_pt.bvh.sah import build_bvh, prim_bounds
from tpu_pt.render import brute
from tpu_pt.scene import cornell, meshes
from tpu_pt.scene.types import make_lights, make_materials, make_scene


@pytest.fixture(scope="module")
def sphere_scene():
    v, f = meshes.icosphere(subdiv=2)  # 320 tris
    return make_scene(
        vertices=v, tri_idx=f, tri_mat=np.zeros(len(f), np.int32),
        materials=make_materials([dict(albedo=(0.5, 0.5, 0.5))]),
        lights=make_lights([]),
    )


@pytest.fixture(scope="module")
def cornell_scene():
    return cornell.cornell("spheres")


def _check_invariants(scene, bvh):
    lo, hi = prim_bounds(scene)
    n_nodes = bvh.n_nodes
    node_min = np.asarray(bvh.node_min)
    node_max = np.asarray(bvh.node_max)
    skip = np.asarray(bvh.skip)
    start = np.asarray(bvh.prim_start)
    count = np.asarray(bvh.prim_count)
    prim_ids = np.asarray(bvh.prim_ids)

    # Every primitive appears exactly once.
    assert sorted(prim_ids.tolist()) == list(range(scene.n_prims))
    leaf = count > 0
    covered = np.zeros(scene.n_prims, bool)
    for i in np.where(leaf)[0]:
        seg = prim_ids[start[i]:start[i] + count[i]]
        assert not covered[seg].any()
        covered[seg] = True
        # Leaf AABB contains its primitives' AABBs.
        assert np.all(node_min[i] <= lo[seg].min(axis=0) + 1e-6)
        assert np.all(node_max[i] >= hi[seg].max(axis=0) - 1e-6)
    assert covered.all()

    # Skip pointers: strictly increasing targets, all in (i, N].
    ids = np.arange(n_nodes)
    assert np.all(skip > ids)
    assert np.all(skip <= n_nodes)

    # Parent contains children: inner node i has left child i+1 and the right
    # child at skip[i+1 subtree]... walk: children of inner i are i+1 and
    # skip[i+1].
    for i in np.where(~leaf)[0]:
        left = i + 1
        right = skip[left]
        assert right < skip[i] if skip[i] < n_nodes else right <= n_nodes
        for ch in (left, right):
            assert np.all(node_min[i] <= node_min[ch] + 1e-6)
            assert np.all(node_max[i] >= node_max[ch] - 1e-6)


def test_invariants_cornell(cornell_scene):
    _check_invariants(cornell_scene, build_bvh(cornell_scene))


def test_invariants_mesh(sphere_scene):
    _check_invariants(sphere_scene, build_bvh(sphere_scene))


def _random_rays(n, key, radius=3.0):
    k1, k2 = jax.random.split(jax.random.key(key))
    ro = jax.random.uniform(k1, (n, 3), minval=-radius, maxval=radius)
    rd = jax.random.normal(k2, (n, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    return ro.astype(jnp.float32), rd.astype(jnp.float32)


@pytest.mark.parametrize("scene_name", ["cornell", "mesh"])
def test_traversal_matches_brute(scene_name, cornell_scene, sphere_scene):
    scene = cornell_scene if scene_name == "cornell" else sphere_scene
    bvh = build_bvh(scene)
    ro, rd = _random_rays(512, key=11)
    t_min = jnp.zeros((512, 1))
    t_max = jnp.full((512, 1), 1e30)
    h_ref = brute.intersect(scene, ro, rd, t_min, t_max)
    h_bvh = flat.intersect(bvh, scene, ro, rd, t_min, t_max)
    np.testing.assert_array_equal(np.asarray(h_ref.hit), np.asarray(h_bvh.hit))
    # t must match to float tolerance; prim ids can differ only for exactly
    # tied t (shared edges) — compare t instead of ids.
    np.testing.assert_allclose(
        np.asarray(h_ref.t)[np.asarray(h_ref.hit)],
        np.asarray(h_bvh.t)[np.asarray(h_ref.hit)],
        rtol=1e-5, atol=1e-6,
    )
    agree = np.asarray(h_ref.prim) == np.asarray(h_bvh.prim)
    assert agree[np.asarray(h_ref.hit)[:, 0]].mean() > 0.99


@pytest.mark.parametrize("scene_name", ["cornell", "mesh"])
def test_occlusion_matches_brute(scene_name, cornell_scene, sphere_scene):
    scene = cornell_scene if scene_name == "cornell" else sphere_scene
    bvh = build_bvh(scene)
    ro, rd = _random_rays(512, key=12)
    t_max = jnp.full((512, 1), 2.0)
    o_ref = brute.occluded(scene, ro, rd, t_max)
    o_bvh = flat.occluded(bvh, scene, ro, rd, t_max)
    np.testing.assert_array_equal(np.asarray(o_ref), np.asarray(o_bvh))


def test_render_bvh_matches_oracle(cornell_scene):
    """BASELINE.json config-1 gate (shrunk): BVH image allclose vs oracle."""
    from tpu_pt.config import RenderConfig
    from tpu_pt.render.driver import render

    cam = cornell.camera(32, 32)
    cfg = RenderConfig(width=32, height=32, spp=4, direct_only=True)
    key = jax.random.key(0)
    img_o = render(cornell_scene, cam, cfg, key, backend="brute")
    bvh = build_bvh(cornell_scene)
    img_b = render(cornell_scene, cam, cfg, key, backend="bvh", bvh=bvh)
    np.testing.assert_allclose(img_b, img_o, rtol=1e-4, atol=1e-5)


def test_render_bvh_matches_oracle_indirect(cornell_scene):
    from tpu_pt.config import RenderConfig
    from tpu_pt.render.driver import render

    cam = cornell.camera(24, 24)
    cfg = RenderConfig(width=24, height=24, spp=4, max_depth=3)
    key = jax.random.key(1)
    img_o = render(cornell_scene, cam, cfg, key, backend="brute")
    bvh = build_bvh(cornell_scene)
    img_b = render(cornell_scene, cam, cfg, key, backend="bvh", bvh=bvh)
    # Tiny numeric drift allowed (different reduction order in intersect);
    # any real traversal bug produces grossly different images.
    np.testing.assert_allclose(img_b, img_o, rtol=1e-3, atol=1e-3)
