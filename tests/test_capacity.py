"""Capacity-contract assertions on the ACTUAL bench scene + camera
(VERDICT r1 weak #7: the contract must be enforced in CI, not audited
out-of-band).

The pair-major traversal keeps live (ray, node) pairs in static budgets
(ClusterBVH.pair_mults × Q).  Dropped pairs = silently wrong images, so the
shipped defaults must show dropped == 0 for the bench workload: camera rays
through the 1.3M-triangle scene plus incoherent bounce-like rays.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pt.bvh import cluster as C
from tpu_pt.core.camera import generate_rays, pixel_xy
from tpu_pt.scene import meshes


@pytest.fixture(scope="module")
def bench_scene():
    scene = meshes.big_scene(subdiv=8)  # the 1.3M-tri bench mesh
    cb = jax.tree.map(jnp.asarray, C.build_cluster_bvh(scene))
    return scene, cb


def _rays(cam, Q, mixed=False, block=None):
    """block=<pixel>: Q CONTIGUOUS pixels from there — the actual wavefront
    respawn population (coherent batches share clusters and carry ~1.4x the
    random-pixel candidate load, so they are the binding capacity case)."""
    k1, k2, k3 = jax.random.split(jax.random.key(11), 3)
    if block is not None:
        pix = block + jnp.arange(Q, dtype=jnp.int32)
    else:
        pix = jax.random.randint(k1, (Q,), 0, 1024 * 1024)
    xy = pixel_xy(1024, 1024, pix, jnp.full((Q, 2), 0.5))
    ro, rd = generate_rays(cam, xy)
    if mixed:
        h = Q // 2
        ro_r = jax.random.uniform(k2, (h, 3), minval=-2, maxval=2)
        rd_r = jax.random.normal(k3, (h, 3))
        rd_r = rd_r / jnp.linalg.norm(rd_r, axis=-1, keepdims=True)
        ro = jnp.concatenate([ro[:h], ro_r])
        rd = jnp.concatenate([rd[:h], rd_r])
    return jnp.asarray(ro, jnp.float32), jnp.asarray(rd, jnp.float32)


@pytest.mark.parametrize("mixed", [False, True])
def test_no_pair_drops_on_bench_scene(bench_scene, mixed):
    scene, cb = bench_scene
    Q = 4096
    cam = meshes.big_camera(1024, 1024)
    ro, rd = _rays(cam, Q, mixed=mixed)
    t_min = jnp.zeros((Q, 1), jnp.float32)
    t_max = jnp.full((Q, 1), 1e30, jnp.float32)
    n_live, dropped = C.pairs_stats(cb, ro, rd, t_min, t_max)
    assert int(dropped) == 0, (int(n_live), int(dropped))
    assert int(n_live) > 0


@pytest.mark.parametrize("mixed", [False, True])
def test_no_truncation_compact_on_bench_scene(bench_scene, mixed):
    """r2 production (compact) path: zero candidates truncated anywhere —
    descent frontier caps, leaf lane cap, or flat pair budget — for the
    bench camera + incoherent-ray population."""
    scene, cb = bench_scene
    Q = 4096
    cam = meshes.big_camera(1024, 1024)
    ro, rd = _rays(cam, Q, mixed=mixed)
    t_min = jnp.zeros((Q, 1), jnp.float32)
    t_max = jnp.full((Q, 1), 1e30, jnp.float32)
    n_live, overflow = C.compact_stats(cb, ro, rd, t_min, t_max)
    assert int(overflow) == 0, (int(n_live), int(overflow))
    assert int(n_live) > 0


@pytest.mark.parametrize("block", [0, 512 * 1024 + 512, 128 * 4096])
def test_no_truncation_compact_on_coherent_blocks(bench_scene, block):
    """Regression for the r2 coherent-batch overflow: the wavefront
    respawns rays in PIXEL ORDER, and a contiguous center block carries
    ~1.4x the random-pixel candidate load (shared clusters).  The shipped
    leaf pair mult (6) must cover the worst measured block (23,312
    candidates at Q=4096) — random-pixel sampling alone missed this."""
    scene, cb = bench_scene
    Q = 4096
    cam = meshes.big_camera(1024, 1024)
    ro, rd = _rays(cam, Q, block=block)
    t_min = jnp.zeros((Q, 1), jnp.float32)
    t_max = jnp.full((Q, 1), 1e30, jnp.float32)
    n_live, overflow = C.compact_stats(cb, ro, rd, t_min, t_max)
    assert int(overflow) == 0, (int(n_live), int(overflow))


def test_no_truncation_compact_on_atrium():
    """Same contract on the architectural interior scene (high depth
    complexity: colonnades + coffered ceiling), camera down the nave.

    The atrium's depth complexity exceeds the grid-heuristic default caps
    (by design — that is what makes it Sponza-class), so this exercises the
    production recipe for a NEW scene: autotune_for_render probes the REAL
    warmed wavefront population and sizes the frontier caps + flat pair
    budget from its measured maxima, and the contract must then hold on a
    fresh ray population (different resolution/queue than the probe)."""
    from tpu_pt.config import RenderConfig

    scene = meshes.atrium_scene()
    Q = 4096
    cam = meshes.atrium_camera(1024, 1024)
    cfg = RenderConfig(width=256, height=256, spp=1, max_depth=4,
                       rr_start=2, rr_prob=0.7)
    cam_probe = meshes.atrium_camera(256, 256)
    cb = jax.tree.map(jnp.asarray, C.autotune_for_render(
        scene, cam_probe, cfg, queue=2048, segments=4,
        exact_fallback=False))
    # Fresh rays (different key/block) — caps must generalize, not memorize:
    # a coherent off-center block plus random interior rays.
    k2, k3 = jax.random.split(jax.random.key(23), 2)
    pix = 300 * 1024 + 200 + jnp.arange(Q, dtype=jnp.int32)
    xy = pixel_xy(1024, 1024, pix, jnp.full((Q, 2), 0.5))
    ro, rd = generate_rays(cam, xy)
    h = Q // 2
    ro_r = jax.random.uniform(k2, (h, 3), minval=-6, maxval=6)
    rd_r = jax.random.normal(k3, (h, 3))
    rd_r = rd_r / jnp.linalg.norm(rd_r, axis=-1, keepdims=True)
    ro = jnp.concatenate([ro[:h], ro_r]).astype(jnp.float32)
    rd = jnp.concatenate([rd[:h], rd_r]).astype(jnp.float32)
    t_min = jnp.zeros((Q, 1), jnp.float32)
    t_max = jnp.full((Q, 1), 1e30, jnp.float32)
    n_live, overflow = C.compact_stats(cb, ro, rd, t_min, t_max)
    assert int(overflow) == 0, (int(n_live), int(overflow))
    assert int(n_live) > 0


def test_full_render_no_overflow_big1m(bench_scene):
    """END-TO-END contract gate (VERDICT r3 task 1c): the proxy-population
    tests above passed in r3 while the actual 1024² render truncated 1,374
    candidates — the binding population is the REAL mixed-depth wavefront,
    which only a full `render_wavefront_counts` run produces.  Renders the
    1.3M-tri bench scene (reduced 128² so CI stays fast; the camera still
    spans the full field of view) with the default-built cluster BVH and
    asserts zero overflow anywhere."""
    from tpu_pt.config import RenderConfig
    from tpu_pt.render.wavefront import render_wavefront_counts

    scene, cb = bench_scene
    cfg = RenderConfig(width=128, height=128, spp=1, max_depth=4,
                       rr_start=2, rr_prob=0.7)
    cam = meshes.big_camera(128, 128)
    img, nc, ns, novf, ni = render_wavefront_counts(
        scene, cam, cfg, jax.random.key(0), cb, queue=4096,
        backend="cluster")
    assert int(novf) == 0, int(novf)
    assert float(nc) > 0 and float(np.asarray(img).mean()) > 0.0


def test_exact_fallback_repairs_overflow(bench_scene, monkeypatch):
    """Capacity overflow must degrade to SLOWER, never to WRONG (VERDICT r3
    task 1d): with deliberately starved caps (guaranteed overflow), every
    suspect ray's result must equal the exact packed walk bit-for-bit, and
    non-suspect rays must be untouched."""
    del bench_scene  # independent small scene; fixture only orders tests
    # The suspect set below is PREDICTED from a full-batch descend +
    # flat-pairs; pin the traversal unsplit so production truncation uses
    # the same budget slicing as the prediction (split-path exactness has
    # its own gate: test_cluster.test_split_traversal_bit_identical).
    from tpu_pt.bvh import cluster as _cl

    monkeypatch.setattr(_cl, "SPLIT_CLOSEST", 1)
    monkeypatch.setattr(_cl, "SPLIT_ANYHIT", 1)
    from tpu_pt.bvh import packed as P
    from tpu_pt.bvh.native import build_packed_any
    from tpu_pt.scene import cornell

    scene = cornell.cornell("mesh")
    cam = cornell.camera(64, 64)
    Q = 2048
    pix = jnp.arange(Q, dtype=jnp.int32)
    xy = pixel_xy(64, 64, pix, jnp.full((Q, 2), 0.5))
    ro, rd = generate_rays(cam, xy)
    t_min = jnp.zeros((Q, 1), jnp.float32)
    t_max = jnp.full((Q, 1), 1e30, jnp.float32)

    cb0 = C.build_cluster_bvh(scene, tile=32)
    caps = tuple(max(2, c // 8) for c in cb0.frontiers)
    starved = C.build_cluster_bvh(scene, tile=32, frontiers=caps,
                                  k_leaf=max(2, cb0.k_leaf // 8),
                                  pair_mults=(8, 8, 1))
    pk = build_packed_any(scene)
    with_fb = C.ClusterBVH(starved.levels, starved.tiles, starved.tile_gid,
                           starved.frontiers, starved.k_leaf,
                           starved.pair_budget,
                           pair_mults=starved.pair_mults,
                           levels16=starved.levels16, fallback=pk)

    cand, live, ovf = C._descend_compact(with_fb, ro, 1.0 / rd, t_min,
                                         t_max)
    _, _, _, _, _, lost = C._flat_pairs(
        cand, live, Q, with_fb.pair_mults[2] * Q)
    suspect = np.asarray((ovf > 0) | (lost > 0))
    assert suspect.sum() > 0, "test setup failed to force overflow"

    hit_fb, novf = C.intersect_counted(with_fb, scene, ro, rd, t_min, t_max)
    hit_plain, _ = C.intersect_counted(starved, scene, ro, rd, t_min, t_max)
    hit_ref = P.intersect(pk, scene, ro, rd, t_min, t_max)
    assert int(novf) > 0  # overflow still REPORTED (observability)
    s = suspect
    assert np.array_equal(np.asarray(hit_fb.hit)[s], np.asarray(hit_ref.hit)[s])
    assert np.array_equal(np.asarray(hit_fb.prim)[s], np.asarray(hit_ref.prim)[s])
    assert np.array_equal(np.asarray(hit_fb.t)[s], np.asarray(hit_ref.t)[s])
    ns_ = ~suspect
    assert np.array_equal(np.asarray(hit_fb.t)[ns_],
                          np.asarray(hit_plain.t)[ns_])

    occ_fb, _ = C.occluded_counted(with_fb, scene, ro, rd,
                                   jnp.full((Q, 1), 5.0))
    occ_ref = P.occluded(pk, scene, ro, rd, jnp.full((Q, 1), 5.0))
    assert np.array_equal(np.asarray(occ_fb)[s], np.asarray(occ_ref)[s])


def test_budgets_cover_measured_live_pairs(bench_scene):
    """The shipped multipliers must exceed the measured live-pair load with
    >=1.5x headroom at the leaf (top/mid verified by dropped==0 above)."""
    scene, cb = bench_scene
    Q = 4096
    cam = meshes.big_camera(1024, 1024)
    ro, rd = _rays(cam, Q)
    t_min = jnp.zeros((Q, 1), jnp.float32)
    t_max = jnp.full((Q, 1), 1e30, jnp.float32)
    n_live, dropped = C.pairs_stats(cb, ro, rd, t_min, t_max)
    assert int(dropped) == 0
    leaf_budget = cb.pair_mults[2] * Q
    assert leaf_budget >= 1.5 * int(n_live), (leaf_budget, int(n_live))


def test_suspect_pixel_repair(bench_scene, monkeypatch):
    """Suspect-pixel-only repair (VERDICT r5 task 6): an overflowing render
    flags exactly the pixels a fallback-attached render could change;
    repairing ONLY those pixels must reproduce the full fallback-attached
    render bit-for-bit, at cost proportional to the suspect count."""
    del bench_scene
    from tpu_pt.bvh import cluster as C
    from tpu_pt.render.wavefront import (render_wavefront,
                                         render_wavefront_suspect_counts,
                                         repair_suspect_pixels)
    from tpu_pt.config import RenderConfig
    from tpu_pt.scene import cornell

    scene = cornell.cornell("mesh")
    cam = cornell.camera(24, 24)
    cfg = RenderConfig(width=24, height=24, spp=1, max_depth=2)
    key = jax.random.key(9)

    cb0 = C.build_cluster_bvh(scene, tile=32)
    caps = tuple(max(2, c // 6) for c in cb0.frontiers)
    starved = C.build_cluster_bvh(scene, tile=32, frontiers=caps,
                                  k_leaf=max(3, cb0.k_leaf // 6),
                                  pair_mults=(8, 8, 2))

    img, _, _, novf, _, sus = render_wavefront_suspect_counts(
        scene, cam, cfg, key, starved, queue=256, backend="cluster")
    sus = np.asarray(sus)
    assert int(novf) > 0 and sus.sum() > 0, "setup failed to force overflow"
    assert sus.sum() < cfg.n_pixels, "need non-suspect pixels too"

    exact = C.attach_fallback(starved, scene)
    repaired, novf2 = repair_suspect_pixels(
        scene, cam, cfg, key, exact, np.asarray(img), sus, queue=256,
        backend="cluster")
    ref = np.asarray(render_wavefront(scene, cam, cfg, key, exact,
                                      queue=256, backend="cluster"))
    # Bit-identical on TPU (verified on-chip; the subset render replays the
    # same global RNG stream per pixel).  XLA *CPU* vectorizes the two
    # program shapes differently and drifts ~0.1% of elements by 1 ULP, so
    # the CI gate allows exactly that.
    np.testing.assert_allclose(repaired, ref, rtol=3e-7, atol=1e-9)
    mismatch = (repaired != ref).any(-1).mean()
    assert mismatch < 0.005, f"{mismatch:.4f} of pixels differ beyond ULP"
