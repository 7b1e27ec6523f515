"""Distribution tests on the 8-virtual-device CPU mesh (SURVEY.md §4 item 5):
the identical shard_map tile-sharded renderer must match the single-device
image, and psum'd grads must equal the unsharded grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pt.bvh.packed import pack_bvh
from tpu_pt.bvh.sah import build_bvh
from tpu_pt.config import RenderConfig
from tpu_pt.diff.params import split
from tpu_pt.dist.sharding import loss_and_grad_sharded, make_mesh, render_sharded
from tpu_pt.render.wavefront import render_wavefront
from tpu_pt.scene import cornell


@pytest.fixture(scope="module")
def setup():
    scene = cornell.cornell("spheres")
    packed = pack_bvh(build_bvh(scene), scene)
    return scene, packed


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_render_matches_single(setup):
    scene, packed = setup
    cfg = RenderConfig(width=16, height=16, spp=4, max_depth=2)
    cam = cornell.camera(16, 16)
    key = jax.random.key(0)
    mesh = make_mesh()
    img_1 = np.asarray(render_wavefront(scene, cam, cfg, key, packed,
                                        queue=512, backend="packed"))
    img_n = np.asarray(render_sharded(scene, cam, cfg, key, packed, mesh,
                                      queue=512, backend="packed"))
    np.testing.assert_allclose(img_n, img_1, rtol=1e-4, atol=1e-6)


def test_sharded_render_nondivisible_pixels(setup):
    scene, packed = setup
    # 18*18 = 324 pixels, not divisible by 8 shards → padded tail.
    cfg = RenderConfig(width=18, height=18, spp=2, max_depth=1)
    cam = cornell.camera(18, 18)
    key = jax.random.key(1)
    mesh = make_mesh()
    img_1 = np.asarray(render_wavefront(scene, cam, cfg, key, packed,
                                        queue=512, backend="packed"))
    img_n = np.asarray(render_sharded(scene, cam, cfg, key, packed, mesh,
                                      queue=512, backend="packed"))
    np.testing.assert_allclose(img_n, img_1, rtol=1e-4, atol=1e-6)


def test_interleaved_shards_bit_identical_with_stats(setup):
    """Round-robin pixel interleaving (the static mitigation for SURVEY.md
    §2 r15's dynamic tile assignment) must produce the bit-exact
    single-device image — counter-based RNG makes ANY pixel partition
    exact — including with a padded (non-divisible) pixel count, and the
    per-shard load counters must account for every traced segment."""
    scene, packed = setup
    cfg = RenderConfig(width=18, height=18, spp=2, max_depth=2)
    cam = cornell.camera(18, 18)
    key = jax.random.key(3)
    mesh = make_mesh()
    img_1 = np.asarray(render_wavefront(scene, cam, cfg, key, packed,
                                        queue=512, backend="packed"))
    img_i, stats = render_sharded(scene, cam, cfg, key, packed, mesh,
                                  queue=512, backend="packed",
                                  interleave=True, with_stats=True)
    img_c = np.asarray(render_sharded(scene, cam, cfg, key, packed, mesh,
                                      queue=512, backend="packed",
                                      interleave=False))
    np.testing.assert_array_equal(np.asarray(img_i), img_c)
    np.testing.assert_allclose(np.asarray(img_i), img_1, rtol=1e-4,
                               atol=1e-6)
    assert stats["steps_run"].shape == (8,)
    assert (stats["steps_run"] > 0).all()
    assert stats["n_closest"].sum() > 0
    assert stats["n_overflow"].sum() == 0  # packed backend is exact


def test_sharded_grads_match_unsharded(setup):
    scene, packed = setup
    cfg = RenderConfig(width=8, height=8, spp=2, max_depth=1)
    cam = cornell.camera(8, 8)
    key = jax.random.key(2)
    mesh = make_mesh()
    params, _ = split(scene)

    # Unsharded reference: grad of summed-MSE via the wavefront renderer.
    from tpu_pt.diff.params import merge

    target = np.asarray(
        render_wavefront(scene, cam, cfg, key, packed, queue=256,
                         backend="packed")
    ).reshape(-1, 3) * 0.5

    def ref_loss(p):
        img = render_wavefront(merge(p, scene), cam, cfg, key, packed,
                               queue=256, backend="packed",
                               fast=False).reshape(-1, 3)
        return jnp.sum((img - target) ** 2) / (cfg.n_pixels * 3)

    loss_ref, grads_ref = jax.value_and_grad(ref_loss)(params)

    loss_sh, grads_sh = loss_and_grad_sharded(
        params, scene, cam, cfg, key, jnp.asarray(target), packed, mesh,
        queue=256, backend="packed",
    )
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    for k in grads_ref:
        np.testing.assert_allclose(
            np.asarray(grads_sh[k]), np.asarray(grads_ref[k]),
            rtol=1e-4, atol=1e-6, err_msg=k,
        )


def test_grad_psums_are_per_chunk(setup):
    """Structural proof of the overlapped allreduce (BASELINE config 5):
    the compiled training step must contain one all-reduce PER remat chunk
    (issued inside the backward sweep), not a single tail psum."""
    import functools

    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    from tpu_pt.diff.params import merge
    from tpu_pt.render.wavefront import n_steps, wavefront_accum

    scene, packed = setup
    packed = jax.tree.map(jnp.asarray, packed)  # closed over → device arrays
    # Sizes chosen so the shard step count exceeds the remat threshold and
    # yields several chunks.
    cfg = RenderConfig(width=16, height=16, spp=4, max_depth=2)
    cam = cornell.camera(16, 16)
    key = jax.random.key(3)
    mesh = make_mesh()
    params, _ = split(scene)
    n = mesh.devices.size
    block = cfg.n_pixels // n
    queue = 32
    steps = n_steps(cfg, queue, block, cfg.spp)
    inner = max(1, int(round(steps ** 0.5)))
    outer = -(-steps // inner)
    assert outer >= 3  # several chunks, else the test is vacuous

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(), params), P("tile")),
        out_specs=jax.tree.map(lambda _: P(), params),
        check_vma=False,
    )
    def grad_step(params_r, shard_ids):
        pix_lo = shard_ids[0] * block

        def local_loss(p):
            sc = merge(p, scene)
            accum = wavefront_accum(sc, cam, cfg, key, packed, queue,
                                    "packed", pix_lo, block,
                                    psum_axis="tile")
            return jnp.sum((accum / cfg.spp) ** 2)

        return jax.grad(local_loss)(params_r)

    shard_ids = jnp.arange(n, dtype=jnp.int32)
    hlo = jax.jit(grad_step).lower(params, shard_ids).compile().as_text()
    # The psum must execute INSIDE the backward scan's while-loop body —
    # once per chunk, interleaved with the adjoint compute — not as a tail
    # reduction after the sweep.  XLA's op metadata records exactly that:
    # the all-reduce is tagged transpose(jvp())/while/body/.../psum.
    ar_lines = [l for l in hlo.splitlines() if "all-reduce" in l
                and "op_name=" in l and "psum" in l]
    assert ar_lines, "no psum all-reduce found in compiled HLO"
    assert any("transpose" in l and "while/body" in l for l in ar_lines), \
        ar_lines[:3]


def test_sharded_render_cluster_backend_matches_single(setup):
    """The production (cluster) intersector under shard_map: bit-identical
    to its own single-device render of the same program family (the scan
    path sharding uses).  The fast path compiles its first steps as an
    unrolled wide-budget prefix (r5), and XLA's FMA scheduling of the
    unrolled instances differs from the loop body by ~1 ULP on a few
    pixels — same VALUES semantics, different compilation — so fast-vs-
    scan is compared at ULP tolerance instead."""
    from tpu_pt.bvh.cluster import build_cluster_bvh

    scene, _ = setup
    cb = build_cluster_bvh(scene)
    cfg = RenderConfig(width=16, height=16, spp=2, max_depth=2)
    cam = cornell.camera(16, 16)
    key = jax.random.key(2)
    mesh = make_mesh()
    img_sh = np.asarray(render_sharded(scene, cam, cfg, key, cb, mesh,
                                       queue=256, backend="cluster"))
    img_1 = np.asarray(render_wavefront(scene, cam, cfg, key, cb,
                                        queue=256, backend="cluster",
                                        fast=False))
    np.testing.assert_array_equal(img_sh, img_1)
    img_fast = np.asarray(render_wavefront(scene, cam, cfg, key, cb,
                                           queue=256, backend="cluster"))
    np.testing.assert_allclose(img_sh, img_fast, rtol=3e-6, atol=1e-8)
