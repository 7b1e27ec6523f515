"""Progressive/checkpointed rendering: chunked == one-shot; resume works.
SURVEY.md §5 'Checkpoint / resume'."""

import os

import jax
import numpy as np
import pytest

from tpu_pt.bvh.native import build_packed_any
from tpu_pt.config import RenderConfig
from tpu_pt.render.progressive import render_progressive
from tpu_pt.render.wavefront import render_wavefront
from tpu_pt.scene import cornell


@pytest.fixture(scope="module")
def setup():
    scene = cornell.cornell("spheres")
    return scene, build_packed_any(scene)


def test_chunked_equals_oneshot(setup):
    scene, packed = setup
    cfg = RenderConfig(width=12, height=12, spp=6, max_depth=2)
    cam = cornell.camera(12, 12)
    key = jax.random.key(0)
    oneshot = np.asarray(render_wavefront(scene, cam, cfg, key, packed,
                                          queue=256, backend="packed"))
    chunked = render_progressive(scene, cam, cfg, key, packed,
                                 chunk_spp=2, queue=256, backend="packed")
    np.testing.assert_allclose(chunked, oneshot, rtol=1e-5, atol=1e-7)


def test_resume_from_checkpoint(setup, tmp_path):
    scene, packed = setup
    cfg = RenderConfig(width=10, height=10, spp=4, max_depth=1)
    cam = cornell.camera(10, 10)
    key = jax.random.key(1)
    ckpt = str(tmp_path / "render.npz")

    # Render only half by interrupting via on_chunk exception.
    class Stop(Exception):
        pass

    def stop_after_half(spp_done, img):
        if spp_done >= 2:
            raise Stop()

    with pytest.raises(Stop):
        render_progressive(scene, cam, cfg, key, packed, checkpoint=ckpt,
                           chunk_spp=2, queue=256, on_chunk=stop_after_half)
    assert os.path.exists(ckpt)
    data = np.load(ckpt)
    assert int(data["spp_done"]) == 2

    # Resume completes and matches the uninterrupted render.
    resumed = render_progressive(scene, cam, cfg, key, packed,
                                 checkpoint=ckpt, chunk_spp=2, queue=256)
    full = render_progressive(scene, cam, cfg, key, packed,
                              chunk_spp=2, queue=256)
    np.testing.assert_allclose(resumed, full, rtol=1e-6, atol=1e-8)


def test_checkpoint_invalidated_by_config_change(setup, tmp_path):
    scene, packed = setup
    cam = cornell.camera(10, 10)
    key = jax.random.key(2)
    ckpt = str(tmp_path / "render.npz")
    cfg1 = RenderConfig(width=10, height=10, spp=2, max_depth=1)
    render_progressive(scene, cam, cfg1, key, packed, checkpoint=ckpt,
                       chunk_spp=2, queue=256)
    # Different config: stale checkpoint must be ignored, not resumed.
    cfg2 = RenderConfig(width=10, height=10, spp=2, max_depth=2)
    img2 = render_progressive(scene, cam, cfg2, key, packed, checkpoint=ckpt,
                              chunk_spp=2, queue=256)
    ref2 = render_progressive(scene, cam, cfg2, key, packed,
                              chunk_spp=2, queue=256)
    np.testing.assert_allclose(img2, ref2, rtol=1e-6, atol=1e-8)
