"""EXR scanline I/O (tpu_pt/scene/exr.py): round-trips, PFM consistency,
and rejection of out-of-subset files.  SURVEY.md §2 rows 7/19 — the
reference shipped .exr environment maps; these tests prove real ones load.
"""

import numpy as np
import pytest

from tpu_pt.render.envmap import load_envmap, write_pfm
from tpu_pt.scene.exr import read_exr, write_exr


def _hdr(h=24, w=36, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.rand(h, w, 3).astype(np.float32) * 10.0
    img[min(3, h - 1), min(5, w - 1)] = 800.0  # HDR highlight (sun texel)
    return img


class TestRoundTrip:
    @pytest.mark.parametrize("compress", [False, True])
    def test_float_exact(self, tmp_path, compress):
        img = _hdr()
        p = str(tmp_path / "m.exr")
        write_exr(p, img, half=False, compress=compress)
        np.testing.assert_array_equal(read_exr(p), img)

    @pytest.mark.parametrize("compress", [False, True])
    def test_half(self, tmp_path, compress):
        img = _hdr(seed=1)
        p = str(tmp_path / "m.exr")
        write_exr(p, img, half=True, compress=compress)
        back = read_exr(p)
        np.testing.assert_allclose(back, img, rtol=1e-3)  # f16 mantissa

    def test_zip_multichunk(self, tmp_path):
        """ZIP chunks cover 16 scanlines; H=40 exercises 2 full + 1 partial
        chunk."""
        img = _hdr(h=40, w=20, seed=2)
        p = str(tmp_path / "m.exr")
        write_exr(p, img)
        np.testing.assert_array_equal(read_exr(p), img)

    def test_incompressible_chunk_stored_raw(self, tmp_path):
        """Chunks that zlib cannot shrink are stored raw (size == raw size);
        the reader must take the uncompressed branch."""
        rng = np.random.RandomState(3)
        img = rng.rand(4, 8, 3).astype(np.float32)  # random f32 ~incompressible
        p = str(tmp_path / "m.exr")
        write_exr(p, img, compress=True)
        np.testing.assert_array_equal(read_exr(p), img)


class TestEnvmapDispatch:
    def test_pfm_exr_consistency(self, tmp_path):
        img = _hdr(seed=4)
        pe = str(tmp_path / "m.exr")
        pp = str(tmp_path / "m.pfm")
        write_exr(pe, img)
        write_pfm(pp, img)
        np.testing.assert_array_equal(load_envmap(pe), load_envmap(pp))

    def test_unknown_extension(self, tmp_path):
        with pytest.raises(ValueError, match="unsupported environment"):
            load_envmap(str(tmp_path / "m.hdr"))


class TestRejections:
    def test_not_exr(self, tmp_path):
        p = tmp_path / "bad.exr"
        p.write_bytes(b"PNG\x00garbage")
        with pytest.raises(ValueError, match="not an EXR"):
            read_exr(str(p))

    def test_unsupported_compression(self, tmp_path):
        img = _hdr(h=4, w=4, seed=5)
        p = str(tmp_path / "m.exr")
        write_exr(p, img, compress=False)
        raw = bytearray(open(p, "rb").read())
        # Patch the compression attribute byte to PIZ (4).
        i = raw.index(b"compression\x00compression\x00")
        off = i + len(b"compression\x00compression\x00") + 4
        raw[off] = 4
        open(p, "wb").write(bytes(raw))
        with pytest.raises(ValueError, match="PIZ"):
            read_exr(str(p))

    def test_tiled_rejected(self, tmp_path):
        img = _hdr(h=4, w=4, seed=6)
        p = str(tmp_path / "m.exr")
        write_exr(p, img, compress=False)
        raw = bytearray(open(p, "rb").read())
        raw[4:8] = (2 | 0x200).to_bytes(4, "little")  # set tile flag
        open(p, "wb").write(bytes(raw))
        with pytest.raises(ValueError, match="tiled"):
            read_exr(str(p))


class TestSceneAttach:
    def test_with_envmap_adds_light_and_tables(self):
        from tpu_pt.scene import cornell
        from tpu_pt.scene.types import LIGHT_ENV, with_envmap

        scene = cornell.cornell("empty")
        env = _hdr(h=8, w=16, seed=7)
        s2 = with_envmap(scene, env)
        assert s2.env_map.shape == (8, 16, 3)
        assert (np.asarray(s2.lights.kind) == LIGHT_ENV).sum() == 1
        assert s2.env_marg_cdf.shape == (8,)
        assert s2.env_cond_cdf.shape == (8, 16)
        # Idempotent: attaching again must not duplicate the light row.
        s3 = with_envmap(s2, env)
        assert (np.asarray(s3.lights.kind) == LIGHT_ENV).sum() == 1

    def test_render_with_exr_env(self, tmp_path):
        """End-to-end: EXR from disk -> scene -> render shows the sky."""
        import jax

        from tpu_pt.config import RenderConfig
        from tpu_pt.core.camera import Camera
        from tpu_pt.render.driver import render
        from tpu_pt.render.envmap import gradient_sky
        from tpu_pt.scene.types import (LIGHT_ENV, MAT_DIFFUSE, make_lights,
                                        make_materials, make_scene,
                                        with_envmap)

        p = str(tmp_path / "sky.exr")
        write_exr(p, gradient_sky(h=8, w=16))
        verts = [(-1, 0, -1), (-1, 0, 1), (1, 0, 1), (1, 0, -1)]
        tris = [(0, 1, 2), (0, 2, 3)]
        scene = make_scene(
            np.asarray(verts, np.float32), np.asarray(tris, np.int32),
            np.zeros(2, np.int32),
            make_materials([dict(kind=MAT_DIFFUSE, albedo=(0.5, 0.5, 0.5))]),
            make_lights([dict(kind=LIGHT_ENV)]))
        scene = with_envmap(scene, read_exr(p))
        cam = Camera.look_at(eye=(0, 0.5, 4), target=(0, 2.5, 0), hfov=60,
                             aspect=1.0)
        cfg = RenderConfig(width=8, height=8, spp=2, direct_only=True)
        img = render(scene, cam, cfg, jax.random.key(0), backend="brute")
        assert img.mean() > 0.05
