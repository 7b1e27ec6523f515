"""Environment light tests: lat-long mapping, PFM IO, miss radiance, and
LIGHT_ENV next-event estimation (reference environment_light.*)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pt.config import RenderConfig
from tpu_pt.core.camera import Camera
from tpu_pt.render.driver import render
from tpu_pt.render.envmap import eval_env, gradient_sky, load_pfm, write_pfm
from tpu_pt.scene.types import (
    LIGHT_ENV, MAT_DIFFUSE, make_lights, make_materials, make_scene,
)


class TestEvalEnv:
    def test_direction_mapping(self):
        # 2x4 map with distinct texels; +y must land in the top row.
        env = np.arange(2 * 4 * 3, dtype=np.float32).reshape(2, 4, 3)
        up = jnp.asarray([[0.0, 1.0, 0.0]])
        down = jnp.asarray([[0.0, -1.0, 0.0]])
        v_up = np.asarray(eval_env(jnp.asarray(env), up))[0]
        v_dn = np.asarray(eval_env(jnp.asarray(env), down))[0]
        assert (v_up == env[0]).all(axis=-1).any()
        assert (v_dn == env[1]).all(axis=-1).any()

    def test_gradient_sky_shape(self):
        sky = gradient_sky(h=16, w=32, scale=2.0)
        assert sky.shape == (16, 32, 3)
        # zenith brighter blue than ground
        assert sky[0, 0, 2] > sky[-1, 0, 2]


class TestPfm:
    def test_roundtrip(self, tmp_path):
        img = np.random.RandomState(0).rand(8, 12, 3).astype(np.float32)
        p = str(tmp_path / "map.pfm")
        write_pfm(p, img)
        back = load_pfm(p)
        np.testing.assert_allclose(back, img, rtol=1e-7)


class TestEnvRender:
    def _scene(self, env):
        # Single diffuse quad floating in the environment.
        verts = [(-1, 0, -1), (-1, 0, 1), (1, 0, 1), (1, 0, -1)]
        tris = [(0, 1, 2), (0, 2, 3)]
        return make_scene(
            np.asarray(verts, np.float32), np.asarray(tris, np.int32),
            np.zeros(2, np.int32),
            make_materials([dict(kind=MAT_DIFFUSE, albedo=(0.5, 0.5, 0.5))]),
            make_lights([dict(kind=LIGHT_ENV)]),
            env_map=env,
        )

    def test_miss_shows_env(self):
        env = gradient_sky(h=8, w=16, scale=1.0)
        scene = self._scene(env)
        cam = Camera.look_at(eye=(0, 0.5, 4), target=(0, 2.5, 0), hfov=60,
                             aspect=1.0)
        cfg = RenderConfig(width=8, height=8, spp=2, direct_only=True)
        img = render(scene, cam, cfg, jax.random.key(0), backend="brute")
        # Camera mostly sees sky: nonzero, bluish at top.
        assert img.mean() > 0.05
        top = img[-2:].mean(axis=(0, 1))
        assert top[2] >= top[0]  # blue-ish zenith

    def test_env_nee_lights_surface(self):
        env = gradient_sky(h=8, w=16, scale=3.0)
        scene = self._scene(env)
        cam = Camera.look_at(eye=(0, 2.0, 0.01), target=(0, 0, 0), hfov=40,
                             aspect=1.0, up=(0, 0, -1))
        cfg = RenderConfig(width=8, height=8, spp=8, direct_only=True)
        img = render(scene, cam, cfg, jax.random.key(1), backend="brute")
        # The quad fills the view and is lit purely by env NEE.
        assert img.mean() > 0.05

    def test_no_env_is_black_miss(self):
        scene = self._scene(None)
        cam = Camera.look_at(eye=(0, 0.5, 4), target=(0, 4.0, 0), hfov=40,
                             aspect=1.0)
        cfg = RenderConfig(width=6, height=6, spp=1, direct_only=True)
        img = render(scene, cam, cfg, jax.random.key(2), backend="brute")
        assert img[-1].max() == 0.0  # pure sky rows are black
