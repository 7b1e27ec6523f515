"""Environment (lat-long) light map: evaluation, sampling, PFM loading.

Counterpart of the reference's ``src/static_scene/environment_light.*``
(SURVEY.md §2 row 7), which importance-sampled a lat-long ``.exr`` map.
Offline constraints: EXR codecs are unavailable, so maps load from PFM
(trivial float format Blender/pbrt can emit) or any (H, W, 3) array.

The map is stored on ``Scene.env_map``; a scene with no environment uses a
(1, 1, 3) zero map (pytree structure stays constant).  Miss rays fetch
radiance along their direction; next-event estimation uses a LIGHT_ENV row
(uniform-sphere sampling in v1 — unbiased; map importance sampling is a
perf upgrade, not a correctness one).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def eval_env(env_map, d):
    """Radiance of the environment along unit directions d (..., 3).

    Lat-long convention (matches the reference's EnvironmentLight):
    u = phi / 2pi with phi = atan2(x, -z); v = theta / pi, theta from +y.
    Nearest-texel lookup (bilinear is a later refinement)."""
    h, w = env_map.shape[0], env_map.shape[1]
    phi = jnp.arctan2(d[..., 0], -d[..., 2])
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    u = (phi / (2.0 * jnp.pi) + 0.5) % 1.0
    v = theta / jnp.pi
    xi = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    return env_map[yi, xi]


def load_pfm(path: str) -> np.ndarray:
    """Read a PFM file -> (H, W, 3) float32 (top row first)."""
    with open(path, "rb") as fh:
        header = fh.readline().strip()
        if header not in (b"PF", b"Pf"):
            raise ValueError(f"not a PFM file: {path}")
        dims = fh.readline().split()
        w, h = int(dims[0]), int(dims[1])
        scale = float(fh.readline().strip())
        data = np.frombuffer(fh.read(), "<f4" if scale < 0 else ">f4")
    c = 3 if header == b"PF" else 1
    img = data.reshape(h, w, c)[::-1]  # PFM stores bottom-up
    if c == 1:
        img = np.repeat(img, 3, axis=2)
    return np.ascontiguousarray(img.astype(np.float32))


def write_pfm(path: str, img: np.ndarray) -> None:
    img = np.asarray(img, np.float32)
    h, w, _ = img.shape
    with open(path, "wb") as fh:
        fh.write(b"PF\n")
        fh.write(f"{w} {h}\n".encode())
        fh.write(b"-1.0\n")
        fh.write(np.ascontiguousarray(img[::-1]).astype("<f4").tobytes())


def gradient_sky(h: int = 32, w: int = 64, horizon=(0.8, 0.85, 1.0),
                 zenith=(0.2, 0.35, 0.8), ground=(0.25, 0.2, 0.15),
                 scale: float = 1.0) -> np.ndarray:
    """Procedural sky map (test/demo stand-in for missing .exr assets)."""
    theta = (np.arange(h) + 0.5) / h * np.pi
    t = np.cos(theta)[:, None, None]  # +1 at zenith → -1 at nadir
    up = np.clip(t, 0, 1)
    down = np.clip(-t, 0, 1)
    mid = 1.0 - up - down
    img = (up * np.asarray(zenith) + mid * np.asarray(horizon)
           + down * np.asarray(ground))
    return np.broadcast_to(img, (h, w, 3)).astype(np.float32) * scale
