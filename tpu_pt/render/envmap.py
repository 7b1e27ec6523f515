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

    Lat-long convention (matches the reference's EnvironmentLight, which
    bilinearly filtered its .exr map): u = phi / 2pi with
    phi = atan2(x, -z); v = theta / pi, theta from +y.  Bilinear texel
    filter — wraps in phi, clamps at the poles."""
    h, w = env_map.shape[0], env_map.shape[1]
    phi = jnp.arctan2(d[..., 0], -d[..., 2])
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    u = (phi / (2.0 * jnp.pi) + 0.5) % 1.0
    v = theta / jnp.pi
    x = u * w - 0.5                       # texel-center continuous coords
    y = jnp.clip(v * h - 0.5, 0.0, h - 1.0)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    x0 = jnp.mod(x0f.astype(jnp.int32), w)
    x1 = jnp.mod(x0 + 1, w)               # phi wraps around the seam
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)       # theta clamps at the poles
    top = env_map[y0, x0] * (1 - fx) + env_map[y0, x1] * fx
    bot = env_map[y1, x0] * (1 - fx) + env_map[y1, x1] * fx
    return top * (1 - fy) + bot * fy


def build_env_tables(env_map: np.ndarray):
    """Luminance CDF tables for environment importance sampling
    (reference: EnvironmentLight's marginal/conditional sampling of the
    .exr map — SURVEY.md §2 row 7).

    Texel weights are luminance x sin(theta_row) (the solid angle of a
    lat-long texel shrinks toward the poles).  Returns
    (marg_cdf (H,), cond_cdf (H, W)) float32 numpy arrays; a zero or
    constant map degenerates to (area-corrected) uniform sampling.
    """
    env = np.asarray(env_map, np.float32)
    h, w = env.shape[0], env.shape[1]
    lum = env @ np.asarray([0.2126, 0.7152, 0.0722], np.float32)
    # 3x3 box blur (wrap in phi, clamp in theta) so the pmf covers the
    # BILINEAR tent of every bright texel: eval_env spreads a texel's
    # radiance into its 8 neighbours, and sampling those at a bare dim-texel
    # probability gives rare huge-weight samples (unbiased but terrible
    # variance).  Blurring the table changes only the sampling density —
    # the pdf is derived from these same tables, so the estimator stays
    # exactly unbiased.
    padded = np.concatenate([lum[:1], lum, lum[-1:]], axis=0)
    padded = np.concatenate(
        [padded[:, -1:], padded, padded[:, :1]], axis=1)
    lum = sum(padded[dy:dy + h, dx:dx + w]
              for dy in range(3) for dx in range(3)) / 9.0
    sin_t = np.sin((np.arange(h, dtype=np.float32) + 0.5) / h * np.pi)
    wgt = lum * sin_t[:, None]
    if wgt.sum() <= 0.0:
        wgt = np.broadcast_to(sin_t[:, None], (h, w)).copy()
    row_w = wgt.sum(axis=1)
    marg_cdf = np.cumsum(row_w / row_w.sum()).astype(np.float32)
    marg_cdf[-1] = 1.0
    cond = wgt / np.maximum(row_w[:, None], 1e-30)
    cond = np.where(row_w[:, None] > 0, cond, 1.0 / w)
    cond_cdf = np.cumsum(cond, axis=1).astype(np.float32)
    cond_cdf[:, -1] = 1.0
    return marg_cdf, cond_cdf


def _pmf_from_cdfs(marg_cdf, cond_cdf, yi, xi):
    """Per-texel probability mass from the two CDF tables (gathered)."""
    m_hi = marg_cdf[yi]
    m_lo = jnp.where(yi > 0, marg_cdf[jnp.maximum(yi - 1, 0)], 0.0)
    c_hi = cond_cdf[yi, xi]
    c_lo = jnp.where(xi > 0, cond_cdf[yi, jnp.maximum(xi - 1, 0)], 0.0)
    return (m_hi - m_lo) * (c_hi - c_lo)


def sample_env(marg_cdf, cond_cdf, u):
    """Importance-sample the environment map.  u: (..., 2) uniforms.

    Inverse-CDF over rows then columns, with the CDF-remainder reused as
    the in-texel jitter (continuous, stratified, piecewise-constant pdf).
    Returns (d (..., 3) unit world directions, pdf (..., 1) solid-angle
    pdf).  pdf = pmf * H * W / (2 pi^2 sin theta) — the exact density of
    this sampler, so f * L / pdf is unbiased for any map.
    """
    h = marg_cdf.shape[0]
    w = cond_cdf.shape[1]
    u1 = u[..., 0]
    u2 = u[..., 1]
    # Row: first index with cdf > u1 (dense compare; maps are small).
    yi = jnp.sum((marg_cdf[..., None, :] <= u1[..., None]).astype(jnp.int32),
                 axis=-1)
    yi = jnp.clip(yi, 0, h - 1)
    m_lo = jnp.where(yi > 0, marg_cdf[jnp.maximum(yi - 1, 0)], 0.0)
    m_hi = marg_cdf[yi]
    fy = jnp.clip((u1 - m_lo) / jnp.maximum(m_hi - m_lo, 1e-12), 0.0, 1.0)
    # Column within the chosen row.
    row_cdf = cond_cdf[yi]                              # (..., W) gather
    xi = jnp.sum((row_cdf <= u2[..., None]).astype(jnp.int32), axis=-1)
    xi = jnp.clip(xi, 0, w - 1)
    c_lo = jnp.where(xi > 0, cond_cdf[yi, jnp.maximum(xi - 1, 0)], 0.0)
    c_hi = cond_cdf[yi, xi]
    fx = jnp.clip((u2 - c_lo) / jnp.maximum(c_hi - c_lo, 1e-12), 0.0, 1.0)

    v = (yi.astype(jnp.float32) + fy) / h               # theta / pi
    uu = (xi.astype(jnp.float32) + fx) / w              # phi / 2pi + .5
    theta = v * jnp.pi
    phi = (uu - 0.5) * (2.0 * jnp.pi)
    sin_t = jnp.sin(theta)
    d = jnp.stack([sin_t * jnp.sin(phi), jnp.cos(theta),
                   -sin_t * jnp.cos(phi)], axis=-1)
    pmf = _pmf_from_cdfs(marg_cdf, cond_cdf, yi, xi)
    pdf = pmf * (h * w) / (2.0 * jnp.pi ** 2 * jnp.maximum(sin_t, 1e-6))
    return d, pdf[..., None]


def env_pdf(marg_cdf, cond_cdf, d):
    """Solid-angle pdf sample_env would assign to directions d (..., 3).
    (The MIS counterpart of sample_env; shares its texel mapping.)"""
    h = marg_cdf.shape[0]
    w = cond_cdf.shape[1]
    phi = jnp.arctan2(d[..., 0], -d[..., 2])
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    uu = (phi / (2.0 * jnp.pi) + 0.5) % 1.0
    v = theta / jnp.pi
    xi = jnp.clip((uu * w).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    pmf = _pmf_from_cdfs(marg_cdf, cond_cdf, yi, xi)
    sin_t = jnp.maximum(jnp.sin(theta), 1e-6)
    return (pmf * (h * w) / (2.0 * jnp.pi ** 2 * sin_t))[..., None]


def load_envmap(path: str) -> np.ndarray:
    """Load a lat-long radiance map by extension: ``.exr`` (scanline
    NONE/ZIP/ZIPS — tpu_pt/scene/exr.py) or ``.pfm``.  Returns (H, W, 3)
    float32, top row first — the reference's ``-e <envmap.exr>`` input
    (SURVEY.md §2 rows 7/17/19)."""
    low = path.lower()
    if low.endswith(".exr"):
        from tpu_pt.scene.exr import read_exr

        return read_exr(path)
    if low.endswith(".pfm"):
        return load_pfm(path)
    raise ValueError(f"unsupported environment map format: {path} "
                     "(.exr or .pfm)")


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
