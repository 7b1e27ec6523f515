"""Counter-based RNG + Monte-Carlo samplers.

Replaces the reference's ``Sampler2D/3D`` + ``random_uniform()``
(SURVEY.md §2 row 11: ``UniformGridSampler2D``,
``CosineWeightedHemisphereSampler3D``).

Key design point (TPU-native): randomness is **counter-based and
order-invariant**.  Every draw is a pure function of
``(base_key, ray_id, draw_id)`` where ray_id identifies the logical sample
(pixel*spp + s) and draw_id identifies the call site (bounce*stride +
purpose).  Consequently the oracle renderer, the BVH renderer, the wavefront
renderer (which *reorders* rays by compaction) and the sharded renderer all
consume bit-identical random numbers — which is what makes the
"image allclose vs CPU oracle" gates in BASELINE.json testable at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def draws(key, ray_ids, draw_id: int, n: int):
    """n uniforms in [0,1) per ray: shape (R, n).

    key: jax PRNG key.  ray_ids: (R,) int32 logical sample ids.
    draw_id: static int identifying the call site.
    """
    k = jax.random.fold_in(key, draw_id)
    ks = jax.vmap(lambda i: jax.random.fold_in(k, i))(ray_ids)
    return jax.vmap(lambda kk: jax.random.uniform(kk, (n,), dtype=jnp.float32))(ks)


def draws_lane(key, ray_ids, draw_ids, n: int):
    """Like :func:`draws` but with a PER-LANE draw id (traced int32 array).

    Used by the persistent wavefront renderer where lanes sit at different
    bounce depths: ``draws_lane(key, ids, 1 + depth*64 + off, n)`` produces
    bit-identical values to ``draws(key, ids, 1 + d*64 + off, n)`` for a lane
    at depth d — which is what keeps wavefront output equal to the oracle's.
    """
    def one(i, d):
        kk = jax.random.fold_in(jax.random.fold_in(key, d), i)
        return jax.random.uniform(kk, (n,), dtype=jnp.float32)

    return jax.vmap(one)(ray_ids, draw_ids)


def cosine_hemisphere(u):
    """Cosine-weighted hemisphere sample in the local frame (z = normal).

    u: (..., 2) uniforms.  Returns (dir, pdf): dir (..., 3), pdf (..., 1).
    pdf = cos(theta)/pi.
    """
    phi = 2.0 * jnp.pi * u[..., 0:1]
    cos_t = jnp.sqrt(jnp.maximum(1.0 - u[..., 1:2], 0.0))
    sin_t = jnp.sqrt(jnp.maximum(u[..., 1:2], 0.0))
    d = jnp.concatenate([jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t], axis=-1)
    pdf = cos_t / jnp.pi
    return d, pdf


def uniform_hemisphere(u):
    """Uniform hemisphere sample in the local frame.  pdf = 1/(2*pi)."""
    z = u[..., 0:1]
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * jnp.pi * u[..., 1:2]
    d = jnp.concatenate([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    pdf = jnp.full_like(z, 1.0 / (2.0 * jnp.pi))
    return d, pdf


def uniform_sphere(u):
    """Uniform sphere sample.  pdf = 1/(4*pi)."""
    z = 1.0 - 2.0 * u[..., 0:1]
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * jnp.pi * u[..., 1:2]
    d = jnp.concatenate([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    pdf = jnp.full_like(z, 1.0 / (4.0 * jnp.pi))
    return d, pdf
