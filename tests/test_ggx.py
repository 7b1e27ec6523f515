"""GGX microfacet BSDF: sampling/eval consistency, energy bounds, and the
detached-sampling roughness gradient of the sampled-lobe weight.

SURVEY.md §2 row 10 (BSDF parity) + BASELINE.json north star (gradients
w.r.t. BRDF roughness).  The renderer-level FD check lives in test_diff.py
(NEE path, pathwise-exact); here the SAMPLED lobe's estimator is validated
in expectation: E_u[weight] = ∫ f cosθ dωi for any sampling density, so the
detached-sampling AD gradient must match a common-random-numbers FD of the
mean weight.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pt.render import bsdf as B
from tpu_pt.scene.types import MAT_GGX


def _mat(n, albedo=(1.0, 1.0, 1.0), roughness=0.4):
    return B.MatProps(
        kind=jnp.full((n,), MAT_GGX, jnp.int32),
        albedo=jnp.broadcast_to(jnp.asarray(albedo, jnp.float32), (n, 3)),
        emission=jnp.zeros((n, 3)),
        ior=jnp.full((n, 1), 1.5),
        roughness=jnp.full((n, 1), roughness),
    )


def _hemi_integral_f_cos(mat_row, wo, n_theta=256, n_phi=256):
    """Numeric ∫ f(wo, wi) cosθ dωi over the upper hemisphere."""
    th = (jnp.arange(n_theta) + 0.5) / n_theta * (jnp.pi / 2)
    ph = (jnp.arange(n_phi) + 0.5) / n_phi * (2 * jnp.pi)
    T, P = jnp.meshgrid(th, ph, indexing="ij")
    wi = jnp.stack([jnp.sin(T) * jnp.cos(P), jnp.sin(T) * jnp.sin(P),
                    jnp.cos(T)], -1).reshape(-1, 3)
    n = wi.shape[0]
    mat = jax.tree.map(lambda a: jnp.broadcast_to(a[:1], (n,) + a.shape[1:]),
                       mat_row)
    f = B.eval_f(mat, jnp.broadcast_to(wo, (n, 3)), wi)
    w = (jnp.sin(T) * jnp.cos(T)).reshape(-1, 1)  # cosθ sinθ dθ dφ
    dth = (jnp.pi / 2) / n_theta
    dph = (2 * jnp.pi) / n_phi
    return jnp.sum(f * w, axis=0) * dth * dph


class TestGGX:
    def test_sample_matches_eval_integral(self):
        """Mean sampled weight == numeric ∫ f cosθ dωi (estimator is
        unbiased for the NDF sampling density)."""
        n = 1 << 16
        mat = _mat(n, albedo=(0.8, 0.5, 0.3), roughness=0.45)
        wo = jnp.asarray([0.3, -0.1, 0.92], jnp.float32)
        wo = wo / jnp.linalg.norm(wo)
        u = jax.random.uniform(jax.random.key(0), (n, 3))
        bs = B.sample(mat, jnp.broadcast_to(wo, (n, 3)), u)
        mc = jnp.mean(bs.weight, axis=0)
        ref = _hemi_integral_f_cos(jax.tree.map(lambda a: a[:1], mat), wo)
        np.testing.assert_allclose(np.asarray(mc), np.asarray(ref),
                                   rtol=5e-2, atol=5e-3)

    def test_energy_conservation(self):
        """White (albedo=1) GGX must not amplify: ∫ f cosθ dωi <= 1 for a
        span of roughness and view angles."""
        # roughness >= 0.15 so the lobe is resolvable on the 256^2 grid
        # (at r=0.05, alpha=2.5e-3 the NDF is narrower than a grid cell).
        for rough in (0.15, 0.2, 0.5, 1.0):
            for cz in (0.95, 0.5, 0.15):
                wo = jnp.asarray([np.sqrt(1 - cz * cz), 0.0, cz], jnp.float32)
                val = _hemi_integral_f_cos(_mat(1, roughness=rough), wo)
                assert float(jnp.max(val)) <= 1.0 + 1e-3, (rough, cz, val)

    def test_roughness_grad_of_mean_weight(self):
        """AD grad (detached sampling) of E_u[weight] vs common-random-
        numbers FD — the sampled-lobe roughness gradient BASELINE requires."""
        n = 1 << 17
        wo = jnp.asarray([0.45, 0.2, 0.87], jnp.float32)
        wo = wo / jnp.linalg.norm(wo)
        u = jax.random.uniform(jax.random.key(3), (n, 3))

        def mean_w(rough):
            mat = _mat(n, albedo=(0.7, 0.7, 0.7), roughness=1.0)
            mat = mat._replace(roughness=jnp.full((n, 1), 0.0) + rough)
            bs = B.sample(mat, jnp.broadcast_to(wo, (n, 3)), u)
            return jnp.mean(bs.weight)

        r0 = 0.35
        g = float(jax.grad(mean_w)(jnp.float32(r0)))
        eps = 2e-2
        fd = (float(mean_w(jnp.float32(r0 + eps)))
              - float(mean_w(jnp.float32(r0 - eps)))) / (2 * eps)
        assert np.isfinite(g)
        np.testing.assert_allclose(g, fd, rtol=0.15, atol=2e-3)

    def test_delta_and_validity_flags(self):
        n = 8
        mat = _mat(n)
        u = jax.random.uniform(jax.random.key(1), (n, 3))
        wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        bs = B.sample(mat, wo, u)
        assert not bool(jnp.any(B.is_delta(mat)))
        assert bool(jnp.all(bs.weight >= 0.0))
