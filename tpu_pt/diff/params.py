"""Differentiable parameter pytree <-> Scene plumbing.

BASELINE.json requires gradients w.r.t. vertex positions, BRDF
albedo/roughness, and light emission.  These live as ordinary leaves inside
``Scene``; this module splits them out into a ``Params`` dict (the thing an
optimizer updates / grads are psum'd over) and grafts them back.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_pt.scene.types import Scene


def split(scene: Scene):
    """Scene -> (params dict, closure re-attaching them)."""
    params = dict(
        vertices=scene.vertices,
        albedo=scene.materials.albedo,
        roughness=scene.materials.roughness,
        emission=scene.materials.emission,
        light_radiance=scene.lights.radiance,
    )
    return params, scene


def merge(params, scene: Scene) -> Scene:
    return scene._replace(
        vertices=params["vertices"],
        materials=scene.materials._replace(
            albedo=params["albedo"],
            roughness=params["roughness"],
            emission=params["emission"],
        ),
        lights=scene.lights._replace(radiance=params["light_radiance"]),
    )
