"""Structured render metrics & logging.

Replaces the reference's printf observability (SURVEY.md §5: scene stats,
BVH build time, render time, rays traced) with a structured JSON record:
config hash, rays traced, rays/s, wavefront queue occupancy per step,
BVH stats, HBM footprint estimate.  ``bench.py`` and the CLI both emit
these records; the driver's BENCH_r{N}.json consumes bench.py's line.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pt.config import RenderConfig


def scene_stats(scene) -> dict:
    bytes_total = sum(
        int(np.asarray(x).nbytes) for x in jax.tree.leaves(scene)
    )
    return dict(
        tris=int(scene.n_tris),
        spheres=int(scene.n_spheres),
        vertices=int(scene.vertices.shape[0]),
        lights=int(scene.lights.count),
        materials=int(scene.materials.kind.shape[0]),
        scene_bytes=bytes_total,
    )


def bvh_stats(packed) -> dict:
    return dict(
        nodes=int(packed.n_nodes),
        tables=int(packed.n_tables),
        max_leaf=int(packed.max_leaf),
        table_bytes=int(np.asarray(packed.table).nbytes),
    )


def queue_occupancy(scene, cam, cfg: RenderConfig, key, bvh,
                    queue: int = 4096, backend: str = "packed") -> dict:
    """Run the wavefront loop recording per-step live-lane counts — the key
    perf signal (SURVEY.md §5 'compacted-queue sizes per bounce')."""
    from tpu_pt.render.driver import _intersectors_counted
    from tpu_pt.render.wavefront import _step, init_queue, n_steps

    Q = min(queue, cfg.n_pixels * cfg.spp)
    steps = n_steps(cfg, Q)

    @jax.jit
    def run(scene, cam, key, bvh):
        intersect_fn, occluded_fn = _intersectors_counted(backend, bvh)
        st = init_queue(Q, cfg.n_pixels)

        def body(st, _):
            st2, _counts = _step(scene, cam, cfg, key, intersect_fn,
                                 occluded_fn, st, jnp.int32(0), cfg.n_pixels,
                                 jnp.int32(0), cfg.spp)
            return st2, jnp.sum(st2.alive)

        _, occ = jax.lax.scan(body, st, None, length=steps)
        return occ

    occ = np.asarray(run(scene, cam, key, bvh))
    return dict(
        queue=Q,
        steps=int(steps),
        occupancy=[int(x) for x in occ],
        mean_occupancy=float(occ.mean() / Q),
    )


@dataclass
class RenderReport:
    """Accumulates one render's observability record."""

    cfg: RenderConfig
    scene_info: dict = field(default_factory=dict)
    bvh_info: dict = field(default_factory=dict)
    timings: dict = field(default_factory=dict)
    t0: float = field(default_factory=time.time)

    def phase(self, name: str):
        rep = self

        class _Timer:
            def __enter__(self):
                self.t = time.time()

            def __exit__(self, *a):
                rep.timings[name] = round(time.time() - self.t, 4)

        return _Timer()

    def to_json(self, **extra) -> str:
        return json.dumps(dict(
            config=json.loads(self.cfg.to_json()),
            scene=self.scene_info,
            bvh=self.bvh_info,
            timings=self.timings,
            wall_s=round(time.time() - self.t0, 3),
            **extra,
        ))
