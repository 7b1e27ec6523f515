"""Multi-chip / multi-host distribution: tile sharding over a device mesh.

Replaces the reference's distributed layer (SURVEY.md §2 row 15: image-space
tile split across GPUs/nodes with a master/worker dynamic assignment over
MPI/sockets, §3.3).  The TPU-native design has NO transport code at all
(SURVEY.md §5 "Distributed communication backend"):

  - a ``jax.sharding.Mesh`` over all chips, axis "tile";
  - ``shard_map``: each chip renders a contiguous pixel range with the
    persistent-wavefront renderer; the scene + BVH are replicated;
  - the final image is a sharded array — assembling it on host 0 is just
    ``jax.device_get`` (XLA all-gathers lazily if asked);
  - gradient reduction is ``psum`` over the mesh (it rides ICI inside a
    slice, DCN between slices), inserted automatically by shard_map's AD
    transpose for the replicated parameters.

Load balance: the reference needed *dynamic* tile assignment because its
tiles had wildly-varying cost (SURVEY.md §2 row 15).  Here each shard's
wavefront queue stays full regardless of which pixels terminate early, so
per-shard cost tracks the shard's total path-segment count, not its pixel
count.  MEASURED on the 8-device CPU mesh (tools/measure_balance.py,
atrium 256²): contiguous blocks still carry a real segment imbalance
(different image regions have different mean path length), and round-robin
pixel interleaving (``interleave=True``) collapses it to ~the drain tail —
see BASELINE.md "Multi-chip load balance" for the recorded numbers.
``render_sharded(with_stats=True)`` returns the per-shard counters.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh
(``init_distributed``); everything else is identical — the mesh just spans
more chips.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from tpu_pt.config import RenderConfig
from tpu_pt.diff.params import merge
from tpu_pt.render.wavefront import wavefront_accum
from tpu_pt.scene.types import Scene


def init_distributed(**kw) -> None:
    """Multi-host bring-up (no-op on a single host)."""
    try:
        jax.distributed.initialize(**kw)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process


def make_mesh(n_devices: Optional[int] = None, axis: str = "tile") -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devs), (axis,))


def _pad_pixels(n_pix: int, n_shards: int) -> int:
    return -(-n_pix // n_shards) * n_shards


def render_sharded(scene: Scene, cam, cfg: RenderConfig, key, bvh, mesh: Mesh,
                   queue: int = 1 << 15, backend: str = "bvh",
                   interleave: bool = True, with_stats: bool = False,
                   fast: bool = False):
    """Tile-sharded render over `mesh` -> (H, W, 3) on host.

    interleave=False: shard s renders the contiguous pixel block
    [s*block, (s+1)*block).  interleave=True (DEFAULT — measured strictly
    better r4: 0.0% vs 3.4% step imbalance on the atrium, bit-identical,
    zero cost; BASELINE.md "Multi-chip load balance"): shard s renders
    pixels {s, s+n, s+2n, ...} — round-robin over the image, so every
    shard sees
    a statistically identical pixel mix regardless of where the expensive
    regions are.  This is the static answer to the reference's *dynamic*
    master/worker tile assignment (SURVEY.md §2 r15): dynamic stealing
    exists to fix cost imbalance between contiguous tiles, and round-robin
    interleaving removes that imbalance up-front with zero communication.
    Ray ids are global either way, so both layouts produce the bit-exact
    single-device image (tests/test_dist.py asserts this on the 8-device
    CPU mesh; tools/measure_balance.py records the measured imbalance).

    with_stats=True also returns per-shard measured load counters
    (steps_run, n_closest, n_shadow, n_overflow) — the observability that
    sizes the imbalance (VERDICT r3 task 4).

    fast=True uses the early-exit while_loop per shard (each shard stops
    when its sample budget drains) — the production-pod setting.  The
    default stays the fixed-length scan because it is BIT-identical to
    the single-device scan render (the repo's sharding-correctness
    gate); the fast path's unrolled wide-budget prefix compiles with
    ~1-ULP different FMA scheduling (r5, see test_dist).  with_stats
    implies fast.
    """
    n = mesh.devices.size
    padded = _pad_pixels(cfg.n_pixels, n)
    block = padded // n

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P("tile")),
        out_specs=(P("tile"), P("tile")) if with_stats else P("tile"),
        # Re-tried under jax 0.9 (VERDICT r3 task 6): check_vma=True still
        # rejects the renderer — while_loop carries START replicated and
        # BECOME shard-varying once the shard's pix_lo mixes in ("carry
        # input and carry output must have equal types", packed.py
        # while_loop).  The semantics are proven by the bit-identity tests
        # in test_dist.py, so the static check stays off.
        check_vma=False,
    )
    def shard_render(scene_r, cam_r, bvh_r, shard_ids):
        s = shard_ids[0]
        pix_lo = s if interleave else s * block
        stride = n if interleave else 1
        if with_stats:
            accum, (nc, ns, novf, n_iter) = wavefront_accum(
                scene_r, cam_r, cfg, key, bvh_r, queue, backend, pix_lo,
                block, pix_stride=stride, with_counts=True, fast=True)
            stats = jnp.stack(
                [n_iter, nc, ns, novf]).astype(jnp.int32)[None, :]
            return accum, stats
        return wavefront_accum(
            scene_r, cam_r, cfg, key, bvh_r, queue, backend, pix_lo, block,
            pix_stride=stride, fast=fast)

    shard_ids = jnp.arange(n, dtype=jnp.int32)
    # jit the shard_map: eager shard_map can't evaluate the closed_call the
    # remat-chunked scan introduces (and jit is the production mode anyway).
    out = jax.jit(shard_render)(scene, cam, bvh, shard_ids)
    accum, stats = out if with_stats else (out, None)
    if interleave:
        # Global row s*block + j holds pixel s + j*n; invert the layout.
        accum = accum.reshape(n, block, 3).transpose(1, 0, 2).reshape(
            padded, 3)
    img = (accum / cfg.spp)[: cfg.n_pixels]
    img = img.reshape(cfg.height, cfg.width, 3)
    if with_stats:
        return img, dict(
            steps_run=np.asarray(stats[:, 0]),
            n_closest=np.asarray(stats[:, 1]),
            n_shadow=np.asarray(stats[:, 2]),
            n_overflow=np.asarray(stats[:, 3]))
    return img


def loss_and_grad_sharded(params, scene: Scene, cam, cfg: RenderConfig, key,
                          target, bvh, mesh: Mesh, queue: int = 1 << 14,
                          backend: str = "bvh"):
    """Sharded inverse-rendering step — the "training step" of this
    framework.  Forward: tile-sharded wavefront render; backward: adjoint
    sweep per shard + automatic psum of parameter grads over the mesh
    (BASELINE.json config 5: "grad allreduce overlapped" — XLA overlaps the
    per-shard backward compute with the psum since the collective only
    depends on each shard's finished grads).

    target: (padded_pixels, 3) with padded_pixels = ceil(n_pix/n)*n.
    Returns (loss, grads) replicated on every device.
    """
    n = mesh.devices.size
    padded = _pad_pixels(cfg.n_pixels, n)
    block = padded // n

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("tile"), P("tile")),
        out_specs=(P(), jax.tree.map(lambda _: P(), params)),
        check_vma=False,
    )
    def step(params_r, scene_r, cam_r, bvh_r, target_blk, shard_ids):
        pix_lo = shard_ids[0] * block

        def local_loss(p):
            sc = merge(p, scene_r)
            accum = wavefront_accum(
                sc, cam_r, cfg, key, bvh_r, queue, backend, pix_lo, block,
                psum_axis="tile",
            )
            img = accum / cfg.spp
            # Padding tail pixels (>= n_pixels) are masked out of the loss.
            pix_ids = pix_lo + jnp.arange(block)
            mask = (pix_ids < cfg.n_pixels)[:, None]
            sq = jnp.sum(jnp.where(mask, (img - target_blk) ** 2, 0.0))
            return sq / (cfg.n_pixels * 3)  # normalize INSIDE so grads match

        loss, grads = jax.value_and_grad(local_loss)(params_r)
        loss = jax.lax.psum(loss, "tile")
        # NO tail psum of grads: every remat chunk psums its partial grads
        # inside its backward (wavefront_accum psum_axis), overlapping the
        # allreduce with the backward bounce sweep (BASELINE config 5).
        return loss, grads

    @jax.jit
    def outer(params, scene, cam, bvh, target):
        # Sharded operands (shard ids, padded target) are created INSIDE
        # jit so they are global arrays in multi-process runs — host numpy
        # inputs stay replicated, which every process can supply locally.
        tgt = jnp.zeros((padded, 3), jnp.float32).at[: cfg.n_pixels].set(
            target.reshape(-1, 3))
        shard_ids = jnp.arange(n, dtype=jnp.int32)
        return step(params, scene, cam, bvh, tgt, shard_ids)

    return outer(params, scene, cam, bvh, target)
