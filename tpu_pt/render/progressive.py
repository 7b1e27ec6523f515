"""Progressive, checkpointable rendering: spp-chunked accumulation.

The reference kept its progressive accumulation only in memory (keyboard
'D'/'S' dumped the current buffer; a crash lost the render — SURVEY.md §5
"Checkpoint / resume").  Here the accumulator + sample count + config hash
are written to an ``.npz`` after every chunk, giving free crash-resume and
progressive preview for long renders.  Because the wavefront sample stream
is counter-based over (pixel, sample-index), chunked accumulation sums to
EXACTLY the one-shot image (tests/test_progressive.py).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Callable, Optional

import jax
import numpy as np

from tpu_pt.config import RenderConfig
from tpu_pt.render.wavefront import wavefront_accum
from tpu_pt.scene.types import Scene


def _state_key(cfg: RenderConfig, seed_key, bvh, backend: str) -> str:
    """Checkpoint identity: cfg + RNG key + BACKEND + the BVH's traversal
    budgets.  The budgets matter (ADVICE r4): two runs over the same scene
    with different frontier caps / pair budgets can truncate differently,
    so mixing their chunks into one accumulator would silently blend
    differently-truncated images.  Geometry itself is not hashed
    (uploading the full tile tensor per resume would dwarf the render);
    the budget tuple + core array shapes are the cheap proxy that catches
    every --autotune / backend mismatch.

    The exact-retrace FALLBACK is deliberately NOT part of the key: a
    fallback-attached traversal only rewrites rays whose candidates
    overflowed, so on chunks that reported overflow == 0 it is
    bit-identical to the fallback-free program — resuming a clean
    checkpoint with the fallback attached is exactly the efficient
    verify-then-retry for progressive renders (VERDICT r5 task 6).
    Checkpoints recording n_ovf > 0 are rejected on resume instead
    (render_progressive)."""
    h = hashlib.sha256()
    h.update(cfg.to_json().encode())
    h.update(np.asarray(jax.random.key_data(seed_key)).tobytes())
    h.update(backend.encode())
    if hasattr(bvh, "frontiers"):  # ClusterBVH: budgets + core shapes only
        sig = (bvh.frontiers, bvh.k_leaf, bvh.pair_budget, bvh.pair_mults,
               tuple(tuple(np.shape(lv)) for lv in bvh.levels),
               tuple(np.shape(bvh.tiles)))
    else:
        sig = tuple(tuple(x.shape) for x in jax.tree.leaves(bvh)
                    if hasattr(x, "shape"))
    h.update(repr(sig).encode())
    return h.hexdigest()[:16]


def render_progressive(
    scene: Scene,
    cam,
    cfg: RenderConfig,
    key,
    bvh,
    checkpoint: Optional[str] = None,
    chunk_spp: Optional[int] = None,
    queue: int = 1 << 17,
    backend: str = "packed",
    on_chunk: Optional[Callable] = None,
    return_counts: bool = False,
    stop_on_overflow: bool = False,
    overflow_is_exact: bool = False,
):
    """Render cfg.spp samples in chunks of ``chunk_spp`` (default
    cfg.spp_chunk), checkpointing to ``checkpoint`` (npz) after each chunk
    and resuming from it if present.  Returns (H, W, 3) radiance — or
    ((H, W, 3), n_overflow) with ``return_counts`` (the summed
    capacity-contract truncations, for the CLI's verify-then-retry).

    ``on_chunk(spp_done, image_so_far)`` is the progressive-preview hook
    (the reference's live tile blitting, headless).

    ``stop_on_overflow`` aborts after the first chunk that reports
    capacity-contract truncations (ADVICE r4): the caller is going to
    retry with the exact fallback anyway, so finishing the remaining
    chunks of a potentially hours-long job would be pure waste.  No
    checkpoint is written for the offending chunk, so the stored
    accumulator stays exact and the fallback-attached retry RESUMES it.

    ``overflow_is_exact`` declares that the supplied ``bvh`` corrects
    overflow in-run (exact-retrace fallback attached): overflow neither
    aborts nor taints the checkpoint."""
    chunk_spp = chunk_spp or cfg.spp_chunk
    state_key = _state_key(cfg, key, bvh, backend)
    accum = np.zeros((cfg.n_pixels, 3), np.float32)
    spp_done = 0
    n_ovf = 0

    if checkpoint and os.path.exists(checkpoint):
        data = np.load(checkpoint, allow_pickle=False)
        ck_ovf = int(data["n_ovf"]) if "n_ovf" in data else 0
        ck_exact = bool(data["exact"]) if "exact" in data else ck_ovf == 0
        # A checkpoint whose chunks truncated (inexact) was written by a
        # run that may have dropped hits — only exact accumulators resume.
        if str(data["state_key"]) == state_key and ck_exact:
            accum = data["accum"]
            spp_done = int(data["spp_done"])
            n_ovf = ck_ovf

    accum_fn = jax.jit(
        wavefront_accum,
        static_argnames=("cfg", "queue", "backend", "n_pix_local",
                         "spp_count", "fast", "with_counts"),
    )

    while spp_done < cfg.spp:
        n = min(chunk_spp, cfg.spp - spp_done)
        part, (_, _, novf, _) = accum_fn(
            scene, cam, cfg, key, bvh, queue=queue, backend=backend,
            pix_lo=0, n_pix_local=cfg.n_pixels, spp_lo=spp_done, spp_count=n,
            fast=True,  # forward-only: early-exit while_loop
            with_counts=True,
        )
        accum = accum + np.asarray(jax.block_until_ready(part))
        n_ovf += int(np.asarray(novf))
        spp_done += n
        if stop_on_overflow and n_ovf and not overflow_is_exact:
            img = (accum / max(spp_done, 1)).reshape(cfg.height, cfg.width, 3)
            return (img, n_ovf) if return_counts else img
        if checkpoint:
            tmp = checkpoint + ".tmp.npz"
            np.savez(tmp, accum=accum, spp_done=spp_done,
                     state_key=state_key, n_ovf=n_ovf,
                     exact=(n_ovf == 0 or overflow_is_exact))
            os.replace(tmp, checkpoint)
        if on_chunk is not None:
            preview = (accum / spp_done).reshape(cfg.height, cfg.width, 3)
            on_chunk(spp_done, preview)

    img = (accum / cfg.spp).reshape(cfg.height, cfg.width, 3)
    return (img, n_ovf) if return_counts else img
