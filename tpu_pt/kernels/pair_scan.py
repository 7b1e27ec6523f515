"""Pallas TPU kernel: segmented (t, gid)-min scan over a ray-sorted pair
list — the reduce stage of the cluster-BVH pair traversal.

The compact traversal tests one flat ray-major pair list per batch and
needs, per ray, the nearest hit (lowest t, ties broken by LOWEST gid —
the cross-backend tie rule of SURVEY.md §4 item 2).  The XLA production
reduce is one 5-operand 3-key sort (`_reduce_pairs_closest`): correct and
measured-optimal among XLA formulations (tools/microbench_reduce2.py),
but it is a full sort where only a segmented reduction is required — the
pair list is ALREADY ray-major, so each ray's pairs are contiguous.

This kernel computes the inclusive SEGMENTED running min along the pair
axis in one streaming pass: for pair p of ray r, out[:, p] = the best
(t, gid, u, v) among ray r's pairs at positions <= p.  The caller reads
each ray's answer at its segment END (position right-1, already known
from `_flat_pairs`' cumsum — no sort, no scatter).  Exactness: the
lexicographic (t, gid) min is associative and commutative, so any
combination order gives the bit-identical winner; the scan does not
reorder floats, it only selects.

Layout: fields on SUBLANES, pairs on LANES — (8, P) f32 with rows
[t, gid, u, v, ray, 0, 0, 0] (gid/ray stored as exact small-int floats).
A block of B pairs is one (8, B) VMEM tile; the in-block scan is the
classic doubling (Hillis–Steele) segmented scan on the lane axis
(log2(B) steps of lane-roll + compare + select on 8-vreg registers).
Blocks run in sequential grid order; the open segment's aggregate is
carried across blocks in a (8, 128) VMEM scratch (column 0), so the scan
is global over the whole pair list.

Cost model: the pair list at bench shape is ~6k pairs per sub-batch —
~0.2 MB of HBM traffic per call vs the sort's O(P log P) compare
network; the XLA-side sort measured 0.576 ms at the full bench pair
shape (microbench_reduce2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_pt.core.intersect import INF

B = 1024          # pairs per program (lane-axis block)
NF = 8            # field rows (sublanes): t, gid, u, v, ray, pad...
_NEUTRAL_T = INF
_NEUTRAL_G = 2.0 ** 31  # exact in f32; larger than any real gid


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _take2(a, b):
    """Lexicographic (t, gid) 'b wins' mask, shaped (1, N) from (8, N)
    operands."""
    ta, ga = a[0:1, :], a[1:2, :]
    tb, gb = b[0:1, :], b[1:2, :]
    return (tb < ta) | ((tb == ta) & (gb < ga))


def _combine(a, b):
    """Segmented-min combine: b is the LATER element; returns elementwise
    best-of fields."""
    return jnp.where(_take2(a, b), b, a)


def _kernel(fields_ref, out_ref, carry_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        # Neutral carry: t=INF, gid=MAX, ray=-1 (matches no real ray).
        col = jax.lax.broadcasted_iota(jnp.int32, (NF, 128), 0)
        init = jnp.where(col == 0, _NEUTRAL_T,
                jnp.where(col == 1, _NEUTRAL_G,
                jnp.where(col == 4, -1.0, 0.0)))
        carry_ref[:, :] = init

    v = fields_ref[:, :]                                   # (NF, B)
    ray = v[4:5, :]                                        # (1, B)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)

    # Segment-start flags: pair p starts a new segment iff its ray differs
    # from pair p-1's (pair -1 = the carried-in ray id from the previous
    # block; neutral -1 never matches, so block 0 starts fresh).
    ray_prev = pltpu.roll(ray, 1, axis=1)                  # [p-1], lane0 wraps
    carry_ray = carry_ref[4:5, 0:1]                        # (1, 1)
    ray_prev = jnp.where(lanes == 0,
                         jnp.broadcast_to(carry_ray, (1, B)), ray_prev)
    # Flags ride as f32 0/1 — Mosaic cannot rotate i1 vectors ("Rotate
    # with non-32-bit data").
    flag = (ray != ray_prev).astype(jnp.float32)           # (1, B)

    # Doubling segmented inclusive scan along lanes: carry (v, flag) where
    # flag = "a segment start lies within the scanned window".
    d = 1
    while d < B:
        v_sh = pltpu.roll(v, d, axis=1)
        f_sh = pltpu.roll(flag, d, axis=1)
        ok = lanes >= d
        comb = _combine(v_sh, v)
        v = jnp.where(ok & (flag == 0.0), comb, v)
        flag = jnp.maximum(flag, jnp.where(ok, f_sh, 0.0))
        d *= 2

    # Fold the cross-block carry into the leading open segment (elements
    # with no segment start at-or-before them in this block).
    carry = carry_ref[:, 0:1]                              # (NF, 1)
    carry_b = jnp.broadcast_to(carry, (NF, B))
    v = jnp.where(flag > 0.0, v, _combine(carry_b, v))

    out_ref[:, :] = v
    # New carry: the scanned value at the block's last pair (aggregate of
    # the segment still open at the block boundary).  Its ray row IS the
    # open segment's ray id — combines only merge within a segment, and
    # the fold above merges equal-ray values — so one column store
    # carries both (Mosaic rejects scalar stores to VMEM).
    carry_ref[:, 0:1] = v[:, B - 1:B]


@functools.partial(jax.jit, static_argnames=())
def pair_segmin_scan(fields):
    """fields: (8, P) f32 rows [t, gid, u, v, ray, 0, 0, 0], P % B == 0,
    pairs ray-major (each ray's pairs contiguous).  Returns the (8, P)
    inclusive segmented (t, gid)-min scan along the pair axis; read each
    ray's best at its segment-end column."""
    P = fields.shape[1]
    assert fields.shape[0] == NF and P % B == 0, fields.shape
    return pl.pallas_call(
        _kernel,
        grid=(P // B,),
        in_specs=[pl.BlockSpec((NF, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((NF, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NF, P), jnp.float32),
        scratch_shapes=[pltpu.VMEM((NF, 128), jnp.float32)],
        interpret=_interpret(),
    )(fields)
