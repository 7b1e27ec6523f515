"""Device LBVH builder: Morton codes → sort → Karras radix tree → flat
skip-pointer table, all in XLA ops on the accelerator.

BASELINE.json config 3 requires "LBVH device build (Morton sort on device)"
— the counterpart of the reference's host-side BVH build + GPU upload
(SURVEY.md §2 rows 9, 14), but constructed where the data already lives.
Per SURVEY.md §7 hard-part 3, everything is dense vectorized XLA: the radix
tree is the Karras-2012 parallel construction (each internal node finds its
range/split with vectorized binary searches), AABBs propagate bottom-up with
a fixed-depth gather loop, and the skip-pointer DFS layout falls out of a
closed form — for a binary tree over contiguous leaf ranges,

    preorder_index(node [f, l]) = 2*f + (#ancestors with range start f)
    skip(node [f, l])           = preorder_index + 2*(l - f) + 1

so no sequential DFS is needed (the ancestor count is a short parent-chain
walk, vectorized over all nodes).

The emitted PackedBVH has ONE node table (children in Morton order) instead
of the 8 octant-ordered tables the SAH path builds; the traversal handles
both (octant index is modded by the table count).  Leaves hold 1 primitive.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pt.bvh.packed import PackedBVH
from tpu_pt.scene.types import Scene


def _expand_bits(v):
    """Spread the low 10 bits of v so there are 2 zeros between each bit."""
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton_codes(cent, lo, hi):
    """30-bit Morton codes of centroids normalized to the scene box.
    cent: (P, 3); lo/hi: (3,) scene bounds."""
    x = jnp.clip((cent - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 1.0 - 1e-7)
    q = (x * 1024.0).astype(jnp.uint32)
    return (
        (_expand_bits(q[:, 0]) << 2)
        | (_expand_bits(q[:, 1]) << 1)
        | _expand_bits(q[:, 2])
    )


def _clz32(x):
    """Leading zeros of uint32 (0..32), branchless."""
    n = jnp.zeros(x.shape, jnp.int32)
    cur = x
    for shift in (16, 8, 4, 2, 1):
        empty = cur < (jnp.uint32(1) << jnp.uint32(32 - shift))
        n = n + jnp.where(empty, shift, 0)
        cur = jnp.where(empty, cur << jnp.uint32(shift), cur)
    return jnp.where(x == 0, 32, n)


def _prefix64(code_a, code_b, idx_a, idx_b):
    """Common-prefix length of the conceptual 64-bit keys (code << 32 | idx)
    without uint64 (disabled under jax_enable_x64=False): if the Morton
    codes differ the prefix is clz(code^code); for duplicate codes the index
    word breaks the tie (Karras's duplicate-handling trick)."""
    cx = code_a ^ code_b
    ix = idx_a.astype(jnp.uint32) ^ idx_b.astype(jnp.uint32)
    return jnp.where(cx != 0, _clz32(cx), 32 + _clz32(ix))


def build_lbvh_arrays(prim_lo, prim_hi):
    """Core device build.  prim_lo/hi: (P, 3) primitive bounds (device).

    Returns (nodes_table (1, N, 8) f32, perm (P,) i32) with N = 2P-1, in the
    PackedBVH node layout (leaves hold exactly 1 primitive)."""
    p = prim_lo.shape[0]
    cent = (prim_lo + prim_hi) * 0.5
    scene_lo = jnp.min(prim_lo, axis=0)
    scene_hi = jnp.max(prim_hi, axis=0)
    codes = morton_codes(cent, scene_lo, scene_hi)

    perm = jnp.arange(p, dtype=jnp.int32)
    codes_s, perm = jax.lax.sort_key_val(codes, perm)
    idx_arr = jnp.arange(p, dtype=jnp.int32)

    def delta(i, j):
        """Prefix length between sorted leaves i, j; -1 outside range."""
        valid = (j >= 0) & (j < p)
        jj = jnp.clip(j, 0, p - 1)
        d = _prefix64(codes_s[i], codes_s[jj], i, jj)
        return jnp.where(valid, d, -1)

    # --- Karras ranges/splits for internal nodes i in [0, p-2]. ---
    i = jnp.arange(p - 1, dtype=jnp.int32)
    d_dir = jnp.sign(delta(i, i + 1) - delta(i, i - 1)).astype(jnp.int32)
    delta_min = delta(i, i - d_dir)

    # Exponential search for range length upper bound.
    lmax = jnp.full_like(i, 2)

    def grow(state):
        lmax, = state
        cond = delta(i, i + lmax * d_dir) > delta_min
        return (jnp.where(cond, lmax * 2, lmax),)

    def grow_cond(state):
        lmax, = state
        return jnp.any((delta(i, i + lmax * d_dir) > delta_min) & (lmax < 2 * p))

    (lmax,) = jax.lax.while_loop(grow_cond, grow, (lmax,))

    # Binary search for exact range end.
    l = jnp.zeros_like(i)
    t = lmax // 2

    def shrink_cond(state):
        _, t = state
        return jnp.any(t >= 1)

    def shrink(state):
        l, t = state
        cond = (t >= 1) & (delta(i, i + (l + t) * d_dir) > delta_min)
        return jnp.where(cond, l + t, l), t // 2

    l, _ = jax.lax.while_loop(shrink_cond, shrink, (l, t))
    j = i + l * d_dir  # other end of the range
    first = jnp.minimum(i, j)
    last = jnp.maximum(i, j)

    # Binary search for the split position.
    delta_node = delta(i, j)
    s = jnp.zeros_like(i)
    t = -(-l // 2)  # ceil(l/2)

    def split_cond(state):
        _, t = state
        return jnp.any(t >= 1)

    def split_step(state):
        s, t = state
        cond = (t >= 1) & (delta(i, i + (s + t) * d_dir) > delta_node)
        s_new = jnp.where(cond, s + t, s)
        t_new = jnp.where(t > 1, -(-t // 2), 0)
        return s_new, t_new

    s, _ = jax.lax.while_loop(split_cond, split_step, (s, -(-l // 2)))
    gamma = i + s * d_dir + jnp.minimum(d_dir, 0)  # split leaf index

    left_is_leaf = first == gamma
    right_is_leaf = last == gamma + 1
    # Node numbering: internal k ∈ [0, p-2]; leaf j ∈ [0, p-1].
    left_child = jnp.where(left_is_leaf, gamma, gamma)          # same id space
    right_child = jnp.where(right_is_leaf, gamma + 1, gamma + 1)

    # --- Bottom-up AABBs: parent pointers then fixed-depth propagation. ---
    # parent arrays: for internal child c (internal id), for leaf child g.
    int_parent = jnp.full((p - 1,), -1, jnp.int32)
    leaf_parent = jnp.full((p,), -1, jnp.int32)
    int_parent = int_parent.at[jnp.where(~left_is_leaf, left_child, p - 1)].set(
        jnp.where(~left_is_leaf, i, int_parent[-1]), mode="drop"
    )
    int_parent = int_parent.at[jnp.where(~right_is_leaf, right_child, p - 1)].set(
        jnp.where(~right_is_leaf, i, int_parent[-1]), mode="drop"
    )
    leaf_parent = leaf_parent.at[jnp.where(left_is_leaf, gamma, p)].set(
        jnp.where(left_is_leaf, i, 0), mode="drop"
    )
    leaf_parent = leaf_parent.at[jnp.where(right_is_leaf, gamma + 1, p)].set(
        jnp.where(right_is_leaf, i, 0), mode="drop"
    )

    leaf_lo = prim_lo[perm]
    leaf_hi = prim_hi[perm]
    node_lo = jnp.full((p - 1, 3), 1e30, jnp.float32)
    node_hi = jnp.full((p - 1, 3), -1e30, jnp.float32)

    def aabb_step(_, bb):
        node_lo, node_hi = bb
        l_lo = jnp.where(left_is_leaf[:, None], leaf_lo[left_child],
                         node_lo[left_child])
        l_hi = jnp.where(left_is_leaf[:, None], leaf_hi[left_child],
                         node_hi[left_child])
        r_lo = jnp.where(right_is_leaf[:, None], leaf_lo[right_child],
                         node_lo[right_child])
        r_hi = jnp.where(right_is_leaf[:, None], leaf_hi[right_child],
                         node_hi[right_child])
        return jnp.minimum(l_lo, r_lo), jnp.maximum(l_hi, r_hi)

    # Tree depth ≤ 64 for 64-bit keys; 64 sweeps guarantee convergence.
    node_lo, node_hi = jax.lax.fori_loop(0, 64, aabb_step, (node_lo, node_hi))

    # --- Skip-pointer DFS layout via the closed form. ---
    # preorder_index(X) = 2*first(X) + L(X) where L(X) = number of LEFT
    # turns on the path root→X.  A step parent→child is a left turn iff the
    # child's range start equals the parent's (right turns advance `first`).
    # Walk every node's parent chain to the root (depth ≤ 64 for ≤64-bit
    # conceptual keys), comparing range starts level by level.
    def left_turns(parent0, my_first):
        """parent0: internal id of each element's parent (-1 = root/none);
        my_first: range start of the element itself."""
        def step(_, state):
            cnt, cur_parent, cur_first = state
            valid = cur_parent >= 0
            cc = jnp.clip(cur_parent, 0, p - 2)
            pf = first[cc]
            cnt = cnt + (valid & (pf == cur_first)).astype(jnp.int32)
            cur_first = jnp.where(valid, pf, cur_first)
            nxt = jnp.where(valid, int_parent[cc], -1)
            return cnt, nxt, cur_first
        cnt, _, _ = jax.lax.fori_loop(
            0, 64, step, (jnp.zeros_like(parent0), parent0, my_first)
        )
        return cnt

    l_int = left_turns(int_parent, first)
    idx_int = 2 * first + l_int
    size_int = 2 * (last - first) + 1
    skip_int = idx_int + size_int

    leaf_ids = jnp.arange(p, dtype=jnp.int32)
    l_leaf = left_turns(leaf_parent, leaf_ids)
    idx_leaf = 2 * leaf_ids + l_leaf
    skip_leaf = idx_leaf + 1

    # --- Emit the (2p-1, 8) table. ---
    n_nodes = 2 * p - 1
    table = jnp.zeros((n_nodes, 8), jnp.float32)
    meta_leaf = leaf_ids | (1 << 26)  # start=sorted slot, count=1
    table = table.at[idx_leaf, 0:3].set(leaf_lo)
    table = table.at[idx_leaf, 3:6].set(leaf_hi)
    table = table.at[idx_leaf, 6].set(
        jax.lax.bitcast_convert_type(skip_leaf, jnp.float32))
    table = table.at[idx_leaf, 7].set(
        jax.lax.bitcast_convert_type(meta_leaf, jnp.float32))
    table = table.at[idx_int, 0:3].set(node_lo)
    table = table.at[idx_int, 3:6].set(node_hi)
    table = table.at[idx_int, 6].set(
        jax.lax.bitcast_convert_type(skip_int, jnp.float32))
    table = table.at[idx_int, 7].set(
        jax.lax.bitcast_convert_type(jnp.full((p - 1,), -1, jnp.int32),
                                     jnp.float32))
    return table[None], perm


def build_lbvh(scene: Scene) -> PackedBVH:
    """Device LBVH → PackedBVH (single node table, max_leaf=1)."""
    from tpu_pt.bvh.packed import pack_bvh

    v = jnp.asarray(scene.vertices)
    ti = jnp.asarray(scene.tri_idx)
    p0, p1, p2 = v[ti[:, 0]], v[ti[:, 1]], v[ti[:, 2]]
    tri_lo = jnp.minimum(jnp.minimum(p0, p1), p2)
    tri_hi = jnp.maximum(jnp.maximum(p0, p1), p2)
    c = jnp.asarray(scene.sph_center)
    r = jnp.asarray(scene.sph_radius)[:, None]
    lo = jnp.concatenate([tri_lo, c - r], axis=0)
    hi = jnp.concatenate([tri_hi, c + r], axis=0)
    table, perm = jax.jit(build_lbvh_arrays)(lo, hi)

    # Primitive rows in sorted order (host gather; cheap relative to build).
    from tpu_pt.bvh.native import _prim_rows

    pid = np.asarray(perm)
    return PackedBVH.build(nodes=np.asarray(table),
                           prims=_prim_rows(scene, pid),
                           prim_gid=pid, max_leaf=1)
