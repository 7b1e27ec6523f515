"""r5 fetch-primitive shootout for the fused descent kernel.

The fused-descent design (docs/r5-descent-kernel.md) needs, inside a
Pallas kernel, "fetch row idx[p] of a VMEM-resident (N, 64) bf16 child
table" at the descent's two gather shapes (P=Q*cap rows from N=233 and
N=1864 tables).  r4 proved Mosaic rejects every SUBLANE-indexed form
(tools/microbench_vmem_gather.py).  This benchmarks the remaining
vectorized candidates against the XLA HBM row gather baseline:

  A. one-hot MXU: build (B, Npad) 0/1 bf16 one-hot rows in registers,
     matmul against the resident (Npad, 64) table (exact: each output row
     is a single-row sum, f32 accumulation).
  B. lane gather: table stored transposed (64, Npad); per 8-field sublane
     group, jnp.take_along_axis(tab[f8], idx2d, axis=1) — Mosaic's gather
     unit is lane-oriented, so THIS axis may be supported where the
     sublane axis was not.  Output transposed (64, P) — which is the SoA
     layout the slab test wants anyway.
  C. grouped wide rows (the hierarchy trick): fetching 8 sibling rows as
     ONE (512,)-wide row of a (N/8, 512) grouped table makes the one-hot
     compare cost per fetched element 8x cheaper (same one-hot serves 512
     output lanes).  Measured at the L1 shape where the descent would use
     it: fetch Q*cap0 grouped rows covering cap0*8 children.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/microbench_fetch_kernel.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 256    # fetched rows per program (variant A/C)
L = 512    # fetched lanes per program (variant B)


def _interp() -> bool:
    return jax.default_backend() != "tpu"


def _pad_lanes(n: int) -> int:
    return -(-n // 128) * 128


# -- variant A: one-hot MXU fetch -------------------------------------------

def onehot_fetch(table16, idx):
    """table16 (N, 64) bf16, idx (P,) i32 -> (P, 64) f32 rows."""
    N, W = table16.shape
    Np = _pad_lanes(N)
    tab = jnp.zeros((Np, W), jnp.bfloat16).at[:N].set(table16)
    P = idx.shape[0]
    assert P % B == 0

    def kern(idx_ref, tab_ref, out_ref):
        ids = jax.lax.broadcasted_iota(jnp.int32, (B, Np), 1)
        oh = (ids == idx_ref[:]).astype(jnp.bfloat16)
        out_ref[:] = jnp.dot(oh, tab_ref[:],
                             preferred_element_type=jnp.float32)

    return pl.pallas_call(
        kern,
        grid=(P // B,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, W), jnp.float32),
        interpret=_interp(),
    )(idx[:, None], tab)


# -- variant B: lane-axis take_along_axis gather ----------------------------

def lane_gather_fetch(table16, idx):
    """table16 (N, 64) bf16, idx (P,) i32 -> (64, P) f32 (SoA: field rows,
    fetched entries on lanes)."""
    N, W = table16.shape
    Np = _pad_lanes(N)
    tabT = jnp.zeros((W, Np), jnp.float32).at[:, :N].set(
        table16.T.astype(jnp.float32))
    P = idx.shape[0]
    assert P % L == 0
    idx2 = jnp.broadcast_to(idx[None, :], (8, P))

    def kern(idx_ref, tab_ref, out_ref):
        ix = idx_ref[:]
        for f in range(W // 8):
            out_ref[f * 8:(f + 1) * 8, :] = jnp.take_along_axis(
                tab_ref[f * 8:(f + 1) * 8, :], ix, axis=1)

    return pl.pallas_call(
        kern,
        grid=(P // L,),
        in_specs=[
            pl.BlockSpec((8, L), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((W, L), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, P), jnp.float32),
        interpret=_interp(),
    )(idx2, tabT)


# -- variant C: grouped wide-row one-hot fetch ------------------------------

def grouped_fetch(grouped16, idx):
    """grouped16 (G, 512) bf16 (8 sibling 64-rows concatenated), idx (P,)
    i32 -> (P, 512) f32."""
    G, W = grouped16.shape
    Gp = _pad_lanes(G)
    tab = jnp.zeros((Gp, W), jnp.bfloat16).at[:G].set(grouped16)
    P = idx.shape[0]
    Bc = 128
    assert P % Bc == 0

    def kern(idx_ref, tab_ref, out_ref):
        ids = jax.lax.broadcasted_iota(jnp.int32, (Bc, Gp), 1)
        oh = (ids == idx_ref[:]).astype(jnp.bfloat16)
        out_ref[:] = jnp.dot(oh, tab_ref[:],
                             preferred_element_type=jnp.float32)

    return pl.pallas_call(
        kern,
        grid=(P // Bc,),
        in_specs=[
            pl.BlockSpec((Bc, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bc, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, W), jnp.float32),
        interpret=_interp(),
    )(idx[:, None], tab)


def timed(fn, *args, iters=30):
    @jax.jit
    def loop(*a):
        def body(acc, _):
            out = fn(*a)
            return acc + out[0, 0] * 1e-20, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return acc

    float(np.asarray(loop(*args)))
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(loop(*args)))
        ts.append(time.time() - t0)
    return min(ts) / iters


def bench_shape(name, P, N, jit_variants):
    k1, k2 = jax.random.split(jax.random.key(1))
    table16 = jax.random.normal(k1, (N, 64), jnp.float32).astype(jnp.bfloat16)
    idx = jax.random.randint(k2, (P,), 0, N, jnp.int32)
    ref = np.asarray(table16[idx].astype(jnp.float32))
    mb = P * 64 * 4 / 1e6
    print(f"-- {name}: P={P} N={N} ({mb:.0f} MB out)")

    dt = timed(lambda t, i: t[i].astype(jnp.float32), table16, idx) * 1e3
    print(f"   xla row gather     {dt:7.3f} ms ({mb/dt:6.1f} GB/s)")

    for vname, fn, check in jit_variants:
        try:
            out = np.asarray(fn(table16, idx))
            ok = check(ref, out)
            dt = timed(fn, table16, idx) * 1e3
            print(f"   {vname:<18} {dt:7.3f} ms ({mb/dt:6.1f} GB/s) "
                  f"exact={ok}")
        except Exception as e:  # noqa: BLE001 — record which forms lower
            msg = str(e).replace("\n", " ")[:160]
            print(f"   {vname:<18} FAILED: {type(e).__name__}: {msg}")


def main():
    print(f"backend={jax.default_backend()}")
    va = ("onehot-mxu", jax.jit(onehot_fetch),
          lambda r, o: np.array_equal(r, o))
    vb = ("lane-gather", jax.jit(lane_gather_fetch),
          lambda r, o: np.array_equal(r.T, o))
    # descent shapes: L1 fetch (cap0=34 rows/ray from N=233), L2 fetch
    # (cap1=59 rows/ray from N=1864), Q=4096
    bench_shape("L1", 4096 * 34 // B * B, 233, [va, vb])
    bench_shape("L2", 4096 * 59 // B * B, 1864, [va, vb])

    # grouped wide-row fetch at the L1 shape: 34 grouped rows/ray from the
    # (233, 512) grouped form of the L2 table — covers all 272 children.
    P = 4096 * 34 // 128 * 128
    N = 1864
    k1, k2 = jax.random.split(jax.random.key(2))
    t16 = jax.random.normal(k1, (N, 64), jnp.float32).astype(jnp.bfloat16)
    grouped = t16.reshape(N // 8, 512)
    idx = jax.random.randint(k2, (P,), 0, N // 8, jnp.int32)
    ref = np.asarray(grouped[idx].astype(jnp.float32))
    mb = P * 512 * 4 / 1e6
    print(f"-- grouped: P={P} G={N//8} ({mb:.0f} MB out)")
    dt = timed(lambda t, i: t[i].astype(jnp.float32), grouped, idx) * 1e3
    print(f"   xla row gather     {dt:7.3f} ms ({mb/dt:6.1f} GB/s)")
    fn = jax.jit(grouped_fetch)
    out = np.asarray(fn(grouped, idx))
    ok = np.array_equal(ref, out)
    dt = timed(fn, grouped, idx) * 1e3
    print(f"   grouped-onehot     {dt:7.3f} ms ({mb/dt:6.1f} GB/s) "
          f"exact={ok}")


if __name__ == "__main__":
    main()
