"""Empirical feasibility + cost matrix for Mosaic's tpu.dynamic_gather.

jax 0.9's Pallas lowering (jax/_src/pallas/mosaic/lowering.py:2464) DOES
support lax.gather -> tpu.dynamic_gather for the SAME-SHAPE batched form
(src, idx, out all (M, N)):
  dim 0: out[s, l] = src[idx[s, l], l]   (sublane gather, per lane)
  dim 1: out[s, l] = src[s, idx[s, l]]   (lane gather, per sublane row)
r4's negative result hit the row-fetch forms (idx shape != src shape);
the same-shape form was never probed.  This measures, per (dim, M, N):
lowers-or-not, correctness, and ns/element — the data the fused descent
kernel design needs, since a cheap dim-0 gather at (256, 128) IS the
child-row fetch (table rows on sublanes, one fetched row per output
sublane), and a cheap dim-1 gather at (B, 512) is the per-ray
slot-relative fetch.

Run: python tools/microbench_dyngather.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gather_kernel(dim: int):
    def kern(src_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=dim)
    return kern


def run_case(dim, M, N, reps, dtype=jnp.float32):
    """One pallas_call doing `reps` chained same-shape gathers (to amortize
    call overhead and defeat CSE via data dependence)."""
    k1, k2 = jax.random.split(jax.random.key(0))
    src = jax.random.normal(k1, (M, N), jnp.float32).astype(dtype)
    idx = jax.random.randint(k2, (M, N), 0, M if dim == 0 else N, jnp.int32)

    def kern(src_ref, idx_ref, out_ref):
        x = src_ref[:]
        ix = idx_ref[:]
        for _ in range(reps):
            x = jnp.take_along_axis(x, ix, axis=dim)
        out_ref[:] = x

    fn = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), dtype),
        interpret=jax.default_backend() != "tpu",
    )
    jfn = jax.jit(lambda s, i: fn(s, i))
    try:
        out = np.asarray(jfn(src, idx))
    except Exception as e:  # noqa: BLE001 — feasibility probe
        msg = str(e).replace("\n", " ")[:110]
        print(f"  dim={dim} ({M:5d},{N:5d}) {np.dtype(dtype).name:8s} "
              f"FAIL {type(e).__name__}: {msg}")
        return

    # correctness vs numpy (single application, reps=1 case only)
    if reps == 1:
        s = np.asarray(src)
        i = np.asarray(idx)
        ref = np.take_along_axis(s, i, axis=dim)
        ok = np.array_equal(ref, out)
    else:
        ok = None

    @jax.jit
    def loop(s, i):
        def body(acc, _):
            o = jfn(s, i)
            return acc + o[0, 0].astype(jnp.float32) * 1e-20, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=20)
        return acc

    float(np.asarray(loop(src, idx)))
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(loop(src, idx)))
        ts.append(time.time() - t0)
    dt = min(ts) / 20 / max(reps, 1)
    ns_el = dt * 1e9 / (M * N)
    print(f"  dim={dim} ({M:5d},{N:5d}) {np.dtype(dtype).name:8s} "
          f"{dt*1e6:9.2f} us/gather  {ns_el:7.3f} ns/el"
          + (f"  exact={ok}" if ok is not None else ""))


def main():
    print(f"backend={jax.default_backend()}")
    print("feasibility (reps=1, correctness-checked):")
    for dim in (0, 1):
        for M, N in ((8, 128), (8, 512), (64, 128), (256, 128), (256, 512),
                     (256, 2048), (2048, 128)):
            run_case(dim, M, N, reps=1)
    print("cost (reps=16 chained, call overhead amortized):")
    for dim in (0, 1):
        for M, N in ((8, 512), (256, 128), (256, 512), (256, 2048),
                     (2048, 128)):
            run_case(dim, M, N, reps=16)
    print("bf16:")
    run_case(0, 256, 128, reps=16, dtype=jnp.bfloat16)
    run_case(1, 256, 512, reps=16, dtype=jnp.bfloat16)
    print("int32:")
    run_case(1, 256, 512, reps=16, dtype=jnp.int32)


if __name__ == "__main__":
    main()
