"""Prototype: row gather from a VMEM-resident table inside a Pallas kernel.

The r5 fused-descent design (docs/r5-descent-kernel.md) hinges on one
question: can Mosaic gather (P,) dynamic rows from a small VMEM table
(child AABB tables are 30 KB / 238 KB bf16 on the bench scene) faster than
XLA's HBM row gather (~0.83-0.86 ms for the descent shapes, 21-44 GB/s)?
This benchmarks a block kernel that loads rows one sublane-group at a time
via dynamic indexing, against the XLA gather — both producing identical
(P, 64) f32 outputs.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/microbench_vmem_gather.py

RESULT (r4, v5e, jax 0.9): NEGATIVE — Mosaic rejects every sublane-indexed
VMEM gather form tried (single-row dynamic slice: "cannot statically prove
that index in dimension 0 is a multiple of 8"; jnp.take on axis 0: shape
mismatch; take_along_axis on axis 0: lowering AssertionError).  Kept as
the regression harness: if a future Mosaic adds sublane gather, this is
the benchmark to re-run.  Until then the r5 kernel's fetch plan is the
in-VMEM one-hot MXU matmul (docs/r5-descent-kernel.md step 3).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 512    # rows per program instance


def _kernel(idx_ref, table_ref, out_ref):
    """idx block (B,) i32 in SMEM; table (N, 64) bf16 in VMEM; out (B, 64)
    f32 in VMEM.  8 dynamic single-row loads per unrolled step keep the
    scalar-indexed loads pipelined."""
    def body(i, _):
        for k in range(8):
            r = idx_ref[i * 8 + k]
            out_ref[i * 8 + k, :] = table_ref[r, :].astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, B // 8, body, 0, unroll=True)


@functools.partial(jax.jit, static_argnames=())
def vmem_gather(table16, idx):
    P = idx.shape[0]
    assert P % B == 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,            # idx in SMEM, whole array
        grid=(P // B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # table resident
        ],
        out_specs=pl.BlockSpec((B, 64), lambda i, idx_ref: (i, 0),
                               memory_space=pltpu.VMEM),
    )

    def kern(idx_ref, table_ref, out_ref):
        i0 = pl.program_id(0) * B

        def body(i, _):
            for k in range(8):
                r = idx_ref[i0 + i * 8 + k]
                out_ref[i * 8 + k, :] = table_ref[r, :].astype(jnp.float32)
            return 0

        jax.lax.fori_loop(0, B // 8, body, 0, unroll=True)

    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, 64), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(idx, table16)


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


def main():
    for P, N in ((4096 * 34, 233), (4096 * 59, 1864)):
        P = (P // B) * B
        k1, k2 = jax.random.split(jax.random.key(1))
        table16 = jax.random.normal(k1, (N, 64), jnp.float32).astype(
            jnp.bfloat16)
        idx = jax.random.randint(k2, (P,), 0, N, jnp.int32)

        r_ref = np.asarray(table16[idx].astype(jnp.float32))
        r_krn = np.asarray(vmem_gather(table16, idx))
        assert np.array_equal(r_ref, r_krn), "kernel gather mismatch"

        dt_x = timed(lambda: table16[idx].astype(jnp.float32)) * 1e3
        dt_k = timed(lambda: vmem_gather(table16, idx)) * 1e3
        mb = P * 128 / 1e6
        print(f"P={P:7d} N={N:5d}: xla-gather {dt_x:7.3f} ms "
              f"({mb/dt_x:6.1f} GB/s)  vmem-kernel {dt_k:7.3f} ms "
              f"({mb/dt_k:6.1f} GB/s)")
    print("outputs bit-identical: OK")


if __name__ == "__main__":
    main()
