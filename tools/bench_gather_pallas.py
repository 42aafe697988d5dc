"""Can a Pallas kernel with manual row DMAs beat XLA's gather lowering?

The wide-BVH traversal (accel/traverse16.py) is bound by incoherent
512-byte row gathers from HBM (docs/PERF.md). XLA lowers `table[idx]` to
its own gather; this microbenchmark pits that against a Pallas kernel that
issues one async HBM->VMEM DMA per row with a deep in-flight window —
the candidate mechanism for a faster traversal inner loop.

Usage: python tools/bench_gather_pallas.py [log2_rows] [log2_batch]
Prints a table: XLA gather vs pallas DMA window sizes, M rows/s.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_gather(table, idx, blk=512, nslot=8):
    """out[i] = table[idx[i]] via per-row DMAs, `nslot` in flight.

    idx arrives as per-block (blk,) SMEM slabs — prefetching the whole
    index array through PrefetchScalarGridSpec overflows SMEM past ~1 MB
    (the round-3 HTTP-500 compile failure at B=1M)."""
    B = idx.shape[0]
    R, W = table.shape
    assert B % blk == 0

    C = blk // 8   # SMEM idx block is (1, 8, C): last-2 dims pass the
                   # (÷8, ==array-dim) tiling constraint

    def kernel(idx_ref, table_ref, out_ref, sems):
        def start(i):
            row = idx_ref[0, i // C, i % C]
            # 2-D (1, W) slices: Mosaic DMAs want tiled (sublane, lane) refs
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(row, 1), :], out_ref.at[pl.ds(i, 1), :],
                sems.at[i % nslot])

        # prime the window
        for i in range(nslot):
            start(i).start()

        def body(i, _):
            # wait slot, then reuse it for row i+nslot
            start(i).wait()   # same (src-shape, dst, sem) as the start above

            @pl.when(i + nslot < blk)
            def _():
                start(i + nslot).start()
            return 0

        jax.lax.fori_loop(0, blk, body, 0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, W), table.dtype),
        grid=(B // blk,),
        in_specs=[pl.BlockSpec((1, 8, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((blk, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((nslot,))],
    )(idx.reshape(B // blk, 8, C), table)


def timed(f, *args, reps=5):
    # device-side reduce + scalar transfer: np.asarray of the (B, 128)
    # output would time the axon host tunnel (~512 MB), not the gather
    red = jax.jit(lambda *a: jnp.sum(f(*a)))
    np.asarray(red(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(red(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    lr = int(sys.argv[1]) if len(sys.argv) > 1 else 17   # 131k rows = 64 MB
    lb = int(sys.argv[2]) if len(sys.argv) > 2 else 20   # 1M gathers
    R, B = 1 << lr, 1 << lb
    rs = np.random.RandomState(0)
    table = jnp.asarray(rs.rand(R, 128), jnp.float32)
    idx = jnp.asarray(rs.randint(0, R, B), jnp.int32)
    print(f"table {R}x128 f32 ({R*512/2**20:.0f} MB), {B} random rows",
          file=sys.stderr)

    xla = jax.jit(lambda t, i: t[i])
    dt = timed(xla, table, idx)
    # correctness via a weighted checksum (full output would cross the
    # axon host tunnel)
    w = jnp.asarray(rs.rand(128), jnp.float32)
    csum = jax.jit(lambda t, i, f=xla: jnp.sum(f(t, i) * w))
    ref = float(csum(table, idx))
    print(f"xla-gather                : {dt*1e3:7.2f} ms  "
          f"{B/dt/1e6:7.1f} M rows/s")

    for nslot in (4, 8, 16, 32):
        try:
            f = jax.jit(functools.partial(pallas_gather, nslot=nslot))
            dt = timed(f, table, idx)
            got = float(jax.jit(
                lambda t, i: jnp.sum(f(t, i) * w))(table, idx))
            ok = abs(got - ref) <= 1e-6 * abs(ref)
            print(f"pallas-dma window={nslot:3d}    : {dt*1e3:7.2f} ms  "
                  f"{B/dt/1e6:7.1f} M rows/s  correct={ok}")
        except Exception as e:
            print(f"pallas-dma window={nslot:3d}    : FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
