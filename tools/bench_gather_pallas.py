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
    """out[i] = table[idx[i]] via per-row DMAs, `nslot` in flight."""
    B = idx.shape[0]
    R, W = table.shape
    assert B % blk == 0

    def kernel(idx_ref, table_ref, out_ref, sems):
        base = pl.program_id(0) * blk

        def start(i):
            row = idx_ref[base + i]
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // blk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((blk, W), lambda i, idx_ref: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((nslot,))],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, W), table.dtype),
        grid_spec=grid_spec,
    )(idx, table)


def timed(f, *args, reps=5):
    out = f(*args)
    np.asarray(out)             # force real completion (axon: see PERF.md)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        np.asarray(out[0] if isinstance(out, tuple) else out)
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
    ref = np.asarray(xla(table, idx))
    print(f"xla-gather                : {dt*1e3:7.2f} ms  "
          f"{B/dt/1e6:7.1f} M rows/s")

    for nslot in (4, 8, 16, 32):
        try:
            f = jax.jit(functools.partial(pallas_gather, nslot=nslot))
            dt = timed(f, table, idx)
            ok = np.array_equal(np.asarray(f(table, idx)), ref)
            print(f"pallas-dma window={nslot:3d}    : {dt*1e3:7.2f} ms  "
                  f"{B/dt/1e6:7.1f} M rows/s  correct={ok}")
        except Exception as e:
            print(f"pallas-dma window={nslot:3d}    : FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
