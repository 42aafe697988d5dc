"""Cornell fwd+bwd sweep (round-5 item 3): remat x compaction combos.

The round-4 record: 1.18 Mray/s with jax.checkpoint per sample and
compaction off (its scatter transposes cost ~14%). Round 5 added a
custom-vjp permutation compact (path.perm_take/perm_put) whose transpose
is a masked gather; this sweeps all four combos to pick the bench combo.
Usage: python tools/exp_fwdbwd.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bench import build_cornell, bench_cornell_fwdbwd, log


def main():
    ctx, cam, film, sampler, integ = build_cornell()
    for remat in (True, False):
        for compact in (False, True):
            try:
                r = bench_cornell_fwdbwd(ctx, cam, film, sampler, integ,
                                         n_runs=3, remat=remat,
                                         compact=compact)
                print(f"remat={remat} compact={compact}: "
                      f"{r/1e6:6.3f} Mray/s", flush=True)
            except Exception as e:
                print(f"remat={remat} compact={compact}: FAILED {e!r}",
                      flush=True)


if __name__ == "__main__":
    main()
