"""Native (C++) BVH builder: bit-parity with the NumPy builder.

The native builder (rustracer_tpu/native/bvh_builder.cpp) must produce the
exact tree of accel/bvh.py::build_bvh — same DFS preorder, same SAH split
decisions (reference semantics: rustracer-core/src/bvh/mod.rs:202-287).
"""
import numpy as np
import pytest

from rustracer_tpu.accel.bvh import build_bvh
from rustracer_tpu.native import build_bvh_native, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain")


@pytest.mark.parametrize("n", [1, 2, 3, 7, 64, 513, 4096])
@pytest.mark.parametrize("split", ["sah", "middle"])
def test_native_matches_python(n, split):
    rng = np.random.default_rng(n)
    c = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    e = rng.uniform(0.01, 0.5, (n, 3)).astype(np.float32)
    got = build_bvh_native(c - e, c + e, split, 4)
    want = build_bvh(c - e, c + e, split, 4)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_native_degenerate_coincident_centroids():
    # all centroids identical -> leaf-chain path (count > max_prims)
    n = 23
    lo = np.zeros((n, 3), np.float32)
    hi = np.ones((n, 3), np.float32)
    got = build_bvh_native(lo, hi, "sah", 4)
    want = build_bvh(lo, hi, "sah", 4)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    # every prim appears exactly once
    assert sorted(got[3].tolist()) == list(range(n))
