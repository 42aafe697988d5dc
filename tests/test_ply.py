"""PLY loader/exporter: roundtrips, endianness, quads, parser integration.

Reference: rustracer-core/src/shapes/plymesh.rs:18-242 (reader via the
ply-rs crate; x/y/z, nx/ny/nz, u/v properties, tri/quad faces). The
exporter (write_ply) is repo-only, used to exercise the loader at scale in
bench.py.
"""
import os
import struct

import numpy as np
import pytest

from rustracer_tpu.utils.plyio import read_ply, write_ply


def small_mesh():
    p = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0], [0.5, 0.5, 1]],
                 np.float32)
    n = np.tile(np.array([[0, 0, 1]], np.float32), (5, 1))
    uv = p[:, :2].copy()
    idx = np.array([[0, 1, 2], [0, 2, 3], [0, 1, 4]], np.int32)
    return p, n, uv, idx


class TestPlyRoundtrip:
    @pytest.mark.parametrize("binary", [True, False])
    def test_roundtrip(self, tmp_path, binary):
        p, n, uv, idx = small_mesh()
        path = str(tmp_path / "m.ply")
        write_ply(path, p, idx, n=n, uv=uv, binary=binary)
        rp, rn, ruv, ridx = read_ply(path)
        np.testing.assert_array_equal(rp, p)
        np.testing.assert_array_equal(rn, n)
        np.testing.assert_array_equal(ruv, uv)
        np.testing.assert_array_equal(ridx, idx)

    def test_positions_only(self, tmp_path):
        p, _, _, idx = small_mesh()
        path = str(tmp_path / "m.ply")
        write_ply(path, p, idx)
        rp, rn, ruv, ridx = read_ply(path)
        np.testing.assert_array_equal(rp, p)
        assert rn is None and ruv is None
        np.testing.assert_array_equal(ridx, idx)

    def test_big_endian(self, tmp_path):
        """Hand-built binary_big_endian file (plymesh.rs handles both)."""
        p = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]], np.float32)
        path = str(tmp_path / "be.ply")
        with open(path, "wb") as f:
            f.write(b"ply\nformat binary_big_endian 1.0\n"
                    b"element vertex 3\n"
                    b"property float x\nproperty float y\nproperty float z\n"
                    b"element face 1\n"
                    b"property list uchar int vertex_indices\nend_header\n")
            f.write(p.astype(">f4").tobytes())
            f.write(struct.pack(">B3i", 3, 0, 1, 2))
        rp, _, _, ridx = read_ply(path)
        np.testing.assert_array_equal(rp, p)
        np.testing.assert_array_equal(ridx, [[0, 1, 2]])

    def test_quads_fan_triangulated(self, tmp_path):
        p = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
        path = str(tmp_path / "q.ply")
        with open(path, "wb") as f:
            f.write(b"ply\nformat ascii 1.0\nelement vertex 4\n"
                    b"property float x\nproperty float y\nproperty float z\n"
                    b"element face 1\n"
                    b"property list uchar int vertex_indices\nend_header\n")
            for row in p:
                f.write((" ".join(str(float(x)) for x in row) + "\n").encode())
            f.write(b"4 0 1 2 3\n")
        _, _, _, ridx = read_ply(path)
        np.testing.assert_array_equal(ridx, [[0, 1, 2], [0, 2, 3]])

    def test_scale_roundtrip(self, tmp_path):
        """10k-tri procedural mesh survives bit-exactly (the bench.py path)."""
        from rustracer_tpu.utils.meshgen import bumpy_sphere
        v, n, f = bumpy_sphere(subdivisions=4)
        path = str(tmp_path / "big.ply")
        write_ply(path, v, f, n=n)
        rp, rn, _, ridx = read_ply(path)
        np.testing.assert_array_equal(rp, v)
        np.testing.assert_array_equal(rn, n)
        np.testing.assert_array_equal(ridx, f)


class TestPlyParserIntegration:
    def test_plymesh_shape_through_parser(self, tmp_path):
        """Shape "plymesh" end-to-end (api.rs plymesh factory)."""
        from rustracer_tpu.scene.api import parse_scene
        p, n, uv, idx = small_mesh()
        write_ply(str(tmp_path / "m.ply"), p, idx, n=n, uv=uv)
        scene = tmp_path / "s.pbrt"
        scene.write_text("""
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Camera "perspective"
WorldBegin
  Shape "plymesh" "string filename" "m.ply"
WorldEnd
""")
        api = parse_scene(str(scene))
        geom = api.scene.geom
        assert int(np.asarray(geom.t_idx).shape[0]) >= 3
