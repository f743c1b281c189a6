"""Codec + PLY round-trip tests (reference analogues:
src/read_write/codec.rs:150-213, src/read_write/ply.rs:734-837)."""

import numpy as np
import pytest

from point_cloud_viewer_tpu.core.points_batch import PointsBatch
from point_cloud_viewer_tpu.io.ply import PlyReader, write_ply
from point_cloud_viewer_tpu.ops.codec import (
    PositionEncoding,
    decode_positions,
    encode_positions,
    position_encoding_for,
)

REFERENCE_PLYS = "/root/reference/src/test_data"


def test_position_encoding_selection():
    # min_bits = trunc(log2(edge/res)) + 1
    assert position_encoding_for(2.0, 1.0) == PositionEncoding.UINT8  # 2 bits
    assert position_encoding_for(255.0, 1.0) == PositionEncoding.UINT8  # 8 bits
    assert position_encoding_for(256.0, 1.0) == PositionEncoding.UINT16  # 9 bits
    assert position_encoding_for(65535.0, 1.0) == PositionEncoding.UINT16
    assert position_encoding_for(65536.0, 1.0) == PositionEncoding.FLOAT32
    assert position_encoding_for(2.0**24 - 1, 1.0) == PositionEncoding.FLOAT32
    assert position_encoding_for(2.0**24, 1.0) == PositionEncoding.FLOAT64
    assert position_encoding_for(0.5, 1.0) == PositionEncoding.UINT8


@pytest.mark.parametrize(
    "encoding,tol",
    [
        (PositionEncoding.UINT8, 2.0 / 255),
        (PositionEncoding.UINT16, 2.0 / 65535),
        (PositionEncoding.FLOAT32, 1e-6),
        (PositionEncoding.FLOAT64, 1e-12),
    ],
)
def test_fixpoint_roundtrip(encoding, tol):
    rng = np.random.default_rng(42)
    cube_min = np.array([40.0, -3.0, 7.5])
    edge = 2.0
    pts = cube_min + rng.random((1000, 3)) * edge
    enc = encode_positions(pts, cube_min, edge, encoding)
    assert enc.dtype == encoding.numpy_dtype
    dec = decode_positions(enc, cube_min, edge, encoding)
    assert np.abs(dec - pts).max() < tol * 1.01


def test_fixpoint_scalar_reference_values():
    # The reference codec test values (codec.rs:180-213).
    v, mn, edge = 41.33333, 40.0, 2.0
    for enc, tol in [
        (PositionEncoding.UINT8, 1e-2),
        (PositionEncoding.UINT16, 1e-4),
    ]:
        e = encode_positions(np.array([[v, v, v]]), np.full(3, mn), edge, enc)
        d = decode_positions(e, np.full(3, mn), edge, enc)
        assert abs(d[0, 0] - v) < tol


def test_encode_clamps_out_of_cube():
    cube_min = np.zeros(3)
    pts = np.array([[-1.0, 0.5, 3.0]])  # outside the [0,2] cube in x and z
    enc = encode_positions(pts, cube_min, 2.0, PositionEncoding.UINT16)
    assert enc[0, 0] == 0 and enc[0, 2] == 65535


def test_read_reference_ply_rgb():
    r = PlyReader(f"{REFERENCE_PLYS}/xyz_f32_rgb_u8_le.ply")
    batch = r.read_all()
    assert len(batch) == 8
    assert "color" in batch.attributes
    assert batch.attributes["color"].shape == (8, 3)
    assert batch.attributes["color"].dtype == np.uint8
    assert batch.position.dtype == np.float64


def test_read_reference_ply_intensity():
    r = PlyReader(f"{REFERENCE_PLYS}/xyz_f32_rgb_u8_intensity_f32.ply")
    batch = r.read_all()
    assert len(batch) == 8
    assert set(batch.attributes) == {"color", "intensity"}
    assert batch.attributes["intensity"].dtype == np.float32


def test_read_reference_ply_rgba_skips_alpha():
    r = PlyReader(f"{REFERENCE_PLYS}/xyz_f32_rgba_u8_le.ply")
    batch = r.read_all()
    assert len(batch) == 8
    assert set(batch.attributes) == {"color"}


def test_ply_write_read_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    batch = PointsBatch(
        position=rng.random((100, 3)) * 10 - 5,
        attributes={
            "color": rng.integers(0, 256, (100, 3), dtype=np.uint8),
            "intensity": rng.random(100).astype(np.float32),
            "timestamp": rng.integers(0, 2**40, 100).astype(np.uint64),
        },
    )
    path = str(tmp_path / "out.ply")
    write_ply(path, batch)
    back = PlyReader(path).read_all()
    np.testing.assert_allclose(back.position, batch.position, atol=0)
    np.testing.assert_array_equal(back.attributes["color"], batch.attributes["color"])
    np.testing.assert_array_equal(
        back.attributes["intensity"], batch.attributes["intensity"]
    )
    np.testing.assert_array_equal(
        back.attributes["timestamp"], batch.attributes["timestamp"]
    )


def test_ply_offset_comment(tmp_path):
    batch = PointsBatch(position=np.array([[1.0, 2.0, 3.0]]))
    path = str(tmp_path / "o.ply")
    write_ply(path, batch, offset=np.array([100.0, 200.0, 300.0]))
    header = open(path, "rb").read(200)
    assert b"comment offset: 100.0 200.0 300.0" in header
    back = PlyReader(path).read_all()
    np.testing.assert_allclose(back.position, batch.position)


def test_ply_stream_writer_patches_count(tmp_path):
    from point_cloud_viewer_tpu.io.ply import PlyStreamWriter

    rng = np.random.default_rng(9)
    path = str(tmp_path / "stream.ply")
    with PlyStreamWriter(path) as w:
        for _ in range(3):
            w.write(
                PointsBatch(
                    position=rng.random((100, 3)),
                    attributes={"color": rng.integers(0, 255, (100, 3), dtype=np.uint8)},
                )
            )
    back = PlyReader(path).read_all()
    assert len(back) == 300
    assert set(back.attributes) == {"color"}


def test_ply_stream_writer_append(tmp_path):
    from point_cloud_viewer_tpu.io.ply import PlyStreamWriter

    rng = np.random.default_rng(10)
    path = str(tmp_path / "append.ply")
    b1 = PointsBatch(position=rng.random((50, 3)))
    b2 = PointsBatch(position=rng.random((70, 3)))
    with PlyStreamWriter(path) as w:
        w.write(b1)
    with PlyStreamWriter(path, append=True) as w:
        w.write(b2)
    back = PlyReader(path).read_all()
    assert len(back) == 120
    np.testing.assert_allclose(back.position[:50], b1.position)
    np.testing.assert_allclose(back.position[50:], b2.position)


def test_ply_stream_writer_rejects_schema_mismatch(tmp_path):
    """A batch whose record layout differs from the file's declared header
    must raise — on a later write AND on append — instead of silently
    desynchronizing the body from the property list."""
    from point_cloud_viewer_tpu.io.ply import PlyStreamWriter

    rng = np.random.default_rng(11)
    path = str(tmp_path / "schema.ply")
    with_color = PointsBatch(
        position=rng.random((10, 3)),
        attributes={"color": rng.integers(0, 255, (10, 3), dtype=np.uint8)},
    )
    plain = PointsBatch(position=rng.random((10, 3)))
    with_f32 = PointsBatch(
        position=rng.random((10, 3)),
        attributes={"intensity": rng.random(10).astype(np.float32)},
    )
    with PlyStreamWriter(path) as w:
        w.write(with_color)
        with pytest.raises(ValueError, match="does not match"):
            w.write(plain)
        w.write(with_color)  # matching batches still fine
    with PlyStreamWriter(path, append=True) as w:
        with pytest.raises(ValueError, match="does not match"):
            w.write(with_f32)
        w.write(with_color)
    back = PlyReader(path).read_all()
    assert len(back) == 30 and set(back.attributes) == {"color"}


def test_ply_reader_rejects_non_u8_color(tmp_path):
    """The reference only accepts uchar r/g/b (read_write/ply.rs:467-469);
    a float color channel must raise, not silently truncate into u8."""
    path = str(tmp_path / "floatcolor.ply")
    header = (
        "ply\nformat binary_little_endian 1.0\nelement vertex 2\n"
        "property double x\nproperty double y\nproperty double z\n"
        "property float red\nproperty float green\nproperty float blue\n"
        "end_header\n"
    )
    rec = np.zeros(2, dtype=[("x", "<f8"), ("y", "<f8"), ("z", "<f8"),
                             ("r", "<f4"), ("g", "<f4"), ("b", "<f4")])
    rec["r"] = [0.25, 0.75]
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(rec.tobytes())
    with pytest.raises(ValueError, match="must be uchar"):
        PlyReader(path).read_all()


def test_export_ply_cli(tmp_path, capsys):
    from point_cloud_viewer_tpu.cli import build_octree as cli_build
    from point_cloud_viewer_tpu.cli import export_ply as cli_export

    out = str(tmp_path / "oct")
    cli_build.main(
        ["/root/reference/src/test_data/xyz_f32_rgb_u8_le.ply",
         "--output_directory", out]
    )
    ply_out = str(tmp_path / "exported.ply")
    assert cli_export.main([out, "--output", ply_out]) == 0
    assert "Wrote 8 points" in capsys.readouterr().out
    back = PlyReader(ply_out).read_all()
    assert len(back) == 8
