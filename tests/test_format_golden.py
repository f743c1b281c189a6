"""Literal format-contract golden vectors.

Unlike tests/test_golden.py (which freezes THIS framework's output against
itself), every expected byte here is hand-derived from the reference's
formulas and wire contract and checked in as a literal:

* position codec bytes from src/read_write/codec.rs:85-139
  (t = clamp((p - min)/edge, 0, 1); u8/u16 truncating casts; f32/f64
  normalized IEEE-754 little-endian),
* meta.pb bytes from point_viewer_proto_rust/src/proto.proto:17-149 +
  the proto3 wire spec (each byte annotated below),
* independently re-parsed with google.protobuf using a descriptor compiled
  BY protoc FROM THE REFERENCE'S OWN .proto file — no code of ours in that
  loop.
"""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from point_cloud_viewer_tpu.ops.codec import PositionEncoding, encode_positions

# Node cube min=(1,1,1), edge=2.  Three points with exact binary fractions:
#   (1.0, 1.0, 1.0) -> t = (0,    0,    0)
#   (3.0, 3.0, 3.0) -> t = (1,    1,    1)
#   (2.0, 1.5, 3.0) -> t = (0.5,  0.25, 1)
_POINTS = np.array([[1.0, 1.0, 1.0], [3.0, 3.0, 3.0], [2.0, 1.5, 3.0]])
_MIN = np.ones((3, 3))
_EDGE = np.full(3, 2.0)

# u8:  trunc(t*255)  ->  0,0,0 | 255,255,255 | 127 (127.5), 63 (63.75), 255
_U8 = bytes.fromhex("000000" "ffffff" "7f3fff")
# u16: trunc(t*65535) -> 0|65535|32767=0x7fff, 16383=0x3fff, 65535 (LE)
_U16 = bytes.fromhex("000000000000" "ffffffffffff" "ff7fff3fffff")
# f32: IEEE-754 LE: 0=00000000, 1=0000803f, 0.5=0000003f, 0.25=0000803e
_F32 = bytes.fromhex(
    "000000000000000000000000"
    "0000803f0000803f0000803f"
    "0000003f0000803e0000803f"
)
# f64: 0=0x0, 1=0x3ff0..., 0.5=0x3fe0..., 0.25=0x3fd0... (LE)
_F64 = bytes.fromhex(
    "000000000000000000000000000000000000000000000000"
    "000000000000f03f000000000000f03f000000000000f03f"
    "000000000000e03f000000000000d03f000000000000f03f"
)


@pytest.mark.parametrize(
    "encoding,expected",
    [
        (PositionEncoding.UINT8, _U8),
        (PositionEncoding.UINT16, _U16),
        (PositionEncoding.FLOAT32, _F32),
        (PositionEncoding.FLOAT64, _F64),
    ],
)
def test_codec_literal_bytes(encoding, expected):
    got = encode_positions(_POINTS, _MIN, _EDGE, encoding).tobytes()
    assert got == expected


def test_codec_literal_bytes_native():
    from point_cloud_viewer_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    offsets = np.array([0, 3], dtype=np.int64)
    idx = np.arange(3, dtype=np.int64)
    for dtype, expected in [(np.uint8, _U8), (np.uint16, _U16),
                            (np.float32, _F32), (np.float64, _F64)]:
        got = native.gather_encode(
            _POINTS, idx, _MIN[:1], _EDGE[:1], offsets, dtype
        )
        assert got.tobytes() == expected


# ---------------------------------------------------------------------------
# meta.pb: every byte hand-derived from proto.proto field numbers + the
# proto3 wire format.
#
#   08 0d                Meta.version (f1, varint) = 13
#   22 3a                Meta.bounding_box (f4, msg, 58 bytes)
#     1a 1b              AxisAlignedCuboid.min (f3, Vector3d, 27 bytes)
#       09 <8B>            x (f1, double) = 0.5  -> 000000000000e03f
#       11 <8B>            y (f2, double) = 1.5  -> 000000000000f83f
#       19 <8B>            z (f3, double) = 2.5  -> 0000000000000440
#     22 1b              AxisAlignedCuboid.max (f4, Vector3d, 27 bytes)
#       09 <8B>            x = 4.5 -> 0000000000001240
#       11 <8B>            y = 8.5 -> 0000000000002140
#       19 <8B>            z = 16.5 -> 0000000000803040
#   32 11                Meta.octree (f6, OctreeMeta, 17 bytes)
#     11 <8B>              resolution (f2, double) = 0.5
#     1a 06                nodes[0] (f3, OctreeNode, 6 bytes)
#       10 01                position_encoding (f2, varint) = Uint8
#       18 03                num_points (f3, varint) = 3
#       22 00                id (f4, NodeId, empty: root high=low=0)
_META_HEX = (
    "080d"
    "223a"
    "1a1b" "09000000000000e03f" "11000000000000f83f" "190000000000000440"
    "221b" "090000000000001240" "110000000000002140" "190000000000803040"
    "3211"
    "11000000000000e03f"
    "1a06" "1001" "1803" "2200"
)


def _tiny_meta():
    from point_cloud_viewer_tpu.protos.meta import (
        BoundingBoxProto, MetaProto, OctreeMetaProto, OctreeNodeProto,
        PositionEncodingProto,
    )

    return MetaProto(
        version=13,
        bounding_box=BoundingBoxProto(min=(0.5, 1.5, 2.5), max=(4.5, 8.5, 16.5)),
        octree=OctreeMetaProto(
            resolution=0.5,
            nodes=[
                OctreeNodeProto(
                    id=0, num_points=3,
                    position_encoding=PositionEncodingProto.UINT8,
                )
            ],
        ),
    )


def test_meta_pb_literal_bytes():
    assert _tiny_meta().encode().hex() == _META_HEX


def test_meta_pb_parses_with_reference_proto():
    """Compile the REFERENCE'S proto.proto with protoc and parse the literal
    bytes with google.protobuf — an anchor fully independent of this
    framework's codec."""
    ref_proto = "/root/reference/point_viewer_proto_rust/src/proto.proto"
    if not os.path.exists(ref_proto):
        pytest.skip("reference .proto not available")
    try:
        from google.protobuf import descriptor_pb2, descriptor_pool, message_factory
    except ImportError:
        pytest.skip("google.protobuf unavailable")

    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "desc.pb")
        try:
            subprocess.run(
                ["protoc", f"--proto_path={os.path.dirname(ref_proto)}",
                 f"--descriptor_set_out={out}", ref_proto],
                check=True, capture_output=True, timeout=60,
            )
        except (subprocess.SubprocessError, FileNotFoundError):
            pytest.skip("protoc unavailable")
        fds = descriptor_pb2.FileDescriptorSet()
        with open(out, "rb") as f:
            fds.ParseFromString(f.read())

    pool = descriptor_pool.DescriptorPool()
    for fd in fds.file:
        pool.Add(fd)
    msg_cls = message_factory.GetMessageClass(
        pool.FindMessageTypeByName("point_viewer.proto.Meta")
    )
    meta = msg_cls()
    meta.ParseFromString(bytes.fromhex(_META_HEX))
    assert meta.version == 13
    assert meta.bounding_box.min.x == 0.5
    assert meta.bounding_box.min.y == 1.5
    assert meta.bounding_box.min.z == 2.5
    assert meta.bounding_box.max.x == 4.5
    assert meta.bounding_box.max.y == 8.5
    assert meta.bounding_box.max.z == 16.5
    assert meta.octree.resolution == 0.5
    assert len(meta.octree.nodes) == 1
    node = meta.octree.nodes[0]
    assert node.num_points == 3
    assert node.position_encoding == 1  # Uint8
    assert node.id.high == 0 and node.id.low == 0

    # And the reverse: bytes serialized by google.protobuf from the
    # reference descriptor decode identically through OUR reader.
    from point_cloud_viewer_tpu.protos.meta import MetaProto

    ours = MetaProto.decode(meta.SerializeToString())
    assert ours.version == 13
    assert tuple(ours.bounding_box.min) == (0.5, 1.5, 2.5)
    assert ours.octree.resolution == 0.5
    assert ours.octree.nodes[0].num_points == 3
