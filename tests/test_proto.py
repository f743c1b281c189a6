"""Wire-format tests for the hand-rolled meta.pb codec: round trips through
our codec and cross-validation against the installed google.protobuf parser
to prove conformance with the reference schema
(point_viewer_proto_rust/src/proto.proto)."""

import struct

import numpy as np
import pytest

from point_cloud_viewer_tpu.core.attributes import AttributeDataType
from point_cloud_viewer_tpu.protos import pbwire as pb
from point_cloud_viewer_tpu.protos.meta import (
    AttributeProto,
    BoundingBoxProto,
    MetaProto,
    OctreeMetaProto,
    OctreeNodeProto,
    PositionEncodingProto,
    S2CellProto,
    S2MetaProto,
    decode_node_id,
    encode_node_id,
)


def test_varint_roundtrip():
    for v in [0, 1, 127, 128, 300, 2**32, 2**64 - 1]:
        buf = pb.encode_varint(v)
        out, pos = pb.decode_varint(buf, 0)
        assert out == v and pos == len(buf)


def test_node_id_roundtrip():
    for value in [0, 5 << 120 | 0o12345, (21 << 120) | (1 << 63) | 12345]:
        assert decode_node_id(encode_node_id(value)) == value


def test_node_id_deprecated_migration():
    # A version-9 NodeId stored as (level=3, index=0o123) must decode to the
    # packed representation.
    w = pb.FieldWriter()
    w.varint(1, 3, signed=True)
    w.varint(2, 0o123, signed=True)
    assert decode_node_id(w.finish()) == (3 << 120) | 0o123


def _sample_meta() -> MetaProto:
    nodes = [
        OctreeNodeProto(id=0, num_points=12345, position_encoding=PositionEncodingProto.UINT16),
        OctreeNodeProto(
            id=(2 << 120) | 0o45,
            num_points=99,
            position_encoding=PositionEncodingProto.FLOAT32,
        ),
    ]
    return MetaProto(
        version=13,
        bounding_box=BoundingBoxProto(min=(-1.5, 2.0, -3.25), max=(4.0, 5.5, 6.75)),
        octree=OctreeMetaProto(resolution=0.001, nodes=nodes),
    )


def test_meta_roundtrip_octree():
    meta = _sample_meta()
    decoded = MetaProto.decode(meta.encode())
    assert decoded.version == 13
    assert decoded.bounding_box == meta.bounding_box
    assert decoded.s2 is None
    assert decoded.octree.resolution == 0.001
    assert decoded.octree.nodes == meta.octree.nodes


def test_meta_roundtrip_s2():
    meta = MetaProto(
        version=13,
        bounding_box=BoundingBoxProto(min=(0, 0, 0), max=(1, 1, 1)),
        s2=S2MetaProto(
            cells=[S2CellProto(id=2**61 + 5, num_points=7)],
            attributes=[
                AttributeProto("color", AttributeDataType.U8VEC3),
                AttributeProto("intensity", AttributeDataType.F32),
            ],
        ),
    )
    decoded = MetaProto.decode(meta.encode())
    assert decoded.s2.cells == meta.s2.cells
    assert decoded.s2.attributes == meta.s2.attributes
    assert decoded.octree is None


def test_google_protobuf_cross_validation():
    """Parse our bytes with the official protobuf library against a schema
    built from the reference .proto definition (field numbers only)."""
    proto = pytest.importorskip("google.protobuf")
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

    pool = descriptor_pool.DescriptorPool()
    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "pv.proto"
    fdp.package = "pv"
    fdp.syntax = "proto3"

    v3d = fdp.message_type.add()
    v3d.name = "Vector3d"
    for i, ax in enumerate("xyz", 1):
        f = v3d.field.add()
        f.name, f.number, f.type, f.label = ax, i, 1, 1  # TYPE_DOUBLE

    bbox = fdp.message_type.add()
    bbox.name = "AxisAlignedCuboid"
    for name, num in [("min", 3), ("max", 4)]:
        f = bbox.field.add()
        f.name, f.number, f.type, f.label = name, num, 11, 1  # TYPE_MESSAGE
        f.type_name = ".pv.Vector3d"

    nid = fdp.message_type.add()
    nid.name = "NodeId"
    for name, num in [("high", 3), ("low", 4)]:
        f = nid.field.add()
        f.name, f.number, f.type, f.label = name, num, 4, 1  # TYPE_UINT64

    onode = fdp.message_type.add()
    onode.name = "OctreeNode"
    f = onode.field.add()
    f.name, f.number, f.type, f.label = "position_encoding", 2, 5, 1  # TYPE_INT32
    f = onode.field.add()
    f.name, f.number, f.type, f.label = "num_points", 3, 3, 1  # TYPE_INT64
    f = onode.field.add()
    f.name, f.number, f.type, f.label = "id", 4, 11, 1
    f.type_name = ".pv.NodeId"

    ometa = fdp.message_type.add()
    ometa.name = "OctreeMeta"
    f = ometa.field.add()
    f.name, f.number, f.type, f.label = "resolution", 2, 1, 1
    f = ometa.field.add()
    f.name, f.number, f.type, f.label = "nodes", 3, 11, 3  # repeated
    f.type_name = ".pv.OctreeNode"

    meta = fdp.message_type.add()
    meta.name = "Meta"
    f = meta.field.add()
    f.name, f.number, f.type, f.label = "version", 1, 5, 1
    f = meta.field.add()
    f.name, f.number, f.type, f.label = "bounding_box", 4, 11, 1
    f.type_name = ".pv.AxisAlignedCuboid"
    f = meta.field.add()
    f.name, f.number, f.type, f.label = "octree", 6, 11, 1
    f.type_name = ".pv.OctreeMeta"

    pool.Add(fdp)
    msg_cls = message_factory.GetMessageClass(pool.FindMessageTypeByName("pv.Meta"))

    ours = _sample_meta()
    parsed = msg_cls.FromString(ours.encode())
    assert parsed.version == 13
    assert parsed.bounding_box.min.x == -1.5
    assert parsed.bounding_box.max.z == 6.75
    assert parsed.octree.resolution == 0.001
    assert len(parsed.octree.nodes) == 2
    assert parsed.octree.nodes[0].num_points == 12345
    assert parsed.octree.nodes[1].id.high == (2 << 120 | 0o45) >> 64
    assert parsed.octree.nodes[1].id.low == ((2 << 120) | 0o45) & ((1 << 64) - 1)

    # And decode the official library's serialization with our codec.
    reserialized = parsed.SerializeToString()
    redecoded = MetaProto.decode(reserialized)
    assert redecoded.octree.nodes == ours.octree.nodes
    assert redecoded.bounding_box == ours.bounding_box


def test_native_meta_parse_matches_python():
    """The native meta.pb wire walker agrees with the Python decoder on a
    current-layout meta and bails (None) on legacy/s2 layouts."""
    import numpy as np

    from point_cloud_viewer_tpu import native
    from point_cloud_viewer_tpu.octree.node_id import NodeId
    from point_cloud_viewer_tpu.protos.meta import (
        BoundingBoxProto, MetaProto, OctreeMetaProto, OctreeNodeProto,
        PositionEncodingProto, S2MetaProto,
    )

    if not native.available():
        import pytest

        pytest.skip("native unavailable")
    rng = np.random.default_rng(8)
    nodes = []
    for _ in range(500):
        lvl = int(rng.integers(0, 24))
        path = int(rng.integers(0, 8 ** min(lvl, 20))) << (3 * max(lvl - 20, 0))
        nodes.append(OctreeNodeProto(
            id=NodeId.from_level_index(lvl, path).value,
            num_points=int(rng.integers(0, 1 << 40)),
            position_encoding=PositionEncodingProto(int(rng.integers(1, 5))),
        ))
    meta = MetaProto(
        version=13,
        bounding_box=BoundingBoxProto(min=(-3.5, 2.25, -7.0),
                                      max=(10.5, 20.0, 30.25)),
        octree=OctreeMetaProto(resolution=0.023, nodes=nodes),
    )
    buf = meta.encode()
    parsed = native.parse_octree_meta(buf)
    assert parsed is not None
    version, bbox, resolution, id_hi, id_lo, num_points, enc = parsed
    assert version == 13
    np.testing.assert_array_equal(bbox, [-3.5, 2.25, -7.0, 10.5, 20.0, 30.25])
    assert resolution == 0.023
    assert len(id_hi) == len(nodes)
    for i, n in enumerate(nodes):
        assert (int(id_hi[i]) << 64) | int(id_lo[i]) == n.id
        assert int(num_points[i]) == n.num_points
        assert int(enc[i]) == int(n.position_encoding)

    # s2 metas must bail to the Python decoder.
    s2meta = MetaProto(
        version=13,
        bounding_box=BoundingBoxProto(min=(0.0,) * 3, max=(1.0,) * 3),
        s2=S2MetaProto(cells=[], attributes=[]),
    )
    assert native.parse_octree_meta(s2meta.encode()) is None


def test_native_meta_parse_fuzz_no_crash():
    """The native wire walker must never crash on malformed input — every
    corruption either parses to the same arrays or bails to Python (None)."""
    import numpy as np

    from point_cloud_viewer_tpu import native
    from point_cloud_viewer_tpu.protos.meta import (
        BoundingBoxProto, MetaProto, OctreeMetaProto, OctreeNodeProto,
        PositionEncodingProto,
    )

    if not native.available():
        import pytest

        pytest.skip("native unavailable")
    rng = np.random.default_rng(0)
    for _ in range(300):
        buf = rng.integers(0, 256, rng.integers(0, 120), dtype=np.uint8).tobytes()
        native.parse_octree_meta(buf)
    meta = MetaProto(
        version=13,
        bounding_box=BoundingBoxProto(min=(0, 0, 0), max=(1, 1, 1)),
        octree=OctreeMetaProto(resolution=0.5, nodes=[
            OctreeNodeProto(id=(3 << 120) | 5, num_points=7,
                            position_encoding=PositionEncodingProto.UINT8)]),
    )
    base = bytearray(meta.encode())
    for i in range(len(base)):
        flipped = bytearray(base)
        flipped[i] ^= 0xFF
        native.parse_octree_meta(bytes(flipped))
        native.parse_octree_meta(bytes(base[:i]))  # truncation


def test_native_meta_parse_rejects_out_of_range_values():
    """Corrupt metas must bail to the Python decoder (None), not truncate
    into accidentally-valid values: a position_encoding varint of 257 must
    not wrap to UINT8 (=1), and a level byte > 40 would drive uint64 shifts
    past 64 bits in the vectorized cube math."""
    from point_cloud_viewer_tpu import native
    from point_cloud_viewer_tpu.protos.meta import (
        BoundingBoxProto, MetaProto, OctreeMetaProto, OctreeNodeProto,
    )

    if not native.available():
        import pytest

        pytest.skip("native unavailable")

    def meta_with(node):
        return MetaProto(
            version=13,
            bounding_box=BoundingBoxProto(min=(0, 0, 0), max=(1, 1, 1)),
            octree=OctreeMetaProto(resolution=0.5, nodes=[node]),
        ).encode()

    # encoding 257 wraps to 1 under a u8 cast; 0 and 5 are out of range.
    for bad_enc in (0, 5, 257):
        buf = meta_with(OctreeNodeProto(id=(1 << 120) | 3, num_points=7,
                                        position_encoding=bad_enc))
        assert native.parse_octree_meta(buf) is None

    # level 41 exceeds the 120-bit path capacity of the format.
    buf = meta_with(OctreeNodeProto(id=(41 << 120) | 3, num_points=7,
                                    position_encoding=1))
    assert native.parse_octree_meta(buf) is None
    # level 40 is the maximum and stays on the fast path.
    buf = meta_with(OctreeNodeProto(id=(40 << 120) | 3, num_points=7,
                                    position_encoding=1))
    assert native.parse_octree_meta(buf) is not None
