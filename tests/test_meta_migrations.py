"""Version 9-12 meta.pb read migrations (reference: src/octree/mod.rs:154-215,
src/lib.rs:40-48).  Old-format metas are constructed at the wire level."""

import struct

import numpy as np
import pytest

from point_cloud_viewer_tpu.protos import pbwire as pb
from point_cloud_viewer_tpu.protos.meta import MetaProto, PositionEncodingProto


def _vector3f(x, y, z):
    w = pb.FieldWriter()
    w.float32(1, x)
    w.float32(2, y)
    w.float32(3, z)
    return w.finish()


def _vector3d(x, y, z):
    w = pb.FieldWriter()
    w.double(1, x)
    w.double(2, y)
    w.double(3, z)
    return w.finish()


def _node_v9(level, index, num_points):
    nid = pb.FieldWriter()
    nid.varint(1, level, signed=True)  # deprecated_level
    nid.varint(2, index, signed=True)  # deprecated_index
    node = pb.FieldWriter()
    node.varint(2, int(PositionEncodingProto.UINT16))
    node.varint(3, num_points, signed=True)
    node.message(4, nid.finish())
    return node.finish()


def _node_v10(value, num_points):
    nid = pb.FieldWriter()
    nid.varint(3, value >> 64)
    nid.varint(4, value & ((1 << 64) - 1))
    node = pb.FieldWriter()
    node.varint(2, int(PositionEncodingProto.UINT16))
    node.varint(3, num_points, signed=True)
    node.message(4, nid.finish())
    return node.finish()


def test_v9_meta_migration():
    # v9: f32 bbox (deprecated fields), top-level resolution + nodes,
    # NodeId as (level, index).
    bbox = pb.FieldWriter()
    bbox.message(1, _vector3f(-1.0, -2.0, -3.0))
    bbox.message(2, _vector3f(4.0, 5.0, 6.0))
    meta = pb.FieldWriter()
    meta.varint(1, 9, signed=True)
    meta.double(3, 0.05)  # deprecated_resolution
    meta.message(4, bbox.finish())
    meta.message(5, _node_v9(0, 0, 100))
    meta.message(5, _node_v9(2, 0o45, 7))

    decoded = MetaProto.decode(meta.finish())
    assert decoded.version == 9
    assert decoded.octree is not None
    assert decoded.octree.resolution == 0.05
    assert decoded.bounding_box.min == (-1.0, -2.0, -3.0)
    assert decoded.bounding_box.max == (4.0, 5.0, 6.0)
    ids = {n.id: n.num_points for n in decoded.octree.nodes}
    assert ids[0] == 100
    assert ids[(2 << 120) | 0o45] == 7


def test_v11_meta_migration():
    # v11: f64 bbox at top level, top-level resolution/nodes, packed NodeId.
    bbox = pb.FieldWriter()
    bbox.message(3, _vector3d(0.0, 0.0, 0.0))
    bbox.message(4, _vector3d(10.0, 10.0, 10.0))
    meta = pb.FieldWriter()
    meta.varint(1, 11, signed=True)
    meta.double(3, 0.01)
    meta.message(4, bbox.finish())
    meta.message(5, _node_v10((1 << 120) | 3, 42))

    decoded = MetaProto.decode(meta.finish())
    assert decoded.version == 11
    assert decoded.octree.resolution == 0.01
    assert decoded.octree.nodes[0].id == (1 << 120) | 3
    assert decoded.octree.nodes[0].num_points == 42


def test_v12_meta_migration():
    # v12: bbox lives INSIDE OctreeMeta (deprecated_bounding_box, field 1).
    bbox = pb.FieldWriter()
    bbox.message(3, _vector3d(1.0, 1.0, 1.0))
    bbox.message(4, _vector3d(9.0, 9.0, 9.0))
    octree = pb.FieldWriter()
    octree.message(1, bbox.finish())
    octree.double(2, 0.002)
    octree.message(3, _node_v10(0, 5))
    meta = pb.FieldWriter()
    meta.varint(1, 12, signed=True)
    meta.message(6, octree.finish())

    decoded = MetaProto.decode(meta.finish())
    assert decoded.version == 12
    assert decoded.bounding_box.min == (1.0, 1.0, 1.0)
    assert decoded.bounding_box.max == (9.0, 9.0, 9.0)
    assert decoded.octree.resolution == 0.002


def test_upgrade_cli_rewrites_v11_to_v13(tmp_path):
    bbox = pb.FieldWriter()
    bbox.message(3, _vector3d(0.0, 0.0, 0.0))
    bbox.message(4, _vector3d(2.0, 2.0, 2.0))
    meta = pb.FieldWriter()
    meta.varint(1, 11, signed=True)
    meta.double(3, 0.01)
    meta.message(4, bbox.finish())
    meta.message(5, _node_v10(0, 3))
    path = tmp_path / "meta.pb"
    path.write_bytes(meta.finish())

    from point_cloud_viewer_tpu.cli import upgrade_octree

    assert upgrade_octree.main([str(tmp_path)]) == 0
    upgraded = MetaProto.decode(path.read_bytes())
    assert upgraded.version == 13
    assert upgraded.octree.resolution == 0.01
    assert upgraded.bounding_box.max == (2.0, 2.0, 2.0)


def test_unknown_version_rejected():
    meta = pb.FieldWriter()
    meta.varint(1, 14, signed=True)
    with pytest.raises(ValueError):
        MetaProto.decode(meta.finish())


def test_unsupported_version_rejected_through_fast_path(tmp_path):
    """A v99 meta with an otherwise-modern layout must raise through the
    container even though the native fast parser could read its bytes."""
    import os

    import numpy as np
    import pytest

    from point_cloud_viewer_tpu.octree.octree import Octree
    from point_cloud_viewer_tpu.protos.meta import (
        BoundingBoxProto, MetaProto, OctreeMetaProto,
    )

    meta = MetaProto(
        version=99,
        bounding_box=BoundingBoxProto(min=(0.0,) * 3, max=(1.0,) * 3),
        octree=OctreeMetaProto(resolution=0.5, nodes=[]),
    )
    d = str(tmp_path / "v99")
    os.makedirs(d)
    with open(os.path.join(d, "meta.pb"), "wb") as f:
        f.write(meta.encode())
    with pytest.raises(ValueError, match="unsupported meta version"):
        Octree.from_directory(d)
