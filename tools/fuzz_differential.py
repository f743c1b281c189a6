"""Differential fuzz: random clouds -> in-core vs streaming vs mesh builds
byte-identity; random geometry queries vs brute force (index-in-color).

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/fuzz_differential.py [seconds]   (FUZZ_SEED=n varies the run)

Campaign results are recorded in ROUND_NOTES.md.
"""
import os, shutil, sys, tempfile, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from point_cloud_viewer_tpu.core.points_batch import PointsBatch
from point_cloud_viewer_tpu.math.geometry import Aabb, Frustum, Isometry, Obb, Perspective
from point_cloud_viewer_tpu.octree.builder import build_octree
from point_cloud_viewer_tpu.octree.streaming import build_octree_streaming
from point_cloud_viewer_tpu.parallel.mesh import make_mesh
from point_cloud_viewer_tpu.query.client import PointCloudClient
from point_cloud_viewer_tpu.query.point_query import PointQuery
from point_cloud_viewer_tpu.query.location import GeometryLocation

DEADLINE = time.time() + float(sys.argv[1]) if len(sys.argv) > 1 else time.time() + 600

def synth(rng, n, style):
    if n == 0:
        return np.zeros((0, 3))
    if style == "uniform":
        return rng.random((n, 3)) * rng.uniform(0.5, 500)
    if style == "clustered":
        k = max(1, min(10, n // 10))
        centers = rng.random((k, 3)) * 100
        idx = rng.integers(0, k, n)
        return centers[idx] + rng.normal(0, rng.uniform(0.001, 2.0), (n, 3))
    if style == "collinear":
        t = rng.random(n)
        return np.outer(t, rng.random(3) * 50) + rng.random(3)
    if style == "same_point":
        return np.tile(rng.random(3) * 10, (n, 1))
    if style == "plane":
        p = rng.random((n, 3)) * 40
        p[:, rng.integers(0, 3)] = rng.random() * 40
        return p
    raise AssertionError(style)

def attrs(rng, n, which):
    a = {}
    if "color" in which:
        a["color"] = rng.integers(0, 256, (n, 3)).astype(np.uint8)
    if "intensity" in which:
        a["intensity"] = rng.random(n).astype(np.float32)
    if "ts" in which:
        a["ts"] = rng.random(n) * 1e6
    return a

def same_dir(a, b, tag):
    fa, fb = sorted(os.listdir(a)), sorted(os.listdir(b))
    assert fa == fb, f"{tag}: file sets differ {len(fa)} vs {len(fb)}"
    for name in fa:
        if open(os.path.join(a, name), 'rb').read() != open(os.path.join(b, name), 'rb').read():
            raise AssertionError(f"{tag}: {name} bytes differ")

it = 0
MAX_ITERS = int(os.environ.get("FUZZ_MAX_ITERS", 10**9))
NO_MESH = os.environ.get("FUZZ_NO_MESH", "") == "1"
rng_master = np.random.default_rng(int(os.environ.get("FUZZ_SEED", 0)))
styles = ["uniform", "clustered", "collinear", "same_point", "plane"]
while time.time() < DEADLINE and it < MAX_ITERS:
    it += 1
    seed = int(rng_master.integers(0, 2**31))
    rng = np.random.default_rng(seed)
    n = int(rng.choice([0, 1, 2, 7, 103, 5_001, 60_000]))
    style = styles[int(rng.integers(0, len(styles)))]
    opts = [["color"], ["color", "intensity"], ["intensity", "ts"], []]
    which = ["color"] if n == 0 else opts[int(rng.integers(0, len(opts)))]
    pos = synth(rng, n, style)
    res = float(rng.choice([0.001, 0.01, 0.3, 5.0]))
    if n and rng.random() < 0.15 and style in ("clustered", "same_point"):
        res = float(np.max(pos.max(axis=0) - pos.min(axis=0)) + 1e-6) / 2**26
    bl = int(rng.choice([1, 2, 3]))
    batch = PointsBatch(position=pos, attributes=attrs(rng, n, which))
    base = tempfile.mkdtemp(prefix="fuzz_")
    tag = f"it{it} seed={seed} n={n} {style} res={res} bl={bl} attrs={which}"
    try:
        build_octree(os.path.join(base, "mem"), res, batch)
        nb = max(1, int(rng.integers(1, 6)))
        cuts = np.sort(rng.integers(0, n + 1, nb - 1)) if n else []
        parts = np.split(np.arange(n), cuts) if n else [np.arange(0)]
        batches = [batch.slice(int(p[0]), int(p[-1]) + 1) if len(p) else
                   PointsBatch(position=np.zeros((0,3)), attributes=attrs(rng,0,which))
                   for p in parts]
        build_octree_streaming(
            os.path.join(base, "stream"), res, batches,
            bounding_box=Aabb.bounding_points(pos) if n else None,
            bucket_levels=bl, spill_directory=os.path.join(base, "spill"),
        )
        same_dir(os.path.join(base, "mem"), os.path.join(base, "stream"), tag + " [stream]")
        if n > 0 and not NO_MESH and rng.random() < 0.5:
            nd = int(rng.choice([2, 3, 5, 8]))
            build_octree(os.path.join(base, "mesh"), res, batch, mesh=make_mesh(nd))
            same_dir(os.path.join(base, "mem"), os.path.join(base, "mesh"), tag + f" [mesh{nd}]")

        # query differential (only when color carries the index)
        if n > 0 and "color" in which and n <= 60_000:
            idxc = np.arange(n, dtype=np.uint32)
            icolor = np.stack([(idxc >> 16) & 0xFF, (idxc >> 8) & 0xFF, idxc & 0xFF], axis=1).astype(np.uint8)
            qb = PointsBatch(position=pos, attributes={"color": icolor})
            qdir = os.path.join(base, "q")
            build_octree(qdir, res, qb)
            lo = pos.min(axis=0); hi = pos.max(axis=0)
            span = np.maximum(hi - lo, 1e-9)
            a = lo + rng.random(3) * span * 0.8
            b = a + rng.random(3) * span * 0.5 + 1e-9
            box = Aabb(a, b)
            expected = np.nonzero(box.contains(pos))[0]
            got = []
            client = PointCloudClient.from_locations([qdir], batch_size=7919)
            for bt in client.stream(PointQuery(attributes=["color"], location=GeometryLocation(box))):
                c = bt.attributes["color"].astype(np.uint32)
                got.append((c[:, 0] << 16) | (c[:, 1] << 8) | c[:, 2])
            got = np.sort(np.concatenate(got)) if got else np.empty(0, np.uint32)
            # quantization envelope: points within sqrt(3)*res of the boundary may flip (box)
            sym = np.setdiff1d(got, expected).size + np.setdiff1d(expected, got).size
            if sym:
                flip = np.union1d(np.setdiff1d(got, expected), np.setdiff1d(expected, got)).astype(int)
                d = np.maximum(np.maximum(a - pos[flip], pos[flip] - b).max(axis=1), 0)
                # decoded position error bound
                assert (np.abs(d) <= np.sqrt(3) * res + 1e-12).all(), (
                    f"{tag}: query flips beyond quantization envelope: {d.max()}")
        if n > 0 and "color" in which and n <= 60_000 and rng.random() < 0.5:
            # OBB differential on the same index cloud
            center = lo + rng.random(3) * span
            half = rng.random(3) * span * 0.4 + 1e-6
            axis = rng.normal(size=3); axis /= np.linalg.norm(axis)
            iso = Isometry.from_axis_angle(axis, rng.random() * 3.0, translation=center)
            obb = Obb(iso, half)
            expected = np.nonzero(obb.contains(pos))[0]
            got = []
            client = PointCloudClient.from_locations([qdir], batch_size=7919)
            for bt in client.stream(PointQuery(attributes=["color"], location=GeometryLocation(obb))):
                c = bt.attributes["color"].astype(np.uint32)
                got.append((c[:, 0] << 16) | (c[:, 1] << 8) | c[:, 2])
            got = np.sort(np.concatenate(got)) if got else np.empty(0, np.uint32)
            flips = np.union1d(np.setdiff1d(got, expected), np.setdiff1d(expected, got)).astype(int)
            if len(flips):
                local = np.abs(obb.obb_from_query.transform_points(pos[flips]))
                d = np.max(local - half, axis=1)
                assert (d <= np.sqrt(3) * res + 1e-9).all() and (d >= -np.sqrt(3) * res - 1e-9).all(), (
                    f"{tag}: OBB flips beyond envelope: {d.min()} {d.max()}")
        if n > 0 and "color" in which and n <= 60_000 and rng.random() < 0.5:
            # Frustum differential: eye outside the cloud looking at a
            # random interior target.
            eye_pos = lo + (rng.random(3) - 0.5) * span * 4.0
            look = lo + rng.random(3) * span
            fwd = look - eye_pos
            if np.linalg.norm(fwd) > 1e-9:
                fwd /= np.linalg.norm(fwd)
                zax = np.array([0.0, 0.0, 1.0])
                axis = np.cross(zax, -fwd)  # camera looks down -z
                s_ = np.linalg.norm(axis)
                ang = float(np.arctan2(s_, np.dot(zax, -fwd)))
                iso = Isometry.from_axis_angle(
                    axis / s_ if s_ > 1e-12 else zax, ang, translation=eye_pos
                )
                far = max(float(np.linalg.norm(span) * 6), 1.0)
                fr = Frustum.new(iso, Perspective.from_fov(
                    float(rng.uniform(0.4, 1.6)), float(rng.uniform(0.6, 1.5)),
                    0.1, far))
                # Ground truth on the DECODED positions — exactly what the
                # engine filters — so the comparison is EXACT, no envelope.
                client = PointCloudClient.from_locations([qdir], batch_size=7919)
                decoded = np.empty((n, 3))
                for bt in client.stream(PointQuery(attributes=["color"])):
                    c = bt.attributes["color"].astype(np.uint32)
                    di = (c[:, 0] << 16) | (c[:, 1] << 8) | c[:, 2]
                    decoded[di] = bt.position
                expected = np.nonzero(fr.contains(decoded))[0]
                got = []
                for bt in client.stream(PointQuery(attributes=["color"],
                                                   location=GeometryLocation(fr))):
                    c = bt.attributes["color"].astype(np.uint32)
                    got.append((c[:, 0] << 16) | (c[:, 1] << 8) | c[:, 2])
                got = np.sort(np.concatenate(got)) if got else np.empty(0, np.uint32)
                assert np.array_equal(got, expected), (
                    f"{tag}: frustum query != frustum test on decoded points")
        print(f"OK {tag}")
    except Exception:
        print(f"FAIL {tag}", flush=True)
        raise
    finally:
        shutil.rmtree(base, ignore_errors=True)
print(f"fuzz finished: {it} iterations, no failures")
