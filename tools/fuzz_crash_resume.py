"""Crash-injection fuzz: kill the streaming build at RANDOM points (in the
spill pass, bucket builds, or node writes), resume — possibly crashing
AGAIN — and require byte-identical output to an uninterrupted build.

Usage: JAX_PLATFORMS=cpu python tools/fuzz_crash_resume.py [seconds]
(FUZZ_SEED=n varies the run).  Campaign results in ROUND_NOTES.md.
"""
import os, shutil, sys, tempfile, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from point_cloud_viewer_tpu.core.points_batch import PointsBatch
from point_cloud_viewer_tpu.math.geometry import Aabb
from point_cloud_viewer_tpu.octree import streaming as S
from point_cloud_viewer_tpu.octree import builder as B
from point_cloud_viewer_tpu.io import node_io

DEADLINE = time.time() + (float(sys.argv[1]) if len(sys.argv) > 1 else 600)

class Boom(Exception):
    pass

HOOKS = {
    "bucket": (S, "_build_bucket_subtree"),
    "spill_append": (S._BucketSpill, "append"),
    # builder.py binds write_node_files at import: patch ITS binding.
    "write_node": (B, "write_node_files"),
    # Device (pipelined) bucket route: dispatch and completion stages.
    "dev_dispatch": (S, "_dispatch_device_bucket"),
    "dev_finish": (S, "_finish_device_bucket"),
}
REAL = {k: getattr(mod, name) for k, (mod, name) in HOOKS.items()}

def with_crash(hook, crash_at):
    mod, name = HOOKS[hook]
    real = REAL[hook]
    state = {"n": 0}
    def wrapper(*a, **kw):
        state["n"] += 1
        if state["n"] == crash_at:
            raise Boom(f"{hook}@{crash_at}")
        return real(*a, **kw)
    setattr(mod, name, wrapper)

def restore():
    for k, (mod, name) in HOOKS.items():
        setattr(mod, name, REAL[k])

it = 0
MAX_ITERS = int(os.environ.get("FUZZ_MAX_ITERS", 10**9))
rng_master = np.random.default_rng(int(os.environ.get("FUZZ_SEED", 5)))
while time.time() < DEADLINE and it < MAX_ITERS:
    it += 1
    seed = int(rng_master.integers(0, 2**31))
    rng = np.random.default_rng(seed)
    n = int(rng.choice([40_000, 300_000]))
    style = rng.random()
    pos = rng.random((n, 3)) * 64.0
    if style < 0.4:  # clustered: uneven buckets, some split deep
        k = 6
        centers = rng.random((k, 3)) * 60
        pos = centers[rng.integers(0, k, n)] + rng.normal(0, 0.3, (n, 3))
    batch = PointsBatch(position=pos, attributes={
        "color": rng.integers(0, 256, (n, 3), dtype=np.uint8)})
    bl = int(rng.choice([1, 2]))
    res = float(rng.choice([0.01, 0.05]))
    use_device = bool(rng.random() < 0.3)  # pipelined device bucket route
    base = tempfile.mkdtemp(prefix="rfuzz_")
    tag = f"it{it} seed={seed} n={n} bl={bl} res={res} dev={use_device}"
    try:
        ref = os.path.join(base, "ref")
        S.build_octree_streaming(ref, res, batch, bucket_levels=bl)
        crash_dir = os.path.join(base, "crash")
        spill = os.path.join(base, "spill")
        bbox = Aabb.bounding_points(pos)
        attempts = 0
        hooks = list(HOOKS)
        while True:
            attempts += 1
            assert attempts < 30, f"{tag}: did not converge"
            if rng.random() < 0.75:   # 25%: let this attempt run clean
                pool = (["bucket", "spill_append", "write_node"]
                        if not use_device else
                        ["spill_append", "write_node", "dev_dispatch", "dev_finish"])
                hook = pool[int(rng.integers(0, len(pool)))]
                hi = {"bucket": 9, "spill_append": 2, "write_node": 60,
                      "dev_dispatch": 9, "dev_finish": 9}[hook]
                with_crash(hook, int(rng.integers(1, hi)))
            try:
                S.build_octree_streaming(
                    crash_dir, res, batch, bounding_box=bbox,
                    bucket_levels=bl, spill_directory=spill,
                    use_device=use_device,
                )
                break  # completed
            except Boom:
                pass  # resume on next loop
            finally:
                restore()
        fa, fb = sorted(os.listdir(ref)), sorted(os.listdir(crash_dir))
        assert fa == fb, f"{tag}: file sets differ after {attempts} attempts"
        for name in fa:
            a = open(os.path.join(ref, name), 'rb').read()
            b = open(os.path.join(crash_dir, name), 'rb').read()
            assert a == b, f"{tag}: {name} differs after {attempts} attempts"
        print(f"OK {tag} ({attempts} attempts)")
    except Exception:
        print(f"FAIL {tag}", flush=True)
        raise
    finally:
        restore()
        shutil.rmtree(base, ignore_errors=True)
print(f"resume fuzz finished: {it} iterations, no failures")
