"""X-ray strategy fuzz: random configurations (strategy kind, binning,
intensity ranges, tile sizes, point distributions incl. edge-sitters and
empty/degenerate batches) — the jitted device splat kernels must render
BIT-IDENTICAL images to the host unique/bincount reductions.

Exactness conditions (see tests/test_xray_strategies.py): intensities are
quantized to 1/64 steps so all f64 sums are association-independent; colors
are u8 so sums are exact integers.

Usage: JAX_PLATFORMS=cpu python tools/fuzz_xray.py [seconds]
(FUZZ_SEED=n varies the run; FUZZ_MAX_ITERS bounds it).
Campaign results in ROUND_NOTES.md.
"""
import os, sys, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from point_cloud_viewer_tpu.core.points_batch import PointsBatch
from point_cloud_viewer_tpu.math.geometry import Aabb
from point_cloud_viewer_tpu.xray.generation import make_strategy

DEADLINE = time.time() + (float(sys.argv[1]) if len(sys.argv) > 1 else 600)
MAX_ITERS = int(os.environ.get("FUZZ_MAX_ITERS", 10**9))

KINDS = ["xray", "colored", "colored_with_intensity", "colored_with_height_stddev"]

it = 0
rng_master = np.random.default_rng(int(os.environ.get("FUZZ_SEED", 4)))
while time.time() < DEADLINE and it < MAX_ITERS:
    it += 1
    seed = int(rng_master.integers(0, 2**31))
    rng = np.random.default_rng(seed)
    kind = KINDS[int(rng.integers(0, len(KINDS)))]
    size = int(rng.choice([16, 64, 256]))
    extent = rng.uniform(1.0, 200.0, 3)
    bbox = Aabb(np.zeros(3), extent)
    kwargs = {}
    if kind == "colored_with_intensity":
        kwargs = {"min_intensity": float(rng.uniform(0.01, 2.0)),
                  "max_intensity": float(rng.uniform(10.0, 1e5))}
    elif kind == "colored_with_height_stddev":
        kwargs = {"max_stddev": float(rng.uniform(0.1, 10.0)),
                  "colormap": str(rng.choice(["jet", "purplish"]))}
    if kind in ("colored", "colored_with_intensity") and rng.random() < 0.5:
        kwargs["binning"] = ("ts", float(rng.uniform(0.5, 50.0)))
    # Height-stddev exactness precondition (device_splat.py docstring):
    # quantized z -> bit-equality is a theorem; full-f64 z -> device sums
    # may differ in the last ulp, image by <= 1 LSB at colormap boundaries.
    quantize_z = kind != "colored_with_height_stddev" or rng.random() < 0.5
    nb = int(rng.integers(1, 4))
    batches = []
    for _ in range(nb):
        n = int(rng.choice([0, 3, 1000, 50_000]))
        pos = rng.random((n, 3)) * extent
        if quantize_z and n:
            pos[:, 2] = np.round(pos[:, 2] * 64.0) / 64.0
        if n and rng.random() < 0.3:
            pos[: n // 4, 1] = 0.0           # min-y edge: discretize drops
            pos[n // 4 : n // 2, 0] = extent[0] * 0.999999
        attrs = {
            "color": rng.integers(0, 256, (n, 3), dtype=np.uint8),
            "intensity": (rng.integers(-640, 64_000, n) / 64.0).astype(np.float32),
            "ts": rng.random(n) * 100.0 - 20.0,
        }
        batches.append(PointsBatch(position=pos, attributes=attrs))
    tag = f"it{it} seed={seed} {kind} size={size} kwargs={kwargs} nb={nb}"
    try:
        host = make_strategy(kind, **kwargs)
        dev = make_strategy(kind, device=True, **kwargs)
        for b in batches:
            host.process(b, bbox, size)
            dev.process(b, bbox, size)
        ih, idv = host.render(size), dev.render(size)
        if quantize_z:
            assert np.array_equal(ih, idv), f"{tag}: host/device images differ"
        else:
            d = np.abs(ih.astype(np.int16) - idv.astype(np.int16)).max()
            assert d <= 1, f"{tag}: full-f64 stddev drift {d} LSB (> 1)"
        print(f"OK {tag} (exact={quantize_z})")
    except Exception:
        print(f"FAIL {tag}", flush=True)
        raise
print(f"xray fuzz finished: {it} iterations, no failures")
