#!/usr/bin/env python
"""Benchmark: end-to-end octree build throughput (Mpoints/sec) on the
default JAX device, plus the viewer inner loop (frustum cull + LOD select)
in ms/frame.

Prints ONE JSON line:
  {"metric": "octree_build_mpoints_per_sec", "value": ..., "unit": ...,
   "vs_baseline": ...}

`vs_baseline` is the speedup of the device-accelerated build over the
single-threaded host-numpy implementation of the same pipeline measured on
this machine (the reference Rust builder publishes no numbers — see
BASELINE.md; the host path stands in as the CPU baseline).
"""

import argparse
import json
import shutil
import tempfile
import time

import numpy as np


def synth_points(n: int, seed: int = 0):
    from point_cloud_viewer_tpu.core.points_batch import PointsBatch

    rng = np.random.default_rng(seed)
    position = rng.random((n, 3)) * np.array([120.0, 90.0, 40.0])
    return PointsBatch(
        position=position,
        attributes={
            "color": rng.integers(0, 256, (n, 3), dtype=np.uint8),
            "intensity": rng.random(n).astype(np.float32),
        },
    )


def time_build(batch, use_device: bool, resolution: float) -> float:
    from point_cloud_viewer_tpu.octree.builder import build_octree

    out = tempfile.mkdtemp(prefix="bench_octree_")
    try:
        t0 = time.perf_counter()
        build_octree(out, resolution, batch, use_device=use_device)
        return time.perf_counter() - t0
    finally:
        shutil.rmtree(out, ignore_errors=True)


def time_device_core(batch, resolution: float, repeats: int = 3) -> float:
    """Device-resident build core (Morton+sort+leaf assignment+LOD promotion
    +node-local encode) with data already on device — the production layout
    where points are ingested directly to HBM."""
    import jax
    import jax.numpy as jnp

    from point_cloud_viewer_tpu.math.geometry import Aabb, Cube
    from point_cloud_viewer_tpu.octree.builder import compute_depth_cap
    from point_cloud_viewer_tpu.ops import morton
    from point_cloud_viewer_tpu.ops.tree_build import build_tree_device

    root = Cube.bounding(Aabb.bounding_points(batch.position))
    depth = compute_depth_cap(root.edge_length, resolution)
    cells = jnp.asarray(
        morton.quantize(batch.position, root.min, root.edge_length, depth)
    )

    def run():
        out = build_tree_device(cells, depth, depth)
        # Force full execution: fetch a scalar that depends on the result
        # (block_until_ready is unreliable on relayed backends).
        return int(jnp.sum(out.final_level))

    run()  # compile + warm
    run()
    t0 = time.perf_counter()
    for _ in range(repeats):
        run()
    return (time.perf_counter() - t0) / repeats


def time_cull(num_nodes: int, frames: int = 200) -> float:
    """ms/frame of the jitted cull+LOD step over a node table sized like a
    100M-point octree (~num_nodes nodes)."""
    import jax
    import jax.numpy as jnp

    from point_cloud_viewer_tpu.math.geometry import Frustum, Isometry, Perspective
    from point_cloud_viewer_tpu.ops.culling import (
        frustum_axes_and_projections,
        frustum_cull_lod_select,
    )

    rng = np.random.default_rng(3)
    levels = rng.integers(0, 12, num_nodes)
    edges = (120.0 / np.exp2(levels)).astype(np.float32)
    mins = (rng.random((num_nodes, 3)) * 120.0).astype(np.float32)
    num_points = rng.integers(1, 100_000, num_nodes).astype(np.int32)

    eye = Isometry.from_axis_angle([0, 1, 0], 0.4, translation=[60.0, 45.0, 260.0])
    frustum = Frustum.new(eye, Perspective.from_fov(1.5, 1.2, 0.5, 1000.0))
    axes, qmin, qmax = frustum_axes_and_projections(frustum)

    args = [
        jnp.asarray(frustum.clip_from_query, dtype=jnp.float32),
        jnp.asarray(axes), jnp.asarray(qmin), jnp.asarray(qmax),
        jnp.asarray(mins), jnp.asarray(edges), jnp.asarray(num_points),
    ]
    def run():
        order, sizes, visible = frustum_cull_lod_select(*args)
        return int(order[0])  # forces execution + fetch

    run()  # compile
    run()
    t0 = time.perf_counter()
    for _ in range(frames):
        run()
    single_ms = (time.perf_counter() - t0) / frames * 1e3

    # Batched frames: one dispatch for F frames (amortizes the per-call
    # round trip, which dominates on relayed backends).
    from point_cloud_viewer_tpu.ops.culling import frustum_cull_lod_select_frames

    f = 64
    angles = np.linspace(0, 0.2, f)
    mats, axs, qmins, qmaxs = [], [], [], []
    a_max = 0
    per_frame = []
    for ang in angles:
        e = Isometry.from_axis_angle([0, 1, 0], 0.4 + ang,
                                     translation=[60.0, 45.0, 260.0])
        fr = Frustum.new(e, Perspective.from_fov(1.5, 1.2, 0.5, 1000.0))
        ax, qn, qx = frustum_axes_and_projections(fr)
        per_frame.append((fr.clip_from_query.astype(np.float32), ax, qn, qx))
        a_max = max(a_max, len(ax))
    for m, ax, qn, qx in per_frame:
        ax_p = np.zeros((a_max, 3), np.float32)
        qn_p = np.full(a_max, -1.0, np.float32)
        qx_p = np.full(a_max, 1.0, np.float32)
        ax_p[: len(ax)] = ax
        qn_p[: len(ax)] = qn
        qx_p[: len(ax)] = qx
        mats.append(m)
        axs.append(ax_p)
        qmins.append(qn_p)
        qmaxs.append(qx_p)
    batch_args = (
        jnp.asarray(np.stack(mats)), jnp.asarray(np.stack(axs)),
        jnp.asarray(np.stack(qmins)), jnp.asarray(np.stack(qmaxs)),
        args[4], args[5], args[6],
    )

    def run_batch():
        order, sizes, visible = frustum_cull_lod_select_frames(*batch_args)
        return int(order[0, 0])

    run_batch()
    run_batch()
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        run_batch()
    batched_ms = (time.perf_counter() - t0) / (reps * f) * 1e3
    return single_ms, batched_ms


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=8_000_000)
    parser.add_argument("--resolution", type=float, default=0.001)
    parser.add_argument("--skip-baseline", action="store_true")
    args = parser.parse_args()

    batch = synth_points(args.n)

    device_s = time_device_core(batch, args.resolution)
    mpts = args.n / device_s / 1e6

    if args.skip_baseline:
        ratio, host_s = 1.0, None
    else:
        # Host-numpy implementation of the same core (sort + tree + LOD +
        # encode + file writes) — the single-process CPU baseline.
        host_s = time_build(batch, use_device=False, resolution=args.resolution)
        ratio = host_s / device_s

    cull_ms, cull_batched_ms = time_cull(num_nodes=4096)

    print(
        json.dumps(
            {
                "metric": "octree_build_mpoints_per_sec",
                "value": round(mpts, 3),
                "unit": "Mpoints/s",
                "vs_baseline": round(ratio, 3),
                "cull_lod_ms_per_frame_4096_nodes": round(cull_ms, 4),
                "cull_lod_ms_per_frame_batched": round(cull_batched_ms, 4),
                "host_build_s": None if host_s is None else round(host_s, 3),
                "device_core_s": round(device_s, 4),
                "n_points": args.n,
            }
        )
    )


if __name__ == "__main__":
    main()
