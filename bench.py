#!/usr/bin/env python
"""Benchmark: END-TO-END octree build throughput (Mpoints/sec) — synthetic
points in memory -> finished reference-format octree directory on disk —
plus the viewer inner loop (frustum cull + LOD select) in ms/frame.

Prints ONE JSON line:
  {"metric": "octree_build_mpoints_per_sec", "value": ..., "unit": ...,
   "vs_baseline": ...}

The headline `value` is the full-pipeline wall time of the best available
path on THIS machine; `vs_baseline` is its speedup over the single-threaded
host-only implementation of the same pipeline (the reference Rust builder
publishes no numbers — see BASELINE.md; the host path stands in as the CPU
baseline).  Both `e2e_device_s` (device-offloaded build incl. all
host<->device transfers) and `host_build_s` are reported separately, plus
`device_core_s` (device-resident core, the local-HBM deployment number) —
on this machine the TPU sits behind a ~25 MB/s relay, so the end-to-end
device path is transfer-bound; the honest split makes that visible."""

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


def time_build(
    batch, use_device: bool, resolution: float, warm: bool = False,
    native_kernels: bool = True, repeats: int = 1, phases: dict = None,
) -> float:
    """Wall time of one full build (points in memory -> octree on disk),
    median over `repeats` runs (host timings on this shared 1-core machine
    vary ~2x run to run — the r2->r3 'regression' was exactly this noise;
    medians make rounds comparable).

    warm=True runs one extra untimed build first — the device path's first
    run includes a one-off remote XLA compile (~30-40 s on the relay)
    that is not part of steady-state throughput.  native_kernels=False
    forces the pure-numpy pipeline (the unaccelerated CPU baseline).
    `phases` (a dict) collects the per-phase wall-time split of the MEDIAN
    run (quantize+morton / sort / discover+subsample / encode+write)."""
    import contextlib

    from point_cloud_viewer_tpu import native
    from point_cloud_viewer_tpu.octree.builder import build_octree

    ctx = contextlib.nullcontext() if native_kernels else native.disabled()
    runs = []  # (dt, phase dict)
    with ctx:
        for rep in range(int(warm) + repeats):
            out = tempfile.mkdtemp(prefix="bench_octree_")
            pt: dict = {}
            try:
                t0 = time.perf_counter()
                build_octree(
                    out, resolution, batch, use_device=use_device,
                    phase_times=pt,
                )
                dt = time.perf_counter() - t0
            finally:
                shutil.rmtree(out, ignore_errors=True)
            if not (warm and rep == 0):
                runs.append((dt, pt))
    runs.sort(key=lambda r: r[0])
    median = runs[len(runs) // 2]
    if phases is not None:
        phases.update({k: round(v, 3) for k, v in median[1].items()})
    return median[0]


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

    # One jitted program per rep whose scalar output forces full execution
    # (block_until_ready is unreliable on relayed backends; a separate sum
    # dispatch would add round trips).
    @jax.jit
    def core(c):
        out = build_tree_device(c, depth, depth)
        return jnp.sum(out.final_level) + jnp.sum(out.order[:1])

    def run():
        return int(core(cells))

    run()  # compile + warm
    run()
    t0 = time.perf_counter()
    for _ in range(repeats):
        run()
    return (time.perf_counter() - t0) / repeats


def _hbm_probes(timed_scalar, key) -> dict:
    """Streaming-bandwidth probe shapes; the max is the denominator every
    '(x)-off-roofline' verdict divides by:

    * add_1d   — flat f32 add (the r2/r3 probe: one read + one write),
    * add_2d   — the same traffic through a (rows, 512) layout,
    * pallas_copy — a Pallas sequential-grid copy kernel with an SMEM
      scalar added per block (full-lane VMEM blocks, explicit pipeline),
    * triad    — STREAM triad a = x + s*y (2 reads + 1 write),
    * add3     — a = x + y + s*z (3 reads + 1 write; the r5 calibration
      winner: 565 GB/s = 69% of the v5e 819 GB/s spec, settling VERDICT r4
      item 7 — the old 373 GB/s ceiling was probe-shaped, not the part's).

    More concurrent streams expose more of the memory system: the 2-buffer
    shapes saturate near 373-460, 3-4 input streams reach 525-565.
    """
    import jax
    import jax.numpy as jnp

    out = {}
    iters = 20
    n_probe = 128_000_000

    x = jax.jit(lambda k: jax.random.uniform(k, (n_probe,), jnp.float32))(key)

    @jax.jit
    def probe_1d(v):
        def body(i, acc):
            y = jax.lax.optimization_barrier(v + acc)
            return y[0] * 1e-30 + y[-1] * 1e-30
        return jax.lax.fori_loop(0, iters, body, 0.0)

    # Each probe individually guarded: one flaky dispatch must not discard
    # the others' already-measured numbers (hbm_probe_gbps is the max of
    # whatever succeeded).
    try:
        s = timed_scalar(lambda v: float(probe_1d(v)), x) / iters
        out["hbm_probe_add_1d_gbps"] = round(2 * 4 * n_probe / s / 1e9, 1)
    except Exception as e:
        import sys

        print(f"[bench] 1d probe failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    x2 = x.reshape(-1, 512)

    @jax.jit
    def probe_2d(v):
        def body(i, acc):
            y = jax.lax.optimization_barrier(v + acc)
            return y[0, 0] * 1e-30 + y[-1, -1] * 1e-30
        return jax.lax.fori_loop(0, iters, body, 0.0)

    try:
        s = timed_scalar(lambda v: float(probe_2d(v)), x2) / iters
        out["hbm_probe_add_2d_gbps"] = round(2 * 4 * n_probe / s / 1e9, 1)
    except Exception as e:
        import sys

        print(f"[bench] 2d probe failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    del x2

    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        lanes, rows = 128, 2048
        grid = n_probe // lanes // rows  # truncate to whole blocks: every
        m = grid * rows                  # output row IS written (y[-1, -1]
        n_eff = m * lanes                # must be initialized data)

        def copy_kernel(s_ref, x_ref, o_ref):
            o_ref[:] = x_ref[:] + s_ref[0, 0]

        copy = pl.pallas_call(
            copy_kernel,
            out_shape=jax.ShapeDtypeStruct((m, lanes), jnp.float32),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((rows, lanes), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rows, lanes), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )
        xp = x[:n_eff].reshape(m, lanes)

        @jax.jit
        def probe_pl(v):
            def body(i, acc):
                y = copy(acc.reshape(1, 1), v)
                return y[-1, -1] * 1e-30
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        s = timed_scalar(lambda v: float(probe_pl(v)), xp) / iters
        out["hbm_probe_pallas_copy_gbps"] = round(2 * 4 * n_eff / s / 1e9, 1)
    except Exception as e:
        import sys

        print(f"[bench] pallas copy probe failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # Multi-stream shapes (r5): more independent input streams keep more
    # HBM requests in flight.
    try:
        k2, k3 = jax.random.split(key)
        y = jax.jit(lambda k: jax.random.uniform(k, (n_probe,), jnp.float32))(k2)
        z = jax.jit(lambda k: jax.random.uniform(k, (n_probe,), jnp.float32))(k3)

        @jax.jit
        def probe_triad(x, y):
            def body(i, acc):
                a = jax.lax.optimization_barrier(x + acc * y)
                return a[0] * 1e-30 + a[-1] * 1e-30
            return jax.lax.fori_loop(0, iters, body, jnp.float32(1.0))

        s = timed_scalar(lambda a, b: float(probe_triad(a, b)), x, y) / iters
        out["hbm_probe_triad_gbps"] = round(3 * 4 * n_probe / s / 1e9, 1)

        @jax.jit
        def probe_add3(x, y, z):
            def body(i, acc):
                a = jax.lax.optimization_barrier(x + y + acc * z)
                return a[0] * 1e-30 + a[-1] * 1e-30
            return jax.lax.fori_loop(0, iters, body, jnp.float32(1.0))

        s = timed_scalar(
            lambda a, b, c: float(probe_add3(a, b, c)), x, y, z
        ) / iters
        out["hbm_probe_add3_gbps"] = round(4 * 4 * n_probe / s / 1e9, 1)
    except Exception as e:
        import sys

        print(f"[bench] multi-stream probes failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    if out:
        out["hbm_probe_gbps"] = max(
            v for k, v in out.items() if k.startswith("hbm_probe_")
        )
        out["hbm_probe_fraction_of_v5e_spec"] = round(
            out["hbm_probe_gbps"] / 819.0, 3
        )
    return out


def _mxu_probe(timed_scalar, key) -> dict:
    """MXU bf16 FLOPs cross-check (VERDICT r4 item 7): an 8192^3 bf16
    matmul chain with the FULL matrix as loop carry, so XLA cannot narrow
    any in-chain dot to the sliced output (a scalar-carried version
    'measured' 338 TFLOPs — 1.7x the part's spec — because the algebraic
    simplifier rewrote slice(dot) into dot(slice)).  Timed as the
    k=2-vs-k=10 delta so the dispatch floor and the one narrowable final
    dot cancel.  Measured r5: 168 TFLOPs = 85% of the v5e's 197 bf16 spec —
    together with the 69%-of-spec HBM probe this pins the machine as a
    healthy v5e and calibrates every roofline verdict's denominator."""
    import functools

    import jax
    import jax.numpy as jnp

    m = 8192
    ka, kb = jax.random.split(key)
    a = jax.jit(lambda k: jax.random.uniform(k, (m, m), jnp.bfloat16))(ka)
    b = jax.jit(lambda k: jax.random.uniform(k, (m, m), jnp.bfloat16))(kb)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(a, b, k):
        def body(i, c):
            return jnp.dot(a, b + c * jnp.bfloat16(1e-8),
                           preferred_element_type=jnp.bfloat16)
        c = jax.lax.fori_loop(0, k, body, jnp.zeros_like(b))
        return c[0, 0].astype(jnp.float32)

    t2 = timed_scalar(lambda x, y: float(chain(x, y, 2)), a, b)
    t10 = timed_scalar(lambda x, y: float(chain(x, y, 10)), a, b)
    s = (t10 - t2) / 8
    if s <= 0:
        return {}
    tflops = 2 * m**3 / s / 1e12
    return {
        "mxu_probe_tflops_bf16": round(tflops, 1),
        "mxu_probe_fraction_of_v5e_spec": round(tflops / 197.0, 3),
    }


def bench_device_scaling(
    sizes=(16_000_000, 64_000_000, 128_000_000, 256_000_000),
    depth: int = 21, repeats: int = 2
) -> dict:
    """Device-core scaling with DEVICE-RESIDENT data — the production
    layout on local-HBM hardware (BASELINE config 2): uniform random Morton
    codes are generated on device (uniform cells at `depth` ==
    uniform 63-bit codes), the full core (sort + leaf assignment + LOD
    promotion) runs jitted, and timing fetches one dependent scalar
    (block_until_ready is a no-op on relayed backends).

    Also isolates the lax.sort share and measures an achieved-HBM-bandwidth
    probe (cumsum: one read + one write stream) so the sort can be judged
    against a radix-sort roofline (VERDICT r2 item 7)."""
    import jax
    import jax.numpy as jnp

    from point_cloud_viewer_tpu.ops.tree_build import build_tree_device_codes

    out = {}

    def timed_scalar(fn, *args):
        fn(*args)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(repeats):
            fn(*args)
        return (time.perf_counter() - t0) / repeats

    key = jax.random.key(0)

    # Achieved-bandwidth probes (VERDICT r3 item 4: every roofline verdict
    # keys off this number, so try SEVERAL shapes and take the max).  Each
    # streams one read + one write per element with a data-dependent carry
    # (a zero-folded carry lets XLA hoist the loop-invariant op and every
    # shape "measures" the dispatch floor), amortized over an in-device
    # fori_loop against the relay's ~28 ms dispatch floor.
    try:
        out.update(_hbm_probes(timed_scalar, key))
    except Exception as e:
        import sys

        print(f"[bench] hbm probes failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    try:
        out.update(_mxu_probe(timed_scalar, key))
    except Exception as e:
        import sys

        print(f"[bench] mxu probe failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    for n in sizes:
        tag = f"{n // 1_000_000}m"
        try:
            bits = jax.jit(
                lambda k: jax.random.bits(k, (2, n), dtype=jnp.uint32)
            )(key)
            # Uniform codes of EXACTLY 3*depth bits.  Shift amounts must
            # stay in [0, 32) — a >>32 on uint32 is undefined in XLA — so
            # both halves are sized explicitly (depth <= 10 puts the whole
            # code in lo and hi must be zero).
            code_bits = 3 * depth
            hi_bits = max(0, code_bits - 32)
            lo_bits = code_bits - hi_bits
            hi = (bits[0] >> jnp.uint32(32 - hi_bits)) if hi_bits else jnp.zeros_like(bits[0])
            lo = (bits[1] >> jnp.uint32(32 - lo_bits)) if lo_bits < 32 else bits[1]

            @jax.jit
            def core(h, l):
                idx, cur, leaf = build_tree_device_codes(h, l, depth, depth)
                return (
                    jnp.sum(cur.astype(jnp.int32))
                    + idx[0].astype(jnp.int32)
                    + leaf[-1].astype(jnp.int32)
                )

            core_s = timed_scalar(lambda h, l: int(core(h, l)), hi, lo)
            out[f"device_core_s_{tag}"] = round(core_s, 4)
            out[f"device_core_mpoints_per_sec_{tag}"] = round(n / core_s / 1e6, 2)

            if n == 64_000_000:
                # Sort-only at ONE size: each size is another remote XLA
                # compile (~minutes through the relay) and the share is
                # flat across sizes (ROUND_NOTES tables).
                @jax.jit
                def sort_only(h, l):
                    idx = jax.lax.broadcasted_iota(
                        jnp.uint32, (n, 1), 0
                    ).squeeze(-1)
                    sh, sl, si = jax.lax.sort(
                        (h, l, idx), num_keys=3, is_stable=False
                    )
                    return (sh[0] + sl[-1] + si[0]).astype(jnp.uint32)

                sort_s = timed_scalar(
                    lambda h, l: int(sort_only(h, l)), hi, lo
                )
                out[f"device_sort_s_{tag}"] = round(sort_s, 4)
                if "hbm_probe_gbps" in out:
                    # How many x slower than an ideal 8-bit-digit LSD
                    # radix sort of the (hi, lo, idx) tuples at the
                    # MEASURED bandwidth: 8 passes x (read + write) x 12 B.
                    ideal_s = 8 * 2 * 12 * n / (out["hbm_probe_gbps"] * 1e9)
                    out[f"sort_vs_radix8_roofline_x_{tag}"] = round(
                        sort_s / ideal_s, 1
                    )
        except Exception as e:
            out[f"device_core_s_{tag}"] = f"failed: {type(e).__name__}"
            msg = (str(e) or "").upper()
            if "RESOURCE_EXHAUSTED" in msg or "OUT OF MEMORY" in msg or "OOM" in msg:
                break  # larger sizes can only OOM harder: report what fits
            # Transient relay errors: keep trying the remaining sizes so a
            # hiccup at 16M doesn't silently drop the 64M sort/roofline
            # numbers.
    return out


def bench_xray_splat(n: int = 8_000_000, image_size: int = 256) -> dict:
    """X-ray splat throughput, host unique/bincount vs jitted device
    scatter-add kernels (BASELINE config 4; reference hot loop
    xray/src/generation.rs:99-136).  One 256^2 tile, density strategy."""
    from point_cloud_viewer_tpu.core.points_batch import PointsBatch
    from point_cloud_viewer_tpu.math.geometry import Aabb
    from point_cloud_viewer_tpu.xray.generation import make_strategy

    rng = np.random.default_rng(2)
    bbox = Aabb(np.zeros(3), np.array([100.0, 100.0, 30.0]))
    batch = PointsBatch(
        position=rng.random((n, 3)) * np.array([100.0, 100.0, 30.0]),
        attributes={},
    )
    out = {}
    for label, device in (("host", False), ("device", True)):
        s = make_strategy("xray", device=device)
        s.process(batch, bbox, image_size)
        s.render(image_size)  # warm (compile on the device path)
        # Median-of-3: host timings on this shared machine vary ~2x run to
        # run (same rationale as time_build's medians).
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            s.render(image_size)
            reps.append(time.perf_counter() - t0)
        dt = sorted(reps)[1]
        out[f"xray_splat_{label}_mpoints_per_sec"] = round(n / dt / 1e6, 2)

    # Device-RESIDENT kernel rate (keys already in HBM — the production
    # layout; the end-to-end device number above pays the relay transfer).
    import jax
    import jax.numpy as jnp

    from point_cloud_viewer_tpu.xray.device_splat import _xray_occupancy

    s = make_strategy("xray")
    s.process(batch, bbox, image_size)
    keys = jnp.asarray(np.concatenate(s._keys).astype(np.uint32))

    def run():
        return int(_xray_occupancy(keys, image_size)[0])

    run()
    run()
    t0 = time.perf_counter()
    for _ in range(3):
        run()
    dt = (time.perf_counter() - t0) / 3
    out["xray_splat_device_resident_mpoints_per_sec"] = round(n / dt / 1e6, 2)
    return out


def time_cull(num_nodes: int, frames: int = 200):
    """ms/frame of the cull+LOD step over a node table sized like a
    100M-point octree (~num_nodes nodes).

    Returns (host_ms, device_ms, device_batched_ms, device_kernel_ms —
    dispatch-floor-subtracted): the host-native kernel
    is the interactive path on this machine (the TPU sits behind a relay
    with ~30 ms round-trip latency, so any per-frame device dispatch breaks
    the 60 fps budget by construction); the device kernel is the path for
    huge tables and batched multi-frame workloads."""
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

    # Host-native single-frame path FIRST (the interactive 60 fps loop)
    # so a wedged relay cannot take the host number down with it.
    from point_cloud_viewer_tpu.ops.culling import frustum_cull_lod_select_host

    matrix_np = frustum.clip_from_query.astype(np.float32)

    def run_host():
        order, sizes, visible = frustum_cull_lod_select_host(
            matrix_np, axes, qmin, qmax, mins, edges, num_points
        )
        return int(order[0])

    run_host()
    t0 = time.perf_counter()
    for _ in range(frames):
        run_host()
    host_ms = (time.perf_counter() - t0) / frames * 1e3

    try:
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
        device_ms = (time.perf_counter() - t0) / frames * 1e3
    except Exception as e:  # noqa: BLE001 - relay down: host numbers stand
        import sys

        print(f"[bench] device cull failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        return host_ms, None, None, None, None

    # Dispatch-floor-subtracted kernel time (VERDICT r3 item 8, re-done per
    # VERDICT r4 item 3): the same cull runs `iters` times inside ONE
    # dispatch with a data-dependent matrix perturbation (a constant-folded
    # carry would let XLA hoist the loop-invariant cull and measure only
    # the relay floor).  Timing the SAME loop at 2 and 20002 iterations
    # and dividing the delta by 20000 removes the ~28 ms relay floor.  The
    # old 2-vs-22 spread put the 20-iteration delta (~7 ms) INSIDE the
    # relay's run-to-run noise and max(delta, 0) then published clamped
    # noise as "0.0 ms".  The spread must be THIS wide because the
    # 4096-node kernel itself is ~6 us/frame (measured: 202 iters -> 0.9 ms
    # delta, 2002 -> 12.7 ms, both inside the relay's ~12-24 ms rep
    # spread); 20000 extra iterations put ~128 ms of real work above the
    # noise.  Timings are median-of-5, the rep spread is reported as an
    # explicit noise bound, and a delta inside that bound reports None —
    # never a fabricated 0.0.
    kernel_ms = None
    kernel_noise_ms = None
    try:
        import functools

        @functools.partial(jax.jit, static_argnames=("iters",))
        def cull_loop(m, ax, qn, qx, mn, ed, npts, iters):
            def body(i, acc):
                mi = m + acc * 1e-30
                order, sizes, _ = frustum_cull_lod_select(
                    mi, ax, qn, qx, mn, ed, npts
                )
                return order[0].astype(jnp.float32) * 1e-30 + sizes[0] * 1e-30

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        def run_loop(iters):
            """(median, spread) of 5 timed reps at `iters` loop iterations."""
            fn = functools.partial(cull_loop, *args, iters=iters)
            float(fn())  # compile + warm
            float(fn())
            reps = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(fn())
                reps.append(time.perf_counter() - t0)
            reps.sort()
            return reps[2], reps[-1] - reps[0]

        (t2, sp2), (t2002, sp2002) = run_loop(2), run_loop(20002)
        delta = t2002 - t2
        # Conservative noise bound on the delta: the two medians can each
        # be off by their observed rep spread.
        noise = sp2 + sp2002
        kernel_noise_ms = noise / 20000 * 1e3
        if delta > noise:
            kernel_ms = delta / 20000 * 1e3
        else:
            import sys

            print(
                f"[bench] cull kernel delta {delta*1e3:.1f} ms inside noise "
                f"bound {noise*1e3:.1f} ms -> reporting null",
                file=sys.stderr,
            )
    except Exception as e:  # noqa: BLE001
        import sys

        print(f"[bench] cull kernel loop failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # Batched frames: one dispatch for F frames (amortizes the per-call
    # round trip, which dominates on relayed backends).  Frame prep is the
    # library's own (ops/culling.prep_frustum_frames — single-sourced
    # padding); only the dispatch/fetch is hand-timed here.
    from point_cloud_viewer_tpu.ops.culling import (
        frustum_cull_lod_select_frames,
        prep_frustum_frames,
    )

    f = 64
    frustums = []
    for ang in np.linspace(0, 0.2, f):
        e = Isometry.from_axis_angle([0, 1, 0], 0.4 + ang,
                                     translation=[60.0, 45.0, 260.0])
        frustums.append(
            Frustum.new(e, Perspective.from_fov(1.5, 1.2, 0.5, 1000.0))
        )
    mats, axs, qmins, qmaxs = prep_frustum_frames(frustums)
    batch_args = (
        jnp.asarray(mats), jnp.asarray(axs),
        jnp.asarray(qmins), jnp.asarray(qmaxs),
        args[4], args[5], args[6],
    )

    def run_batch():
        order, sizes, visible = frustum_cull_lod_select_frames(*batch_args)
        return int(order[0, 0])

    batched_ms = None
    try:
        run_batch()
        run_batch()
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            run_batch()
        batched_ms = (time.perf_counter() - t0) / (reps * f) * 1e3
    except Exception as e:  # noqa: BLE001 - relay down: other numbers stand
        import sys

        print(f"[bench] batched cull failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    return host_ms, device_ms, batched_ms, kernel_ms, kernel_noise_ms


def _synthetic_1m_node_octree():
    """A VALID 1M-node tree (all ancestors present: complete to level 6 +
    ~700k random level-7 nodes) synthesized directly into a container —
    metas of this size load through the native parser in ~1 s, irrelevant
    to per-frame cost.  Validity matters: the heap cull traverses
    parent->child links."""
    from point_cloud_viewer_tpu.math.geometry import Cube
    from point_cloud_viewer_tpu.octree.node_id import bounding_cubes2
    from point_cloud_viewer_tpu.octree.octree import Octree

    rng = np.random.default_rng(5)
    levels = [np.full(8**l, l, dtype=np.uint8) for l in range(7)]
    paths = [np.arange(8**l, dtype=np.uint64) for l in range(7)]
    n7 = 1_000_000 - sum(len(p) for p in paths)
    pick7 = rng.choice(8**7, size=n7, replace=False).astype(np.uint64)
    levels.append(np.full(n7, 7, dtype=np.uint8))
    paths.append(np.sort(pick7))
    octree = Octree.__new__(Octree)
    octree.levels = np.concatenate(levels)
    octree.path_hi = np.zeros(len(octree.levels), dtype=np.uint64)
    octree.path_lo = np.concatenate(paths)
    octree.num_points = np.full(len(octree.levels), 10, dtype=np.int64)
    octree.root_cube = Cube(np.zeros(3), 1024.0)
    octree.cube_mins, octree.cube_edges = bounding_cubes2(
        octree.levels, octree.path_hi, octree.path_lo, octree.root_cube
    )
    octree._coarse = None
    octree._heap = None
    octree._build_coarse_index()
    octree._build_heap_index()
    return octree


def time_cull_1m_nodes(frames: int = 20):
    """(partial_ms, all_visible_ms) per frame of the container's cull at 1M
    nodes with a 4096-node budget: a partial-view frustum (the
    colossal-cloud serving case) and the worst case — a camera that sees
    the WHOLE cloud (reference heap semantics keep it budget-bound,
    src/octree/mod.rs:228-283)."""
    from point_cloud_viewer_tpu.math.geometry import Frustum, Isometry, Perspective

    octree = _synthetic_1m_node_octree()

    eye = Isometry.from_axis_angle([0, 1, 0], 0.3,
                                   translation=[200.0, 200.0, 400.0])
    frustum = Frustum.new(eye, Perspective.from_fov(1.0, 0.7, 1.0, 500.0))
    # All-visible: pulled back far enough that every node cube is inside.
    eye_all = Isometry.from_axis_angle([0, 1, 0], 0.0,
                                       translation=[512.0, 512.0, 4000.0])
    frustum_all = Frustum.new(
        eye_all, Perspective.from_fov(1.2, 1.0, 1.0, 10000.0)
    )
    results = []
    for fr in (frustum, frustum_all):
        octree.visible_nodes_with_sizes(fr, max_nodes=4096)  # warm
        t0 = time.perf_counter()
        for _ in range(frames):
            octree.visible_nodes_with_sizes(fr, max_nodes=4096)
        results.append((time.perf_counter() - t0) / frames * 1e3)
    return tuple(results)


def bench_queries(n: int = 1_000_000) -> dict:
    """Streaming-query benchmarks over octree and S2 containers — the
    reference's criterion suite (point_cloud_test/benches/main.rs:32-136):
    all/box/frustum/obb/cell-union queries through PointCloudClient."""
    import shutil
    import tempfile

    import numpy as np

    from point_cloud_viewer_tpu.core.points_batch import PointsBatch
    from point_cloud_viewer_tpu.math import s2 as s2m
    from point_cloud_viewer_tpu.math.geometry import Aabb, Frustum, Isometry, Obb, Perspective
    from point_cloud_viewer_tpu.math.wgs84 import local_frame_from_lat_lng
    from point_cloud_viewer_tpu.octree.builder import build_octree
    from point_cloud_viewer_tpu.query.client import PointCloudClient
    from point_cloud_viewer_tpu.query.location import AllPoints
    from point_cloud_viewer_tpu.query.point_query import PointQuery
    from point_cloud_viewer_tpu.s2_cells.cell_union import CellUnion
    from point_cloud_viewer_tpu.s2_cells.splitter import build_s2_cloud

    rng = np.random.default_rng(0)
    local = (rng.random((n, 3)) - 0.5) * np.array([500.0, 500.0, 40.0])
    frame = local_frame_from_lat_lng(37.4, -122.1)
    ecef = frame.inverse().transform_points(local)
    batch = PointsBatch(
        position=ecef,
        attributes={"color": rng.integers(0, 255, (n, 3), dtype=np.uint8)},
    )
    base = tempfile.mkdtemp(prefix="bench_queries_")
    results = {}
    try:
        oct_dir = f"{base}/octree"
        s2_dir = f"{base}/s2"
        t0 = time.perf_counter()
        build_octree(oct_dir, 0.01, batch)
        results["octree_build_s"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        build_s2_cloud(s2_dir, batch)
        results["s2_build_s"] = round(time.perf_counter() - t0, 3)

        center = ecef.mean(axis=0)
        up = center / np.linalg.norm(center)
        z = up
        x = np.cross([0.0, 0.0, 1.0], z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        rot = np.stack([x, y, z], axis=1)
        leaves = s2m.leaf_cell_ids_from_points(ecef[:500])
        queries = {
            "all": AllPoints(),
            "box": Aabb(center - 100.0, center + 100.0),
            "frustum": Frustum.new(
                Isometry(rot, center + up * 300.0),
                Perspective.from_fov(1.0, 1.0, 10.0, 500.0),
            ),
            "obb": Obb(
                Isometry.from_axis_angle([0.2, 0.5, 0.8], 0.4, translation=center),
                [120.0, 80.0, 30.0],
            ),
            "cell_union": CellUnion(np.unique(s2m.parent(leaves, 16))),
        }
        walls = {}
        for kind, d in [("octree", oct_dir), ("s2", s2_dir)]:
            client = PointCloudClient.from_locations([d], num_threads=2)
            for name, location in queries.items():
                total = [0]
                t0 = time.perf_counter()
                client.for_each_point_data(
                    PointQuery(attributes=["color"], location=location),
                    lambda b: total.__setitem__(0, total[0] + len(b)),
                )
                dt = time.perf_counter() - t0
                walls[(name, kind)] = dt
                results[f"{name}_query_{kind}_mpts_per_s"] = round(
                    total[0] / dt / 1e6, 3
                )

        # Brute-force numpy baseline (VERDICT r4 item 2): the same geometry
        # as ONE vectorized mask over the raw in-memory array.  This is the
        # no-index competitor — it scans all N points but pays no disk
        # decode; the ratio (>1 means the container wins on wall time) is
        # honest about the fact that at 1M points an in-RAM scan is hard to
        # beat and the index pays off via node pruning at larger N / colder
        # storage.
        for name in ("box", "frustum"):
            loc = queries[name]
            loc.contains(ecef)  # touch once (page-in; numpy has no compile)
            t0 = time.perf_counter()
            matched = int(loc.contains(ecef).sum())
            bf_dt = time.perf_counter() - t0
            results[f"{name}_query_bruteforce_s"] = round(bf_dt, 4)
            results[f"{name}_query_bruteforce_matched"] = matched
            for kind in ("octree", "s2"):
                q_dt = walls.get((name, kind))
                if q_dt:
                    results[f"{name}_query_{kind}_vs_bruteforce"] = round(
                        bf_dt / q_dt, 3
                    )
        return results
    finally:
        shutil.rmtree(base, ignore_errors=True)


def bench_serve(directory: str, tag: str = "big") -> dict:
    """Load a finished octree directory through Octree.from_directory and
    serve it over the REAL web backend (viewer/web_backend.py, the
    reference's octree_web_viewer/src/backend.rs:16-64 contract), timing
    the three user-visible latencies (VERDICT r4 item 4):

    * meta load seconds (Octree.from_directory — meta.pb parse + indexes),
    * /visible_nodes GET round-trip ms (median of 5),
    * a 50-node /nodes_data POST blob fetch ms (median of 3) + blob bytes.

    Actual HTTP through a live ThreadingHTTPServer on an ephemeral port —
    not direct handler calls — so the number includes the full serving
    stack the TS client sees."""
    import http.client
    import os
    import threading

    from point_cloud_viewer_tpu.math.geometry import (
        Frustum, Isometry, Perspective,
    )
    from point_cloud_viewer_tpu.octree.octree import Octree
    from point_cloud_viewer_tpu.viewer.web_backend import AppState, make_server

    out = {}
    t0 = time.perf_counter()
    octree = Octree.from_directory(directory)
    out[f"{tag}_serve_meta_load_s"] = round(time.perf_counter() - t0, 3)
    out[f"{tag}_serve_num_nodes"] = int(len(octree.levels))

    # A camera inside the scene looking across it (same pose family as
    # time_cull; the synthetic cloud spans [0,120]x[0,90]x[0,40]).
    root = octree.root_cube
    center = root.min + root.edge_length / 2
    eye = Isometry.from_axis_angle(
        [0, 1, 0], 0.4,
        translation=center + np.array([0.0, 0.0, root.edge_length]),
    )
    frustum = Frustum.new(
        eye, Perspective.from_fov(1.5, 1.2, 0.5, 4 * root.edge_length)
    )
    # The route expects the COLUMN-MAJOR flattening of clip_from_query.
    matrix_param = ",".join(
        repr(float(v)) for v in frustum.clip_from_query.flatten(order="F")
    )

    parent = os.path.dirname(directory.rstrip("/"))
    octree_id = os.path.basename(directory.rstrip("/"))
    state = AppState(prefix=parent, init_octree_id=octree_id)
    # Pre-seed the cache with the already-loaded octree so the serve
    # timings measure the routes, not a second multi-second meta load.
    state._cache[octree_id] = octree
    server = make_server(state, port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)

        def get_visible():
            conn.request(
                "GET", f"/visible_nodes/{octree_id}/?matrix={matrix_param}"
            )
            resp = conn.getresponse()
            body = resp.read()
            assert resp.status == 200, (resp.status, body[:200])
            return json.loads(body)

        visible = get_visible()  # warm (and the node-name source)
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            get_visible()
            reps.append(time.perf_counter() - t0)
        out[f"{tag}_serve_visible_nodes_ms"] = round(
            sorted(reps)[2] * 1e3, 2
        )
        out[f"{tag}_serve_visible_nodes_count"] = len(visible)

        names = visible[:50]
        body = json.dumps(names).encode()

        def get_blob():
            conn.request(
                "POST", f"/nodes_data/{octree_id}/", body=body,
                headers={"Content-Type": "application/json"},
            )
            resp = conn.getresponse()
            blob = resp.read()
            assert resp.status == 200, (resp.status, blob[:200])
            return blob
        blob = get_blob()  # warm (page cache)
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            get_blob()
            reps.append(time.perf_counter() - t0)
        out[f"{tag}_serve_nodes_data_ms"] = round(sorted(reps)[1] * 1e3, 2)
        out[f"{tag}_serve_nodes_data_nodes"] = len(names)
        out[f"{tag}_serve_nodes_data_bytes"] = len(blob)
        conn.close()
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=10)
    return out


def bench_big_streaming(
    n: int, resolution: float = 0.001, use_device: bool = True,
    batch_points: int = 8_000_000, validate_prefix: int = 16_000_000,
    prefix_check: bool = True, serve: bool = False,
) -> dict:
    """The north-star configuration (BASELINE configs 2/5; VERDICT r3
    item 1): an END-TO-END out-of-core build at >= 256M points through
    `build_octree_streaming` — synthetic batches streamed from a generator
    (bounded RAM), spill to disk, per-bucket subtree derivation (on device
    with use_device, else the native host kernels), encode/write — with the
    per-phase wall split (spill / bucket load / derive / group /
    encode+write / top).  Both paths are measured by main(): on THIS
    machine the device path pays the axon relay (~25 MB/s, minutes-scale
    stalls observed run-to-run), so the host number is the stable one and
    the device number is the honest relay-including figure.

    Output is spot-validated: meta point-count conservation over all
    nodes, plus (prefix_check) a sampled-node byte check of a
    `validate_prefix`-point prefix built separately through the IN-CORE
    builder (the two paths are byte-identical by the test suite; this
    re-proves it at bench scale)."""
    import os

    from point_cloud_viewer_tpu.math.geometry import Aabb
    from point_cloud_viewer_tpu.octree.builder import build_octree
    from point_cloud_viewer_tpu.octree.streaming import build_octree_streaming

    extent = np.array([120.0, 90.0, 40.0])
    bbox = Aabb(np.zeros(3), extent)

    gen_s = [0.0]

    def gen(total):
        # Input production is harness cost, not framework cost, but it runs
        # INSIDE the builder's spill loop (and therefore inside the "spill"
        # phase timer).  Timing it here splits the record honestly:
        # streaming_phases_*["input_gen"] is CONTAINED IN "spill", not
        # additive with it.
        done = 0
        seed = 0
        while done < total:
            m = min(batch_points, total - done)
            t0 = time.perf_counter()
            b = synth_points(m, seed=seed)
            gen_s[0] += time.perf_counter() - t0
            yield b
            done += m
            seed += 1

    tag = "device" if use_device else "host"
    out = {}
    base = tempfile.mkdtemp(prefix="bench_big_")
    try:
        phases: dict = {}
        t0 = time.perf_counter()
        result = build_octree_streaming(
            os.path.join(base, "big"), resolution, gen(n), bounding_box=bbox,
            spill_directory=os.path.join(base, "spill"),
            use_device=use_device, phase_times=phases,
        )
        dt = time.perf_counter() - t0
        out[f"e2e_streaming_{tag}_s"] = round(dt, 1)
        out[f"e2e_streaming_{tag}_mpts"] = round(n / dt / 1e6, 3)
        out["e2e_streaming_n"] = n
        phases["input_gen"] = gen_s[0]  # contained in "spill", see gen()
        out[f"streaming_phases_{tag}"] = {
            k: round(v, 1) for k, v in phases.items()
        }
        total_meta = sum(c for _, c in result.nodes)
        assert total_meta == n, (total_meta, n)
        out[f"big_meta_points_ok_{tag}"] = True
        if serve:
            # Consume the flagship artifact through the viewer stack it was
            # built for (VERDICT r4 item 4) before the directory is removed.
            try:
                out.update(bench_serve(os.path.join(base, "big")))
            except Exception as e:  # noqa: BLE001 - serve probe is additive
                import sys

                print(f"[bench] serve probe failed: {type(e).__name__}: {e}",
                      file=sys.stderr)
        if not prefix_check:
            return out

        # Validation: in-core build of a prefix, byte-compare shared nodes'
        # files is NOT valid (different point sets).  Instead rebuild the
        # SAME first `validate_prefix` points through the in-core builder
        # into its own directory and compare its bytes against a streaming
        # build of the same prefix.
        kprefix = min(validate_prefix, n)
        pre = synth_points(kprefix, seed=0) if kprefix <= batch_points else None
        if pre is None:
            batches = []
            need = kprefix
            seed = 0
            while need > 0:
                m = min(batch_points, need)
                batches.append(synth_points(m, seed=seed))
                need -= m
                seed += 1
            from point_cloud_viewer_tpu.core.points_batch import PointsBatch

            pre = PointsBatch.concatenate(batches)
        import hashlib

        d_in = os.path.join(base, "prefix_incore")
        d_st = os.path.join(base, "prefix_stream")
        build_octree(d_in, resolution, pre, bounding_box=bbox)
        build_octree_streaming(
            d_st, resolution, pre, bounding_box=bbox, use_device=use_device,
        )
        files = sorted(os.listdir(d_in))
        assert files == sorted(os.listdir(d_st))
        rng = np.random.default_rng(1)
        sample = rng.choice(len(files), size=min(64, len(files)), replace=False)
        for i in sample:
            with open(os.path.join(d_in, files[i]), "rb") as f:
                a = hashlib.sha256(f.read()).digest()
            with open(os.path.join(d_st, files[i]), "rb") as f:
                b = hashlib.sha256(f.read()).digest()
            assert a == b, files[i]
        out["big_prefix_byte_check_ok"] = True
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=16_000_000)
    parser.add_argument("--resolution", type=float, default=0.001)
    parser.add_argument("--skip-baseline", action="store_true")
    parser.add_argument("--skip-queries", action="store_true",
                        help="Skip the streaming-query benchmark suite "
                             "(1M-point octree+S2 builds + 12 queries; runs "
                             "by default — VERDICT r4 item 2).")
    parser.add_argument("--skip-scaling", action="store_true",
                        help="Skip the 16M-128M device-resident scaling runs "
                             "AND the xray splat benchmark.")
    parser.add_argument("--big", type=int, default=256_000_000, metavar="N",
                        help="Size of the end-to-end out-of-core device "
                             "build (0 disables).  Runs in a watchdogged "
                             "subprocess: a wedged relay mid-build cannot "
                             "hang the whole bench.")
    parser.add_argument("--big-only", type=int, default=None, metavar="N",
                        help="Run ONLY the big streaming build and print "
                             "its JSON dict (the subprocess mode --big "
                             "launches).")
    parser.add_argument("--big-mode", choices=["host", "device"],
                        default="device",
                        help="Which derive path the --big-only run uses.")
    parser.add_argument("--big-timeout", type=int, default=5400,
                        help="Seconds before the big-build DEVICE subprocess "
                             "is killed (degrades to null fields); the host "
                             "subprocess gets min(this, 2700).")
    args = parser.parse_args()

    if args.big_only is not None:
        if args.big_only <= 0:
            print(json.dumps({}))
            return
        print(json.dumps(bench_big_streaming(
            args.big_only, args.resolution,
            use_device=args.big_mode == "device",
            # The byte check builds a 16M prefix twice; once (on the stable
            # host run) is enough.  Ditto the serve probe.
            prefix_check=args.big_mode == "host",
            serve=args.big_mode == "host",
        )))
        return

    batch = synth_points(args.n)

    # The axon relay can wedge mid-run (FAILED_PRECONDITION / hangs that
    # recover minutes later).  Device sections degrade to None so the
    # host numbers and the JSON line always land.
    def device_safe(label, fn, default=None):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - report, don't die
            import sys

            print(f"[bench] {label} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            return default

    # Device-resident core (data already in HBM — the local-deployment
    # number) and the two honest end-to-end pipelines.
    device_core_s = device_safe(
        "device core", lambda: time_device_core(batch, args.resolution)
    )
    e2e_device_s = device_safe(
        "device e2e",
        lambda: time_build(
            batch, use_device=True, resolution=args.resolution, warm=True
        ),
    )
    host_phases: dict = {}
    # Median-of-5: this is the headline number and the shared host's
    # run-to-run spread is ~2x (one bad rep at repeats=3 shifts the
    # median visibly; two must collude at 5).  Costs ~16 s.
    host_s = time_build(
        batch, use_device=False, resolution=args.resolution, repeats=5,
        phases=host_phases,
    )
    if args.skip_baseline:
        baseline_s = None
    else:
        # The same full pipeline with every native/device kernel disabled —
        # the single-threaded pure-numpy CPU baseline.
        baseline_s = time_build(
            batch, use_device=False, resolution=args.resolution,
            native_kernels=False, repeats=3,
        )

    # Headline: the best full pipeline available on this machine.
    best_s = min([t for t in (e2e_device_s, host_s) if t is not None])
    mpts = args.n / best_s / 1e6
    # None (not 1.0) when the baseline was skipped: a literal 1.0 would be
    # indistinguishable from a measured parity-with-numpy regression.
    ratio = None if baseline_s is None else baseline_s / best_s

    (cull_ms, cull_device_ms, cull_batched_ms, cull_kernel_ms,
     cull_kernel_noise_ms) = time_cull(num_nodes=4096)
    cull_1m_ms, cull_1m_all_ms = time_cull_1m_nodes()

    extra = {}
    if not args.skip_queries:
        # Host-only (no relay exposure) but still guarded: a failure here
        # must not cost the rest of the bench.
        extra.update(device_safe("query suite", bench_queries, {}))
    if not args.skip_scaling:
        extra.update(device_safe("device scaling", bench_device_scaling, {}))
        extra.update(device_safe("xray splat", bench_xray_splat, {}))
    if args.big:
        import subprocess
        import sys as _sys

        # Host first (stable: no relay exposure), then device (the honest
        # relay-including number, watchdogged hardest).  Separate
        # subprocesses so a wedged relay mid-device-build cannot take the
        # host numbers down with it.
        for mode, tmo in (
            ("host", min(args.big_timeout, 2700)),
            ("device", args.big_timeout),
        ):
            try:
                proc = subprocess.run(
                    [_sys.executable, __file__, "--big-only", str(args.big),
                     "--big-mode", mode, "--resolution", str(args.resolution)],
                    capture_output=True, text=True, timeout=tmo,
                )
                if proc.returncode == 0 and proc.stdout.strip():
                    extra.update(
                        json.loads(proc.stdout.strip().splitlines()[-1])
                    )
                else:
                    print(f"[bench] big streaming ({mode}) failed "
                          f"rc={proc.returncode}: {proc.stderr[-400:]}",
                          file=__import__('sys').stderr)
            except subprocess.TimeoutExpired:
                print(f"[bench] big streaming ({mode}) timed out (wedged "
                      "relay?); continuing without it",
                      file=__import__('sys').stderr)
            except Exception as e:  # noqa: BLE001
                print(f"[bench] big streaming ({mode}) subprocess error: {e}",
                      file=__import__('sys').stderr)

    print(
        json.dumps(
            {
                **extra,
                "metric": "octree_build_mpoints_per_sec",
                "value": round(mpts, 3),
                "unit": "Mpoints/s",
                "vs_baseline": None if ratio is None else round(ratio, 3),
                "headline_path": (
                    "host"
                    if e2e_device_s is None or host_s <= e2e_device_s
                    else "device"
                ),
                "cull_lod_ms_per_frame_4096_nodes": round(cull_ms, 4),
                "cull_lod_ms_per_frame_1m_nodes": round(cull_1m_ms, 4),
                "cull_lod_ms_per_frame_1m_nodes_all_visible": round(
                    cull_1m_all_ms, 4
                ),
                "cull_lod_device_ms_per_frame": (
                    None if cull_device_ms is None
                    else round(cull_device_ms, 4)
                ),
                "cull_lod_ms_per_frame_batched": (
                    None if cull_batched_ms is None
                    else round(cull_batched_ms, 4)
                ),
                "cull_lod_device_kernel_ms_per_frame": (
                    None if cull_kernel_ms is None
                    else round(cull_kernel_ms, 4)
                ),
                "cull_lod_device_kernel_noise_ms_per_frame": (
                    None if cull_kernel_noise_ms is None
                    else round(cull_kernel_noise_ms, 4)
                ),
                "e2e_device_s": (
                    None if e2e_device_s is None else round(e2e_device_s, 3)
                ),
                "host_build_s": round(host_s, 3),
                "host_build_phases": host_phases,
                "numpy_baseline_s": (
                    None if baseline_s is None else round(baseline_s, 3)
                ),
                "device_core_s": (
                    None if device_core_s is None else round(device_core_s, 4)
                ),
                "device_core_mpoints_per_sec": (
                    None if device_core_s is None
                    else round(args.n / device_core_s / 1e6, 3)
                ),
                "n_points": args.n,
            }
        )
    )


if __name__ == "__main__":
    main()
