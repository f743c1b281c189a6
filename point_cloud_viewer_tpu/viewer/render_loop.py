"""Headless viewer runtime — the sdl_viewer's engine without the window.

Reproduces the reference's interactive machinery
(sdl_viewer/src/lib.rs:350-611, node_drawer.rs):

* visible-node selection on a BACKGROUND thread; queued camera matrices are
  drained so only the latest wins (lib.rs:95-111),
* an LRU node cache sized max_nodes_in_memory = cache_size_mb * 5, filled by
  an async loader with at most 10 requests in flight (node_drawer.rs:263-336),
* point order within a node is SHUFFLED once at load, so drawing a prefix
  of 1/lod of the points is a uniform subsample (node_drawer.rs:185-201),
* an adaptive node budget while moving: shrink 10% when FPS < 20, grow 10%
  when FPS > 25 (lib.rs:220-227).

The draw target is pluggable; the built-in one is the numpy software
rasterizer, so the whole viewer stack runs (and is benchmarked) headless.
"""

from __future__ import annotations

import queue
import threading
import time
from collections import OrderedDict
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..octree.node_id import NodeId
from ..octree.octree import Octree
from .camera import Camera
from .software_raster import rasterize_points

MAX_NODES_IN_FLIGHT = 10
FPS_LOWER, FPS_UPPER = 20.0, 25.0


@dataclass
class NodeView:
    """A node's decoded, shuffled point data ready to draw."""

    positions: np.ndarray  # (N, 3) f64 world coords (planet-scale safe)
    colors: np.ndarray  # (N, 3) u8

    def prefix(self, level_of_detail: int) -> Tuple[np.ndarray, np.ndarray]:
        n = int(np.ceil(len(self.positions) / level_of_detail))
        return self.positions[:n], self.colors[:n]


class _DaemonPool:
    """Fixed-size pool of DAEMON worker threads.  Unlike the stdlib
    ThreadPoolExecutor (whose non-daemon workers are JOINED at interpreter
    exit), a node load wedged on a hung remote data provider cannot block
    process exit — the same guarantee the renderer's bounded thread join
    provides for the visible-node thread."""

    def __init__(self, max_workers: int, name: str) -> None:
        self._q: "queue.Queue" = queue.Queue()
        self._threads = [
            threading.Thread(target=self._run, daemon=True, name=f"{name}-{i}")
            for i in range(max_workers)
        ]
        for t in self._threads:
            t.start()

    def _run(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            fn, args = item
            try:
                fn(*args)
            except Exception:  # noqa: BLE001 - loaders report via queues
                pass

    def submit(self, fn, *args) -> None:
        self._q.put((fn, args))

    def shutdown(self, **_ignored) -> None:
        for _ in self._threads:
            self._q.put(None)


class NodeViewContainer:
    """LRU cache + async loader (reference node_drawer.rs:263-336)."""

    def __init__(self, octree: Octree, max_nodes_in_memory: int) -> None:
        self.octree = octree
        self.max_nodes = max_nodes_in_memory
        self._cache: "OrderedDict[int, NodeView]" = OrderedDict()
        self._in_flight: Dict[int, bool] = {}
        self._arrived: "queue.Queue" = queue.Queue()
        self._pool = _DaemonPool(max_workers=4, name="pcv-node-loader")
        self._lock = threading.Lock()

    def _load(self, node_id: NodeId) -> None:
        try:
            batch = self.octree.points_in_node(node_id, attributes=["color"])
            # Seed per NODE ID: deterministic LOD subsamples regardless of
            # which loader thread runs which node (a single shared seeded
            # generator would be consumed in completion order).
            perm = np.random.default_rng(node_id.value ^ 2).permutation(len(batch))
            view = NodeView(
                positions=batch.position[perm],
                colors=batch.attributes["color"][perm],
            )
            self._arrived.put((node_id.value, view))
        except Exception:
            self._arrived.put((node_id.value, None))

    def consume_arrived(self) -> int:
        """Move completed loads into the cache; returns how many arrived."""
        n = 0
        while True:
            try:
                key, view = self._arrived.get_nowait()
            except queue.Empty:
                break
            with self._lock:
                self._in_flight.pop(key, None)
                if view is not None:
                    self._cache[key] = view
                    self._cache.move_to_end(key)
                    while len(self._cache) > self.max_nodes:
                        self._cache.popitem(last=False)
            n += 1
        return n

    def get_or_request(self, node_id: NodeId) -> Optional[NodeView]:
        key = node_id.value
        with self._lock:
            view = self._cache.get(key)
            if view is not None:
                self._cache.move_to_end(key)
                return view
            if key not in self._in_flight and len(self._in_flight) < MAX_NODES_IN_FLIGHT:
                self._in_flight[key] = True
                self._pool.submit(self._load, node_id)
        return None

    def shutdown(self) -> None:
        self._pool.shutdown()


@dataclass
class FrameStats:
    nodes_drawn: int = 0
    points_drawn: int = 0
    visible_nodes: int = 0
    moving: bool = False


class PointCloudRenderer:
    """The per-frame engine: visible-node thread + cache + draw."""

    def __init__(
        self,
        octree: Octree,
        cache_size_mb: int = 2000,
        width: int = 800,
        height: int = 600,
        device_cull: bool = False,
    ) -> None:
        # Cache size clamped to [1000, 16000] MB, ~200 KB per node =>
        # max nodes = MB * 5 (reference lib.rs:374-385).
        cache_size_mb = max(1000, min(16_000, cache_size_mb))
        self.octree = octree
        self.node_views = NodeViewContainer(octree, max_nodes_in_memory=cache_size_mb * 5)
        self.width = width
        self.height = height
        self.max_nodes_moving = cache_size_mb * 5
        self._budget_frames = 0
        self._budget_window_start = time.perf_counter()
        self.point_size_lod = 2  # draw 1/2 of points while moving
        self.show_octree_nodes = False
        # Interactive display knobs (reference lib.rs:505-508 binds keys
        # 7/8/9/0 to +-0.1 steps); the GL pipeline consumes them as shader
        # uniforms, the software rasterizer applies them directly.
        self.gamma = 1.0
        self.point_size = 2.0
        # device_cull: run the per-frame cull through a DeviceCullSession
        # (node table resident in accelerator HBM, one dispatch per frame)
        # instead of the host-native kernels — the production path when the
        # accelerator is local (relay-attached chips pay ~30 ms dispatch
        # latency per frame, so host culling is the right default here).
        self.device_cull = device_cull
        self._cull_session = None
        self._visible: List[NodeId] = []
        self._matrix_queue: "queue.Queue" = queue.Queue()
        self._visible_lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._visible_worker, daemon=True)
        self._thread.start()

    # -- background visible-node computation -------------------------------

    def _device_visible(self, matrix: np.ndarray) -> List[NodeId]:
        """Visible-node calc through the HBM-resident cull session (same
        SAT + screen-size rules as the host path, f32; near-tie display
        order may permute vs the host's f64 — the reference's own
        screen-size-heuristic nondeterminism class)."""
        from ..math.geometry import Frustum
        from ..ops.culling import DeviceCullSession

        if self._cull_session is None:
            self._cull_session = DeviceCullSession(
                self.octree.cube_mins, self.octree.cube_edges,
                self.octree.num_points,
            )
        order, _, visible = self._cull_session.step(Frustum.from_matrix4(matrix))
        count = min(int(visible.sum()), self.node_views.max_nodes)
        return [self.octree.node_ids[i] for i in order[:count]]

    def _visible_worker(self) -> None:
        while not self._stop.is_set():
            try:
                matrix = self._matrix_queue.get(timeout=0.05)
            except queue.Empty:
                continue
            # Drain: only the latest matrix matters (lib.rs:102-111).
            while True:
                try:
                    matrix = self._matrix_queue.get_nowait()
                except queue.Empty:
                    break
            # A non-finite matrix (NaN pose) does NOT raise: NaN SAT
            # comparisons cull nothing, so every node in a 1M-node tree
            # would go "visible" and storm the loader. Treat it like the
            # raising degenerate cases below: keep the previous set.
            if not np.isfinite(matrix).all():
                import sys

                print("viewer: non-finite camera matrix; keeping previous "
                      "visible set", file=sys.stderr)
                continue
            # Cap at the node-cache capacity: nothing beyond it can be
            # drawn, and the top-K cull is much cheaper at ~1M-node scale.
            try:
                if self.device_cull:
                    try:
                        visible = self._device_visible(matrix)
                    except Exception as e:  # noqa: BLE001 - degrade, don't die
                        # A dead/unreachable accelerator must not leave the
                        # viewer frozen on an empty node list: fall back to
                        # the host cull for the rest of the session.
                        import sys

                        print(
                            f"viewer: device cull failed ({type(e).__name__}: "
                            f"{e}); falling back to host culling",
                            file=sys.stderr,
                        )
                        self.device_cull = False
                        visible = self.octree.get_visible_nodes(
                            matrix, max_nodes=self.node_views.max_nodes
                        )
                else:
                    visible = self.octree.get_visible_nodes(
                        matrix, max_nodes=self.node_views.max_nodes
                    )
            except Exception as e:  # noqa: BLE001 - a bad frame must not
                # kill this thread: a singular/NaN matrix (corrupt pose
                # slot, degenerate camera) raises in Frustum/inv; keep the
                # previous visible set and wait for the next camera update.
                import sys

                print(f"viewer: cull failed ({type(e).__name__}: {e}); "
                      "keeping previous visible set", file=sys.stderr)
                continue
            with self._visible_lock:
                self._visible = visible

    def camera_changed(self, world_to_gl: np.ndarray) -> None:
        self._matrix_queue.put(world_to_gl)

    # -- display knobs --------------------------------------------------------

    def adjust_gamma(self, delta: float) -> None:
        """Key 7/8 binding (reference lib.rs:505-506)."""
        self.gamma = max(0.1, self.gamma + delta)
        gl = getattr(self, "gl_renderer", None)
        if gl is not None:
            gl.gamma = self.gamma

    def adjust_point_size(self, delta: float) -> None:
        """Key 9/0 binding (reference lib.rs:507-508)."""
        self.point_size = max(0.1, self.point_size + delta)
        gl = getattr(self, "gl_renderer", None)
        if gl is not None:
            gl.point_size = self.point_size

    # -- adaptive budget -----------------------------------------------------

    def adapt_budget(self, moving: bool, now: Optional[float] = None) -> None:
        """FPS feedback on the moving node budget: +-10% from the AVERAGED
        frame rate, at most once per second, and only while the camera
        moves (reference lib.rs:213-227).  Per-frame instantaneous feedback
        would compound 0.9 every frame and collapse the budget to 1 within
        seconds of sub-20-FPS rendering."""
        if now is None:
            now = time.perf_counter()
        self._budget_frames += 1
        duration = now - self._budget_window_start
        if duration <= 1.0:
            return
        fps = self._budget_frames / duration
        if moving:
            if fps < FPS_LOWER:
                self.max_nodes_moving = max(1, int(self.max_nodes_moving * 0.9))
            elif fps > FPS_UPPER:
                self.max_nodes_moving = min(
                    self.node_views.max_nodes,
                    int(self.max_nodes_moving * 1.1) + 1,
                )
        self._budget_frames = 0
        self._budget_window_start = now

    def resize(self, width: int, height: int) -> None:
        """Window size changed (reference lib.rs:581-586 -> set_size)."""
        self.width = width
        self.height = height

    # -- drawing ------------------------------------------------------------

    def draw(
        self, world_to_gl: np.ndarray, moving: bool = False, render: bool = False
    ):
        """One frame: returns (FrameStats, image or None)."""
        self.node_views.consume_arrived()
        with self._visible_lock:
            visible = list(self._visible)
        limit = self.max_nodes_moving if moving else len(visible)
        lod = self.point_size_lod if moving else 1
        stats = FrameStats(visible_nodes=len(visible), moving=moving)
        pos_parts, col_parts = [], []
        drawn_ids = []
        for node_id in visible[:limit]:
            view = self.node_views.get_or_request(node_id)
            if view is None:
                continue
            p, c = view.prefix(lod)
            stats.nodes_drawn += 1
            stats.points_drawn += len(p)
            drawn_ids.append(node_id)
            if render:
                pos_parts.append(p)
                col_parts.append(c)
        image = None
        if render:
            positions = (
                np.concatenate(pos_parts) if pos_parts else np.empty((0, 3))
            )
            colors = (
                np.concatenate(col_parts)
                if col_parts
                else np.empty((0, 3), dtype=np.uint8)
            )
            if self.gamma != 1.0 and len(colors):
                # Match the GL fragment stage: pow(color, 1/gamma)
                # (viewer/gl/shaders/points.fs).
                colors = (
                    ((colors / 255.0) ** (1.0 / self.gamma)) * 255.0
                ).astype(np.uint8)
            image = rasterize_points(
                positions, colors, world_to_gl, self.width, self.height,
                point_size=max(1, int(round(self.point_size / 2.0))),
            )
            if self.show_octree_nodes and drawn_ids:
                from .software_raster import draw_wireframe_boxes

                metas = [self.octree.node_meta(n) for n in drawn_ids]
                draw_wireframe_boxes(
                    image,
                    np.stack([m.cube_min for m in metas]),
                    np.array([m.edge_length for m in metas]),
                    world_to_gl,
                )
        return stats, image

    def shutdown(self) -> None:
        self._stop.set()
        # device_cull: the worker may sit inside a jitted call (first frame
        # includes the XLA compile); exiting the interpreter with that call
        # in flight aborts in the XLA runtime's teardown.  Wait it out —
        # bounded, so a wedged remote backend can't hang exit forever.
        self._thread.join(timeout=20 if self.device_cull else 2)
        self.node_views.shutdown()


def run_headless(
    octree_directory: str,
    num_frames: int = 100,
    width: int = 800,
    height: int = 600,
    screenshot_path: Optional[str] = None,
    frame_pacing_s: float = 0.01,
    use_gl: bool = False,
    show_octree_nodes: bool = False,
    device_cull: bool = False,
    cache_size_mb: int = 2000,
) -> FrameStats:
    """Drive the full viewer loop headlessly: orbit the camera around the
    cloud, stream nodes, adapt the budget, and optionally save the final
    frame.  Returns the last frame's stats.

    use_gl=True renders through the real OpenGL pipeline (surfaceless EGL,
    shader-side decode — viewer/gl/) instead of the software rasterizer."""
    octree = Octree.from_directory(octree_directory)
    camera = Camera(width, height)
    center = octree.bounding_box.center()
    diag = float(np.linalg.norm(octree.bounding_box.diag()))
    if use_gl:
        from .gl.viewer import GlPointCloudRenderer

        renderer = GlPointCloudRenderer(
            octree, width=width, height=height, device_cull=device_cull,
            cache_size_mb=cache_size_mb,
        )
    else:
        renderer = PointCloudRenderer(
            octree, width=width, height=height, device_cull=device_cull,
            cache_size_mb=cache_size_mb,
        )
    renderer.show_octree_nodes = show_octree_nodes
    try:
        stats = FrameStats()
        for frame in range(num_frames):
            angle = 2 * np.pi * frame / num_frames
            camera.position = center + diag * np.array(
                [np.cos(angle), np.sin(angle), 0.5]
            )
            camera.theta = angle + np.pi / 2
            camera.phi = np.pi / 3
            camera.moved = True
            moved = camera.update(1 / 60)
            matrix = camera.world_to_gl()
            renderer.camera_changed(matrix)
            want_shot = screenshot_path is not None and frame == num_frames - 1
            stats, image = renderer.draw(matrix, moving=moved, render=want_shot)
            if want_shot:
                # Let the async loads settle so the final frame is complete.
                deadline = time.perf_counter() + 5.0
                while (
                    stats.nodes_drawn < stats.visible_nodes
                    and time.perf_counter() < deadline
                ):
                    time.sleep(0.02)
                    stats, image = renderer.draw(
                        matrix, moving=False, render=True
                    )
            renderer.adapt_budget(moved)
            if want_shot and image is not None:
                from PIL import Image

                Image.fromarray(image, "RGBA").save(screenshot_path)
            time.sleep(frame_pacing_s)
        return stats
    finally:
        renderer.shutdown()
