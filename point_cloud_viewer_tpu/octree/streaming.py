"""Out-of-core octree building: clouds larger than RAM.

The in-memory builder (builder.py) needs ~90 bytes/point of headroom; this
module bounds memory by an external Morton bucket partition:

1. PASS 1 streams the input once for the bounding box (the reference's
   find_bounding_box pre-pass, src/octree/generation.rs:256-270).
2. PASS 2 streams batches, Morton-encodes, and spills each point's data to
   one of 8^B bucket files by its code's top 3B bits (a disk-level radix
   step — the external analogue of the sharded all-to-all exchange in
   parallel/sharded_build.py; buckets = level-B subtrees, so no tree work
   ever crosses a bucket).
3. Each bucket is loaded (bounded size), its subtree is derived with the
   standard in-memory machinery rooted at the bucket's level-B node, and
   everything BELOW level B is written; the bucket root's residual point
   list (what survives promotion into it) is kept.
4. The shallow top (levels < B) is finished in memory from the bucket
   roots' residuals (at most ~N/8 points across all buckets, usually far
   fewer).

Output is bit-identical to the in-memory builder whenever bucket spills
preserve batch order (they do: buckets are append-only in stream order,
and within a bucket the standard stable sort applies).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Dict, Iterable, Iterator, List, Optional, Sequence, Tuple, Union

import numpy as np

from ..core.constants import CURRENT_VERSION, META_FILENAME
from ..core.points_batch import PointsBatch
from ..math.geometry import Aabb, Cube
from ..ops import morton
from .builder import (
    BuildResult,
    _LevelNodes,
    _meta_proto,
    _subsample_bottom_up,
    _write_levels,
    compute_depth_cap,
)
from .node_id import NodeId


from ..utils.progress import timed_phase as _timed_phase


def _iter_batches(data) -> Iterator[PointsBatch]:
    if isinstance(data, PointsBatch):
        yield data
    else:
        yield from data


class _BucketSpill:
    """Append-only per-bucket spill files (one .bin per array column)."""

    def __init__(self, directory: str, num_buckets: int) -> None:
        self.directory = directory
        self.num_buckets = num_buckets
        self.counts = np.zeros(num_buckets, dtype=np.int64)
        self._schemas: Optional[List[Tuple[str, np.dtype, int]]] = None

    def _path(self, bucket: int, name: str) -> str:
        return os.path.join(self.directory, f"b{bucket:04d}.{name}")

    def append(self, bucket_ids: np.ndarray, batch: PointsBatch) -> None:
        if self._schemas is None:
            self._schemas = [("position", np.dtype("<f8"), 3)] + [
                (k, np.dtype(v.dtype).newbyteorder("<"),
                 v.shape[1] if v.ndim == 2 else 1)
                for k, v in batch.attributes.items()
            ]
        from .. import native

        if len(bucket_ids) == 0:  # e.g. a reader's trailing empty chunk
            return
        # Bucket ids span only 8^B values: one bincount pass gives both the
        # run boundaries AND feeds the native stable counting scatter —
        # identical order to a stable sort by id, ~5x cheaper than the
        # radix argsort this replaced (no u64 key copies, no sorted-key
        # materialization).
        counts = np.bincount(bucket_ids, minlength=self.num_buckets)
        order = native.counting_argsort(bucket_ids, counts)
        if order is None:  # no native library: stable numpy sort
            order = np.argsort(bucket_ids, kind="stable")
        uniq = np.flatnonzero(counts)
        ends = np.cumsum(counts[uniq])
        starts = ends - counts[uniq]
        arrays = {"position": batch.position, **batch.attributes}
        for b, s, e in zip(uniq, starts, ends):
            sel = order[s:e]
            for name, dt, _ in self._schemas:
                # Native row gather (~6x numpy fancy indexing here) +
                # direct tofile: the old astype().tobytes() chain copied
                # the batch twice more.  astype only fires when the file
                # byte order differs from memory (big-endian hosts).
                part = native.take_rows(arrays[name], sel)
                if part is None:
                    part = arrays[name][sel]
                if part.dtype != dt:
                    part = part.astype(dt)
                with open(self._path(int(b), name), "ab") as f:
                    part.tofile(f)
            self.counts[int(b)] += e - s

    def load(self, bucket: int) -> Optional[PointsBatch]:
        if self.counts[bucket] == 0:
            return None
        arrays = {}
        for name, dt, dim in self._schemas:
            raw = np.fromfile(self._path(bucket, name), dtype=dt)
            arrays[name] = raw.reshape(-1, dim) if dim > 1 else raw
        position = arrays.pop("position")
        return PointsBatch(position=position, attributes=arrays)

    def delete(self, bucket: int) -> None:
        for name, _, _ in self._schemas or []:
            try:
                os.remove(self._path(bucket, name))
            except FileNotFoundError:
                pass


_SPILL_MARKER = "_spill_complete.json"


def _checkpoint_params(resolution, bounding_box, b_levels, depth_cap,
                       attributes, total_cap) -> dict:
    return {
        "resolution": float(resolution),
        "bbox_min": [float(v) for v in bounding_box.mins],
        "bbox_max": [float(v) for v in bounding_box.maxs],
        "bucket_levels": int(b_levels),
        "depth_cap": int(depth_cap),
        "total_cap": int(total_cap),
        "attributes": sorted(attributes) if attributes is not None else None,
    }


def _bucket_done_paths(spill_dir: str, bucket: int):
    base = os.path.join(spill_dir, f"_done_b{bucket:04d}")
    return base + ".json", base + ".npz"


def build_octree_streaming(
    output_directory: str,
    resolution: float,
    data: Union[PointsBatch, Iterable[PointsBatch]],
    bounding_box: Optional[Aabb] = None,
    attributes: Optional[Sequence[str]] = None,
    bucket_levels: int = 2,
    spill_directory: Optional[str] = None,
    use_device: bool = False,
    phase_times: Optional[dict] = None,
) -> BuildResult:
    """Bounded-memory build: peak RAM ~ the largest bucket (~N/8^B for
    spatially spread data) instead of the whole cloud.

    `data` may be a PointsBatch or any iterator of batches (e.g. PlyReader);
    for iterator input, `bounding_box` must be supplied OR the iterator must
    be re-iterable (we stream it twice).

    CHECKPOINT/RESUME: with an explicit `spill_directory`, long builds are
    resumable — the spill pass writes a completion marker, and every
    finished bucket subtree persists its residual + recorded nodes before
    its spill files are deleted.  Re-running the same call after a crash
    skips the spill pass and all finished buckets (the result is
    byte-identical to an uninterrupted build; enforced by tests).

    `use_device`: run each bucket's subtree derivation (sort + leaf
    assignment + LOD promotion) on the default JAX device — this is how the
    53 Mpts/s device core scales past HBM: buckets bound the device working
    set, codes ship 8 B/pt up and (order, levels) 6 B/pt down, and output
    stays byte-identical to the host path.
    """
    import json

    from ..io.node_io import attempt_increasing_rlimit_to_max

    attempt_increasing_rlimit_to_max()
    os.makedirs(output_directory, exist_ok=True)

    if (
        bounding_box is None
        and not isinstance(data, PointsBatch)
        and iter(data) is data
    ):
        # A one-shot iterator would be exhausted by the bbox pass and the
        # spill pass would then see nothing — a silently empty octree.
        raise ValueError(
            "data is a one-shot iterator: pass bounding_box= explicitly or "
            "provide a re-iterable input (the stream is read twice)"
        )

    if bounding_box is None:
        if isinstance(data, PointsBatch):
            bounding_box = Aabb.bounding_points(data.position)
        else:
            bounding_box = None
            for b in _iter_batches(data):
                if attributes is not None and bounding_box is None:
                    # First batch: fail a typo'd attribute name before the
                    # (potentially hours-long) bbox + spill passes.
                    missing = [a for a in attributes if a not in b.attributes]
                    if missing:
                        raise ValueError(
                            f"requested attributes not in input: {missing}"
                        )
                bb = Aabb.bounding_points(b.position)
                if bounding_box is None:
                    bounding_box = bb
                else:
                    bounding_box.grow(bb.mins)
                    bounding_box.grow(bb.maxs)
            if bounding_box is None:
                bounding_box = Aabb.zero()
    root_cube = Cube.bounding(bounding_box)
    from .node_id import MAX_FORMAT_LEVEL

    # total_cap past the u64 budget (21) = a deep build: fat level-21
    # cells are split further inside each bucket subtree by re-rooted
    # sub-builds, exactly as the in-core builder does (_split_fat_leaves).
    total_cap = compute_depth_cap(
        root_cube.edge_length, resolution, max_level=MAX_FORMAT_LEVEL
    )
    depth_cap = min(total_cap, morton.MAX_DEPTH)
    b_levels = min(bucket_levels, depth_cap - 1)
    num_buckets = 8**b_levels

    spill_dir = spill_directory or tempfile.mkdtemp(prefix="octree_spill_")
    os.makedirs(spill_dir, exist_ok=True)
    spill = _BucketSpill(spill_dir, num_buckets)

    params = _checkpoint_params(
        resolution, bounding_box, b_levels, depth_cap, attributes, total_cap
    )
    marker_path = os.path.join(spill_dir, _SPILL_MARKER)
    resumed = False
    if spill_directory is not None and os.path.exists(marker_path):
        try:
            with open(marker_path) as f:
                marker = json.load(f)
        except (json.JSONDecodeError, OSError):
            marker = {}  # truncated by a crash mid-write: clean slate below
        marker_params = marker.get("params")
        if (
            isinstance(marker_params, dict)
            and "total_cap" not in marker_params
            and params["total_cap"] == params["depth_cap"]
        ):
            # Checkpoint written before total_cap existed: such builds
            # were always non-deep (total_cap == depth_cap), so a legacy
            # marker whose other params match is the SAME build.
            marker_params = {**marker_params, "total_cap": params["depth_cap"]}
        if marker_params == params:
            # Resume: the spill pass already completed for this exact build.
            total = int(marker["total"])
            spill.counts = np.asarray(marker["counts"], dtype=np.int64)
            spill._schemas = [
                (name, np.dtype(dt), int(dim))
                for name, dt, dim in marker["schemas"]
            ]
            resumed = True
        elif "params" in marker:
            raise ValueError(
                f"spill directory {spill_dir} holds a checkpoint for a "
                "DIFFERENT build (params mismatch); use a fresh directory"
            )
        # else: corrupt/unparseable marker == no checkpoint -> clean slate.

    # --- PASS 2: spill by top bucket bits ----------------------------------
    if not resumed:
        # A crash DURING a previous spill pass leaves partial append-only
        # bucket files with no marker; appending onto them would duplicate
        # (and possibly misalign) points.  Start from a clean slate —
        # removing only files matching OUR naming patterns.
        import re

        ours = re.compile(r"^(b\d{4,}\..+|_done_b\d{4,}\.(json|npz))$")
        for name in os.listdir(spill_dir):
            if ours.match(name) or name == _SPILL_MARKER:
                try:
                    os.remove(os.path.join(spill_dir, name))
                except OSError:
                    pass
        total = 0
        with _timed_phase(phase_times, "spill"):
            for batch in _iter_batches(data):
                if attributes is not None:
                    # Same up-front error as build_octree (builder.py): a
                    # typo'd name must not surface as a bare KeyError after
                    # a potentially hours-long bbox pass.
                    missing = [a for a in attributes if a not in batch.attributes]
                    if missing:
                        raise ValueError(
                            f"requested attributes not in input: {missing}"
                        )
                    batch = PointsBatch(
                        position=batch.position,
                        attributes={a: batch.attributes[a] for a in attributes},
                    )
                codes, _ = morton.quantize_and_encode(
                    batch.position, root_cube.min, root_cube.edge_length,
                    depth_cap,
                )
                buckets = (
                    codes >> np.uint64(3 * (depth_cap - b_levels))
                ).astype(np.int64)
                spill.append(buckets, batch)
                total += len(batch)
        if spill_directory is not None:
            # Atomic: a crash mid-write must not leave truncated JSON that
            # poisons every later resume attempt.
            tmp = marker_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({
                    "params": params,
                    "total": total,
                    "counts": [int(c) for c in spill.counts],
                    "schemas": [
                        (name, dt.str, int(dim))
                        for name, dt, dim in (spill._schemas or [])
                    ],
                }, f)
            os.replace(tmp, marker_path)

    if total == 0:
        meta = _meta_proto(resolution, bounding_box, [])
        with open(os.path.join(output_directory, META_FILENAME), "wb") as f:
            f.write(meta.encode())
        shutil.rmtree(spill_dir, ignore_errors=True)
        return BuildResult(output_directory, root_cube, resolution, bounding_box, [], 0)

    # --- top structure from aggregated bucket counts -----------------------
    top_leaf_of_bucket, split_b = top_structure(
        spill.counts, b_levels, root_cube, resolution, depth_cap
    )

    # --- per-bucket subtree builds -----------------------------------------
    checkpointing = spill_directory is not None
    recorded: List[Tuple[NodeId, int]] = []
    # (level, batch) pairs feeding the top pass: bucket residuals at level B
    # and whole point sets of shallow leaves.
    top_inputs: List[Tuple[int, PointsBatch]] = []

    def _record_bucket(bkt: int, residual: PointsBatch, nodes) -> None:
        recorded.extend(nodes)
        top_inputs.append((b_levels, residual))
        if checkpointing:
            # Persist residual + recorded nodes BEFORE deleting the spill:
            # a crash in between just reprocesses this bucket (idempotent —
            # node files are rewritten identically).
            dj, dn = _bucket_done_paths(spill_dir, bkt)
            with open(dn + ".tmp", "wb") as f:
                np.savez(
                    f, position=residual.position,
                    **{f"attr_{k}": v for k, v in residual.attributes.items()},
                )
            os.replace(dn + ".tmp", dn)
            tmp = dj + ".tmp"
            with open(tmp, "w") as f:
                json.dump(
                    {"nodes": [[str(nid.value), c] for nid, c in nodes]}, f
                )
            os.replace(tmp, dj)  # json presence = record complete
        spill.delete(bkt)

    # Device pipelining (non-deep builds): keep ONE bucket's device
    # derivation in flight ahead of the bucket being finished, so the
    # host-side group/encode/write and the next spill load run UNDER the
    # device program + transfers.  Completion is FIFO, so written bytes and
    # checkpoint order are identical to the sequential path.
    pipeline_device = use_device and total_cap == depth_cap
    inflight: List[Tuple[int, PointsBatch, tuple]] = []

    def _complete_oldest() -> None:
        bkt, bbatch, state = inflight.pop(0)
        residual, nodes = _finish_device_bucket(
            output_directory, bbatch, state, root_cube, resolution,
            depth_cap, b_levels, phase_times,
        )
        _record_bucket(bkt, residual, nodes)

    for bucket in range(num_buckets):
        if spill.counts[bucket] == 0:
            continue
        leaf_lvl = int(top_leaf_of_bucket[bucket])
        if leaf_lvl >= 0 or bucket not in split_b:
            # No subtree work: the whole bucket feeds the top pass.  Its
            # spill files stay until the very end when checkpointing (the
            # top pass is redone on resume).
            bucket_batch = spill.load(bucket)
            if not checkpointing:
                spill.delete(bucket)
            top_inputs.append(
                (leaf_lvl if leaf_lvl >= 0 else b_levels, bucket_batch)
            )
            continue

        done_json, done_npz = _bucket_done_paths(spill_dir, bucket)
        done_valid = False
        if checkpointing and os.path.exists(done_json):
            try:
                with open(done_json) as f:
                    done = json.load(f)
                done_valid = True
            except (json.JSONDecodeError, OSError):
                done_valid = False  # crashed mid-write: rebuild this bucket
        if done_valid:
            # Resume: this bucket's subtree is already on disk.
            recorded.extend(
                (NodeId(int(v)), int(c)) for v, c in done["nodes"]
            )
            payload = np.load(done_npz)
            residual = PointsBatch(
                position=payload["position"],
                attributes={
                    k[5:]: payload[k]
                    for k in payload.files if k.startswith("attr_")
                },
            )
            top_inputs.append((b_levels, residual))
            continue

        with _timed_phase(phase_times, "bucket_load"):
            bucket_batch = spill.load(bucket)
        if pipeline_device:
            state = _dispatch_device_bucket(
                bucket_batch, root_cube, depth_cap, b_levels, phase_times
            )
            inflight.append((bucket, bucket_batch, state))
            if len(inflight) > 1:
                _complete_oldest()
            continue
        residual, nodes = _build_bucket_subtree(
            output_directory,
            bucket_batch,
            bucket_path=bucket,
            bucket_level=b_levels,
            root_cube=root_cube,
            resolution=resolution,
            depth_cap=depth_cap,
            use_device=use_device,
            total_cap=total_cap,
            phase_times=phase_times,
        )
        _record_bucket(bucket, residual, nodes)
    while inflight:
        _complete_oldest()

    # --- shallow top: levels b_levels..0 ------------------------------------
    with _timed_phase(phase_times, "top"):
        top_nodes = _finish_top(
            output_directory, top_inputs, root_cube, resolution, depth_cap
        )
    recorded.extend(top_nodes)

    meta = _meta_proto(resolution, bounding_box, recorded)
    with open(os.path.join(output_directory, META_FILENAME), "wb") as f:
        f.write(meta.encode())
    # Success: the checkpoint (marker, done-records, retained no-subtree
    # spill files) is only cleared now, so a crash anywhere above — the
    # top pass and meta write included — resumes instead of restarting.
    shutil.rmtree(spill_dir, ignore_errors=True)
    # Report total_cap (up to 40 for deep builds), matching build_octree's
    # BuildResult for the byte-identical in-core build of the same cloud.
    return BuildResult(
        output_directory, root_cube, resolution, bounding_box, recorded, total_cap
    )


def top_structure(
    bucket_counts: np.ndarray,
    b_levels: int,
    root_cube: Cube,
    resolution: float,
    depth_cap: int,
) -> Tuple[np.ndarray, set]:
    """Exact split structure for levels 0..B from per-level-B-cell point
    counts: a node above the bucket level may itself be a leaf, so decide
    splits from the (exact) aggregated counts the way the in-memory builder
    would (its _discover_levels top rows).  Returns
    (top_leaf_of_bucket (8^B,) int64 — the shallow leaf level covering each
    bucket, -1 where the bucket's level-B node splits further — and split_b,
    the set of level-B paths that split).  Shared by the out-of-core bucket
    builder and the distributed mesh builder."""
    from ..core.constants import MAX_POINTS_PER_NODE

    num_buckets = 8**b_levels
    top_leaf_of_bucket = np.full(num_buckets, -1, dtype=np.int64)  # leaf level
    split = {0: np.zeros(1, dtype=np.uint64)}  # root always splits
    level_counts = {
        lvl: np.add.reduceat(
            bucket_counts, np.arange(0, num_buckets, 8 ** (b_levels - lvl))
        )
        for lvl in range(b_levels + 1)
    }
    for lvl in range(1, b_levels + 1):
        parent_split = split[lvl - 1]
        children = (parent_split[:, None] << np.uint64(3)) | np.arange(8, dtype=np.uint64)
        children = children.ravel()
        counts = level_counts[lvl][children.astype(np.int64)]
        nonempty = counts > 0
        edge = root_cube.edge_length / (1 << lvl)
        can_split = lvl < depth_cap and edge > resolution
        is_leaf = nonempty & ((counts <= MAX_POINTS_PER_NODE) | (not can_split))
        # Mark buckets under each leaf.
        for path in children[is_leaf]:
            span = 8 ** (b_levels - lvl)
            start = int(path) * span
            top_leaf_of_bucket[start : start + span] = lvl
        split[lvl] = children[nonempty & ~is_leaf]
    split_b = set(int(p) for p in split.get(b_levels, []))
    return top_leaf_of_bucket, split_b


def _build_bucket_subtree(
    output_directory: str,
    batch: PointsBatch,
    bucket_path: int,
    bucket_level: int,
    root_cube: Cube,
    resolution: float,
    depth_cap: int,
    use_device: bool = False,
    total_cap: Optional[int] = None,
    phase_times: Optional[dict] = None,
) -> Tuple[PointsBatch, List[Tuple[NodeId, int]]]:
    """Build the subtree under one level-B node: writes all nodes at levels
    > B, returns the bucket node's residual points (its post-promotion
    content, NOT yet written — the top pass promotes out of it).
    `use_device`: sort + leaf assignment + LOD promotion run as one jitted
    program on the default JAX device (minimal transfers: 8 B/pt up,
    6 B/pt down), bit-identical to the host kernels.
    `total_cap` > depth_cap marks a DEEP build: fat level-depth_cap cells
    inside this bucket are split by re-rooted sub-builds
    (builder._split_fat_leaves — device-capable) and the bucket derivation
    then splits by the RAW counts while slicing the reduced arrays, exactly
    like the in-core deep path."""
    n = len(batch)
    from .. import native
    from ..core.constants import MAX_POINTS_PER_NODE
    from .builder import _group_subtree_levels

    deep = total_cap is not None and total_cap > depth_cap
    if use_device and not deep:
        state = _dispatch_device_bucket(
            batch, root_cube, depth_cap, bucket_level, phase_times
        )
        return _finish_device_bucket(
            output_directory, batch, state, root_cube, resolution,
            depth_cap, bucket_level, phase_times,
        )

    with _timed_phase(phase_times, "bucket_quantize"):
        codes, _ = morton.quantize_and_encode(
            batch.position, root_cube.min, root_cube.edge_length, depth_cap
        )
    with _timed_phase(phase_times, "bucket_sort"):
        if use_device:
            from ..ops.tree_build import argsort_codes_on_device

            codes, order = argsort_codes_on_device(codes)
        else:
            codes, order = morton.argsort_codes(codes)

    if deep:
        from .builder import _split_fat_leaves

        raw_codes = codes
        codes, order, deep_nodes = _split_fat_leaves(
            output_directory, codes, order, batch, root_cube, resolution,
            depth_cap, total_cap, use_device=use_device,
        )
        levels = _discover_subtree_levels(
            codes, len(codes), depth_cap, root_cube.edge_length, resolution,
            bucket_path, bucket_level, raw_codes=raw_codes,
        )
        final_nodes = _subsample_bottom_up(levels, stop_level=bucket_level)
        residual_idx = (
            final_nodes.pop(bucket_level).idx
            if bucket_level in final_nodes
            else np.empty(0, dtype=np.int64)
        )
        nodes = _write_levels(
            output_directory, final_nodes, batch, order, root_cube,
            resolution,
        )
        nodes.extend(deep_nodes)
        return batch.take(order[residual_idx]), nodes

    with _timed_phase(phase_times, "bucket_derive"):
        out = native.tree_levels(
            codes, depth_cap, depth_cap, MAX_POINTS_PER_NODE,
            root_level=bucket_level, stop_level=bucket_level,
        )
        if out is not None:
            leaf_lv, final_lv = out
            final_nodes, residual_idx = _group_subtree_levels(
                codes, final_lv, leaf_lv, depth_cap, bucket_level
            )
        else:
            # Discover splits INSIDE the bucket: start from the bucket node
            # itself.
            levels = _discover_subtree_levels(
                codes, n, depth_cap, root_cube.edge_length, resolution,
                bucket_path, bucket_level,
            )
            # Promotion stops AT the bucket level: the bucket root's
            # accumulated (pre-promotion) list is the residual the top pass
            # continues from.
            final_nodes = _subsample_bottom_up(levels, stop_level=bucket_level)
            residual_idx = (
                final_nodes.pop(bucket_level).idx
                if bucket_level in final_nodes
                else np.empty(0, dtype=np.int64)
            )
    with _timed_phase(phase_times, "bucket_encode_write"):
        nodes = _write_levels(
            output_directory, final_nodes, batch, order, root_cube, resolution
        )
    return batch.take(order[residual_idx]), nodes


def _dispatch_device_bucket(
    batch: PointsBatch,
    root_cube: Cube,
    depth_cap: int,
    bucket_level: int,
    phase_times: Optional[dict],
) -> tuple:
    """Quantize + launch one bucket's device derivation WITHOUT waiting:
    returns (codes_unsorted, unforced device arrays, n_real).  JAX dispatch
    is async, so the program (upload + sort + leaf assignment + LOD
    promotion) runs while the host works on OTHER buckets — the streaming
    loop keeps one bucket in flight ahead of the one it is finishing
    (host-side group/encode/write and the next spill load overlap device
    time; completion stays FIFO, so bytes and checkpoints are identical to
    the sequential order)."""
    from ..ops.tree_build import tree_codes_grouped_on_device_padded

    with _timed_phase(phase_times, "bucket_quantize"):
        codes_unsorted, _ = morton.quantize_and_encode(
            batch.position, root_cube.min, root_cube.edge_length, depth_cap
        )
        hi, lo = morton.split_u64(codes_unsorted)
    with _timed_phase(phase_times, "bucket_device_dispatch"):
        # Power-of-two padding: bucket sizes are all distinct, so the
        # unpadded call would compile one program PER BUCKET.  The GROUPED
        # exchange (VERDICT r4 item 6) fetches ~4 B/pt (order2 + per-node
        # summaries) instead of 6 B/pt (order, final, leaf); the classic
        # arrays stay on device as the extras-overflow fallback.
        out, n_real = tree_codes_grouped_on_device_padded(
            hi, lo, depth_cap, depth_cap,
            root_level=bucket_level, stop_level=bucket_level,
        )
    if phase_times is not None:
        # Upload-side twin of bucket_fetch_bytes: padded (hi, lo) words
        # are what actually crosses the link.
        phase_times["bucket_upload_bytes"] = (
            phase_times.get("bucket_upload_bytes", 0.0)
            + out[0].shape[0] * 8
        )
    return codes_unsorted, out, n_real


def _finish_device_bucket(
    output_directory: str,
    batch: PointsBatch,
    state: tuple,
    root_cube: Cube,
    resolution: float,
    depth_cap: int,
    bucket_level: int,
    phase_times: Optional[dict],
) -> Tuple[PointsBatch, List[Tuple[NodeId, int]]]:
    """Wait for a dispatched bucket derivation, then group + encode +
    write its subtree (host side).  Bit-identical to the host kernels.

    Fast path: fetch order2 (4 B/pt) + per-level counts + the 1-point-leaf
    extras and group from run boundaries on host.  Fallback (extras
    overflow — pathological data where >~1.5% of points are sole leaf
    occupants): fetch the classic (order, final, leaf) arrays, which the
    device program also produced.  `bucket_fetch_bytes` in phase_times
    records the actual exchange size either way."""
    from .builder import (
        _group_subtree_levels,
        _group_subtree_levels_from_level_order,
    )

    codes_unsorted, out, n_real = state
    (d_order2, d_counts, d_extras_idx, d_extras_level, d_total,
     d_idx, d_final, d_leaf) = out
    with _timed_phase(phase_times, "bucket_device_derive"):
        # The fetch sync: includes any not-yet-finished device work and the
        # device->host transfers.  The overflow scalar comes back FIRST so
        # only one of the two exchanges crosses the link; np.asarray moves
        # WHOLE padded buffers (no device-side slice without a per-n
        # compile), so the byte metric counts padded lengths — the honest
        # wire size.
        n_pad = d_order2.shape[0]
        extras_cap = d_extras_idx.shape[0]
        extras_total = int(d_total)  # scalar fetch: syncs the program
        fetched = 4
        overflow = extras_total > extras_cap
        if overflow:
            order = np.asarray(d_idx)[:n_real].astype(np.int64)
            d_final = np.asarray(d_final)[:n_real]
            d_leaf = np.asarray(d_leaf)[:n_real]
            fetched += n_pad * 6
        else:
            order2 = np.asarray(d_order2)[:n_real].astype(np.int64)
            level_counts = np.asarray(d_counts)
            extras_idx = np.asarray(d_extras_idx)[:extras_total].astype(
                np.int64
            )
            extras_level = np.asarray(d_extras_level)[:extras_total]
            fetched += n_pad * 4 + level_counts.nbytes + extras_cap * 5
    if phase_times is not None:
        phase_times["bucket_fetch_bytes"] = (
            phase_times.get("bucket_fetch_bytes", 0.0) + fetched
        )
    with _timed_phase(phase_times, "bucket_group"):
        if overflow:
            codes = codes_unsorted[order]
            final_nodes, residual_idx = _group_subtree_levels(
                codes, d_final, d_leaf, depth_cap, bucket_level,
            )
        else:
            order = order2
            final_nodes, residual_idx = _group_subtree_levels_from_level_order(
                codes_unsorted, order2, level_counts, extras_idx,
                extras_level, depth_cap, bucket_level,
            )
    with _timed_phase(phase_times, "bucket_encode_write"):
        nodes = _write_levels(
            output_directory, final_nodes, batch, order, root_cube,
            resolution,
        )
    return batch.take(order[residual_idx]), nodes


def _discover_subtree_levels(
    codes, n, depth_cap, root_edge, resolution, bucket_path, bucket_level,
    raw_codes=None,
) -> Dict[int, _LevelNodes]:
    """Like builder._discover_levels but rooted at the level-B bucket node
    (which is treated as split unconditionally; its residual is handled by
    the top pass).

    `raw_codes` (deep builds): split decisions come from counts over the
    PRE-reduction codes — an ancestor of a fat cell must split even when
    its sub-build residual is small (builder._discover_levels_deep
    semantics at bucket scope) — while point lists slice `codes`."""
    from ..core.constants import MAX_POINTS_PER_NODE

    leaf_acc: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
    split_paths = np.array([bucket_path], dtype=np.uint64)
    split_ends = np.full(1, n, dtype=np.int64)

    for level in range(bucket_level + 1, depth_cap + 1):
        k = len(split_paths)
        shift = np.uint64(3 * (depth_cap - level))
        child_paths = (split_paths[:, None] << np.uint64(3)) | np.arange(8, dtype=np.uint64)
        bounds = child_paths << shift
        starts = np.searchsorted(codes, bounds.ravel(), side="left").astype(np.int64)
        ends = np.concatenate(
            [starts.reshape(k, 8)[:, 1:], split_ends[:, None]], axis=1
        ).ravel()
        if raw_codes is None:
            counts = ends - starts
        else:
            upper = bounds + (np.uint64(1) << shift)
            counts = (
                np.searchsorted(raw_codes, upper.ravel(), side="left")
                - np.searchsorted(raw_codes, bounds.ravel(), side="left")
            )
        nonempty = counts > 0
        edge = root_edge / (1 << level)
        can_split = level < depth_cap and edge > resolution
        is_leaf = nonempty & (counts <= MAX_POINTS_PER_NODE) if can_split else nonempty
        if is_leaf.any():
            leaf_acc[level] = (
                child_paths.ravel()[is_leaf],
                np.stack([starts[is_leaf], ends[is_leaf]], axis=1),
            )
        splitting = nonempty & ~is_leaf
        split_paths = child_paths.ravel()[splitting]
        split_ends = ends[splitting]
        if len(split_paths) == 0:
            break

    from .builder import _ranges_to_indices

    out: Dict[int, _LevelNodes] = {}
    for level, (paths, ranges) in leaf_acc.items():
        counts = ranges[:, 1] - ranges[:, 0]
        out[level] = _LevelNodes(
            paths=paths,
            offsets=np.concatenate([[0], np.cumsum(counts)]),
            idx=_ranges_to_indices(ranges),
        )
    return out


def _finish_top(
    output_directory: str,
    top_inputs: List[Tuple[int, PointsBatch]],
    root_cube: Cube,
    resolution: float,
    depth_cap: int,
) -> List[Tuple[NodeId, int]]:
    """Finish the shallow levels: inputs are (node_level, points) pairs —
    bucket residuals at the bucket level and whole shallow-leaf point sets.
    Promotion then proceeds upward exactly like the in-memory builder."""
    top_inputs = [(lvl, b) for lvl, b in top_inputs if len(b)]
    if not top_inputs:
        return []
    top = PointsBatch.concatenate([b for _, b in top_inputs])
    node_levels = np.concatenate(
        [np.full(len(b), lvl, dtype=np.int64) for lvl, b in top_inputs]
    )
    codes, _ = morton.quantize_and_encode(
        top.position, root_cube.min, root_cube.edge_length, depth_cap
    )
    codes, order = morton.argsort_codes(codes)
    node_levels = node_levels[order]

    level_nodes: Dict[int, _LevelNodes] = {}
    for lvl in np.unique(node_levels):
        lvl = int(lvl)
        sel = np.nonzero(node_levels == lvl)[0]
        prefixes = codes[sel] >> np.uint64(3 * (depth_cap - lvl))
        paths, counts = np.unique(prefixes, return_counts=True)
        level_nodes[lvl] = _LevelNodes(
            paths=paths.astype(np.uint64),
            offsets=np.concatenate([[0], np.cumsum(counts)]),
            idx=sel.astype(np.int64),
        )
    final_nodes = _subsample_bottom_up(level_nodes)
    return _write_levels(
        output_directory, final_nodes, top, order, root_cube, resolution
    )
