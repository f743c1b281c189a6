"""Progress reporting + timing breadcrumbs (reference: src/utils.rs:23-35 —
stderr progress bars with a 2s refresh; plus jax.profiler hooks)."""

from __future__ import annotations

import contextlib
import sys
import threading
import time
from typing import Iterator, Optional


class ProgressBar:
    """Minimal stderr progress bar, thread-safe, refreshing at most every
    `refresh_s` seconds (the reference uses pbr with 2s refresh)."""

    def __init__(self, total: int, message: str = "", refresh_s: float = 2.0,
                 stream=None) -> None:
        self.total = max(total, 1)
        self.message = message
        self.refresh_s = refresh_s
        self.count = 0
        self._lock = threading.Lock()
        self._last = 0.0
        self._start = time.time()
        self._stream = stream or sys.stderr
        self._render(force=True)

    def inc(self, n: int = 1) -> None:
        with self._lock:
            self.count += n
            self._render()

    def _render(self, force: bool = False) -> None:
        now = time.time()
        if not force and now - self._last < self.refresh_s:
            return
        self._last = now
        pct = 100.0 * self.count / self.total
        self._stream.write(f"\r{self.message}: {self.count}/{self.total} ({pct:.0f}%)")
        self._stream.flush()

    def finish(self) -> None:
        with self._lock:
            self._render(force=True)
            elapsed = time.time() - self._start
            self._stream.write(f" done in {elapsed:.1f}s\n")
            self._stream.flush()


@contextlib.contextmanager
def timed(label: str, stream=None) -> Iterator[None]:
    """Timing breadcrumb: prints '<label>: X.XXXs' on exit."""
    stream = stream or sys.stderr
    start = time.perf_counter()
    try:
        yield
    finally:
        stream.write(f"{label}: {time.perf_counter() - start:.3f}s\n")
        stream.flush()


@contextlib.contextmanager
def timed_phase(phase_times: Optional[dict], key: str,
                echo: Optional[str] = None) -> Iterator[None]:
    """Accumulate wall time into phase_times[key] (no-op dict when None);
    with `echo`, also print a `timed`-style breadcrumb.  Records on
    exceptions too (try/finally), so a failed phase still shows where the
    time went."""
    t0 = time.perf_counter()
    try:
        if echo is not None:
            with timed(echo):
                yield
        else:
            yield
    finally:
        if phase_times is not None:
            phase_times[key] = (
                phase_times.get(key, 0.0) + time.perf_counter() - t0
            )


@contextlib.contextmanager
def jax_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Wrap a region in a jax.profiler trace when log_dir is given."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


def parse_key_val(s: str):
    """'KEY=value' -> (key, value) (reference: src/utils.rs:10-21)."""
    if "=" not in s:
        raise ValueError(f"invalid KEY=value: no '=' found in {s!r}")
    key, value = s.split("=", 1)
    return key, value


def parse_aabb(s: str):
    """'minx,miny,minz,maxx,maxy,maxz' -> Aabb, validating the length (a
    typo'd count would otherwise broadcast into a silently wrong box)."""
    from ..math.geometry import Aabb

    v = [float(x) for x in s.split(",")]
    if len(v) != 6:
        raise ValueError(
            f"--aabb needs 6 comma-separated values "
            f"(minx,miny,minz,maxx,maxy,maxz), got {len(v)}"
        )
    return Aabb(v[:3], v[3:])
