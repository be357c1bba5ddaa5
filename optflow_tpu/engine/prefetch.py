"""Prefetching frame loader: overlap host decode with device compute.

The reference's pair loop decodes synchronously between GPU solves
(src/optflow.cpp:106-125); its only overlap is the LRU-of-2 frame swap.
Here the job's full image schedule is known up front, so the native
threaded loader (optflow_tpu/native) decodes ``lookahead`` upcoming frames
in the background while the TPU works on the current pair.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from optflow_tpu.core.imgio import ImageReadError, read_gray_scaled


class PrefetchLoader:
    """Callable loader for runner.FrameCache with background lookahead."""

    def __init__(
        self,
        schedule: List[Tuple[str, float]],
        lookahead: int = 8,
        n_threads: int = 4,
    ):
        from optflow_tpu.native import NativeLoader

        self._native = NativeLoader(n_threads)
        # de-duplicated schedule in first-use order
        seen = set()
        self._schedule: List[Tuple[str, float]] = []
        for key in schedule:
            if key not in seen:
                seen.add(key)
                self._schedule.append(key)
        self._pos = 0
        self._lookahead = lookahead
        self._pending: Dict[Tuple[str, float], int] = {}
        self._fill()

    def _fill(self):
        while (
            len(self._pending) < self._lookahead
            and self._pos < len(self._schedule)
        ):
            key = self._schedule[self._pos]
            self._pos += 1
            if key not in self._pending:
                self._pending[key] = self._native.submit(key[0], key[1])

    def __call__(self, path: str, scale: float) -> np.ndarray:
        key = (path, scale)
        job_id = self._pending.pop(key, None)
        if job_id is None:
            job_id = self._native.submit(path, scale)
        try:
            return self._native.wait(job_id)
        except ImageReadError:
            # The native decoder covers PNG/JPEG/TIFF; anything it can't
            # parse falls back to the Python decoder (cv2/PIL) so a format
            # gap never silently skips a pair — the reference's cv::imread
            # (src/optflow.cpp:106) accepts whatever OpenCV was built with.
            return read_gray_scaled(path, scale)
        finally:
            self._fill()

    def close(self):
        # drain outstanding jobs so worker threads quiesce
        for job_id in self._pending.values():
            try:
                self._native.wait(job_id)
            except Exception:
                pass
        self._pending.clear()
        self._native.close()


def make_prefetch_loader(args: dict) -> Optional[PrefetchLoader]:
    """Build a prefetch loader for a job dict when the native library is
    available; None otherwise (callers fall back to the Python loader)."""
    try:
        from optflow_tpu.native import available
    except ImportError:  # pragma: no cover
        return None
    if not available():
        return None
    from optflow_tpu.core.config import JobConfig

    cfg = JobConfig(args)
    schedule: List[Tuple[str, float]] = []
    for im in cfg.images:
        scale = cfg.scale(im)
        schedule.append((str(im.get("p", "")), scale))
        schedule.append((str(im.get("q", "")), scale))
    if not schedule:
        return None
    return PrefetchLoader(schedule)
