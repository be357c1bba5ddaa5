"""ROI system: named regions restricting the per-pair solve.

Reimplements the reference's ROI construction (src/optflow.cpp:228-261,
302-310):

- ``top``: full-width strip of height ``top`` (default 300) at row 0
- ``bottom``: full-width strip of height ``bottom`` anchored at the bottom
- ``custom``: one [x, y, w, h] rectangle shared by both frames
- ``custom`` with per-frame "0"/"1" sub-keys -> ``custom_diff``: different
  rectangles per frame (features pre-alignment is incompatible and ignored,
  src/optflow.cpp:351-363)
- no ROI config at all -> ``default``: the min common size of the two
  frames (src/optflow.cpp:147-154), which also forces feature pre-alignment

The reference resolves per-image ROI overrides against the wrong dict
(``images["rois"]`` instead of the image's own entry, src/optflow.cpp:140),
so per-image ROIs never worked there; here the per-image override is read
correctly (documented deviation, SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Dict, Mapping, Tuple


@dataclasses.dataclass(frozen=True)
class Roi:
    """A rectangle in (x, y, width, height) form, cv::Rect-style."""

    x: int
    y: int
    width: int
    height: int

    def slices(self) -> Tuple[slice, slice]:
        return (
            slice(self.y, self.y + self.height),
            slice(self.x, self.x + self.width),
        )

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.height, self.width)


def roi_from_array(arr) -> Roi:
    """[x, y, w, h] -> Roi (ref: src/optflow.cpp:302-310)."""
    return Roi(int(arr[0]), int(arr[1]), int(arr[2]), int(arr[3]))


def get_rois(roi_args: Mapping, rows: int, cols: int) -> Dict[str, object]:
    """Build the named ROI dict from a ``rois`` config section.

    Returns a dict whose values are :class:`Roi` except ``custom_diff``
    which maps to a ``(roi_frame0, roi_frame1)`` tuple.
    """
    rois: Dict[str, object] = {}
    if "top" in roi_args:
        top = int(roi_args.get("top", 300) or 300)
        rois["top"] = Roi(0, 0, cols, top)
    if "bottom" in roi_args:
        bottom = int(roi_args.get("bottom", 300) or 300)
        rois["bottom"] = Roi(0, rows - bottom, cols, bottom)
    if "custom" in roi_args:
        custom = roi_args["custom"]
        if isinstance(custom, Mapping) and "0" in custom:
            if "1" not in custom:
                # The reference warns "Seg fault on it's way" and then
                # crashes (src/optflow.cpp:250-254); we reuse frame0's rect.
                print(
                    "If you specify a custom for the first frame, you must "
                    "specify a custom for the second. Reusing frame0's.",
                    file=sys.stderr,
                )
            r0 = roi_from_array(custom["0"])
            r1 = roi_from_array(custom.get("1", custom["0"]))
            rois["custom_diff"] = (r0, r1)
        else:
            rois["custom"] = roi_from_array(custom)
    return rois


def resolve_rois(
    im_args: Mapping, args: Mapping, rows: int, cols: int
) -> Dict[str, object]:
    """Per-pair ROI resolution (ref: src/optflow.cpp:136-154): per-image
    ``rois`` wins over job-global ``rois``; with neither, a ``default`` ROI
    covering the min common frame size is used (and triggers feature
    pre-alignment downstream)."""
    if "rois" in im_args:
        return get_rois(im_args["rois"], rows, cols)
    if "rois" in args:
        return get_rois(args["rois"], rows, cols)
    return {"default": Roi(0, 0, cols, rows)}
