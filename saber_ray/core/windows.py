"""Window definitions and pane math.

Parity target: Saber's WindowDefinition (reference: WindowDefinition.java:5-69):
``type ∈ {ROW_BASED, RANGE_BASED}``, tumbling iff size == slide, and the pane
decomposition ``paneSize = gcd(size, slide)``, ``numberOfPanes = size/paneSize``,
``panesPerSlide = slide/paneSize`` (WindowDefinition.java:28-57). Windows are
unions of panes; panes are the unit of partial aggregation, which is what makes
batch boundaries irrelevant (replacing the opening/closing/pending/complete
fragment machinery of WindowBatch.java:339-643).

Session windows (gap timeout) are NOT in the reference — they are required by
the north rule and defined here: a session per key closes when the gap between
consecutive events exceeds ``gap``.

Units: RANGE windows are in **microseconds** of event time (Arrow timestamp[us]
cast to int64); ROW windows are in row ordinals of an explicit index column
(the partitioning assumption for distributed row windows — see
stages/window_agg.py docstring).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

US = 1            # microsecond
MS = 1_000
SECOND = 1_000_000
MINUTE = 60 * SECOND
HOUR = 60 * MINUTE
DAY = 24 * HOUR

RANGE = "range"
ROW = "row"


@dataclass(frozen=True)
class Window:
    """A tumbling/sliding window definition (WindowDefinition.java:5-18)."""

    mode: str          # RANGE (event-time) | ROW (count-based)
    size: int          # us (RANGE) or rows (ROW)
    slide: int

    def __post_init__(self):
        if self.mode not in (RANGE, ROW):
            raise ValueError(f"mode must be '{RANGE}' or '{ROW}', got {self.mode}")
        if self.size <= 0 or self.slide <= 0:
            raise ValueError("size and slide must be positive")
        # slide > size (hopping with gaps) is legal: a pane then belongs to
        # at most one window and some panes to none (windows_of_pane emits
        # empty ranges for gap panes)

    # -- constructors -----------------------------------------------------
    @staticmethod
    def tumbling(size: int, mode: str = RANGE) -> "Window":
        return Window(mode, size, size)

    @staticmethod
    def sliding(size: int, slide: int, mode: str = RANGE) -> "Window":
        return Window(mode, size, slide)

    # -- pane math (WindowDefinition.java:28-57) --------------------------
    @property
    def pane(self) -> int:
        return math.gcd(self.size, self.slide)

    @property
    def panes_per_window(self) -> int:
        return self.size // self.pane

    @property
    def panes_per_slide(self) -> int:
        return self.slide // self.pane

    @property
    def is_tumbling(self) -> bool:
        return self.size == self.slide

    # -- assignment -------------------------------------------------------
    def pane_ids(self, t: np.ndarray) -> np.ndarray:
        """Pane id per event: t // pane (WindowBatch.java:388-477 pid calc)."""
        return t // self.pane

    def windows_of_pane(self, pane_ids: np.ndarray):
        """For each pane id, the [w_min, w_max] inclusive range of window ids
        covering it (possibly empty: w_min > w_max for gap panes when
        slide > size). Window w spans panes [w*panes_per_slide,
        w*panes_per_slide + panes_per_window).  Windows are anchored at t=0
        (window w covers [w*slide, w*slide + size))."""
        pps = self.panes_per_slide
        npw = self.panes_per_window
        w_max = pane_ids // pps
        w_min = np.maximum(0, (pane_ids - npw) // pps + 1)
        return w_min, w_max

    def expand_panes(self, pane_ids: np.ndarray):
        """Explode each pane row into its covering windows.

        Returns ``(row_sel, window_id)`` where ``row_sel`` indexes into the
        input rows (with repetition) and ``window_id`` is the window each
        repeated row belongs to. Expansion factor is ~size/slide.
        """
        w_min, w_max = self.windows_of_pane(pane_ids)
        counts = np.maximum(0, w_max - w_min + 1).astype(np.int64)
        row_sel = np.repeat(np.arange(len(pane_ids), dtype=np.int64), counts)
        # window_id = w_min[row] + offset within that row's run
        offs = np.arange(counts.sum(), dtype=np.int64)
        run_starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        offs -= np.repeat(run_starts, counts)
        window_id = w_min[row_sel] + offs
        return row_sel, window_id

    def window_start(self, window_id):
        return window_id * self.slide

    def window_end(self, window_id):
        """Exclusive end: [start, start+size)."""
        return window_id * self.slide + self.size

    def closed_mask(self, window_id: np.ndarray, watermark: int) -> np.ndarray:
        """Windows fully closed at ``watermark``: end <= watermark.

        Matches Saber's closing condition — a window closes once an event with
        ts >= window_end has been observed (WindowBatch.java:388-477 pane
        crossing), i.e. watermark (= max observed ts) has passed the end.
        """
        return self.window_end(window_id) <= watermark


@dataclass(frozen=True)
class SessionWindow:
    """Session window with gap timeout (north-rule extension; absent from the
    reference — WindowDefinition.java:5-8 has only ROW/RANGE)."""

    gap: int  # microseconds

    def __post_init__(self):
        if self.gap <= 0:
            raise ValueError("gap must be positive")
