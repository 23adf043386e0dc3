"""Property tests for the pane/window math (hypothesis).

The pane decomposition is the engine's correctness core (SURVEY.md §7.1):
window w covers event-time [w*slide, w*slide + size); pane p = t // gcd.
These properties pin the algebra against a brute-force definition for
arbitrary (size, slide, t), including non-integral size/slide ratios.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from saber_ray.core.windows import Window


w_sizes = st.integers(min_value=1, max_value=10_000)
slides = st.integers(min_value=1, max_value=10_000)
times = st.lists(st.integers(min_value=0, max_value=1_000_000),
                 min_size=1, max_size=50)


def brute_windows_of_t(t: int, w: Window) -> set:
    """All window ids covering event time t, by definition."""
    out = set()
    lo = max(0, (t - w.size) // w.slide)
    for wid in range(lo, t // w.slide + 2):
        if wid * w.slide <= t < wid * w.slide + w.size:
            out.add(wid)
    return out


@settings(max_examples=200, deadline=None)
@given(size=w_sizes, slide=slides, ts=times)
def test_pane_expansion_matches_bruteforce(size, slide, ts):
    # slide > size (hopping with gaps) included: gap events map to NO window
    w = Window.sliding(size, slide)
    t = np.asarray(ts, dtype=np.int64)
    panes = w.pane_ids(t)
    row_sel, window_id = w.expand_panes(panes)
    got = {}
    for r, wid in zip(row_sel, window_id):
        got.setdefault(int(r), set()).add(int(wid))
    for i, ti in enumerate(ts):
        assert got.get(i, set()) == brute_windows_of_t(ti, w), \
            f"t={ti} size={size} slide={slide}"


@settings(max_examples=200, deadline=None)
@given(size=w_sizes, slide=slides, t=st.integers(min_value=0, max_value=10**9))
def test_pane_never_straddles_window_boundary(size, slide, t):
    """Every event in a pane belongs to exactly the same window set — the
    invariant that makes pane partials sufficient state."""
    w = Window.sliding(size, slide)
    pane = t // w.pane
    lo, hi = pane * w.pane, (pane + 1) * w.pane - 1
    assert brute_windows_of_t(lo, w) == brute_windows_of_t(hi, w)


@settings(max_examples=100, deadline=None)
@given(size=w_sizes, slide=slides)
def test_window_bounds_roundtrip(size, slide):
    w = Window.sliding(size, slide)
    wid = np.arange(0, 50)
    starts = w.window_start(wid)
    ends = w.window_end(wid)
    assert ((ends - starts) == size).all()
    # closed_mask: a window is closed exactly when watermark >= end
    assert w.closed_mask(wid, int(ends[10]))[:11].all()
    assert not w.closed_mask(wid, int(ends[10]) - 1)[10]
