"""Unit tests for the shared sorted-block segment toolbox."""

import numpy as np
import pyarrow as pa

from saber_ray.core.segments import (equality_codes, key_change_mask,
                                     seg_searchsorted,
                                     segmented_running_max)


def test_key_change_mask_null_runs_stay_one_segment():
    """Consecutive NULL keys are ONE segment (regression: NaN != NaN used
    to split a null run into per-row segments)."""
    t = pa.table({"s": pa.array(["a", None, None, "b"], pa.string()),
                  "i": pa.array([1, None, None, 2], pa.int64()),
                  "f": pa.array([0.5, None, None, 0.5], pa.float64())})
    for c in ("s", "i", "f"):
        assert list(key_change_mask(t, [c])) == [True, True, False, True], c
    # equality codes: equal values equal codes, nulls share one code
    codes = equality_codes(t["s"])
    assert codes[1] == codes[2]


def test_segmented_running_max_matches_per_segment():
    rng = np.random.default_rng(3)
    vals = rng.integers(-10**12, 10**12, 500)
    new_seg = rng.random(500) < 0.1
    new_seg[0] = True
    got = segmented_running_max(vals, new_seg)
    want = vals.copy()
    starts = np.flatnonzero(new_seg)
    for s, e in zip(starts, np.append(starts[1:], 500)):
        np.maximum.accumulate(vals[s:e], out=want[s:e])
    assert (got == want).all()


def test_seg_searchsorted_matches_numpy_per_segment():
    rng = np.random.default_rng(4)
    n = 400
    t = np.sort(rng.integers(0, 100, n).reshape(8, 50), axis=1).ravel()
    lo0 = np.repeat(np.arange(8) * 50, 50)
    hi0 = lo0 + 50
    q = rng.integers(-5, 105, n)
    for side in ("left", "right"):
        got = seg_searchsorted(t, q, lo0, hi0, side=side)
        want = np.array([lo + np.searchsorted(t[lo:hi], qi, side=side)
                         for lo, hi, qi in zip(lo0, hi0, q)])
        assert (got == want).all(), side
