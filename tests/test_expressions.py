"""Unit tests for the expression/predicate layer (no Ray needed)."""

import pyarrow as pa
import pytest

from saber_ray.core.expressions import col, lit
from saber_ray.core.windows import Window, DAY, HOUR

BATCH = pa.table({
    "a": [1, 2, 3, 4],
    "b": [10.0, 20.0, 30.0, 40.0],
    "s": ["x", "yy", None, "zzzz"],
})


def test_arithmetic():
    e = (col("a") * 2 + 1).alias("out")
    assert e(BATCH).to_pylist() == [3, 5, 7, 9]
    assert e.name == "out"
    e2 = (col("b") / col("a") - 5.0)
    assert e2(BATCH).to_pylist() == [5.0, 5.0, 5.0, 5.0]


def test_comparisons_and_boolean():
    p = (col("a") > 1) & (col("b") <= 30.0)
    assert p(BATCH).to_pylist() == [False, True, True, False]
    q = (col("a") == 1) | ~(col("b") < 40.0)
    assert q(BATCH).to_pylist() == [True, False, False, True]


def test_string_and_null_helpers():
    assert col("s").str_len()(BATCH).to_pylist() == [1, 2, None, 4]
    assert col("s").is_not_null()(BATCH).to_pylist() == [True, True, False, True]
    assert col("a").isin([2, 4])(BATCH).to_pylist() == [False, True, False, True]


def test_mod():
    assert (col("a") % 2)(BATCH).to_pylist() == [1, 0, 1, 0]


def test_window_pane_math():
    w = Window.sliding(4 * DAY, DAY)
    assert w.pane == DAY
    assert w.panes_per_window == 4
    assert w.panes_per_slide == 1
    assert not w.is_tumbling
    w2 = Window.sliding(10 * HOUR, 4 * HOUR)
    assert w2.pane == 2 * HOUR
    assert w2.panes_per_window == 5
    assert w2.panes_per_slide == 2


def test_window_expand_panes():
    import numpy as np
    w = Window.sliding(4, 1)  # pane=1, each pane in up to 4 windows
    row_sel, wid = w.expand_panes(np.array([0, 5]))
    # pane 0 → window 0 only (w_min=max(0,-3)=0, w_max=0)
    # pane 5 → windows 2..5
    assert row_sel.tolist() == [0, 1, 1, 1, 1]
    assert wid.tolist() == [0, 2, 3, 4, 5]


def test_window_validation():
    # slide > size is LEGAL (hopping with gaps — hopping_window_gaps gate)
    assert Window.sliding(2, 4).pane == 2
    with pytest.raises(ValueError):
        Window.sliding(0, 1)
    with pytest.raises(ValueError):
        Window("bogus", 1, 1)
