"""strip_html vs its generated DuckDB twin (same step literals)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from saber_ray.stages.curation import strip_html, strip_html_sql
from tests.oracle_util import canon, to_pandas


def _corpus():
    rng = np.random.default_rng(17)
    frags = [
        "<html><body><p>Hello <b>world</b></p></body></html>",
        "plain text no markup",
        "<script type='text/js'>var x = '<p>nested</p>';</script>after",
        "<style>p { color: red }</style>styled",
        "<!-- a comment\nspanning lines --><div>kept</div>",
        "entities: &amp;lt; &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;end",
        "broken <tag still stripped? <b>yes</b>",
        "UPPER <SCRIPT>ignore()</SCRIPT> case",
        "spaces\t\tand\n\nnewlines   collapse",
        None,
        "",
        "unicode café   nbsp-char stays",
    ]
    texts = [frags[i] for i in rng.integers(0, len(frags), 400)]
    return pa.table({"doc_id": pa.array(np.arange(400, dtype=np.int64)),
                     "text": pa.array(texts, pa.string())})


def test_strip_html_matches_sql(ray_session):
    t = _corpus()
    con = duckdb.connect()
    con.register("t", t)
    for collapse in (True, False):
        expr = strip_html_sql("text", collapse=collapse)
        want = canon(con.sql(
            f"SELECT doc_id, {expr} AS clean FROM t").df())
        got = canon(to_pandas(strip_html(
            rd.from_arrow(t).repartition(4), "text", out="clean",
            collapse=collapse)).drop(columns=["text"]))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_strip_html_in_place_and_null(ray_session):
    t = _corpus()
    out = to_pandas(strip_html(rd.from_arrow(t), "text"))
    assert list(out.columns) == ["doc_id", "text"]
    assert out["text"].isna().sum() == (np.array(
        t["text"].is_null()).sum())
