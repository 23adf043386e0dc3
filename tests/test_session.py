"""Session window tests vs a DuckDB window-function oracle (lag + cumsum)."""

import numpy as np
import pandas as pd

from saber_ray import avg, cnt, session_windows
from saber_ray.core.windows import MINUTE
from saber_ray.sources.transcripts import TRANSCRIPTS_SQL, transcripts_from_events
from tests.oracle_util import assert_matches_oracle

GAP = 30 * MINUTE


def _sql(agg_select: str) -> str:
    return f"""
    WITH transcripts AS ({TRANSCRIPTS_SQL}),
    x AS (
      SELECT conv_id, ts, text, epoch_us(ts) AS tu,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {GAP}
                  THEN 1 ELSE 0 END AS brk
      FROM transcripts
      WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
    ),
    s AS (
      SELECT *, SUM(brk) OVER (PARTITION BY conv_id ORDER BY ts, tu
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM x
    )
    SELECT conv_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(tu) AS session_start_us, MAX(tu) AS session_end_us,
           {agg_select}
    FROM s GROUP BY conv_id, session_id
    """


def test_session_counts(ray_session, sf_dir):
    ts = transcripts_from_events(sf_dir)
    out = session_windows(ts, gap=GAP, aggs=[cnt(alias="n_turns")],
                          keys=["conv_id"], order_by=["turn_idx"])
    assert_matches_oracle(out, _sql("COUNT(*) AS n_turns"), sf_dir)


def test_session_avg_text_len(ray_session, sf_dir):
    import numpy as np
    ts = transcripts_from_events(sf_dir)
    # derive a numeric column first (text stays out of the aggregate)
    def add_len(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["text_len"] = df["text"].str.len().astype("int64")
        return df
    ts = ts.map_batches(add_len, batch_format="pandas")
    out = session_windows(ts, gap=GAP,
                          aggs=[avg("text_len", "avg_len"), cnt(alias="n_turns")],
                          keys=["conv_id"], order_by=["turn_idx"],
                          round_decimals=6)
    assert_matches_oracle(
        out, _sql("ROUND(AVG(LENGTH(text)), 6) AS avg_len, COUNT(*) AS n_turns"),
        sf_dir)


def test_session_agg_dtype_stable_with_nullable_ints(ray_session):
    """Block schemas must not depend on per-block null presence (review r2):
    an int column with nulls in only SOME blocks still aggregates as int64."""
    import pyarrow as pa
    import ray.data as rd
    from saber_ray import cnt, max_, min_, session_windows, sum_
    n = 40
    t = pa.table({
        "conv_id": pa.array(["a"] * 20 + ["b"] * 20),
        "ts": pa.array(np.arange(n, dtype=np.int64) * 1000),
        "v": pa.array([None if i == 35 else i for i in range(n)],
                      type=pa.int64()),
    })
    ds = rd.from_arrow(t).repartition(4)
    out = session_windows(ds, gap=10_000,
                          aggs=[cnt(alias="n"), sum_("v", "sv"),
                                min_("v", "mn"), max_("v", "mx")],
                          keys=["conv_id"])
    # dtype check must be unconditional: blocks WITH and WITHOUT nulls
    # must both emit int64 (the review-r2 regression this guards)
    schema = out.schema()
    types = dict(zip(schema.names, schema.types))
    import pyarrow as pa2
    assert types["sv"] == pa2.int64(), types
    assert types["mn"] == pa2.int64() and types["mx"] == pa2.int64()
    tbl = out.to_pandas()
    assert len(tbl) == 2
    assert tbl.set_index("conv_id").loc["a", "sv"] == sum(range(20))
    assert tbl.set_index("conv_id").loc["b", "sv"] == sum(
        i for i in range(20, 40) if i != 35)


def test_session_null_keys_one_group(ray_session):
    """SQL PARTITION BY semantics: NULL session keys form ONE group and must
    not crash Ray's sort (ADVICE r1: sort cannot compare None)."""
    import pyarrow as pa
    import ray.data as rd
    from saber_ray.core.windows import MINUTE
    t = pa.table({
        "tool": pa.array(["a", None, "a", None, None, "b"]),
        "ts": pa.array((np.array([0, 1, 2, 3, 100, 4]) * MINUTE)
                       .astype(np.int64)),
    })
    out = session_windows(rd.from_arrow(t).repartition(3), gap=10 * MINUTE,
                          aggs=[cnt(alias="n")], keys=["tool"])
    df = out.to_pandas().sort_values(["tool", "session_id"],
                                     na_position="last").reset_index(drop=True)
    # 'a': one session of 2; 'b': one of 1; NULL: ONE group with two
    # sessions — (1min, 3min) inside the gap, then 100min alone
    assert len(df) == 4
    nulls = df[df["tool"].isna()]
    assert len(nulls) == 2 and sorted(nulls["n"]) == [1, 2]
    assert df[df["tool"] == "a"]["n"].tolist() == [2]
