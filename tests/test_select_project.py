"""Selection / Projection parity vs DuckDB oracle (Selection.java / Projection.java)."""

from saber_ray import col, lit, selection, projection
from saber_ray.sources.parquet import read_table
from tests.oracle_util import assert_matches_oracle


def test_selection_events(ray_session, sf_dir):
    ds = read_table(sf_dir, "events",
                    columns=["event_id", "event_type", "value"])
    out = selection(ds, (col("value") > 100.0) & (col("event_type") != "error"))
    assert_matches_oracle(
        out,
        "SELECT event_id, event_type, value FROM events "
        "WHERE value > 100.0 AND event_type <> 'error'",
        sf_dir)


def test_selection_string_predicate(ray_session, sf_dir):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    out = selection(ds, col("lang").isin(["en", "es"]) & col("text").contains("window"))
    assert_matches_oracle(
        out,
        "SELECT doc_id, lang, text FROM documents "
        "WHERE lang IN ('en','es') AND contains(text, 'window')",
        sf_dir)


def test_projection_lineitem(ray_session, sf_dir):
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice", "l_discount", "l_tax"])
    out = projection(ds, [
        ((col("l_extendedprice") * (lit(1.0) - col("l_discount")))).alias("revenue"),
        ((col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).alias("charged")),
    ], keep=["l_orderkey"])
    assert_matches_oracle(
        out,
        "SELECT l_orderkey, l_extendedprice * (1.0 - l_discount) AS revenue, "
        "l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charged "
        "FROM lineitem",
        sf_dir)


def test_projection_deep_expression(ray_session, sf_dir):
    # Saber's W1 benchmark stresses deep arithmetic trees (W1.java:138-151)
    ds = read_table(sf_dir, "events", columns=["event_id", "value"])
    e = col("value")
    for _ in range(25):
        e = e * 1.01 + 0.5
    out = projection(ds, [e.alias("deep")], keep=["event_id"])
    sql_e = "value"
    for _ in range(25):
        sql_e = f"(({sql_e}) * 1.01 + 0.5)"
    assert_matches_oracle(
        out, f"SELECT event_id, {sql_e} AS deep FROM events", sf_dir,
        rtol=1e-9)


def test_transcript_text_equality_invariant(ray_session, sf_dir):
    """The input_hint's per-row invariant: per-turn TEXT equality under
    stable (conv_id, turn_idx) ordering — the engine's transcript stream is
    value-identical (including the full text payload) to its SQL twin."""
    from saber_ray.sources.transcripts import (TRANSCRIPTS_SQL,
                                               transcripts_from_events)
    from tests.oracle_util import assert_matches_oracle
    ts = transcripts_from_events(sf_dir).map_batches(
        lambda t: t.select(["conv_id", "turn_idx", "role", "text", "tool"]),
        batch_format="pyarrow")
    assert_matches_oracle(
        ts,
        f"WITH transcripts AS ({TRANSCRIPTS_SQL}) "
        "SELECT conv_id, turn_idx, role, text, tool FROM transcripts",
        sf_dir)


def test_transcripts_null_event_type_matches_sql(ray_session, tmp_path):
    """NULL event_type takes the CASE ELSE branch: role 'system', tool NULL
    (regression: the dictionary-level mapping propagated NULL role)."""
    import duckdb
    import pandas as pd
    from tests.oracle_util import canon, to_pandas
    import pyarrow as pa
    import pyarrow.parquet as pq
    from saber_ray.sources.transcripts import (TRANSCRIPTS_SQL,
                                               transcripts_from_events)
    ev = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array([10, 20, 30, 40], pa.timestamp("us")),
        "user_id": pa.array([7, 7, 8, 8], pa.int64()),
        "event_type": pa.array(["click", None, "error", None], pa.string()),
        "value": pa.array([0.0] * 4, pa.float64()),
        "props": pa.array(["a", "b", "c", "d"], pa.string())})
    pq.write_table(ev, str(tmp_path / "events.parquet"))
    got = canon(to_pandas(transcripts_from_events(str(tmp_path))))
    con = duckdb.connect()
    con.register("events", ev)
    want = canon(con.sql(TRANSCRIPTS_SQL).df())
    pd.testing.assert_frame_equal(got, want)
    assert (got["role"] != "").all() and got["role"].notna().all()
