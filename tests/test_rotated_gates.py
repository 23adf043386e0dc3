"""Gates rotated OUT of the 50-entry driver window keep full value-oracle
coverage here (VERDICT r2 #6: every queries() entry needs a CORRECTNESS
row, so the dict is capped at 50 — rotation must not weaken checks)."""

import pytest

import __ray_entry__ as entry_mod
from saber_ray.stages.sample import sample_sql_predicate
from tests.oracle_util import assert_matches_oracle

def _strip_html_oracle() -> str:
    from saber_ray.stages.curation import strip_html_sql
    return (f"SELECT doc_id, text, {strip_html_sql('text')} AS clean "
            "FROM documents")


ROTATED = {
    "noop": (entry_mod._q_noop, "SELECT * FROM region"),
    "string_ops": (
        entry_mod._q_string_ops,
        "SELECT doc_id, LOWER(text) AS lowered, LENGTH(text) AS n_chars "
        "FROM documents WHERE text LIKE '%the%' "
        r"AND regexp_matches(text, '\b[a-z]{6,}\b')"),
    "hash_sample": (
        entry_mod._q_hash_sample,
        "SELECT event_id, event_type, value FROM events WHERE "
        + sample_sql_predicate("event_id", 0.1)),
    "doc_fingerprint": (
        entry_mod._q_fingerprint,
        "SELECT doc_id, md5(text) AS fingerprint FROM documents"),
    "row_window_global_tumbling": (
        entry_mod._q_row_window_global_tumbling,
        "WITH t AS (SELECT value, "
        "ROW_NUMBER() OVER (ORDER BY event_id) - 1 AS ord FROM events) "
        "SELECT ord // 500 AS window_id, COUNT(*) AS n, "
        "ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 6) "
        "AS sum_value FROM t GROUP BY 1"),
    "bottom_k_sample": (
        entry_mod._q_bottom_k_sample,
        "SELECT event_id, user_id, value FROM events "
        f"ORDER BY ((event_id % {2**31}) * 2654435761 + 0) % {2**32}, "
        "event_id LIMIT 100"),
    "distinct_count": (
        entry_mod._q_distinct,
        "SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1"),
    "topk": (
        entry_mod._q_topk,
        "SELECT event_id, value FROM events "
        "ORDER BY value DESC, event_id LIMIT 10"),
    "theta_join_keyless": (
        entry_mod._q_theta_join_keyless,
        "SELECT epoch_us(p.ts) AS ts_l, epoch_us(c.ts) AS ts_r, "
        "p.event_id AS event_id_l, c.event_id AS event_id_r, "
        "p.value AS value_l, c.value AS value_r "
        "FROM events p JOIN events c ON p.event_type = 'purchase' "
        "AND c.event_type = 'click' "
        f"AND epoch_us(c.ts) BETWEEN epoch_us(p.ts) - {3_600_000_000} "
        f"AND epoch_us(p.ts) + {3_600_000_000} AND p.value > c.value"),
    "semi_join": (
        entry_mod._q_semi_join,
        "SELECT c_custkey, c_mktsegment FROM customer "
        "WHERE c_custkey IN (SELECT o_custkey FROM orders)"),
    "anti_join": (
        entry_mod._q_anti_join,
        "SELECT c_custkey, c_mktsegment FROM customer "
        "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders "
        "WHERE o_orderpriority = '1-URGENT')"),
    "grouped_topk": (
        entry_mod._q_grouped_topk,
        "SELECT * FROM (SELECT event_type, value, event_id, "
        "ROW_NUMBER() OVER (PARTITION BY event_type "
        "ORDER BY value DESC, event_id) AS rn FROM events) "
        "WHERE rn <= 5"),
    "pivot_wide": (
        entry_mod._q_pivot_wide,
        "SELECT o_orderpriority, "
        + ", ".join(
            "ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) "
            f"FILTER (WHERE o_orderstatus = '{s}') AS DOUBLE), 4) "
            f"AS tot_{s}" for s in ("F", "O", "P"))
        + " FROM orders GROUP BY o_orderpriority"),
    "token_stats": (
        entry_mod._q_token_stats,
        "SELECT doc_id, LENGTH(text) AS n_chars, "
        "len(string_split(text, ' ')) AS n_ws_tokens, "
        r"len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) "
        "AS n_bpe_tokens FROM documents"),
    "rank_window": (
        entry_mod._q_rank_window,
        "SELECT user_id, event_type, event_id, RANK() OVER w AS rk, "
        "DENSE_RANK() OVER w AS drk, PERCENT_RANK() OVER w AS pr, "
        "CUME_DIST() OVER w AS cd FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY event_type)"),
    # streaming twin of row_window_global_tumbling: same oracle — the
    # streaming engine in ordinal mode must reproduce the batch ROW_BASED
    # window answer exactly (ordinals = checkpointed metadata prefix sums)
    "streaming_row_window": (
        entry_mod._q_streaming_row_window,
        "WITH t AS (SELECT value, "
        "ROW_NUMBER() OVER (ORDER BY event_id) - 1 AS ord FROM events) "
        "SELECT ord // 500 AS window_id, COUNT(*) AS n, "
        "ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 6) "
        "AS sum_value FROM t GROUP BY 1"),
    # rotated out in r4 for streaming_match_pattern / transcripts_from_csv:
    # sliding-global is the keys-less case of sliding_grouped_agg + sg1;
    # full-outer completes a join family whose other members stay gated
    "sliding_global_agg": (
        entry_mod._q_sliding_global,
        entry_mod._sliding_sql(
            4, entry_mod.DAY, f"window_id, {entry_mod.ALL_SQL}",
            "window_id")),
    # rotated out in r4 for chunk_documents: watermark-closed emission
    # stays gated via streaming_cm1 and the streaming engines' sealed
    # emission rules
    "watermark_closed_windows": (
        entry_mod._q_watermark_closed,
        f"WITH t AS (SELECT epoch_us(ts) // {entry_mod.DAY} AS window_id, "
        "value FROM events), "
        "wm AS (SELECT MAX(epoch_us(ts)) - 259200000000 AS w FROM events) "
        f"SELECT window_id, window_id * {entry_mod.DAY} AS window_start_us, "
        "COUNT(*) AS n, "
        "ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 6) "
        "AS sum_value FROM t, wm "
        f"WHERE (window_id + 1) * {entry_mod.DAY} <= wm.w GROUP BY 1"),
    # rotated out in r4 for json_extract; the dedup verify kernel keeps
    # its composition role in the minhash/simhash pytest suites
    "ngram_jaccard_pairs": (
        entry_mod._q_ngram_jaccard, r"""
            WITH d AS (
              SELECT doc_id,
                     list_filter(string_split_regex(
                                   lower(COALESCE(text, '')), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents WHERE doc_id < 30),
            s AS (
              SELECT doc_id,
                CASE WHEN len(ws) = 0 THEN []
                     WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                     ELSE list_transform(range(1, len(ws) - 1),
                          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                END AS sh
              FROM d),
            p AS (
              SELECT l.doc_id AS a, r.doc_id AS b,
                     list_distinct(l.sh) AS sa, list_distinct(r.sh) AS sb
              FROM s l JOIN s r ON l.doc_id < r.doc_id)
            SELECT a, b,
              ROUND(CASE
                WHEN len(list_distinct(list_concat(sa, sb))) = 0 THEN 1.0
                ELSE CAST(len(list_intersect(sa, sb)) AS DOUBLE)
                     / len(list_distinct(list_concat(sa, sb))) END, 6)
                AS jaccard
            FROM p"""),
    # rotated out in r4 for corpus_diff (which exercises the full-outer
    # exchange at corpus scale); the broadcast path stays gated via
    # q5_local_supplier's broadcast dims and cm1's dim join
    "broadcast_join": (
        entry_mod._q_broadcast_join,
        "SELECT c_custkey, c_nationkey, c_mktsegment, n_name "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey"),
    # rotated out in r4 for perplexity_score: EXCEPT/INTERSECT keep
    # hypothesis property suites vs DuckDB (test_setops_properties)
    "set_except": (
        entry_mod._q_set_except,
        "SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' "
        "EXCEPT "
        "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'"),
    # rotated out in r4 for bm25_search: tokenize/unnest stay exercised by
    # the BM25 gate's tokenizer and the inverted-index pytest oracle
    "token_counts": (
        entry_mod._q_token_counts,
        "SELECT token, COUNT(*) AS n FROM "
        "(SELECT unnest(string_split(text, ' ')) AS token "
        " FROM documents) GROUP BY 1 HAVING COUNT(*) >= 5"),
    # rotated out in r4 for streaming_rolling: per-key row windows stay
    # gated via row_window_global + the rotated tumbling/streaming twins
    "row_window_agg": (
        entry_mod._q_row_window,
        entry_mod._tx(
            "SELECT conv_id, CAST(turn_idx // 4 AS BIGINT) AS window_id, "
            "COUNT(*) AS n_turns FROM transcripts GROUP BY 1, 2")),
    # rotated out in r4 for streaming_shift: ROWS/RANGE frame coverage
    # stays in test_rolling.py's DuckDB property oracles
    "rolling_window": (
        entry_mod._q_rolling_window,
        entry_mod._tx(
            "SELECT conv_id, ts, "
            "CAST(SUM(n_chars) OVER w AS BIGINT) AS roll_chars, "
            "AVG(n_chars) OVER w AS roll_avg, "
            "COUNT(n_chars) OVER w AS roll_n, "
            "MIN(n_chars) OVER w AS roll_min, "
            "MAX(n_chars) OVER w AS roll_max "
            "FROM (SELECT conv_id, ts, length(text) AS n_chars "
            "      FROM transcripts) "
            "WINDOW w AS (PARTITION BY conv_id ORDER BY epoch_us(ts) "
            f"RANGE BETWEEN {30 * entry_mod.MINUTE} PRECEDING "
            f"AND {10 * entry_mod.MINUTE} FOLLOWING)")),
    "full_outer_join": (
        entry_mod._q_full_outer_join,
        "SELECT c.c_custkey, c.c_mktsegment, o.o_custkey, o.o_orderkey, "
        "o.o_orderpriority FROM "
        "(SELECT c_custkey, c_mktsegment FROM customer "
        "WHERE c_mktsegment = 'BUILDING') c FULL OUTER JOIN "
        "(SELECT o_orderkey, o_custkey, o_orderpriority FROM orders "
        "WHERE o_orderpriority = '1-URGENT') o "
        "ON c.c_custkey = o.o_custkey"),
    # rotated out late-r4 for q7_volume_shipping / quality_filter_p90:
    # projection stays exercised inside w1_chained and every revenue
    # pipeline; tumbling-global is the keys-less case of
    # tumbling_grouped_agg (+ the cm/sg window gates)
    "projection": (
        entry_mod._q_projection,
        "SELECT l_orderkey, l_extendedprice * (1.0 - l_discount) AS revenue, "
        "l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charged "
        "FROM lineitem"),
    "tumbling_global_agg": (
        entry_mod._q_tumbling_global,
        f"SELECT epoch_us(ts) // {6 * 3_600_000_000} AS window_id, "
        f"{entry_mod.ALL_SQL} FROM events GROUP BY 1"),
    # q7/quality_filter also sit in the driver's 50 — kept here as extra
    # local coverage since this file is where their oracles were born
    "q7_volume_shipping": (
        entry_mod._q_q7_volume_shipping,
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
        "EXTRACT(year FROM l_shipdate) AS l_year, "
        "ROUND(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) "
        "AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue "
        "FROM supplier, lineitem, orders, customer, "
        "nation n1, nation n2 "
        "WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey "
        "AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey "
        "AND c_nationkey = n2.n_nationkey "
        "AND ((n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11') "
        "OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20')) "
        f"AND epoch_us(l_shipdate) >= {entry_mod._Q7_LO_US} "
        f"AND epoch_us(l_shipdate) < {entry_mod._Q7_HI_US} "
        "GROUP BY 1, 2, 3"),
    "quality_filter_p90": (
        entry_mod._q_quality_filter,
        f"WITH q AS ({entry_mod._quality_sql()}), "
        "thr AS (SELECT quantile_disc(quality, 0.9) AS t FROM q) "
        "SELECT doc_id, quality FROM q, thr WHERE quality >= thr.t"),
    # --- rotated out when the arg/split/mix/pack/strip/incremental-dedup
    # gates entered the 50-window ---
    "selection": (
        entry_mod._q_selection,
        "SELECT event_id, event_type, value FROM events "
        "WHERE value > 100.0 AND event_type <> 'error'"),
    "tumbling_grouped_agg": (
        entry_mod._q_tumbling_grouped,
        f"SELECT event_type, epoch_us(ts) // {entry_mod.DAY} AS window_id, "
        f"{entry_mod.ALL_SQL} FROM events GROUP BY 1, 2"),
    "hopping_window_gaps": (
        entry_mod._q_hopping_window,
        f"SELECT epoch_us(ts) // {6 * entry_mod.HOUR} AS window_id, "
        "COUNT(*) AS n, "
        "ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 6) "
        "AS sum_value FROM events "
        f"WHERE epoch_us(ts) % {6 * entry_mod.HOUR} < {2 * entry_mod.HOUR} "
        "GROUP BY 1"),
    "asof_join": (
        entry_mod._q_asof_join,
        "SELECT p.user_id, epoch_us(p.ts) AS ts_l, epoch_us(c.ts) AS ts_r, "
        "p.event_id AS event_id_l, c.event_id AS event_id_r, "
        "p.value AS value_l, c.value AS value_r "
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
        "ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c "
        "ON p.user_id = c.user_id AND epoch_us(p.ts) >= epoch_us(c.ts)"),
    "grouped_quantiles_approx": (
        entry_mod._q_grouped_quantiles_approx,
        "SELECT lang, quantile_disc(LENGTH(text), 0.25) AS p25_chars, "
        "quantile_disc(LENGTH(text), 0.9) AS p90_chars, "
        "COUNT(DISTINCT LENGTH(text)) AS n_distinct_lens, "
        "COUNT(*) AS n_docs FROM documents GROUP BY 1"),
    # rotated out late-r4 for normalize_zscore: the ordered-parquet source
    # contract stays gated via transcripts_from_csv (same derivation, same
    # oracle) and every transcript-derived gate in the window
    "transcripts_identity": (
        entry_mod._q_transcripts_identity,
        entry_mod._tx(
            "SELECT conv_id, turn_idx, role, text, tool FROM transcripts")),
    # rotated out late-r4 for streaming_resample: tumbling grouped windowed
    # agg stays in the 50 via cm1 + streaming_cm1 (and the rotated
    # tumbling_grouped_agg oracle)
    "cm2": (
        entry_mod._q_cm2,
        entry_mod._tx(
            f"SELECT tool, epoch_us(ts) // {entry_mod.DAY} AS window_id, "
            "ROUND(AVG(LENGTH(text)), 6) AS avg_len, COUNT(*) AS n_turns "
            "FROM transcripts WHERE tool IS NOT NULL GROUP BY 1, 2")),
    # rotated out late-r4 for resample_ffill: the TPC-H composition family
    # stays in the 50 via q5_local_supplier and q7_volume_shipping
    "q3_shipping_priority": (
        entry_mod._q_q3_shipping,
        "SELECT l_orderkey, epoch_us(o_orderdate) AS o_orderdate_us, "
        "ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) "
        "AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue "
        "FROM customer "
        "JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "WHERE c_mktsegment = 'BUILDING' "
        f"AND epoch_us(o_orderdate) < {entry_mod._Q3_CUT_US} "
        f"AND epoch_us(l_shipdate) > {entry_mod._Q3_CUT_US} "
        "GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey LIMIT 10"),
    # rotated out late-r4 for interval_join: grouping-set partials stay
    # exercised via pivot_wide's FILTER twin + this oracle
    "rollup_agg": (
        entry_mod._q_rollup_agg,
        "SELECT o_orderstatus, o_orderpriority, "
        "GROUPING(o_orderstatus, o_orderpriority) AS grouping_id, "
        "COUNT(*) AS n, "
        "ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) "
        "AS DOUBLE), 6) AS sum_total, "
        "ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) "
        "AS DOUBLE) / COUNT(o_totalprice), 6) AS avg_total "
        "FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)"),
    "strip_html": (
        entry_mod._q_strip_html,
        _strip_html_oracle),  # lazy: generated from the stage's step table
    "chunk_documents": (
        entry_mod._q_chunk_documents,
        r"""
            WITH d AS (
              SELECT doc_id,
                     list_filter(string_split_regex(COALESCE(text, ''),
                                 '\s+'), w -> w <> '') AS ws
              FROM documents),
            n AS (SELECT doc_id, ws, len(ws) AS n FROM d WHERE len(ws) > 0),
            c AS (SELECT doc_id, ws, n,
                         1 + greatest(0, CAST(ceil((n - 64) / 48.0)
                                              AS BIGINT)) AS n_chunks
                  FROM n),
            e AS (SELECT doc_id, ws, n, n_chunks,
                         unnest(range(n_chunks)) AS i FROM c)
            SELECT doc_id, i AS chunk_idx, n_chunks,
                   array_to_string(ws[1 + i * 48 : i * 48 + 64], ' ')
                     AS chunk_text,
                   least(64, n - i * 48) AS n_tokens
            FROM e"""),
    "json_extract": (
        entry_mod._q_json_extract,
        "SELECT event_id, event_type, "
        "CAST(props->>'k' AS BIGINT) AS k FROM events"),
    "match_pattern": (
        entry_mod._q_match_pattern,
        entry_mod._tx(f"""
            SELECT conv_id, turn_idx AS match_start_turn_idx,
                   i2 AS match_end_turn_idx,
                   tu AS match_start_us, t2 AS match_end_us
            FROM (SELECT conv_id, turn_idx, role, epoch_us(ts) AS tu,
                    LEAD(role, 1) OVER
                      (PARTITION BY conv_id ORDER BY turn_idx) r1,
                    LEAD(role, 2) OVER
                      (PARTITION BY conv_id ORDER BY turn_idx) r2,
                    LEAD(turn_idx, 2) OVER
                      (PARTITION BY conv_id ORDER BY turn_idx) i2,
                    LEAD(epoch_us(ts), 2) OVER
                      (PARTITION BY conv_id ORDER BY turn_idx) t2
                  FROM transcripts)
            WHERE role = 'user' AND r1 = 'assistant' AND r2 = 'user'
              AND t2 - tu <= {24 * entry_mod.HOUR}""")),
}


@pytest.mark.parametrize("name", sorted(ROTATED))
def test_rotated_gate_vs_oracle(name, ray_session, sf_dir):
    fn, sql = ROTATED[name]
    if callable(sql):
        sql = sql()
    assert_matches_oracle(fn(sf_dir), sql, sf_dir)
