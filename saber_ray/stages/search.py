"""Keyword search over a document corpus: inverted index + BM25 top-k.

The training-data-pipeline retrieval family (quality-by-retrieval audits,
decontamination lookups, "which docs mention X" sweeps) — absent from the
reference (no string values at all, TupleSchema.java:5-8). Built
Ray-Data-first with NO corpus-sized shuffle anywhere:

- ``build_inverted_index``: one ``map_batches`` pass. Every document lives
  wholly inside one row, so per-(term, doc) frequencies are exact within
  the batch — the postings relation (term, doc_id, tf, doclen) needs no
  exchange at all. Writing it partitioned by term hash is one
  ``write_parquet`` away; the relation itself is the index.
- ``bm25_search``: two bounded passes for a BROADCAST query set.
  Pass 1 streams per-batch partials (doc count, total length, per-query-
  term document frequencies — O(#query terms) rows per batch) to the
  driver. Pass 2 re-scans with the idf table broadcast, computes each
  matching doc's FULL per-query score inside its batch (again: a doc
  never spans batches), keeps a per-batch top-k, and fans the ≤
  #blocks × q × k partials into one merge task (similarity._topk_fanin).
  The corpus is read twice and materialized never — at 100 TB that is
  two column-pruned scans, no all-to-all.

Tokenization is the bit-exact twin of DuckDB
``regexp_extract_all(lower(text), '[a-z0-9]+')`` (unicode lowercase, then
maximal ASCII-alnum runs), so every output has a value-level SQL oracle.
Scores are rounded (default 6 dp) BEFORE ranking on both sides — float
sum-order differences can never reorder the top-k.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_REGEX = "[^a-z0-9]+"      # split form of extract_all('[a-z0-9]+')


def _doc_terms(t: pa.Table, text_col: str):
    """(parents, term codes, dictionary, doclen-per-row) for one batch:
    unicode-lower, split on non-alnum runs, drop empty pieces."""
    toks = pc.split_pattern_regex(pc.utf8_lower(t[text_col]), TOKEN_REGEX)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    keep &= pc.is_valid(flat).to_numpy(zero_copy_only=False)
    parents = parents[keep]
    enc = flat.filter(pa.array(keep)).dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    doclen = np.bincount(parents, minlength=t.num_rows).astype(np.int64)
    return parents, codes, enc.dictionary, doclen


def _postings(t: pa.Table, text_col: str):
    """Per-batch exact postings: (doc row index, term code, tf, dict,
    doclen per row) via one np.unique over (row, term) pairs."""
    parents, codes, vocab, doclen = _doc_terms(t, text_col)
    if len(parents) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z, vocab, doclen
    pair = parents * len(vocab) + codes
    uniq, tf = np.unique(pair, return_counts=True)
    return (uniq // len(vocab), uniq % len(vocab),
            tf.astype(np.int64), vocab, doclen)


def build_inverted_index(ds, *, id_col: str = "doc_id",
                         text_col: str = "text"):
    """Postings relation (term, ``id_col``, tf, doclen), one row per
    distinct (term, document) pair — exact with zero shuffle (a document
    never spans batches). SQL twin::

        SELECT term, doc_id, COUNT(*) AS tf, ... FROM (SELECT doc_id,
        unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        FROM documents) GROUP BY term, doc_id
    """
    def f(t: pa.Table) -> pa.Table:
        schema = pa.schema([
            ("term", pa.string()),
            (id_col, t.schema.field(id_col).type),
            ("tf", pa.int64()), ("doclen", pa.int64())])
        rows, codes, tf, vocab, doclen = _postings(t, text_col)
        if len(rows) == 0:
            return schema.empty_table()
        ids = t[id_col].combine_chunks() if isinstance(t[id_col],
                                                       pa.ChunkedArray) \
            else t[id_col]
        return pa.Table.from_arrays(
            [vocab.take(pa.array(codes)), ids.take(pa.array(rows)),
             pa.array(tf), pa.array(doclen[rows])], schema=schema)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def tokenize_query(q: str) -> list[str]:
    """The same tokenizer applied to a query string (term bag, duplicates
    kept — BM25 scores a repeated query term twice)."""
    import re
    return [w for w in re.split(TOKEN_REGEX, q.lower()) if w]


class _StatsPass:
    """Pass 1: per-batch (n_docs, total_len, df per query term) partials —
    O(#query terms) output rows per batch, merged on the driver."""

    def __init__(self, terms: tuple, text_col: str):
        self.terms = list(terms)
        self.text_col = text_col
        self.lookup = {w: i for i, w in enumerate(self.terms)}

    def __call__(self, t: pa.Table) -> pa.Table:
        parents, codes, vocab, doclen = _doc_terms(t, self.text_col)
        # N and avgdl count only docs that PRODUCED tokens — the SQL twin
        # derives both from the tokenized dl relation, where a token-less
        # (empty/punctuation-only/null) document never appears
        n_docs = int((doclen > 0).sum())
        df = np.zeros(len(self.terms), dtype=np.int64)
        if len(parents):
            tmap = np.array([self.lookup.get(w, -1)
                             for w in vocab.to_pylist()], dtype=np.int64)
            qcode = tmap[codes]
            sel = qcode >= 0
            if sel.any():
                # count each (doc, query term) once
                pair = np.unique(parents[sel] * len(self.terms)
                                 + qcode[sel])
                np.add.at(df, pair % len(self.terms), 1)
        return pa.table({
            "term_idx": pa.array(np.arange(len(self.terms) + 1,
                                           dtype=np.int64) - 1),
            "df": pa.array(np.concatenate(([n_docs], df))),
            "sumlen": pa.array(np.concatenate(
                ([doclen.sum()], np.zeros(len(self.terms),
                                          dtype=np.int64))))})


class _ScorePass:
    """Pass 2: full BM25 score per (query, doc) INSIDE the batch (docs
    never span batches), rounded, then per-batch top-k partials."""

    def __init__(self, terms: tuple, idf: tuple, term_queries: tuple,
                 k1: float, b: float, avgdl: float, k: int,
                 id_col: str, text_col: str, round_decimals: int):
        self.lookup = {w: i for i, w in enumerate(terms)}
        self.idf = np.asarray(idf, dtype=np.float64)
        # term index -> (query ids, per-query multiplicity)
        self.tq = [np.asarray(q, dtype=np.int64) for q in term_queries]
        self.k1, self.b, self.avgdl, self.k = k1, b, avgdl, k
        self.id_col, self.text_col = id_col, text_col
        self.round_decimals = round_decimals

    def __call__(self, t: pa.Table) -> pa.Table:
        schema = pa.schema([("query_id", pa.int64()),
                            (self.id_col, t.schema.field(self.id_col).type),
                            ("score", pa.float64())])
        rows, codes, tf, vocab, doclen = _postings(t, self.text_col)
        if len(rows) == 0:
            return schema.empty_table()
        tmap = np.array([self.lookup.get(w, -1)
                         for w in vocab.to_pylist()], dtype=np.int64)
        qterm = tmap[codes]
        sel = qterm >= 0
        if not sel.any():
            return schema.empty_table()
        rows, qterm, tf = rows[sel], qterm[sel], tf[sel]
        dl = doclen[rows].astype(np.float64)
        contrib = self.idf[qterm] * (
            tf * (self.k1 + 1)
            / (tf + self.k1 * (1 - self.b + self.b * dl / self.avgdl)))
        # fan a term's contribution out to every query containing it
        # (with multiplicity: a repeated query term scores twice)
        reps = np.array([len(self.tq[i]) for i in qterm], dtype=np.int64)
        qids = np.concatenate([self.tq[i] for i in qterm]) \
            if reps.sum() else np.zeros(0, dtype=np.int64)
        rows_x = np.repeat(rows, reps)
        contrib_x = np.repeat(contrib, reps)
        if len(rows_x) == 0:
            return schema.empty_table()
        # sum per (query, doc row): both fit small ints within a batch
        pair = qids * (rows_x.max() + 1) + rows_x
        uniq, inv = np.unique(pair, return_inverse=True)
        score = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(score, inv, contrib_x)
        from saber_ray.core.aggregates import round_oracle_np
        score = round_oracle_np(score, self.round_decimals)
        out_q = uniq // (rows_x.max() + 1)
        out_r = uniq % (rows_x.max() + 1)
        # per-batch per-query top-k partial (lexsort: query asc,
        # score desc, doc id asc for deterministic ties)
        ids_all = t[self.id_col].combine_chunks() if isinstance(
            t[self.id_col], pa.ChunkedArray) else t[self.id_col]
        ids_np = ids_all.take(pa.array(out_r)).to_numpy(
            zero_copy_only=False)
        order = np.lexsort((ids_np, -score, out_q))
        pos = np.arange(len(order), dtype=np.int64)
        oq = out_q[order]
        chg = np.ones(len(order), dtype=bool)
        chg[1:] = oq[1:] != oq[:-1]
        rank = pos - np.maximum.accumulate(np.where(chg, pos, 0))
        keep = order[rank < self.k]
        return pa.Table.from_arrays(
            [pa.array(out_q[keep]),
             ids_all.take(pa.array(out_r[keep])),
             pa.array(score[keep])], schema=schema)


def bm25_search(ds, queries: Sequence[str], *, k: int = 10,
                k1: float = 1.2, b: float = 0.75,
                id_col: str = "doc_id", text_col: str = "text",
                round_decimals: Optional[int] = 6):
    """BM25 top-``k`` documents per query string. Returns a Dataset of
    (query_id, ``id_col``, score, rank) — query_id is the position in
    ``queries``. BM25 is the public Okapi ranking function (Robertson &
    Zaragoza, "The Probabilistic Relevance Framework: BM25 and Beyond",
    FnTIR 2009); idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (the standard
    non-negative Lucene/ATIRE form). Intended for a bounded broadcast
    query set (the stats pass ships O(#query terms) rows per batch);
    score a large query TABLE by joining against
    ``build_inverted_index`` output instead."""
    if not queries:
        raise ValueError("queries must be non-empty")
    if round_decimals is None:
        round_decimals = 6
    qterms = [tokenize_query(q) for q in queries]
    terms = sorted({w for ts in qterms for w in ts})
    if not terms:
        raise ValueError("no alphanumeric terms in any query")
    tidx = {w: i for i, w in enumerate(terms)}
    term_queries: list[list[int]] = [[] for _ in terms]
    for qid, ts in enumerate(qterms):
        for w in ts:                      # duplicates kept (bag semantics)
            term_queries[tidx[w]].append(qid)

    from saber_ray.stages.similarity import _apply_scorer, _topk_fanin

    # pass 1: corpus stats — tiny per-batch partials (one row per query
    # term + one totals row), merged here; never materializes the corpus
    stats = _apply_scorer(
        ds, _StatsPass,
        {"terms": tuple(terms), "text_col": text_col}, None)
    n_docs, sum_len = 0, 0
    df = np.zeros(len(terms), dtype=np.int64)
    for t in stats.iter_batches(batch_size=None, batch_format="pyarrow"):
        ti = t["term_idx"].to_numpy(zero_copy_only=False)
        dfv = t["df"].to_numpy(zero_copy_only=False)
        sl = t["sumlen"].to_numpy(zero_copy_only=False)
        tot = ti < 0
        n_docs += int(dfv[tot].sum())
        sum_len += int(sl[tot].sum())
        np.add.at(df, ti[~tot], dfv[~tot])
    if n_docs == 0:
        raise ValueError("empty corpus")
    avgdl = sum_len / n_docs
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

    # typed fan-in seed: preserves the result schema when NO document
    # matches any query (schema() is cached after the stats pass ran)
    sch = ds.schema()             # Ray Schema wrapper: names + pa types
    seed = pa.schema([("query_id", pa.int64()),
                      (id_col, dict(zip(sch.names, sch.types))[id_col]),
                      ("score", pa.float64())])
    # pass 2: in-batch scoring + per-batch top-k, one fan-in merge
    partials = _apply_scorer(
        ds, _ScorePass,
        {"terms": tuple(terms), "idf": tuple(float(v) for v in idf),
         "term_queries": tuple(tuple(q) for q in term_queries),
         "k1": float(k1), "b": float(b), "avgdl": float(avgdl),
         "k": int(k), "id_col": id_col, "text_col": text_col,
         "round_decimals": int(round_decimals)}, None)
    return _topk_fanin(partials, k, id_col, None, seed_schema=seed)
