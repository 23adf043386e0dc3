"""Document chunking: token-budgeted splits with overlap.

THE preprocessing step in front of context-limited training and
retrieval: long documents become ``max_tokens``-sized chunks whose
starts step by ``max_tokens - overlap``. One row per chunk —
``(id, chunk_idx, n_chunks, chunk_text, n_tokens)``.

Chunking rule (the common implementation, fully SQL-expressible): tokens
are maximal non-whitespace runs; chunk ``i`` covers tokens
``[i*stride, i*stride + max_tokens)``; a document emits
``1 + ceil((n - max_tokens)/stride)`` chunks (one when ``n <=
max_tokens``) — iteration stops once a chunk reaches the document's end,
so no tail chunk is ever fully contained in its predecessor. Chunk text
is the space-join of its tokens (whitespace-NORMALIZED output — the
price of a value-level oracle; byte-exact spans would need split offsets
pyarrow does not expose). Empty/whitespace-only/NULL documents emit no
chunks (like UNNEST).

Everything is one ``map_batches`` pass with no Python per row: regex
split → empty-filter via flat+parents → per-chunk token ranges by pure
offset arithmetic → ONE gather of the flat token array → a rebuilt
ListArray joined by ``pc.binary_join``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def chunk_documents(ds, *, max_tokens: int, overlap: int = 0,
                    id_col: str = "doc_id", text_col: str = "text"):
    """``overlap`` tokens are shared between consecutive chunks
    (``0 <= overlap < max_tokens``). SQL twin (DuckDB)::

        tokens = list_filter(string_split_regex(text, '\\s+'), w -> w <> '')
        chunk i of doc = array_to_string(tokens[1+i*s : i*s+max_tokens], ' ')
    """
    max_tokens = int(max_tokens)
    overlap = int(overlap)
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap

    def f(t: pa.Table) -> pa.Table:
        schema = pa.schema([
            (id_col, t.schema.field(id_col).type),
            ("chunk_idx", pa.int64()), ("n_chunks", pa.int64()),
            ("chunk_text", pa.string()), ("n_tokens", pa.int64())])
        if t.num_rows == 0:
            return schema.empty_table()
        # shared tokenizer kernel (core/tokens.py): tokens = maximal
        # non-whitespace runs, empties dropped, NULL text handled — and
        # large_string columns stay large_string end-to-end
        from saber_ray.core.tokens import split_regex
        col = t[text_col]
        if pa.types.is_null(col.type):       # all-null column inference
            col = pc.cast(col, pa.string())
        flat, parents = split_regex(col, r"\S")
        n_tok = np.bincount(parents, minlength=t.num_rows) \
            .astype(np.int64)
        doc_start = np.concatenate(([0], np.cumsum(n_tok)))[:-1]
        # chunks per doc: 1 + ceil((n - max)/stride) for n > 0
        n_chunks = np.where(
            n_tok == 0, 0,
            1 + np.maximum(0, -(-(n_tok - max_tokens) // stride)))
        total = int(n_chunks.sum())
        if total == 0:
            return schema.empty_table()
        doc_of = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                           n_chunks)
        # chunk_idx within doc: global position minus the doc's first
        first = np.concatenate(([0], np.cumsum(n_chunks)))[:-1]
        cidx = np.arange(total, dtype=np.int64) - np.repeat(first,
                                                            n_chunks)
        starts = doc_start[doc_of] + cidx * stride
        lens = np.minimum(max_tokens,
                          (doc_start[doc_of] + n_tok[doc_of]) - starts)
        # ONE gather of every chunk's tokens (overlap duplicates them);
        # int64 large_list offsets — int32 would wrap silently past 2^31
        # gathered tokens per block — and a separator in the VALUE type
        # (string vs large_string kernels don't mix)
        gidx = np.repeat(starts, lens) + _ranges(lens)
        gathered = flat.take(pa.array(gidx))
        offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
        chunk_lists = pa.LargeListArray.from_arrays(pa.array(offsets),
                                                    gathered)
        texts = pc.binary_join(chunk_lists,
                               pa.scalar(" ", type=gathered.type))
        if pa.types.is_large_string(texts.type):
            texts = pc.cast(texts, pa.string())
        ids = t[id_col].combine_chunks() if isinstance(
            t[id_col], pa.ChunkedArray) else t[id_col]
        return pa.Table.from_arrays(
            [ids.take(pa.array(doc_of)), pa.array(cidx),
             pa.array(n_chunks[doc_of]), texts,
             pa.array(lens, type=pa.int64())], schema=schema)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _ranges(lens: np.ndarray) -> np.ndarray:
    """[0..lens[0]) ++ [0..lens[1]) ++ ... as one array (no Python loop)."""
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    idx = np.arange(total, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    return idx - np.repeat(starts, lens)
