"""Feature-hashing text vectorizer: text → fixed-dim embedding column.

The hashing trick (Weinberger et al. '09, public): each lowercased word
token hashes to a dimension index and a ±1 sign; a document's vector is
the signed token-count histogram, L2-normalized. No vocabulary, no
model, no training pass — the operator is a single stateless
``map_batches`` over the corpus, which makes it the deterministic,
container-friendly way to produce an ``embedding`` column from raw text
so the downstream embedding ops (``semdedup``, ``ann_topk*``,
``embedding_near_dup``) run end-to-end on text-only corpora.

Vectorized exactly like the text scorers (stages/text.py): ASCII
batches take the byte-LUT fast path — alpha token runs from the flat
string buffer, one rolling-hash per run over the LOWERED bytes — and
any multi-byte batch falls back to the RE2 split + Arrow utf8_lower +
the same value hash, so both paths hash identical tokens identically
(``substring_hashes`` ≡ ``hash_column`` by construction). Cosine of two
hashed vectors approximates the token-histogram cosine; identical texts
are exactly equal, word order never matters (bag of words).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from saber_ray.core import bytescan as bs
from saber_ray.core.hashing import hash_column, string_buffers
from saber_ray.core.tokens import _single, split_regex


def _hashed_matrix(txt, n_rows: int, dim: int, signed: bool) -> np.ndarray:
    data, starts, ends = string_buffers(_single(pc.fill_null(txt, "")))
    if bs.all_ascii(data):
        rs, re_, owners = bs.token_runs(data, starts, ends, bs.LUT_ALPHA)
        h = bs.run_hashes(bs.lower_ascii(data), rs, re_)
    else:
        flat, owners = split_regex(txt, "a-zA-Z")
        h = hash_column(_single(pc.utf8_lower(flat)))
    idx = (h % np.uint64(dim)).astype(np.int64)
    if signed:
        # an independent hash bit → ±1 keeps E[<u, v>] unbiased
        w = np.where((h >> np.uint64(32)) & np.uint64(1), 1.0, -1.0)
    else:
        w = np.ones(len(h), dtype=np.float64)
    m = np.bincount(owners * dim + idx, weights=w,
                    minlength=n_rows * dim).reshape(n_rows, dim)
    norms = np.linalg.norm(m, axis=1)
    m /= np.maximum(norms, 1e-30)[:, None]
    m[norms == 0] = 0.0             # token-less rows stay zero vectors
    return m.astype(np.float32)


def embed_hashed(ds, *, dim: int = 256, text_col: str = "text",
                 id_col: str = "doc_id", signed: bool = True,
                 out_col: str = "embedding"):
    """Hash-embed ``text_col`` into a ``dim``-wide L2-normalized
    ``list<float32>`` column. Output: (``id_col``, ``out_col``) — the
    embeddings-table shape, directly consumable by the embedding
    operators. Deterministic; no shuffle; no state."""
    if dim < 2:
        raise ValueError("dim must be >= 2")

    def f(t: pa.Table) -> pa.Table:
        schema = pa.schema([(id_col, t.schema.field(id_col).type),
                            (out_col, pa.list_(pa.float32()))])
        if t.num_rows == 0:
            return schema.empty_table()
        m = _hashed_matrix(t[text_col], t.num_rows, dim, signed)
        lists = pa.ListArray.from_arrays(
            pa.array(np.arange(t.num_rows + 1, dtype=np.int64) * dim,
                     pa.int32()),
            pa.array(m.reshape(-1), pa.float32()))
        ids = t[id_col]
        return pa.Table.from_arrays(
            [ids.combine_chunks() if isinstance(ids, pa.ChunkedArray)
             else ids, lists], schema=schema)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
