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


def _token_dims(txt, dim: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(owner row, dimension index, raw hash) per token — shared by the
    embedder and the IDF pass so both see identical tokens. Tokens are
    ALPHANUMERIC runs (unlike the alpha-only quality scorers): for an
    embedding, "2024", "v2" and "covid19" are distinguishing content —
    an alpha tokenizer would collapse every "w0001"-style identifier to
    the same "w" token and embed distinct documents identically."""
    data, starts, ends = string_buffers(_single(pc.fill_null(txt, "")))
    if bs.all_ascii(data):
        rs, re_, owners = bs.token_runs(data, starts, ends, bs.LUT_ALNUM)
        h = bs.run_hashes(bs.lower_ascii(data), rs, re_)
    else:
        flat, owners = split_regex(txt, "a-zA-Z0-9")
        h = hash_column(_single(pc.utf8_lower(flat)))
    return owners, (h % np.uint64(dim)).astype(np.int64), h


def _hashed_matrix(txt, n_rows: int, dim: int, signed: bool,
                   idf=None) -> np.ndarray:
    owners, idx, h = _token_dims(txt, dim)
    if signed:
        # an independent hash bit → ±1 keeps E[<u, v>] unbiased
        w = np.where((h >> np.uint64(32)) & np.uint64(1), 1.0, -1.0)
    else:
        w = np.ones(len(h), dtype=np.float64)
    m = np.bincount(owners * dim + idx, weights=w,
                    minlength=n_rows * dim).reshape(n_rows, dim)
    if idf is not None:
        m *= idf[None, :]
    norms = np.linalg.norm(m, axis=1)
    m /= np.maximum(norms, 1e-30)[:, None]
    m[norms == 0] = 0.0             # token-less rows stay zero vectors
    return m.astype(np.float32)


def train_idf(ds, *, dim: int = 256, text_col: str = "text") -> np.ndarray:
    """One corpus pass → the (dim,) smoothed-IDF vector for hashed
    TF-IDF: ``idf[d] = ln((N + 1) / (df[d] + 1)) + 1`` where ``df[d]``
    counts documents with at least one token hashing to dimension ``d``
    (scikit-learn's smooth_idf formula — public). Each block reduces to
    ONE (dim + 1)-int partial row; the driver sums a handful of tiny
    rows — the corpus never materializes and there is no shuffle."""
    if dim < 2:
        raise ValueError("dim must be >= 2")

    def partial(t: pa.Table) -> pa.Table:
        owners, idx, _ = _token_dims(t[text_col], dim)
        # count each (doc, dim) once: unique flattened pairs
        pairs = np.unique(owners * dim + idx)
        df = np.bincount(pairs % dim, minlength=dim)
        return pa.table({
            "df": pa.ListArray.from_arrays(
                pa.array([0, dim], pa.int32()),
                pa.array(df, pa.int64())),
            "n_docs": pa.array([t.num_rows], pa.int64())})

    df = np.zeros(dim, dtype=np.int64)
    n_docs = 0
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        arr = b["df"].combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        df += flat.reshape(-1, dim).sum(axis=0)
        n_docs += int(pc.sum(b["n_docs"]).as_py())
    return np.log((n_docs + 1.0) / (df + 1.0)) + 1.0


def embed_hashed(ds, *, dim: int = 256, text_col: str = "text",
                 id_col: str = "doc_id", signed: bool = True,
                 idf=None, out_col: str = "embedding"):
    """Hash-embed ``text_col`` into a ``dim``-wide L2-normalized
    ``list<float32>`` column. Output: (``id_col``, ``out_col``) — the
    embeddings-table shape, directly consumable by the embedding
    operators. Deterministic; no shuffle; no per-actor state. Pass the
    ``train_idf`` vector as ``idf`` for hashed TF-IDF (broadcast once
    via ``ray.put``, dim floats per worker)."""
    if dim < 2:
        raise ValueError("dim must be >= 2")
    idf_ref = None
    if idf is not None:
        import ray
        idf = np.asarray(idf, dtype=np.float64)
        if idf.shape != (dim,):
            raise ValueError(f"idf must have shape ({dim},), "
                             f"got {idf.shape}")
        idf_ref = ray.put(idf)

    def f(t: pa.Table, _ref=idf_ref) -> pa.Table:
        schema = pa.schema([(id_col, t.schema.field(id_col).type),
                            (out_col, pa.list_(pa.float32()))])
        if t.num_rows == 0:
            return schema.empty_table()
        import ray
        w = ray.get(_ref) if _ref is not None else None
        m = _hashed_matrix(t[text_col], t.num_rows, dim, signed, idf=w)
        lists = pa.ListArray.from_arrays(
            pa.array(np.arange(t.num_rows + 1, dtype=np.int64) * dim,
                     pa.int32()),
            pa.array(m.reshape(-1), pa.float32()))
        ids = t[id_col]
        return pa.Table.from_arrays(
            [ids.combine_chunks() if isinstance(ids, pa.ChunkedArray)
             else ids, lists], schema=schema)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
