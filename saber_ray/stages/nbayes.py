"""Hashed multinomial Naive Bayes: the supervised curation classifier.

The CCNet-style quality/language filter shape (public: a linear
classifier over token counts): training reduces each block to one
(label, dim-count-vector) partial row over the SAME hashed-alnum token
space as the vectorizer (stages/embed._token_dims — the hashing trick
makes the vocabulary a fixed ``dim``-wide array, no vocab exchange);
the driver sums the tiny partials and bakes the smoothed log-prob
matrix. Scoring broadcasts that (C × dim) matrix once and answers each
batch with C token-gather bincounts — O(tokens) per batch, no dense
(rows × dim) materialization, no shuffle anywhere.

Exactness: given the model, prediction is a deterministic argmax of
exact float64 log-likelihood sums; training counts are exact integers.
The pytest twin recomputes both on the gathered corpus with plain
numpy and matches bit-for-bit.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

from saber_ray.stages.embed import _token_dims


def train_nb(ds, *, text_col: str = "text", label_col: str,
             dim: int = 32_768, alpha: float = 1.0) -> dict:
    """Fit hashed multinomial NB: returns ``{"labels": [...], "log_prior":
    (C,), "log_prob": (C, dim), "dim": dim, "alpha": alpha}``.

    One pass: per block, labels factorize against the batch's own
    uniques and counts fold into a (C_block × dim) int64 grid emitted as
    one row per label; the driver merges by label name. NULL-label rows
    are skipped (unlabeled data trains nothing)."""
    if dim < 2:
        raise ValueError("dim must be >= 2")
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (Laplace smoothing)")

    def partial(t: pa.Table) -> pa.Table:
        lab = t[label_col]
        if isinstance(lab, pa.ChunkedArray):
            lab = lab.combine_chunks()
        if lab.null_count:
            keep = lab.is_valid()
            t = t.filter(keep)
            lab = lab.drop_null()
        schema = pa.schema([("label", pa.string()),
                            ("counts", pa.list_(pa.int64())),
                            ("n_docs", pa.int64())])
        if t.num_rows == 0:
            return schema.empty_table()
        enc = lab.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = enc.dictionary.to_pylist()
        owners, idx, _ = _token_dims(t[text_col], dim)
        grid = np.bincount(codes[owners] * dim + idx,
                           minlength=len(uniq) * dim) \
            .reshape(len(uniq), dim)
        return pa.table({
            "label": pa.array([str(u) for u in uniq], pa.string()),
            "counts": pa.ListArray.from_arrays(
                pa.array(np.arange(len(uniq) + 1) * dim, pa.int32()),
                pa.array(grid.reshape(-1), pa.int64())),
            "n_docs": pa.array(np.bincount(codes, minlength=len(uniq)),
                               pa.int64())})

    counts: dict[str, np.ndarray] = {}
    docs: dict[str, int] = {}
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        labs = b["label"].to_pylist()
        nd = b["n_docs"].to_pylist()
        flat = b["counts"].combine_chunks().flatten() \
            .to_numpy(zero_copy_only=False).reshape(-1, dim)
        for i, lb in enumerate(labs):
            if lb in counts:
                counts[lb] += flat[i]
                docs[lb] += int(nd[i])
            else:
                counts[lb] = flat[i].copy()
                docs[lb] = int(nd[i])
    if not counts:
        raise ValueError("no labeled rows to train on")
    labels = sorted(counts)
    grid = np.stack([counts[lb] for lb in labels]).astype(np.float64)
    n_docs = np.array([docs[lb] for lb in labels], dtype=np.float64)
    log_prob = np.log(grid + alpha) \
        - np.log(grid.sum(axis=1, keepdims=True) + alpha * dim)
    log_prior = np.log(n_docs) - np.log(n_docs.sum())
    return {"labels": labels, "log_prior": log_prior,
            "log_prob": log_prob, "dim": dim, "alpha": alpha}


def predict_nb(ds, model: dict, *, text_col: str = "text",
               keep: Optional[Sequence[str]] = None,
               out_col: str = "label_pred", score_col: str = "log_odds"):
    """Score every document: argmax-class label plus the log-odds margin
    over the runner-up (a confidence for thresholded filtering). The
    (C × dim) log-prob matrix broadcasts once via ``ray.put``; each
    batch costs C bincount gathers over its tokens."""
    import ray

    labels = list(model["labels"])
    lp_ref = ray.put((np.asarray(model["log_prior"], dtype=np.float64),
                      np.asarray(model["log_prob"], dtype=np.float64)))
    dim = int(model["dim"])
    keep = list(keep) if keep else []

    def f(t: pa.Table, _ref=lp_ref) -> pa.Table:
        fields = [(c, t.schema.field(c).type) for c in keep] + \
            [(out_col, pa.string()), (score_col, pa.float64())]
        schema = pa.schema(fields)
        if t.num_rows == 0:
            return schema.empty_table()
        prior, logp = ray.get(_ref)
        owners, idx, _ = _token_dims(t[text_col], dim)
        n = t.num_rows
        scores = np.tile(prior, (n, 1))
        for c in range(len(labels)):
            scores[:, c] += np.bincount(owners, weights=logp[c][idx],
                                        minlength=n)
        order = np.argsort(scores, axis=1, kind="stable")
        best = order[:, -1]
        if scores.shape[1] > 1:
            second = order[:, -2]
            margin = scores[np.arange(n), best] \
                - scores[np.arange(n), second]
        else:
            margin = np.zeros(n)
        names = np.asarray(labels, dtype=object)[best]
        arrs = [t[c] for c in keep] + \
            [pa.array(names, pa.string()), pa.array(margin, pa.float64())]
        return pa.Table.from_arrays(
            [(a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a)
             for a in arrs], schema=schema)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
