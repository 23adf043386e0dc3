"""Hashed multinomial NB vs an exact numpy twin + separable-class recall."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from saber_ray.stages.embed import _token_dims
from saber_ray.stages.nbayes import predict_nb, train_nb
from tests.oracle_util import to_pandas


def _corpus(n=400, n_classes=3, seed=9):
    """Separable classes: each class draws words from its own slice."""
    rng = np.random.default_rng(seed)
    lab = rng.integers(0, n_classes, n)
    texts = []
    for i in range(n):
        words = [f"c{lab[i]}word{rng.integers(0, 30)}" for _ in range(12)]
        texts.append(" ".join(words))
    return pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "label": pa.array([f"class_{x}" for x in lab], pa.string())})


def _numpy_twin(t, dim, alpha):
    """Exact driver-side reimplementation over the same token dims."""
    owners, idx, _ = _token_dims(t["text"], dim)
    labels = sorted(set(t["label"].to_pylist()))
    li = {lb: i for i, lb in enumerate(labels)}
    codes = np.array([li[x] for x in t["label"].to_pylist()])
    grid = np.bincount(codes[owners] * dim + idx,
                       minlength=len(labels) * dim) \
        .reshape(len(labels), dim).astype(np.float64)
    log_prob = np.log(grid + alpha) \
        - np.log(grid.sum(axis=1, keepdims=True) + alpha * dim)
    n_docs = np.bincount(codes, minlength=len(labels)).astype(np.float64)
    log_prior = np.log(n_docs) - np.log(n_docs.sum())
    return labels, log_prior, log_prob


def test_train_nb_matches_numpy_twin(ray_session):
    t = _corpus()
    model = train_nb(rd.from_arrow(t).repartition(7), label_col="label",
                     dim=1024, alpha=0.5)
    labels, prior, logp = _numpy_twin(t, 1024, 0.5)
    assert model["labels"] == labels
    assert np.array_equal(model["log_prior"], prior)
    assert np.array_equal(model["log_prob"], logp)


def test_predict_nb_separable_classes(ray_session):
    """Disjoint-vocabulary classes classify perfectly; margins positive;
    prediction matches the numpy score argmax exactly."""
    t = _corpus()
    ds = rd.from_arrow(t)
    model = train_nb(ds, label_col="label", dim=2048)
    pred = to_pandas(predict_nb(ds, model, keep=["doc_id", "label"])) \
        .sort_values("doc_id").reset_index(drop=True)
    assert (pred["label_pred"] == pred["label"]).all()
    assert (pred["log_odds"] > 0).all()

    # exact score parity
    owners, idx, _ = _token_dims(t["text"], 2048)
    n = t.num_rows
    scores = np.tile(model["log_prior"], (n, 1))
    for c in range(len(model["labels"])):
        scores[:, c] += np.bincount(
            owners, weights=model["log_prob"][c][idx], minlength=n)
    order = np.argsort(scores, axis=1, kind="stable")
    want = np.asarray(model["labels"], dtype=object)[order[:, -1]]
    assert (pred["label_pred"].to_numpy() == want).all()


def test_train_nb_null_labels_and_validation(ray_session):
    t = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": ["aa bb", "aa bb", "zz yy", None],
        "label": ["x", None, "y", "y"]})
    model = train_nb(rd.from_arrow(t), label_col="label", dim=64)
    assert model["labels"] == ["x", "y"]
    # the null-label doc contributed nothing; the null-text doc counted
    # as a document of class y with zero tokens
    with pytest.raises(ValueError, match="alpha"):
        train_nb(rd.from_arrow(t), label_col="label", alpha=0.0)
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string()),
                      "label": pa.array([], pa.string())})
    with pytest.raises(ValueError, match="no labeled rows"):
        train_nb(rd.from_arrow(empty), label_col="label")
