"""core/hashing: value-only determinism (chunking / slicing / position
independence), null-vs-default separation, uniformity sanity."""

import numpy as np
import pyarrow as pa
import pytest

from saber_ray.core.hashing import hash_column, hash_columns, splitmix64


def test_equal_strings_hash_equal_anywhere():
    a = pa.array(["xyz", "hello world", "xyz", "", "hello world"])
    h = hash_column(a)
    assert h[0] == h[2]
    assert h[1] == h[4]
    assert len({h[0], h[1], h[3]}) == 3


def test_slicing_and_chunking_invariant():
    vals = [f"doc-{i % 7}-{'pad' * (i % 5)}" for i in range(100)]
    whole = hash_column(pa.array(vals))
    sliced = hash_column(pa.array(vals).slice(40, 30))
    np.testing.assert_array_equal(whole[40:70], sliced)
    chunked = hash_column(pa.chunked_array(
        [pa.array(vals[:33]), pa.array(vals[33:71]), pa.array(vals[71:])]))
    np.testing.assert_array_equal(whole, chunked)


def test_chunk_slice_boundary_of_poly_prefix():
    # strings crossing the internal 2 MiB slice boundary hash identically
    # to the same strings in a tiny array
    big = ["a" * 600_000, "b" * 600_000, "needle-string", "c" * 1_200_000,
           "needle-string"]
    h = hash_column(pa.array(big))
    assert h[2] == h[4]
    small = hash_column(pa.array(["needle-string"]))
    assert h[2] == small[0]


def test_null_vs_default_and_empty():
    s = pa.array(["", None, "x"])
    h = hash_column(s)
    assert h[0] != h[1]                      # null != empty string
    i = pa.array([0, None, 5], type=pa.int64())
    hi = hash_column(i)
    assert hi[0] != hi[1]                    # null != 0


def test_numeric_float_bool_temporal():
    f = hash_column(pa.array([1.5, -0.0, 0.0, 2.5]))
    assert f[1] == f[2]                      # -0.0 == +0.0
    assert f[0] != f[3]
    b = hash_column(pa.array([True, False, True]))
    assert b[0] == b[2] and b[0] != b[1]
    t = hash_column(pa.array([1, 2, 1], type=pa.timestamp("us")))
    assert t[0] == t[2] and t[0] != t[1]


def test_multi_column_tuple_mixing():
    t = pa.table({"a": ["x", "x", "y"], "b": [1, 2, 1]})
    h = hash_columns(t, ["a", "b"])
    assert len(set(h.tolist())) == 3
    # same tuple values -> same hash in another table/layout
    t2 = pa.table({"a": ["y", "x"], "b": [1, 1]})
    h2 = hash_columns(t2, ["a", "b"])
    assert h2[0] == h[2] and h2[1] == h[0]
    # column order matters (tuple, not bag)
    assert not np.array_equal(hash_columns(t, ["a", "b"]),
                              hash_columns(t, ["b", "a"]))


def test_zero_byte_edge():
    h = hash_column(pa.array(["", "\x00", "\x00\x00"]))
    assert len(set(h.tolist())) == 3


def test_bucket_uniformity():
    vals = pa.array([f"document body {i} with shared prefix text"
                     for i in range(20_000)])
    buckets = hash_column(vals) % np.uint64(8)
    counts = np.bincount(buckets.astype(np.int64), minlength=8)
    assert counts.min() > 20_000 / 8 * 0.9
    assert counts.max() < 20_000 / 8 * 1.1


def test_splitmix_is_bijective_sample():
    x = np.arange(10_000, dtype=np.uint64)
    assert len(np.unique(splitmix64(x))) == 10_000


def test_dictionary_matches_plain():
    plain = pa.array(["a", "b", "a", "c"])
    dic = plain.dictionary_encode()
    np.testing.assert_array_equal(hash_column(plain), hash_column(dic))


def test_empty_and_all_null():
    assert len(hash_column(pa.array([], type=pa.string()))) == 0
    h = hash_column(pa.array([None, None], type=pa.string()))
    assert h[0] == h[1]
