"""core/bytescan: the ASCII byte-LUT fast path must equal the RE2 path
bit-for-bit, and non-ASCII batches must take the fallback."""

import numpy as np
import pyarrow as pa
import pytest

from saber_ray.core import bytescan as bs
from saber_ray.core.hashing import hash_column, string_buffers
from saber_ray.stages.text import LangId, QualityScorer


TEXTS = [
    "The quick brown fox jumps over the lazy dog",
    "",
    "a",
    "  leading and   trailing  ",
    "punct!!! ??? ,,, and words 123 mixed_tokens here",
    "THE AND OF A TO IN IS IT FOR ON",
    "der die das und ist ein zu mit von auf",
    "le la de et un est pour que dans sur",
    "el la de que y en un es por con",
    "no stopwords whatsoever xyzzy plugh",
    "\t\n\f\r mixed whitespace \x0b vertical tab punct",
    "trailing space ",
    " x",
    "a b a b a b",
]


def _tbl(texts):
    return pa.table({"doc_id": list(range(len(texts))),
                     "text": pa.array(texts, type=pa.string())})


def test_quality_fast_equals_re2(monkeypatch):
    q = QualityScorer()
    fast = q(_tbl(TEXTS))["quality"].to_pylist()
    monkeypatch.setattr(bs, "all_ascii", lambda d: False)
    slow = q(_tbl(TEXTS))["quality"].to_pylist()
    assert fast == slow


def test_langid_fast_equals_re2(monkeypatch):
    l = LangId()
    fast = l(_tbl(TEXTS))["lang_pred"].to_pylist()
    monkeypatch.setattr(bs, "all_ascii", lambda d: False)
    slow = l(_tbl(TEXTS))["lang_pred"].to_pylist()
    assert fast == slow
    assert "en" in fast and "de" in fast and "und" in fast


def test_non_ascii_takes_fallback_and_is_correct():
    texts = ["le café est à côté de la gare",        # fr with accents
             "the plain ascii english text is here for it"]
    out = LangId()(_tbl(texts))["lang_pred"].to_pylist()
    assert out == ["fr", "en"]
    q = QualityScorer()(_tbl(texts))["quality"].to_pylist()
    assert all(0.0 <= v <= 1.0 for v in q)


def test_token_runs_shape():
    arr = pa.array(["ab  cd", "", "x", "  ", "ef"])
    data, starts, ends = string_buffers(arr)
    rs, re_, owner = bs.token_runs(data, starts, ends, bs.LUT_ALPHA)
    toks = [bytes(data[s:e]).decode() for s, e in zip(rs, re_)]
    assert toks == ["ab", "cd", "x", "ef"]
    assert owner.tolist() == [0, 0, 2, 4]


def test_count_class_matches_re2():
    import pyarrow.compute as pc
    arr = pa.array(TEXTS)
    data, starts, ends = string_buffers(arr)
    got = bs.count_class(data, starts, ends, bs.LUT_PUNCT)
    want = pc.count_substring_regex(arr, r"[^\w\s]").to_pylist()
    assert got.tolist() == want
    got_a = bs.count_class(data, starts, ends, bs.LUT_ALPHA)
    want_a = pc.count_substring_regex(arr, r"[A-Za-z]").to_pylist()
    assert got_a.tolist() == want_a


def test_run_hashes_match_whole_string_hashes():
    arr = pa.array(["hello world", "foo hello"])
    data, starts, ends = string_buffers(arr)
    rs, re_, _ = bs.token_runs(data, starts, ends, bs.LUT_ALPHA)
    th = bs.run_hashes(data, rs, re_)
    whole = hash_column(pa.array(["hello", "world", "foo"]))
    assert th[0] == whole[0] == th[3]
    assert th[1] == whole[1]
    assert th[2] == whole[2]
