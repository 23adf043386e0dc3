"""char_entropy vs the DuckDB entropy() aggregate and a pure-python
reference — float-tolerance oracles (the op is genuinely float, so it is
pytest-oracled rather than a driver hash gate)."""

import math
from collections import Counter

import pyarrow as pa

from saber_ray.stages.text import char_entropy
from tests.oracle_util import assert_matches_oracle


def _ref(s: str) -> float:
    if not s:
        return 0.0
    n = len(s)
    return -sum((c / n) * math.log2(c / n) for c in Counter(s).values())


def test_char_entropy_vs_duckdb(ray_session, sf_dir):
    import ray
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    got = char_entropy(ds)
    # LEFT JOIN keeps empty/NULL docs (kernel emits 0.0 for them; the
    # per-char aggregate would silently drop their group) — total over
    # every doc_id even if the corpus gains degenerate rows
    sql = ("SELECT d.doc_id, d.text, COALESCE(e.entropy, 0.0) AS entropy "
           "FROM documents d LEFT JOIN ("
           "  SELECT doc_id, ROUND(entropy(ch), 6) AS entropy "
           "  FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch "
           "        FROM documents) GROUP BY doc_id"
           ") e ON d.doc_id = e.doc_id")
    assert_matches_oracle(got, sql, sf_dir)


def test_char_entropy_edges(ray_session):
    import ray
    rows = ["", "aaaa", "ab", "abcd", "hello world", None, "x" * 5000]
    t = pa.table({"doc_id": list(range(len(rows))), "text": rows})
    out = char_entropy(ray.data.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for i, s in enumerate(rows):
        want = _ref(s or "")
        assert abs(out["entropy"][i] - want) < 1e-6, (i, s)
    assert out["entropy"][1] == 0.0          # uniform single byte
    assert abs(out["entropy"][2] - 1.0) < 1e-9   # two equally-likely bytes
