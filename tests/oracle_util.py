"""DuckDB oracle comparison used by the unit tests.

Mirrors the driver's check: row-count + schema + order-insensitive value
comparison with columns sorted by name. Floats are compared with tolerance
here (the engine additionally rounds oracle-facing float outputs to 6
decimals on BOTH sides so the driver's value-hash agrees).
"""

from __future__ import annotations

import glob
import os

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    try:
        import ray.data as rd
        if isinstance(result, rd.Dataset):
            df = result.to_pandas()
            if len(df) == 0 and len(df.columns) == 0:
                # this Ray version's to_pandas drops columns for 0-row
                # results even though the Dataset schema is intact
                sch = result.schema()
                if sch is not None:
                    df = pd.DataFrame(columns=list(sch.names))
            result = df
    except ImportError:
        pass
    if isinstance(result, pa.Table):
        result = result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_matches_oracle(result, sql: str, sf_dir: str, *, atol=1e-6, rtol=1e-9):
    got = canon(to_pandas(result))
    con = duck(sf_dir)
    want = canon(con.sql(sql).df())
    con.close()
    assert len(got) == len(want), f"row count: got {len(got)} want {len(want)}"
    assert list(got.columns) == list(want.columns), \
        f"columns: got {list(got.columns)} want {list(want.columns)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            np.testing.assert_allclose(
                g.to_numpy(dtype=float), w.to_numpy(dtype=float),
                atol=atol, rtol=rtol, err_msg=f"column {c}")
        else:
            mismatch = (g.astype(str).to_numpy() != w.astype(str).to_numpy())
            assert not mismatch.any(), \
                f"column {c}: {mismatch.sum()} mismatches, first at row {np.argmax(mismatch)}"
