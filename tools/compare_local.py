#!/usr/bin/env python3
"""Dev-only local oracle harness (mimics the driver's DuckDB compare).

Usage: python3 tools/compare_local.py <outDir> <sfDir>
  where <outDir> is what `sbt "runMain graft.Verify <sfDir> <outDir>"` wrote.

For each <name>.parquet result + oracle_sql.json entry, runs the oracle
SQL in DuckDB over views named after the testdata tables, then compares:
columns sorted by name, rows sorted by all columns, every cell
canonicalized to a STRING and compared exactly — the same discipline as
the driver's hash compare, so dtype drift (int64 12 vs float64 12.0,
which a tolerance compare would hide — see VERDICT r1 on win_sessionize)
fails here too. NOT part of the shipped library — uses the driver-side
python stack (duckdb/pandas/pyarrow) for pre-validation only.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def cell_str(v) -> str:
    """Canonical string form of a cell, driver-style: the materialized
    pandas value's str(), with list-likes rendered element-wise."""
    if hasattr(v, "tolist") and not isinstance(v, (str, bytes)):
        v = v.tolist()  # numpy arrays / scalars -> python
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(cell_str(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def cells_equal(a, b) -> bool:
    return cell_str(a) == cell_str(b)


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = Path(out_dir, name)
        if not res_dir.exists():
            print(f"FAIL {name}: no spark result dir")
            n_fail += 1
            continue
        try:
            got = canon(pd.read_parquet(res_dir))
            want = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(got)):
            for c in got.columns:
                if not cells_equal(got[c].iloc[i], want[c].iloc[i]):
                    bad = (i, c, got[c].iloc[i], want[c].iloc[i])
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duckdb={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
