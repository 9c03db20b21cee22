#!/usr/bin/env python3
"""Local pre-check of the driver's t2 gate: run Verify output vs DuckDB.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json:
  - read the Spark result parquet at <verifyOutDir>/<name>/
  - run the oracle SQL in DuckDB with each testdata table registered as a view
  - sort columns by name, sort rows, compare values exactly
Reports per-query OK/FAIL with first differing cell.  (Dev tool only — the
driver has its own harness; this one exists so mismatches die here, not at
the round gate.)
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # bit-exact expectation (decimal-sum contract)
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_ok = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_path = Path(out_dir, name)
        if not spark_path.exists():
            print(f"FAIL {name}: no Spark output at {spark_path}")
            n_fail += 1
            continue
        try:
            got = canon(pd.read_parquet(spark_path))
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        bad = None
        for ci, c in enumerate(got.columns):
            gv, wv = got[c].tolist(), want[c].tolist()
            for ri in range(len(gv)):
                if not cells_equal(gv[ri], wv[ri]):
                    bad = (c, ri, gv[ri], wv[ri])
                    break
            if bad:
                break
        if bad:
            c, ri, g, w = bad
            print(f"FAIL {name}: col={c} row={ri} spark={g!r} oracle={w!r}")
            n_fail += 1
        else:
            print(f"OK   {name} ({len(got)} rows, {len(got.columns)} cols)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
