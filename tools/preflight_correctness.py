"""Driver-replica correctness preflight at the driver's gate scale.

The pytest oracle-parity suite gates sf0.001; the round driver gates
sf0.01. This script runs the SAME queries()/oracle_sql() pairs at
sf0.01 (or $OPHOIS_PREFLIGHT_SF_DIR) and prints one status line per
query plus a JSON summary — a dress rehearsal for CORRECTNESS_r{N}.

Usage: python tools/preflight_correctness.py [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ophois_spark.queries import ORACLES, QUERIES
from ophois_spark.session import get_spark

SF_DIR = os.environ.get("OPHOIS_PREFLIGHT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    names = sys.argv[1:] or sorted(QUERIES)
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    results: dict[str, dict] = {}
    for name in names:
        t0 = time.monotonic()
        row = {"rows_match": False, "schema_match": False, "values_match": False}
        try:
            got = normalize(QUERIES[name](spark, SF_DIR).toPandas())
            if name not in ORACLES:
                row = {"rows_only": len(got) > 0, "spark_rows": len(got)}
            else:
                want = normalize(con.sql(ORACLES[name]).df())
                row["spark_rows"], row["oracle_rows"] = len(got), len(want)
                row["schema_match"] = list(got.columns) == list(want.columns)
                row["rows_match"] = len(got) == len(want)
                if row["schema_match"] and row["rows_match"]:
                    # NaN-aware AND dtype-tolerant, matching the
                    # driver gate's hash-of-sorted-values: nulls equal
                    # each other (plain list equality fails nan != nan)
                    # and int32 vs int64 / Int64 vs float64 columns
                    # compare on VALUES (Series.equals would add dtype
                    # strictness the real gate does not have)
                    def col_eq(a, b):
                        av = a.astype(object).where(a.notna(), None).tolist()
                        bv = b.astype(object).where(b.notna(), None).tolist()
                        return av == bv

                    row["values_match"] = all(
                        col_eq(got[c], want[c]) for c in got.columns
                    )
        except Exception as exc:  # surface, keep sweeping
            row["err"] = f"{type(exc).__name__}: {exc}"[:300]
        row["sec"] = round(time.monotonic() - t0, 2)
        results[name] = row
        ok = row.get("values_match") or row.get("rows_only")
        print(f"{'PASS' if ok else 'FAIL'} {name} ({row['sec']}s)"
              + ("" if ok else f" {row}"), flush=True)
    n_ok = sum(1 for r in results.values()
               if r.get("values_match") or r.get("rows_only"))
    print(json.dumps({"sf_dir": SF_DIR, "passed": n_ok, "total": len(results)}))
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
