"""Local replica of the driver's DuckDB correctness harness.

Runs each registered query at sf0.01 on Spark AND its oracle SQL on DuckDB,
canonicalizes both results the way the driver does (columns sorted by name,
rows sorted by every column — which REQUIRES hashable cells, the round-1
d8 failure mode), and compares row count, schema width, and a value hash.

Usage:
    python scripts/preflight.py            # first 50 (the driver window)
    python scripts/preflight.py --all      # every registered query
    python scripts/preflight.py k19 x14    # name filters (substring)
"""

from __future__ import annotations

import hashlib
import os
import sys
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    # float-tolerant canonical text: round to 6 dp like the driver's
    # order-insensitive compare; everything else str()'d
    parts = []
    for col in df.columns:
        s = df[col]
        if s.dtype.kind == "f":
            s = s.round(6).map(lambda v: f"{v:.6f}")
        parts.append(s.astype(str))
    blob = "\n".join("|".join(t) for t in zip(*parts)) if parts else ""
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def main() -> int:
    import __spark_entry__ as se
    from pcd_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    run_all = "--all" in sys.argv
    sf = os.environ.get("PCD_PREFLIGHT_SF", "/root/testdata/sf0.01")

    q, o = se.queries(), se.oracle_sql()
    names = list(q)
    window = names if run_all else names[:50]
    if args:
        window = [n for n in window if any(a in n for a in args)]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    spark = get_spark("preflight", cores=8, shuffle_partitions=16)
    bad = []
    for n in window:
        if n not in o:
            print(f"{n:34s} SKIP (rows-only: no oracle)")
            continue
        try:
            sp = canon(q[n](spark, sf).toPandas())
            du = canon(con.execute(o[n]).fetchdf())
            hs, hd = value_hash(sp), value_hash(du)
            ok = len(sp) == len(du) and len(sp.columns) == len(du.columns) and hs == hd
            print(
                f"{n:34s} rows {len(sp)}/{len(du)} "
                f"cols {len(sp.columns)}/{len(du.columns)} "
                f"hash {'OK' if hs == hd else 'MISMATCH ' + hs + ' ' + hd}"
            )
            if not ok:
                bad.append(n)
        except Exception:
            print(f"{n:34s} ERROR")
            traceback.print_exc()
            bad.append(n)
    print(f"\nchecked={len(window)} bad={bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
