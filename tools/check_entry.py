"""Driver-compare rehearsal: run every queries() entry on Spark and its
oracle_sql() on DuckDB at a given sf_dir; compare row count, column names,
and an order-insensitive value hash (columns sorted by name, rows sorted).

Usage: python tools/check_entry.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd


def value_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    pdf = pdf[cols].copy()
    for c in cols:
        col = pdf[c]
        if col.dtype == object:
            pdf[c] = col.astype(str)
        elif str(col.dtype).startswith("float"):
            pdf[c] = col.round(6).map(lambda v: f"{v:.6f}")
        else:
            pdf[c] = col.astype(str)
    rows = sorted(map("|".join, pdf.itertuples(index=False, name=None)))
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main(sf_dir: str) -> int:
    sys.path.insert(0, ".")
    import __spark_entry__ as entry_mod
    from incremental_entity_extraction_spark.session import get_spark

    spark = get_spark(cores=8, app_name="check-entry")
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows  ({dt:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        elif value_hash(sdf) != value_hash(odf):
            problems.append("value-hash mismatch")
        if problems:
            failures += 1
            print(f"FAIL {name}: {'; '.join(problems)}  ({dt:.1f}s)")
            if "value-hash mismatch" in problems and len(sdf) == len(odf):
                cols = sorted(sdf.columns)
                a = sdf[cols].sort_values(cols).reset_index(drop=True)
                b = odf[cols].sort_values(cols).reset_index(drop=True)
                for c in cols:
                    if not a[c].astype(str).equals(b[c].astype(str)):
                        diff_idx = (a[c].astype(str) != b[c].astype(str)).idxmax()
                        print(f"   first diff col={c} row={diff_idx}: "
                              f"spark={a[c][diff_idx]!r} duckdb={b[c][diff_idx]!r}")
        else:
            print(f"OK   {name}: {len(sdf)} rows  ({dt:.1f}s)")
    print(f"\n{failures} failures / {len(qs)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))
