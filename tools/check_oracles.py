"""Local replica of the driver's correctness gate: run each queries()[name]
on Spark and oracle_sql()[name] on DuckDB against the same sf dir; compare
row count, column names, and order-insensitive values."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from ppocr_spark import cache  # noqa: E402
from ppocr_spark.pipeline import build_session  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
# rebind the corpus-derived oracles' embedded parquet paths to the same
# scale (oracle_sql() defaults to the driver's sf0.01 contract)
os.environ["PPOCR_ORACLE_SF_DIR"] = SF_DIR
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if v is None:
        # distinct sentinel: the driver's value-hash distinguishes NULL from
        # empty string (this exact class failed dedup_substring_rewrite in r4)
        return "\x00<NULL>"
    return str(v)


def main():
    only = sys.argv[1:] or None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    spark = build_session("oracle-check", cores=8)
    qs = entry.queries()
    os_ = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
            cache.release_all()  # free library persists between queries
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error {str(e)[:200]}")
            continue
        if name not in os_:
            print(f"ok(rows-only) {name}: {len(srows)} rows")
            continue
        try:
            ddf = con.sql(os_[name])
            drows = ddf.fetchall()
            dcols = [d[0] for d in ddf.description]
            dtypes = [str(t) for t in ddf.types]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error {str(e)[:200]}")
            continue
        # a typed value-hash (the driver's) can never match HUGEINT against
        # any Spark type — sum() over integers must be cast ::BIGINT in the
        # oracle SQL (this exact class failed clean_corpus_stats in r3)
        huge = [c for c, t in zip(dcols, dtypes) if "HUGEINT" in t]
        if huge:
            failures.append((name, f"HUGEINT oracle columns {huge}"))
            print(f"FAIL {name}: oracle emits HUGEINT columns {huge} "
                  "(cast ::BIGINT)")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append((name, f"cols {scols} vs {dcols}"))
            print(f"FAIL {name}: cols {scols} vs {dcols}")
            continue
        if len(srows) != len(drows):
            failures.append((name, f"rows {len(srows)} vs {len(drows)}"))
            print(f"FAIL {name}: rows {len(srows)} vs {len(drows)}")
            continue
        # order-insensitive, column-name-sorted value comparison
        order = sorted(range(len(scols)), key=lambda i: scols[i])
        dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
        sset = sorted(
            tuple(canon(r[scols[i]]) for i in order) for r in srows
        )
        dset = sorted(
            tuple(canon(r[i]) for i in dorder) for r in drows
        )
        if sset != dset:
            diff = [
                (a, b) for a, b in zip(sset, dset) if a != b
            ][:3]
            failures.append((name, f"values differ, first: {diff}"))
            print(f"FAIL {name}: values differ; first diffs: {diff}")
        else:
            print(f"OK   {name}: {len(srows)} rows")
    print()
    if failures:
        print(f"{len(failures)} FAILURES:", [f[0] for f in failures])
        sys.exit(1)
    print("all green")
    spark.stop()


if __name__ == "__main__":
    main()
