"""Local simulation of the driver's correctness gate.

Runs every entry in __spark_entry__.queries() at sf0.01 and compares
row count, schema (column names sorted) and a value hash against the
DuckDB oracle from oracle_sql(), mimicking the driver's canonicalizer:
sort columns by name, sort rows, round floats, hash.

Usage: python scripts/check_oracles.py [query ...]
"""
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def canon(df_pandas):
    import numpy as np
    df = df_pandas.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype(float).round(6)
            # normalize -0.0
            df[c] = df[c] + 0.0
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    payload = df.to_csv(index=False, float_format="%.6f").encode()
    return hashlib.md5(payload).hexdigest()


def main():
    only = set(sys.argv[1:])
    import duckdb
    import __spark_entry__ as entry
    from greynirserver_spark.session import get_spark
    spark = get_spark()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            pdf = sdf.toPandas()
            srows, scols = len(pdf), sorted(pdf.columns)
            if name not in oracles:
                results[name] = {"status": "no_oracle", "rows": srows,
                                 "sec": round(time.time() - t0, 1)}
                continue
            odf = con.execute(oracles[name]).fetchdf()
            orows, ocols = len(odf), sorted(odf.columns)
            h_s, h_o = canon(pdf), canon(odf)
            ok = (srows == orows) and (scols == ocols) and (h_s == h_o)
            results[name] = {
                "status": "PASS" if ok else "FAIL",
                "rows": (srows, orows),
                "schema": "ok" if scols == ocols else f"{scols} vs {ocols}",
                "hash": "ok" if h_s == h_o else "MISMATCH",
                "sec": round(time.time() - t0, 1),
            }
        except Exception as e:  # noqa: BLE001
            results[name] = {"status": "ERROR",
                             "err": repr(e)[:200],
                             "sec": round(time.time() - t0, 1)}
        print(name, json.dumps(results[name]), flush=True)

    bad = {k: v for k, v in results.items() if v["status"] not in ("PASS",)}
    print("\n=== SUMMARY:", len(results), "queries,",
          sum(1 for v in results.values() if v["status"] == "PASS"), "pass,",
          len(bad), "not-pass")
    for k, v in bad.items():
        print("  ", k, v["status"])


if __name__ == "__main__":
    main()
