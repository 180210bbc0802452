#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (written by graft.Verify), runs
the matching SQL from oracle_sql.json in DuckDB against the raw testdata
parquet, canonicalizes both (columns sorted by name, rows sorted by all
columns, values stringified), and reports match/mismatch per query.
"""
import datetime
import json
import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, np.ndarray):
                # pandas surfaces list columns as ndarrays; str(ndarray)
                # elides long arrays with '...', so normalize via tolist().
                v = v.tolist()
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(f"{v:.9g}")
            elif isinstance(v, (list, tuple)):
                vals.append(repr([f"{x:.7g}" if isinstance(x, float) else x for x in v]))
            elif isinstance(v, (datetime.date, datetime.datetime, pd.Timestamp)):
                # Normalize date-vs-midnight-timestamp renderings (Spark
                # date32 -> datetime.date, DuckDB date_trunc -> Timestamp):
                # the driver hashes these equal, so we must too. Restricted
                # to datetime-typed values so genuine string columns ending
                # in " 00:00:00" are not silently rewritten.
                s = str(v)
                if s.endswith(" 00:00:00"):
                    s = s[: -len(" 00:00:00")]
                vals.append(s)
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [c for c in sorted(colnames)], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            print(f"FAIL  {name}: no spark output")
            n_bad += 1
            continue
        # Both sides through pandas, mimicking the driver: nullable int64
        # degrades to float64 identically on both sides, while a DuckDB
        # HUGEINT (sum of ints) vs Spark BIGINT asymmetry is surfaced.
        sdf = pq.read_table(qdir).to_pandas()
        spark_cols = list(sdf.columns)
        spark_rows = [tuple(r) for r in sdf.itertuples(index=False, name=None)]
        try:
            # Route through pandas like the driver does: DuckDB HUGEINT
            # (sum of integers) degrades to float64 here, so an oracle
            # returning HUGEINT hashes as "123.0" vs Spark's "123".
            ddf = con.execute(oracle[name]).df()
            duck_cols = list(ddf.columns)
            duck_rows = [tuple(r) for r in ddf.itertuples(index=False, name=None)]
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_bad += 1
            continue
        sc, sr = canon(spark_rows, spark_cols)
        dc, dr = canon(duck_rows, duck_cols)
        if sc != dc:
            print(f"FAIL  {name}: schema {sc} != {dc}")
            n_bad += 1
        elif sr != dr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL  {name}: {len(sr)} vs {len(dr)} rows; first diffs: {diffs}")
            n_bad += 1
        else:
            print(f"ok    {name} ({len(sr)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
