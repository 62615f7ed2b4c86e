#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfdir> <verify_out_dir>

For each query in <verify_out_dir>/oracle_sql.json: run the SQL in DuckDB
(tables = parquet files in sfdir), read the Spark result parquet, sort
columns by name, compare row-by-row values. Prints PASS/FAIL per query.
"""
import json
import math
import os
import sys

import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for tbl in ("region nation customer supplier part orders lineitem "
            "events documents embeddings").split():
    # driver testdata is one file per table; GenScale soak output is a
    # Spark directory of part files — accept both layouts
    path = f"{sfdir}/{tbl}.parquet"
    if os.path.isdir(path):
        path = f"{path}/*.parquet"
    con.execute(
        f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{path}')")

with open(f"{outdir}/oracle_sql.json") as f:
    oracle = json.load(f)


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    # a missing dump is a failure (the engine builder threw in
    # Verify) — but fail FAST, before spending minutes running the
    # oracle SQL whose comparison target doesn't exist (a subset
    # SPARK_GRAFT_ONLY dump otherwise stalls on the heavyweight
    # oracles of queries that were never dumped)
    if not os.path.isdir(f"{outdir}/{name}"):
        print(f"FAIL {name}: no engine dump at {outdir}/{name}")
        n_fail += 1
        continue
    try:
        odf = con.execute(sql).fetchdf()
        ocols = sorted(odf.columns)
        orows = [tuple(norm(v) for v in row)
                 for row in odf[ocols].itertuples(index=False)]
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')"
        ).fetchdf()
        scols = sorted(sdf.columns)
        srows = [tuple(norm(v) for v in row)
                 for row in sdf[scols].itertuples(index=False)]
        odt = [str(t) for t in odf[ocols].dtypes] if ocols == scols else []
        sdt = [str(t) for t in sdf[scols].dtypes] if ocols == scols else []
        if ocols != scols:
            print(f"FAIL {name}: columns oracle={ocols} spark={scols}")
            n_fail += 1
        elif odt != sdt:
            # the driver's hash gate hashes typed values: a DuckDB
            # float64/object(Decimal) vs Spark int64 mismatches even
            # when values compare equal (3.0 == 3). Be as strict here.
            bad = [(c, o, s) for c, o, s in zip(ocols, odt, sdt) if o != s]
            print(f"FAIL {name}: dtype mismatch {bad}")
            n_fail += 1
        elif orows != srows:
            diff = next((i, a, b) for i, (a, b)
                        in enumerate(zip(orows, srows)) if a != b) \
                if len(orows) == len(srows) else ("len", len(orows),
                                                 len(srows))
        # also dtype info for debugging
            print(f"FAIL {name}: first diff {diff}")
            print(f"  oracle dtypes: {dict(odf.dtypes.astype(str))}")
            print(f"  spark  dtypes: {dict(sdf.dtypes.astype(str))}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(orows)} rows)")
            n_pass += 1
    except Exception as e:
        print(f"FAIL {name}: {e}")
        n_fail += 1

print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
