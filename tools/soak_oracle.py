#!/usr/bin/env python3
"""sf1 soak oracle: check_oracle with per-query time + spill caps."""
import json, math, os, sys, threading
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
TIMEOUT = 180
con = duckdb.connect()
con.execute("SET memory_limit='24GB'")
con.execute("SET temp_directory='/tmp/duck_spill'")
con.execute("SET max_temp_directory_size='20GB'")
for tbl in ("region nation customer supplier part orders lineitem "
            "events documents embeddings").split():
    path = f"{sfdir}/{tbl}.parquet"
    if os.path.isdir(path):
        path = f"{path}/*.parquet"
    con.execute(
        f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{path}')")

with open(f"{outdir}/oracle_sql.json") as f:
    oracle = json.load(f)

def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    return v

n_pass = n_fail = n_cap = 0
for name, sql in sorted(oracle.items()):
    timer = threading.Timer(TIMEOUT, con.interrupt)
    timer.start()
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        timer.cancel()
        msg = str(e).split("\n")[0][:120]
        kind = "CAP " if ("INTERRUPT" in msg.upper()
                          or "temp_directory" in msg
                          or "Out of Memory" in msg) else "FAIL"
        if kind == "CAP ":
            n_cap += 1
        else:
            n_fail += 1
        print(f"{kind}{name}: {msg}")
        continue
    timer.cancel()
    try:
        # rows are sorted before comparing (the column reorder makes
        # tuples comparable), so queries without a total ORDER BY
        # can't spuriously FAIL on row order
        # key=repr gives a total order even with None/mixed types
        ocols = sorted(odf.columns)
        orows = sorted((tuple(norm(v) for v in row)
                        for row in odf[ocols].itertuples(index=False)),
                       key=repr)
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')"
        ).fetchdf()
        scols = sorted(sdf.columns)
        srows = sorted((tuple(norm(v) for v in row)
                        for row in sdf[scols].itertuples(index=False)),
                       key=repr)
        if ocols != scols:
            print(f"FAIL {name}: columns oracle={ocols} spark={scols}")
            n_fail += 1
        elif [str(t) for t in odf[ocols].dtypes] != \
             [str(t) for t in sdf[scols].dtypes]:
            print(f"FAIL {name}: dtypes differ")
            n_fail += 1
        elif orows != srows:
            print(f"FAIL {name}: values differ "
                  f"({len(orows)} vs {len(srows)} rows)")
            n_fail += 1
        else:
            n_pass += 1
            print(f"PASS {name} ({len(srows)} rows)")
    except Exception as e:
        print(f"FAIL {name}: compare error {str(e)[:120]}")
        n_fail += 1

print(f"\n{n_pass} pass, {n_fail} fail, {n_cap} oracle-capped")
