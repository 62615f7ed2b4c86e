#!/usr/bin/env python3
"""Post-GenScale fixup (driver-side): restore events.ts to
TIMESTAMP(NANOS).

Spark cannot write the parquet nano timestamp type, so GenScale's
events table comes out as int64 nanos; the oracle and the engine's
nanosAsLong read path both expect the driver testdata's physical
TIMESTAMP(NANOS). This rewrites <sfdir>/events.parquet (a Spark
directory or a single file) as ONE file with ts cast back to
timestamp[ns], drops the stale Spark schema metadata, and removes
.crc/_SUCCESS droppings from every table directory.

Usage: python3 tools/restore_nanos.py /tmp/sf1
"""
import glob
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sfdir = sys.argv[1]
d = f"{sfdir}/events.parquet"
t = pq.read_table(d)
print("before:", t.schema.field("ts").type, t.num_rows, "rows")
idx = t.schema.get_field_index("ts")
t = t.set_column(idx, pa.field("ts", pa.timestamp("ns")),
                 t.column("ts").cast(pa.timestamp("ns")))
t = t.replace_schema_metadata(None)
tmp = f"{sfdir}/events_new.parquet"
pq.write_table(t, tmp)
if os.path.isdir(d):
    shutil.rmtree(d)
else:
    os.remove(d)
os.rename(tmp, d)
print("after:", pq.read_schema(d).field("ts").type)

for p in glob.glob(f"{sfdir}/*.parquet"):
    if os.path.isdir(p):
        for f in glob.glob(p + "/.*.crc") + glob.glob(p + "/_SUCCESS*"):
            os.remove(f)
print("done")
