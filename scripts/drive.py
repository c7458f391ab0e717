#!/usr/bin/env python
"""Harness-realistic end-to-end drive (see .claude/skills/verify):
entry() smoke, oracle spot-checks vs DuckDB, run_extraction with golden
equality + resume idempotence, hostile payloads, empty input.
Run from any cwd: `python scripts/drive.py`."""
import sys, tempfile, os
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import duckdb
from pyspark.sql import SparkSession
import __spark_entry__ as mod
from pdftotext_spark.plans.pipeline import session_confs, run_extraction
from pdftotext_spark.sources.transcripts_gen import write_parquet

b = SparkSession.builder.master("local[8]").appName("verify-drive").config("spark.ui.enabled","false")
for k, v in session_confs().items():
    b = b.config(k, v)
spark = b.getOrCreate()

print("== entry(spark) smoke ==")
df = mod.entry(spark)
rows = df.collect()
print("rows:", len(rows), "schema:", df.schema.simpleString())
for r in rows[:5]: print(" ", r)
assert len(rows) > 0 and all(r.n_roundtrip_equal == r.n_docs for r in rows)

print("== oracle spot-check at sf0.01 (3 queries) ==")
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.01/{t}.parquet')")
for name in ("minhash_lsh_pairs", "cosine_topk", "sessionize"):
    sdf = mod.queries()[name](spark, "/root/testdata/sf0.01")
    s_rows = sorted(tuple(str(x) for x in r) for r in sdf.collect())
    d_rows = sorted(tuple(str(x) for x in r) for r in con.execute(mod.oracle_sql()[name]).fetchall())
    print(f" {name}: spark={len(s_rows)} duck={len(d_rows)} sample={s_rows[:1]}")
    assert len(s_rows) == len(d_rows)

print("== extraction job: run_extraction() end-to-end with resume ==")
work = tempfile.mkdtemp()
write_parquet(f"{work}/in", n_turns=400, seed=7, skew_conv_turns=150)
out = run_extraction(spark, f"{work}/in/transcripts.parquet",
                     output_path=f"{work}/out", metrics_path=f"{work}/metrics", run_id="drive-1")
n1 = out.count()
golden = spark.read.parquet(f"{work}/in/golden.parquet")
joined = out.join(golden, ["conv_id","turn_idx"])
bad = joined.filter("extracted_text <> expected_text").count()
print(f" extracted={n1} golden_mismatches={bad}")
assert n1 == 400 and bad == 0
m = spark.read.parquet(f"{work}/metrics")
print(" metrics rows:", m.count(), "turns:", m.agg({"turns_parsed":"sum"}).first()[0])

print("== PROBE: resume is idempotent (second run adds nothing) ==")
out2 = run_extraction(spark, f"{work}/in/transcripts.parquet",
                      output_path=f"{work}/out", metrics_path=f"{work}/metrics", run_id="drive-2")
n2 = out2.count()
print(f" after second run: {n2} rows (expected still 400)")
assert n2 == 400, f"resume duplicated rows: {n2}"

print("== PROBE: hostile payloads never kill the job ==")
import pandas as pd, pyarrow as pa, pyarrow.parquet as pq
from datetime import datetime, timezone
hostile = pd.DataFrame({
    "conv_id": ["h"]*6, "turn_idx": list(range(6)),
    "role": ["user"]*6,
    "text": ["%B64%!!notb64", "%PDF-1.4 garbage \x01\x02", "", "<html><p>x</p>",
             "%B64%" + "QUFB"*10, "%PDF-1.4\n1 0 obj\n<< /Filter /JBIG2Decode /Length 2 >>\nstream\nxx\nendstream\nendobj\ntrailer\n<< >>"],
    "tool": ["?"]*6,
    "ts": [datetime(2026,1,1,tzinfo=timezone.utc)]*6,
})
hostile["turn_idx"] = hostile["turn_idx"].astype("int32")
hschema = pa.schema([("conv_id", pa.string()),("turn_idx", pa.int32()),("role", pa.string()),("text", pa.string()),("tool", pa.string()),("ts", pa.timestamp("us", tz="UTC"))])
pq.write_table(pa.Table.from_pandas(hostile, schema=hschema), f"{work}/hostile.parquet")
hdf = run_extraction(spark, f"{work}/hostile.parquet")
hrows = hdf.collect()
for r in hrows: print("  ", r.turn_idx, r.payload_kind, "failures:", r.decode_failures, repr(r.extracted_text[:30]))
assert len(hrows) == 6

print("== PROBE: empty input ==")
empty = hostile.iloc[0:0]
pq.write_table(pa.Table.from_pandas(empty, schema=hschema), f"{work}/empty.parquet")
print(" empty rows:", run_extraction(spark, f"{work}/empty.parquet").count())

print("ALL DRIVE CHECKS PASSED")
spark.stop()
