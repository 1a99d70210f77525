"""Simulate the spark-graft driver: import __spark_entry__ by path from a
clean process, smoke entry(), then run every queries() entry at sf0.01 and
compare to oracle_sql() via DuckDB with an order-insensitive value hash."""
import hashlib
import importlib.util
import json
import sys

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# --- smoke: entry() twice, stable schema, rows > 0
df1 = mod.entry(spark)
rows = df1.collect()
df2 = mod.entry(spark)
assert df1.schema == df2.schema, "entry() schema unstable"
print(f"entry: {len(rows)} rows, schema={[f.name for f in df1.schema]}")
assert len(rows) > 0

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


def value_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(6)
        pdf[c] = pdf[c].astype(str)
    lines = sorted("|".join(r) for r in pdf.itertuples(index=False))
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


qs, oracles = mod.queries(), mod.oracle_sql()
report = {}
ok = True
for name, fn in sorted(qs.items()):
    got = fn(spark, SF).toPandas()
    if name not in oracles:
        report[name] = {"rows": len(got), "oracle": None}
        continue
    exp = con.execute(oracles[name]).fetch_df()
    match = (len(got) == len(exp)
             and sorted(got.columns) == sorted(exp.columns)
             and value_hash(got) == value_hash(exp))
    report[name] = {"rows": len(got), "exp_rows": len(exp), "match": match}
    ok = ok and match
print(json.dumps(report, indent=1))
print("ALL MATCH" if ok else "MISMATCH")
sys.exit(0 if ok else 1)
