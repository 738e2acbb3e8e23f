"""Ad-hoc driver-sim for a named subset of registry keys at sf0.01."""
import sys

import duckdb

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

import s3spark.queries  # noqa: F401
from s3spark.registry import REGISTRY
from tests.helpers import assert_same  # reuse the harness comparator

KEYS = sys.argv[1:] or [
    "dedup_semdedup",
    "quality_classifier_hashed",
    "bpe_train_unrolled",
    "agg_kmv_distinct",
    "scan_manifest_prune",
    "stream_foreach_batch_upsert",
]

SF = "/root/testdata/sf0.01"
spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
for t in (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
):
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

fails = []
for k in KEYS:
    q = REGISTRY[k]
    try:
        df = q.fn(spark, SF)
        if q.oracle is None:
            print(f"{k}: rows-only, {df.count()} rows")
            continue
        assert_same(df, con, q.oracle, name=k)
        print(f"{k}: PASS")
    except Exception as exc:  # noqa: BLE001
        print(f"{k}: FAIL {type(exc).__name__}: {str(exc)[:400]}")
        fails.append(k)
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
