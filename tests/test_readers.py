"""Reader round-trips: CSV/JSON/ORC with explicit schemas, PERMISSIVE
malformed handling."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from fn_rq_report_etl_dev_spark.sources.readers import read_csv, read_json, read_orc

SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), True),
    T.StructField("name", T.StringType(), True),
    T.StructField("amount", T.DoubleType(), True),
])


def test_csv_roundtrip_and_permissive_garbage(spark, tmp_path):
    p = str(tmp_path / "c.csv")
    with open(p, "w") as f:
        f.write("id,name,amount\n1,alpha,1.5\n2,beta,not-a-number\n3,gamma,3.25\n")
    rows = {r["id"]: r for r in read_csv(spark, p, SCHEMA).collect()}
    assert rows[1]["amount"] == 1.5
    assert rows[2]["amount"] is None  # malformed field → null, row kept
    assert rows[3]["name"] == "gamma"


def test_json_roundtrip(spark, tmp_path):
    p = str(tmp_path / "j.json")
    with open(p, "w") as f:
        f.write('{"id": 1, "name": "a", "amount": 2.5}\n{"id": 2, "extra": true}\n')
    rows = {r["id"]: r for r in read_json(spark, p, SCHEMA).collect()}
    assert rows[1]["amount"] == 2.5
    assert rows[2]["amount"] is None  # absent field → null (projection contract)


def test_orc_roundtrip(spark, tmp_path):
    p = str(tmp_path / "o.orc")
    df = spark.createDataFrame([(1, "x", 9.5)], SCHEMA)
    df.write.orc(p)
    got = read_orc(spark, p, SCHEMA).collect()
    assert [(r["id"], r["name"], r["amount"]) for r in got] == [(1, "x", 9.5)]


def test_binary_file_reader_feeds_asset_table(spark, tmp_path):
    """binaryFile source → asset table → fake decode, end-to-end: glob
    pruning keeps non-matching files out at listing time; payload bytes
    survive exactly (digest check)."""
    import hashlib

    from fn_rq_report_etl_dev_spark.operators.multimodal import (
        decode_features,
        to_asset_table,
    )
    from fn_rq_report_etl_dev_spark.sources.readers import read_binary_files

    payload = bytes(range(256))
    (tmp_path / "a.bin").write_bytes(payload)
    (tmp_path / "b.bin").write_bytes(b"second")
    (tmp_path / "ignore.txt").write_text("not binary media")

    raw = read_binary_files(spark, str(tmp_path), glob="*.bin")
    rows = {r["path"].split("/")[-1]: r for r in raw.collect()}
    assert set(rows) == {"a.bin", "b.bin"}
    assert rows["a.bin"]["length"] == 256 and bytes(rows["a.bin"]["content"]) == payload

    assets = to_asset_table(
        raw.withColumn("asset_id", F.crc32(F.col("path"))),
        "asset_id", "content", "application/octet-stream",
    )
    got = {r["n_bytes"]: r for r in assets.collect()}
    assert got[256]["content_md5"] == hashlib.md5(payload).hexdigest()
    feats = decode_features(assets, deterministic_fake=True).collect()
    assert all(r["decode_ok"] for r in feats)
