"""Sources & sinks beyond parquet scan (SURVEY.md §2.B "Scans/sources" /
"Sinks"): CSV, JSON, ORC and line-text ingest, partitioned parquet write.

Each is registered as a *roundtrip* query — write the driver table out
through the sink, read it back through the matching source with an explicit
schema (never inferred on the correctness path, §1.3), and return content
that the DuckDB oracle checks against the original table.  Equality proves
both directions of the connector.

Scratch lives under the system temp dir (unique per sf_dir), like Spark's
own shuffle/checkpoint scratch.

Scale notes: writes are partition-parallel (one file per task; the
partitioned write shuffles on the partition column first so each partition
directory is written by one task — ``repartition(col)`` before
``partitionBy`` avoids the small-files explosion); reads are split-parallel
(CSV/JSON are splittable by line).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.compat import dd_money_sum, money_sum
from ..registry import query


def _scratch(kind: str, sf_dir: str) -> str:
    # Stable digest: str hash is per-process randomized, which would leak a
    # fresh /tmp dir per run; every writer here uses mode("overwrite").
    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return os.path.join(tempfile.gettempdir(), f"sce_{kind}_{digest}")


_CSV_ORACLE = "SELECT n_nationkey, n_name, n_regionkey FROM nation"


@query("csv_roundtrip_nation", oracle=_CSV_ORACLE, tags=("sources", "csv"), cache=False)
def csv_roundtrip_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation → CSV (header) → read back with explicit schema.  Proves the
    CSV source/sink pair; schema is declared, not inferred."""
    n = load_table(spark, sf_dir, "nation")
    path = _scratch("csv_nation", sf_dir)
    n.write.mode("overwrite").option("header", True).csv(path)
    return spark.read.schema("n_nationkey int, n_name string, n_regionkey int").option(
        "header", True
    ).csv(path)


_JSON_ORACLE = "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer"


@query("json_roundtrip_customer", oracle=_JSON_ORACLE, tags=("sources", "json"), cache=False)
def json_roundtrip_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → JSON lines → read back with explicit schema.  Doubles
    survive exactly (Spark writes shortest-round-trip representations)."""
    c = load_table(spark, sf_dir, "customer")
    path = _scratch("json_customer", sf_dir)
    c.write.mode("overwrite").json(path)
    return spark.read.schema(
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string"
    ).json(path)


_PARTITIONED_ORACLE = f"""
SELECT o_orderstatus, COUNT(*) AS n, {dd_money_sum('o_totalprice', 'total')}
FROM orders GROUP BY o_orderstatus
"""


@query("partitioned_write_orders", oracle=_PARTITIONED_ORACLE, tags=("sinks", "parquet"), cache=False)
def partitioned_write_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → parquet partitioned by o_orderstatus → read back →
    aggregate per partition.  The pre-write ``repartition`` on the
    partition column makes one task own each directory (no small-files
    explosion); reading back and aggregating proves values and partition
    routing survived.  Partition pruning over this layout is asserted in
    tests/test_plans.py."""
    o = load_table(spark, sf_dir, "orders")
    path = _scratch("part_orders", sf_dir)
    o.repartition(F.col("o_orderstatus")).write.mode("overwrite").partitionBy(
        "o_orderstatus"
    ).parquet(path)
    back = spark.read.parquet(path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), money_sum("o_totalprice", "total")
    )


_TEXT_ORACLE = "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders"


@query("text_roundtrip_orders", oracle=_TEXT_ORACLE, tags=("sources", "text"), cache=False)
def text_roundtrip_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → delimited text lines (``df.write.text``) → read back with
    ``spark.read.text`` + explicit ``split`` parse — the log-file ingestion
    shape (the source every raw-crawl pipeline starts from).  Reads are
    split-parallel by line like CSV; the parse is row-local codegen.  The
    oracle is the original table: the hash passes only if serialize +
    re-parse is lossless (doubles survive via Spark's shortest-round-trip
    string rendering)."""
    o = load_table(spark, sf_dir, "orders")
    path = _scratch("text_orders", sf_dir)
    o.select(
        F.concat_ws(
            "|",
            F.col("o_orderkey"),
            F.col("o_orderstatus"),
            F.col("o_totalprice").cast("string"),
        ).alias("value")
    ).write.mode("overwrite").text(path)
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), r"\|")
    return lines.select(
        parts.getItem(0).cast("bigint").alias("o_orderkey"),
        parts.getItem(1).alias("o_orderstatus"),
        parts.getItem(2).cast("double").alias("o_totalprice"),
    )


_ORC_ORACLE = "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier"


@query("orc_roundtrip_supplier", oracle=_ORC_ORACLE, tags=("sources", "orc"), cache=False)
def orc_roundtrip_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier → ORC → read back with explicit schema.  Proves the ORC
    source/sink pair (the other columnar format Spark ships natively —
    splittable stripes, predicate pushdown, column pruning like parquet)."""
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    path = _scratch("orc_supplier", sf_dir)
    s.write.mode("overwrite").orc(path)
    return spark.read.schema(
        "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double"
    ).orc(path)


_EVOLUTION_ORACLE = """
SELECT s_suppkey, s_name,
       CASE WHEN s_suppkey % 2 = 0 THEN s_acctbal END AS s_acctbal
FROM supplier
"""


@query(
    "parquet_schema_evolution",
    oracle=_EVOLUTION_ORACLE,
    tags=("sources", "parquet", "schema"),
    cache=False,
)
def parquet_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across parquet file generations — the situation
    every long-lived 100 TB table is in: generation v1 wrote
    ``(s_suppkey, s_name)``, a later v2 added ``s_acctbal``; reading the
    whole tree with ``mergeSchema`` unions the footers and v1 rows
    surface NULL for the added column.  The deterministic key-parity
    split lets the oracle reconstruct exactly which rows carry the new
    column.

    Scale: schema merge reads FOOTERS only (one small metadata read per
    file, distributed); data pages are untouched until the scan, and
    column pruning/pushdown still apply per file.  ``mergeSchema`` is
    opt-in per read because the footer pass costs a listing — production
    tables pin the merged schema in a catalog instead of re-deriving it
    every query (the read-side contract this query demonstrates).
    """
    s = load_table(spark, sf_dir, "supplier")
    root = _scratch("schema_evo", sf_dir)
    v1 = s.where(F.col("s_suppkey") % 2 == 1).select("s_suppkey", "s_name")
    v2 = s.where(F.col("s_suppkey") % 2 == 0).select(
        "s_suppkey", "s_name", "s_acctbal"
    )
    v1.write.mode("overwrite").parquet(os.path.join(root, "v1"))
    v2.write.mode("overwrite").parquet(os.path.join(root, "v2"))
    return (
        spark.read.option("mergeSchema", True)
        .option("recursiveFileLookup", True)
        .parquet(root)
        .select("s_suppkey", "s_name", "s_acctbal")
    )


_BINARYFILE_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5
FROM documents
WHERE doc_id % 97 = 0
"""


@query(
    "binaryfile_blob_ingest",
    oracle=_BINARYFILE_ORACLE,
    tags=("sources", "binary", "multimodal"),
    cache=False,
)
def binaryfile_blob_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``binaryFile`` source — the front door of every multimodal
    pipeline: opaque blob FILES on storage (images/audio/shards) become a
    DataFrame of ``(path, modificationTime, length, content: binary)``
    rows, after which the engine's multimodal operators
    (operators/multimodal.py) take over.  The fixture generator writes
    one blob file per sampled document (UTF-8 bytes of ``text``) so the
    oracle can recompute the exact byte length and md5 from the source
    table: the hash passes only if file bytes survive the
    write→list→read path untouched and the filename→key parse is exact.

    Scale: the driver-side writer is FIXTURE-ONLY (bounded ``% 97``
    sample, ~1% of docs — at 100 TB blobs already exist as files; no
    pipeline writes them row-by-row from a driver).  The read side is the
    part that must scale and does: Spark lists the directory in parallel,
    one task per file group (``maxPartitionBytes`` splits large listings,
    small files coalesce into shared tasks), and column pruning applies —
    a metadata-only query never reads content bytes.  md5 runs JVM-side
    per file; key extraction is a codegen regexp on the path.
    """
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 97 == 0)
        .select("doc_id", "text")
    )
    path = _scratch("binblob", sf_dir)
    os.makedirs(path, exist_ok=True)
    for stale in os.listdir(path):  # overwrite semantics, like the sinks above
        os.remove(os.path.join(path, stale))
    for r in docs.collect():
        with open(os.path.join(path, f"doc_{r['doc_id']}.bin"), "wb") as fh:
            fh.write(r["text"].encode("utf-8"))
    blobs = spark.read.format("binaryFile").load(path)
    return blobs.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.col("length").cast("bigint").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )
