"""Python DataSource API (Spark 4) connector for the engine's Zarr stores:
``spark.read.format("sce_zarr").option("path", <array dir>).load()``.

The mapInPandas read path (``zarrv2.read_zarr_matrix``) proves the decode;
this module lifts it into Spark's FIRST-CLASS connector surface — the
Python DataSource API (SPARK-44076, public since 4.0) — so a Zarr array
behaves like any other format: usable from ``spark.read.format``, from SQL
via ``CREATE TABLE ... USING sce_zarr``, and composable with every
downstream operator with no knowledge of the chunk layout.

Split planning is the part that matters at scale and it is explicit here:
``ZarrChunkReader.partitions()`` returns ONE InputPartition PER CHUNK
OBJECT, so Spark schedules decode tasks at exactly the store's parallel
grain (the same contract a JVM FileSourceScan gets from its split planner
— and the property the reference's chunked executors were built around).
The driver reads only the tiny JSON metadata; chunk bytes are opened
inside ``read()`` on executors, and rows come back as Arrow
``RecordBatch``es (the vectorized lane of the API — never per-row Python
tuples).

A 100 TB caveat is documented rather than hidden: ``partitions()`` lists
the chunk directory driver-side (one listing RPC, like every file source's
split planner), and each task re-opens its own chunk file — fine locally
and on shared filesystems; an object-store deployment would swap
``os.listdir``/``open`` for the store SDK inside the same two methods.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..registry import query


class ZarrChunkPartition(InputPartition):
    def __init__(self, chunk_path: str):
        self.chunk_path = chunk_path


class ZarrChunkReader(DataSourceReader):
    """One InputPartition per chunk object; Arrow-batched decode."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("sce_zarr requires .option('path', <array dir>)")
        from .zarrv2 import _CHUNK_NAME, read_zarray_meta

        self.array_path = path
        self.meta = read_zarray_meta(path)  # driver: one small JSON read
        self.chunk_names = sorted(
            n for n in os.listdir(path) if _CHUNK_NAME.match(n)
        )

    def partitions(self):
        return [
            ZarrChunkPartition(os.path.join(self.array_path, n))
            for n in self.chunk_names
        ]

    def read(self, partition: ZarrChunkPartition):
        import pandas as pd
        import pyarrow as pa

        from .zarrv2 import _decode_blocks

        with open(partition.chunk_path, "rb") as fh:
            content = fh.read()
        decode = _decode_blocks(self.meta)
        pdf_in = pd.DataFrame({"path": [partition.chunk_path], "content": [content]})
        for out in decode(iter([pdf_in])):
            yield pa.RecordBatch.from_pandas(out, preserve_index=False)


class ZarrDataSource(DataSource):
    """``sce_zarr`` format: Zarr v2 array directory → DataFrame.

    Schema derives from the array metadata (driver-side), matching the
    mapInPandas readers: 2-D arrays surface as
    ``(row, col0, values: array<double>)`` chunk-slice rows, 1-D arrays
    as ``(row, value)``.
    """

    @classmethod
    def name(cls) -> str:
        return "sce_zarr"

    def schema(self) -> str:
        import numpy as np

        from .zarrv2 import read_zarray_meta

        meta = read_zarray_meta(self.options["path"])
        if len(meta["shape"]) == 2:
            return "row bigint, col0 bigint, values array<double>"
        kind = np.dtype(meta["dtype"]).kind
        return "row bigint, value " + ("bigint" if kind in "iu" else "double")

    def reader(self, schema) -> ZarrChunkReader:
        return ZarrChunkReader(self.options)


def read_zarr_pyds(spark: SparkSession, array_path: str) -> DataFrame:
    """Open a Zarr v2 array through the registered Python DataSource."""
    spark.dataSource.register(ZarrDataSource)  # idempotent per session
    return spark.read.format("sce_zarr").option("path", array_path).load()


# Same oracle as zarr_roundtrip: the store is written from embeddings and
# must read back value-exact through the connector.
_PYDS_ORACLE = """
SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
       round(CAST(unnest(embedding) AS DOUBLE), 6) AS v
FROM embeddings
"""


@query("zarr_pyds_roundtrip", oracle=_PYDS_ORACLE, tags=("sources", "zarr", "datasource"), cache=False)
def zarr_pyds_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings → Zarr v2 store (blosc-lz4, chunk-parallel write) → read
    back through ``spark.read.format("sce_zarr")`` → COO.  Identical
    result contract to ``zarr_roundtrip`` — what changes is the READ
    ENGINE SURFACE: the store enters the plan as a scan of a registered
    connector with one task per chunk (see module docstring), not as a
    ``binaryFile``+mapInPandas composition the caller must know to build.
    The value hash proves the connector's split planning, Arrow batch
    path, dtype mapping, and edge-chunk trimming end to end.
    """
    import hashlib
    import tempfile

    from ..catalog import load_table
    from .zarrv2 import _DEFAULT_COMPRESSOR, write_zarr_group, zarr_matrix_coo

    e = load_table(spark, sf_dir, "embeddings")
    store = os.path.join(
        tempfile.gettempdir(),
        f"sce_zarr_pyds_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}",
    )
    write_zarr_group(e, store, compressor=_DEFAULT_COMPRESSOR)
    x = read_zarr_pyds(spark, os.path.join(store, "X"))
    ids = read_zarr_pyds(spark, os.path.join(store, "vec_id")).withColumnRenamed(
        "value", "vec_id"
    )
    return zarr_matrix_coo(x, ids)
