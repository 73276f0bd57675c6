"""Table catalog: loaders for the driver's parquet tables.

The reference's ingest is ``AnnDataRdd.from_zarr`` — enumerate Zarr chunks,
read each chunk in an executor (SURVEY.md §3.1 EP1 [M]).  Parquet row-groups
give the same storage-parallel scan property natively through
``spark.read.parquet``; predicate pushdown and column pruning then come free
from Catalyst, which the reference had no equivalent of (SURVEY.md §4.1).

Special case: ``events.ts`` is parquet TIMESTAMP(NANOS); with
``spark.sql.legacy.parquet.nanosAsLong=true`` (set by ``session.tune``) it
arrives as int64 nanoseconds.  ``load_table("events")`` exposes it as:

- ``ts``     : int64 epoch nanoseconds (raw)
- ``ts_us``  : int64 epoch microseconds (== DuckDB ``epoch_us(ts)``)
- ``ts_s``   : int64 epoch seconds (truncated; == DuckDB ``epoch_us(ts)//1_000_000``)
- ``ts_ntz`` : TIMESTAMP_NTZ at microsecond precision, for Spark temporal
  operators (``window``/``session_window``/``date_trunc``).

All integer — no session-timezone or float ambiguity against the oracle.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import tune

#: per-session DataFrame cache: session -> {(sf_dir, name): DataFrame}.
#: A DataFrame is an immutable plan, so handing the same one to every query
#: is safe and skips repeated file listing / schema resolution / conf
#: re-application (hundreds of ms of driver-side latency per query at
#: bench scale; irrelevant to cluster throughput, which is why it lives
#: here and not in user code).
_df_cache: "weakref.WeakKeyDictionary[SparkSession, dict]" = weakref.WeakKeyDictionary()

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _events_time_columns(df: DataFrame) -> DataFrame:
    ts = F.col("ts")
    if dict(df.dtypes)["ts"] in ("bigint", "long"):
        # int64 nanoseconds (nanosAsLong path). Integer division keeps the
        # conversion exact and engine-agnostic (DuckDB: epoch_us // 1e6).
        return (
            df.withColumn("ts_us", F.expr("ts div 1000"))
            .withColumn("ts_s", F.expr("ts div 1000000000"))
            .withColumn("ts_ntz", F.to_timestamp_ntz(F.timestamp_micros(F.expr("ts div 1000"))))
        )
    # Fallback: session already reads nanos as timestamp (future Spark).
    return (
        df.withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
        .withColumn("ts_s", F.expr("unix_micros(cast(ts as timestamp)) div 1000000"))
        .withColumn("ts_ntz", F.col("ts").cast("timestamp_ntz"))
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table; apply engine confs + the events time shim.

    Plans are memoized per session (see ``_df_cache``)."""
    try:
        cache = _df_cache[spark]
    except KeyError:
        cache = _df_cache.setdefault(spark, {})
    key = (sf_dir, name)
    if key not in cache:
        tune(spark)
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if name == "events":
            df = _events_time_columns(df)
        cache[key] = df
    return cache[key]


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> dict[str, DataFrame]:
    """Register all tables under their BARE names (plus ``suffix``) — the
    interactive convenience for ad-hoc ``spark.sql`` over one dataset.

    Bare names are session-global: registering a second sf_dir re-points
    them at the new data (``createOrReplaceTempView`` semantics).  Engine
    code must NOT use this — query builders go through ``table_view``,
    whose names embed a hash of the full data path and therefore never
    alias across datasets.
    """
    out = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(f"{name}{suffix}")
        out[name] = df
    return out


def _sf_tag(sf_dir: str) -> str:
    """Unique, readable view-name tag for a data directory.

    The basename alone is NOT unique (two roots can both end in
    ``sf0.1``), and an aliased view name would silently re-point queries
    at the other dataset — so a short hash of the FULL path disambiguates.
    """
    import hashlib
    import re

    base = re.sub(r"\W+", "_", os.path.basename(sf_dir.rstrip("/"))) or "d"
    digest = hashlib.sha1(sf_dir.rstrip("/").encode()).hexdigest()[:8]
    return f"{base}_{digest}"


#: Max on-disk parquet bytes below which a latency-sensitive aggregate
#: swaps to the SINGLE-TASK fused plan (an inner ``COALESCE(1)`` block
#: below the aggregation): a ``SinglePartition`` child satisfies every
#: clustered/ordered distribution, so the whole query — scan, partial and
#: final aggregation, sort — collapses into ONE stage with no exchange.
#: At small inputs the scan is one task regardless (single parquet row
#: group), so the fusion costs nothing in scan parallelism and saves one
#: full shuffle (write + read + stage dispatch wall).  Measured r11,
#: interleaved same-JVM A/B at sf0.1: distinct_users_daily 158→135 ms
#: quiet / 460→297 under 26-process CPU load; doc_text_stats 109→98 /
#: 252→178; embed_centroid_per_label 94→79 / 262→173;
#: tumbling_window_events 97→95 / 233→188 — the fusion's margin GROWS
#: with the dispatch floor, which is exactly the regime that breached the
#: r10 bench gate.  Above the gate the parallel exchange plan stands: the
#: serial aggregate's cost grows with input while the stage wall it saves
#: is constant, so the swap inverts quickly — measured on synthesized
#: key-shifted event copies (scale_stress.synthesize, engine posture):
#: fused/parallel ms = 2.0 MiB: 135/158 · 5.5 MiB: 605/510 (distinct
#: already loses) · 7.2 MiB: 1058/605 · 13 MiB: 2262/1189; the simple-sum
#: tumbling agg still wins fused at 7.2 MiB (208/215) but the gate is set
#: where the EARLIEST query class inverts, with margin: 4 MiB.  (At 100 TB
#: the fused plan would be nonsense — the gate is what makes this an
#: adaptive-plan choice, not a bench trick.)
#: Negatives recorded at the same floors: q1 (+13 quiet/+62 loaded —
#: its 600 k-row serial partial agg is real compute) and window_rank
#: (+111 quiet; flips to −347 only at ~3-4× the driver's observed
#: floors — non-monotone, not worth a load-sensitive gate), so both
#: keep their parallel plans unconditionally.
FUSE_SINGLE_TASK_MAX_BYTES = 1 << 22


def local_input_bytes(sf_dir: str, table: str) -> int | None:
    """On-disk parquet footprint of one table, or None when the path is
    not a local filesystem directory (remote stores skip size gates —
    they are never in the small regime that motivates them)."""
    root = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isfile(root):
        return os.path.getsize(root)
    if not os.path.isdir(root):
        return None
    total = 0
    for dirpath, _, names in os.walk(root):
        for nm in names:
            total += os.path.getsize(os.path.join(dirpath, nm))
    return total


def fuse1_hint(sf_dir: str, table: str, gate: int | None = None) -> str:
    """``"/*+ COALESCE(1) */ "`` when ``table`` is fusion-small, else ``""``.

    Splice into the SELECT of the query block DIRECTLY ABOVE the scan
    (below the aggregation/window that needs the distribution) — a hint
    attaches to its own query block's output, so hinting the outer block
    would coalesce ABOVE the operator and fuse nothing.
    """
    if gate is None:
        gate = FUSE_SINGLE_TASK_MAX_BYTES
    nb = local_input_bytes(sf_dir, table)
    return "/*+ COALESCE(1) */ " if nb is not None and nb <= gate else ""


def table_view(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Register (once per session) an sf-scoped temp view for ``name`` and
    return the view name.

    This backs the ``spark.sql(...)`` form of the latency-critical
    builders: a single SQL string is one Py4J round-trip parsed JVM-side,
    where the equivalent Column-by-Column DataFrame construction costs
    50–150 ms of Python↔JVM chatter per fresh plan build (measured at
    bench SF; identical logical plan either way, so Catalyst output and
    the 100 TB physical strategy are unchanged).
    """
    try:
        cache = _df_cache[spark]
    except KeyError:
        cache = _df_cache.setdefault(spark, {})
    view = f"sce_{_sf_tag(sf_dir)}_{name}"
    key = ("__view__", sf_dir, name)
    if key not in cache:
        load_table(spark, sf_dir, name).createOrReplaceTempView(view)
        cache[key] = view
    return view
