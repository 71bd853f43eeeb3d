"""Parquet readers for the driver testdata layout.

One parquet file per table under ``{sf_dir}/{name}.parquet`` (see
TESTDATA.md).  Kept thin on purpose: ``spark.read.parquet`` already
gives predicate pushdown, column pruning and partition-parallel scans;
anything smarter (bucketing, sorting) belongs to the writer side of a
real deployment.

**Session-wide side effect**: ``load_table``/``load_tables``/
``register_views``/``read_events`` pin ``spark.sql.session.timeZone``
to UTC on the CALLER'S session (details in ``load_table``).  Every
temporal expression this engine evaluates — and anything else the host
session runs afterwards — sees UTC semantics from the first load on.
Callers embedding these readers in a session with its own timezone
expectations must save/restore the conf around the call.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read ``{sf_dir}/{name}.parquet``.

    SIDE EFFECT: pins ``spark.sql.session.timeZone = UTC`` on the given
    session (and ``spark.sql.legacy.parquet.nanosAsLong`` for
    ``events``) — deliberate and session-wide; see the module docstring.
    """
    # Pin the session zone for EVERY table load: date/timestamp literal
    # casts, NTZ<->TIMESTAMP coercions and window bucketing all follow
    # the session zone, and the driver harness calls us with its OWN
    # session whose zone we don't control.  UTC makes every temporal
    # expression agree with DuckDB's naive-as-UTC reading regardless of
    # the host timezone.  (Dynamic SQLConf — safe to set per call.)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts has shipped as TIMESTAMP(NANOS) in some testdata
        # generations, which Spark rejects outright
        # (PARQUET_TYPE_ILLEGAL) unless told to read nanos as BIGINT.
        # The conf is dynamic (SQLConf), so set it here too — the
        # driver harness calls us with its OWN session, which won't
        # have gone through get_spark().
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # Restore a real timestamp from the nanosecond BIGINT so
            # event-time semantics and oracle comparisons line up.
            # Integer division: `ts / 1000` would promote the ~1.7e18
            # BIGINT to double (2^53 mantissa) and silently perturb
            # ~1.6% of microsecond values by ±1, shifting event-time
            # ordering and window/session boundaries vs engines that
            # truncate exactly.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # TIMESTAMP(MICROS, isAdjustedToUTC=false) footers read as
            # TIMESTAMP_NTZ, which unix_micros()/unix_timestamp()
            # reject.  DuckDB treats the same naive value as UTC, so
            # pin the session zone before the NTZ->TIMESTAMP cast:
            # epoch extraction then agrees bit-for-bit across engines
            # regardless of the host timezone the driver session has.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def spread(df: DataFrame) -> DataFrame:
    """Round-robin a narrow scan across the session's cores.

    A small parquet file arrives as ONE split, serializing any
    CPU-heavy per-row work (shingling, hashing, vector math) onto one
    task.  The tiny shuffle buys full-width parallelism.  At 100 TB the
    scan already yields thousands of splits (>= defaultParallelism) and
    this is a no-op — the guard makes it safe to leave in place.

    Use it ONLY in front of CPU-heavy per-row stages: for plain
    scan→aggregate plans the map-side combine already minimizes the
    shuffle and a forced repartition moves the whole table for nothing.

    The guard estimates splits from file sizes (``inputFiles`` +
    filesystem stat) instead of ``df.rdd.getNumPartitions()``, which
    would force a second full physical-planning pass per query.
    """
    spark = df.sparkSession
    p = spark.sparkContext.defaultParallelism
    try:
        # The conf may be spelled "134217728b", "128m", etc. in a
        # foreign session — any parse failure must degrade to the
        # default split size, never break the query.
        raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
        units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
        raw = raw.strip().lower().removesuffix("b")
        mult = units.get(raw[-1:], 1)
        max_split = int(raw.rstrip("kmg")) * mult if raw else 128 << 20
        files = [f.removeprefix("file:") for f in df.inputFiles()]
        splits = sum(
            max(1, os.path.getsize(f) // max_split) for f in files if os.path.exists(f)
        )
    except Exception:  # non-local/non-file plan or odd conf: leave it alone
        return df
    if 0 < splits < p:
        src = df
        df = df.repartition(p)
        # Remember the pre-shuffle frame (round 14): row-count-only
        # consumers (e.g. the max_df denominator in the Jaccard
        # pipelines) can aggregate the bare scan instead of paying the
        # round-robin exchange of the full text column — the count is
        # partitioning-invariant, so the value is identical by
        # construction.
        df._pre_spread = src
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_events(
    spark: SparkSession,
    path: str,
    *,
    format: str = "parquet",
    schema=None,
    ts_col: str | None = None,
    **options,
) -> DataFrame:
    """Format-agnostic event-stream reader: parquet (default), CSV,
    JSON Lines, or ORC.

    Text formats get the safety rails they need at scale:

    * CSV/JSON demand an explicit ``schema`` (DDL string or
      StructType) — schema inference reads the whole input once
      before the job even starts, which is a silent extra pass over
      100 TB;
    * malformed rows land in a ``_corrupt_record`` column (PERMISSIVE
      mode) instead of killing the job — filter or count them as a
      data-quality step;
    * CSV defaults to ``header=true``.

    ``ts_col`` optionally names a BIGINT nanosecond column to convert
    to a proper microsecond timestamp (exact integer division — see
    ``load_table``).
    """
    return _read_events_impl(
        spark, path, format=format, schema=schema, ts_col=ts_col,
        streaming=False, **options,
    )


def read_events_stream(
    spark: SparkSession,
    path: str,
    *,
    format: str = "parquet",
    schema=None,
    ts_col: str | None = None,
    max_files_per_trigger: int | None = None,
    **options,
) -> DataFrame:
    """Streaming twin of :func:`read_events`: a Structured Streaming
    file source over the same formats, for feeding
    ``match_pattern_stream`` / the windowed streaming aggregations.

    A ``schema`` is MANDATORY for every format here (streaming file
    sources cannot infer), and ``max_files_per_trigger`` caps ingest
    per micro-batch — the standard backfill throttle so a catch-up over
    a large directory doesn't build one giant first batch.  The
    per-key arrival-order contract of the CEP kernel is the caller's to
    uphold: file modification-time order must follow event order
    (or pass ``event_time_col`` to the kernel for watermark repair).
    """
    if schema is None:
        raise ValueError("streaming sources require an explicit schema")
    extra = dict(options)
    if max_files_per_trigger is not None:
        extra["maxFilesPerTrigger"] = str(max_files_per_trigger)
    return _read_events_impl(
        spark, path, format=format, schema=schema, ts_col=ts_col,
        streaming=True, **extra,
    )


def _read_events_impl(
    spark: SparkSession,
    path: str,
    *,
    format: str,
    schema,
    ts_col: str | None,
    streaming: bool,
    **options,
) -> DataFrame:
    fmt = format.lower()
    if fmt not in ("parquet", "csv", "json", "orc"):
        raise ValueError(f"unsupported event source format: {format!r}")
    reader = spark.readStream if streaming else spark.read
    if fmt in ("csv", "json"):
        if schema is None:
            raise ValueError(
                f"{fmt} sources require an explicit schema: inference "
                "is a full extra pass over the input"
            )
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", "_corrupt_record"
        )
        if fmt == "csv":
            reader = reader.option("header", options.pop("header", "true"))
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.format(fmt).load(path)
    if ts_col is not None:
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get(ts_col)
        if ts_type == "bigint":
            df = df.withColumn(
                ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
            )
        elif ts_type == "timestamp_ntz":
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df
