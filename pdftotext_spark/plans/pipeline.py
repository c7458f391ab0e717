"""Batch extraction pipeline over a transcripts table (SURVEY.md §7.3).

Scale design (BASELINE.json north_rule — 10^12 turns, 1000 executors):

- **Shuffle-free extraction by default**: per-turn work is keyless, so
  the parquet scan's byte splits already balance it (mega-conversation
  skew is a *key* phenomenon — it cannot skew a byte-split scan). The
  deterministic salted repartition
  (``pmod(xxhash64(conv_id, turn_idx), SALT)``) remains available for
  pathological file layouts; measured, skipping it is ~2× end-to-end
  (BENCH/BASELINE.md).
- **Conversation assembly** is the only shuffle-by-key stage
  (groupBy + array_sort(collect_list), optional two-level chunking for
  unbounded conversation sizes) — AQE handles residual skew
  (``spark.sql.adaptive.enabled`` + skew settings in
  :func:`session_confs`).
- **Resumability**: ``resume_anti_join`` drops `(conv_id, turn_idx)`
  pairs already committed to the target table (Iceberg snapshot or
  parquet staging dir) — an idempotent restart needs no checkpoint
  files of its own. The join broadcasts when the committed side is
  small and AQE-converts otherwise.
- **Metrics manifest** (north_rule lineage requirement): per-partition
  rows `{run_id, partition_id, turns_parsed, decode_failures,
  images_extracted, wall_ms}`. ``run_extraction`` stamps
  ``(run_id, partition_id)`` onto every output row *before* the write,
  so the manifest aggregates exactly this run's increment from the
  committed files (resume never double-counts) and partition ids are
  extraction-task ids — one extra narrow aggregation, no second pass
  over payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdftotext_spark.functions.extract import (
    EXTRACT_SCHEMA,
    FRAGMENT_SCHEMA,
    extract_batches,
    fragment_batches,
)

DEFAULT_SALT = 64

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def session_confs() -> dict[str, str]:
    """Recommended session configuration for the extraction job.

    Scale-dependent values are env-parameterized with local defaults
    (r7, guide §2.2/§9 discipline): the driver's bench stays
    comparable on ``local[32]``, while a cluster deployment overrides
    without code edits —

    - ``SPARK_GRAFT_SHUFFLE_PARTITIONS`` (default 32): on a cluster
      size so post-shuffle partitions land in the 100 MB–1 GB band
      (e.g. ~2–3x total executor cores as a floor) and let AQE
      coalescing shrink small stages; 32 is NOT a magic constant, it
      is the local core count.
    - ``SPARK_GRAFT_MAX_PARTITION_BYTES`` (default 1m): extraction
      burns ~1 CPU-sec per scanned MB — far above scan cost — so
      splits sized to ~seconds-of-CPU keep every core fed; pure-scan
      relational work on a cluster wants the IO-optimal 128m–1g
      instead.
    """
    import os

    return {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # measured on the 100k-turn fixture (BENCH/BASELINE.md): large
        # Arrow batches beat 2k-row ones (fewer pipe round-trips); with
        # CPU-matched ~1m scan splits a partition is one batch anyway
        "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
        # extraction burns ~1 CPU-sec per scanned MB — orders of
        # magnitude above scan cost — so splits far below the IO-optimal
        # 128m keep every core fed and bound straggler tails. Measured
        # on the 100k-turn fixture: 1m splits 42k turns/s vs 20k at 16m
        # (BENCH/BASELINE.md). On a real cluster, size this to
        # ~seconds-of-CPU per split for the same reason.
        "spark.sql.files.maxPartitionBytes": os.environ.get(
            "SPARK_GRAFT_MAX_PARTITION_BYTES", "1m"
        ),
        "spark.sql.shuffle.partitions": os.environ.get(
            "SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"
        ),
        # reliable-checkpoint hygiene (ADVICE r4): every materialize()
        # under a configured checkpoint dir writes a permanent rdd-*
        # directory; with this on, the ContextCleaner deletes a
        # checkpoint's files once its RDD is garbage-collected, so
        # iterative CC loops don't accumulate one orphan dir per round
        # for the application lifetime (must be set before the context
        # starts — a session conf, not settable from materialize()).
        "spark.cleaner.referenceTracking.cleanCheckpoints": "true",
    }


TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def read_transcripts(spark: SparkSession, path_or_table: str) -> DataFrame:
    """Load the transcripts input: Iceberg table name if the catalog
    resolves it, else a path — parquet by default, with JSONL / CSV /
    ORC picked by extension (S1/S2 analog, widened to the ingest
    formats a collection pipeline actually lands: JSONL dumps and CSV
    exports read with the explicit transcript schema — never inferred,
    so malformed rows become nulls instead of schema drift)."""
    if "/" not in path_or_table:
        try:
            return spark.read.table(path_or_table)
        except Exception:
            pass
    low = path_or_table.rstrip("/").lower()
    if low.endswith((".jsonl", ".json", ".ndjson")):
        return spark.read.schema(TRANSCRIPT_DDL).json(path_or_table)
    if low.endswith((".csv", ".tsv")):
        return spark.read.schema(TRANSCRIPT_DDL).option(
            "header", "true"
        ).option("sep", "\t" if low.endswith(".tsv") else ",").option(
            "multiLine", "true"
        ).option("escape", '"').csv(path_or_table)
    if low.endswith(".orc"):
        return spark.read.orc(path_or_table)
    if low.endswith(".xml"):
        # Spark 4 native XML datasource (rowTag per transcript turn);
        # explicit schema like the other text formats (Avro is NOT
        # wired: the external spark-avro module isn't in this image —
        # probed, "Failed to find data source: avro")
        return (
            spark.read.schema(TRANSCRIPT_DDL)
            .option("rowTag", "turn")
            .format("xml")
            .load(path_or_table)
        )
    return spark.read.parquet(path_or_table)


def extract_turns(
    transcripts: DataFrame,
    n_partitions: int | None = None,
    salt: int = DEFAULT_SALT,
    options=None,
) -> DataFrame:
    """Per-turn extraction via ``mapInPandas`` — shuffle-free by
    default.

    Extraction is per-row pure (no key), so the parquet scan's byte
    splits already balance work: mega-conversation skew is a *key*
    phenomenon and cannot skew a keyless byte-split scan. Measured on
    the 100k-turn fixture, skipping the repartition removes a
    ~120 MB shuffle and its barrier (~2× end-to-end; BENCH/BASELINE.md).

    Pass ``n_partitions`` to force a salted repartition instead — for
    pathological file layouts (one giant unsplittable file, heavily
    clustered payload sizes) the deterministic turn-level salt
    ``pmod(xxhash64(conv_id, turn_idx), salt)`` spreads any single
    conversation across ``salt`` partitions.

    Input must carry TRANSCRIPT_COLUMNS; output schema is
    :data:`EXTRACT_SCHEMA`. We select exactly the six input columns so
    column pruning reaches the scan.
    """
    from pdftotext_spark.sources.shipping import ship_package

    ship_package(transcripts.sparkSession)
    df = transcripts.select(*TRANSCRIPT_COLUMNS)
    if n_partitions is not None:
        df = df.repartition(
            n_partitions,
            F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(salt)),
        )
    if options is None:
        return df.mapInPandas(extract_batches, EXTRACT_SCHEMA)
    # ExtractOptions is a plain picklable dataclass: close over it so
    # per-turn behavior (layout mode, de-hyphenation, markers, page
    # selection, time budget, ...) is configurable at the pipeline level

    def batches_with_options(it):
        return extract_batches(it, options)

    return df.mapInPandas(batches_with_options, EXTRACT_SCHEMA)


def extract_fragments_df(transcripts: DataFrame, n_partitions: int | None = None) -> DataFrame:
    """Exploded positioned-fragments table (FIXTURES.md §4) for the
    layout/captures operator family."""
    from pdftotext_spark.sources.shipping import ship_package

    ship_package(transcripts.sparkSession)
    df = transcripts.select("conv_id", "turn_idx", "text")
    if n_partitions is not None:
        df = df.repartition(n_partitions, F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(DEFAULT_SALT)))
    return df.mapInPandas(fragment_batches, FRAGMENT_SCHEMA)


def assemble_conversations(
    extracted: DataFrame,
    separator: str = "\n",
    chunk_size: int | None = None,
) -> DataFrame:
    """Reassemble per-conversation text under stable
    ``(conv_id, turn_idx)`` ordering (the north_rule invariant).

    One shuffle on conv_id; ``array_sort(collect_list(struct(...)))``
    gives a deterministic order-independent assembly (no window
    needed — groupBy + array_sort keeps partial aggregation map-side).

    ``chunk_size`` enables the *two-level* assembly for
    mega-conversations: turns first concatenate within
    ``turn_idx // chunk_size`` chunks, then chunks concatenate per
    conversation — no single aggregation buffer ever holds more than
    ``chunk_size`` turns, so a 10^7-turn conversation cannot OOM an
    executor. Output is byte-identical to the single-level path
    (tested); use it whenever conversation sizes are unbounded.
    """
    def _ordered_concat(df, key_cols, order_col, text_col):
        return df.groupBy(*key_cols).agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(order_col, text_col))),
                    lambda s: s[text_col],
                ),
                separator,
            ).alias("conversation_text"),
            F.sum("n_turns").alias("n_turns") if "n_turns" in df.columns
            else F.count("*").alias("n_turns"),
            F.sum("decode_failures").alias("decode_failures"),
            F.max("last_ts" if "last_ts" in df.columns else "ts").alias("last_ts"),
        )

    if chunk_size is None:
        return _ordered_concat(
            extracted, ["conv_id"], "turn_idx", "extracted_text"
        )
    chunked = extracted.withColumn(
        "chunk_no", (F.col("turn_idx") / F.lit(chunk_size)).cast("long")
    )
    stage1 = _ordered_concat(
        chunked, ["conv_id", "chunk_no"], "turn_idx", "extracted_text"
    ).withColumnRenamed("conversation_text", "chunk_text")
    return _ordered_concat(stage1, ["conv_id"], "chunk_no", "chunk_text")


def metrics_manifest(extracted: DataFrame, run_id: str) -> DataFrame:
    """Per-partition lineage/metrics manifest (north_rule).

    If the frame already carries a ``partition_id`` column (stamped at
    extraction time by :func:`run_extraction`), it is trusted — so the
    manifest reflects the *extraction tasks*, not whatever scan
    partitioning a later read-back happens to have."""
    if "partition_id" not in extracted.columns:
        extracted = extracted.withColumn("partition_id", F.spark_partition_id())
    return (
        extracted
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("turns_parsed"),
            F.sum("decode_failures").alias("decode_failures"),
            F.sum("n_images").alias("images_extracted"),
            (F.sum("extract_us") / F.lit(1000)).cast("long").alias("wall_ms"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("committed_at", F.current_timestamp())
    )


def resume_anti_join(transcripts: DataFrame, committed: DataFrame) -> DataFrame:
    """Drop turns already present in the committed output —
    idempotent resume from an Iceberg snapshot / staging dir
    (SURVEY.md §7.8). AQE picks broadcast vs shuffle join at runtime;
    the join key is narrow (two columns) either way."""
    return transcripts.join(
        committed.select("conv_id", "turn_idx"),
        on=["conv_id", "turn_idx"],
        how="left_anti",
    )


def run_extraction(
    spark: SparkSession,
    input_path: str,
    output_path: str | None = None,
    metrics_path: str | None = None,
    run_id: str = "run-0",
    resume: bool = True,
    options=None,
    max_global_seconds: float = 0.0,
) -> DataFrame:
    """End-to-end job: read → (resume filter) → extract → write +
    manifest. Returns the extracted DataFrame (lazily if not written).
    ``options`` is an :class:`~pdftotext_spark.core.document.
    ExtractOptions` (or None for defaults) — it rides inside the
    pickled UDF so the full option surface reaches executors.
    ``max_global_seconds`` > 0 stamps a job-wide wall deadline into
    the options (MaxGlobalExecutionTime analog): once spent, executors
    skip remaining payloads as recorded failures instead of parsing
    them — the job completes with partial output + honest metrics."""
    if max_global_seconds > 0:
        import dataclasses
        import time as _time

        from pdftotext_spark.core.document import ExtractOptions

        options = dataclasses.replace(
            options or ExtractOptions(),
            global_deadline_epoch=_time.time() + max_global_seconds,
        )
    transcripts = read_transcripts(spark, input_path)
    if output_path is not None and resume:
        try:
            committed = spark.read.parquet(output_path)
            transcripts = resume_anti_join(transcripts, committed)
        except Exception:
            pass  # nothing committed yet
    extracted = extract_turns(transcripts, options=options)
    if output_path is not None:
        # lineage columns stamped before the write: every output row
        # records which run committed it and which extraction task
        # produced it, so the manifest can be derived from the written
        # files without a second extraction pass, counts ONLY this
        # run's increment on resume, and partition ids are extraction
        # task ids (not read-back scan splits)
        (
            extracted.withColumn("partition_id", F.spark_partition_id())
            .withColumn("run_id", F.lit(run_id))
            .write.mode("append")
            .parquet(output_path)
        )
        # read back with mergeSchema: resuming into a directory written
        # by an older schema (e.g. pre-lineage files without run_id)
        # must not let Spark pick an old file's schema and lose the
        # lineage columns
        extracted = spark.read.option("mergeSchema", "true").parquet(output_path)
        if metrics_path is not None:
            if "run_id" in extracted.columns:
                # legacy rows surface run_id=null after the merge and
                # are correctly excluded by the equality filter
                increment = extracted.filter(F.col("run_id") == run_id).drop(
                    "run_id"
                )
            else:
                # output predates lineage stamping entirely — treat
                # nothing as this run's increment rather than failing
                increment = extracted.limit(0)
            metrics_manifest(increment, run_id).write.mode("append").parquet(
                metrics_path
            )
    return extracted


def export_training_jsonl(
    conversations: DataFrame,
    path: str,
    compression: str = "gzip",
    source: str = "pdftotext_spark",
    mode: str = "error",
) -> None:
    """Final sink of a training-data build: one JSON object per
    assembled conversation in the ``{"text": ..., "meta": {...}}``
    convention most LLM data loaders consume, written as compressed
    JSONL (gzip by default — splittable-enough at one file per
    partition, and every writer/reader speaks it; pass ``zstd``/
    ``none`` where the stack supports them).

    Keeps the write embarrassingly parallel: no coalesce, one shard
    per upstream partition — at 100 TB the shard count IS the
    parallelism of the downstream loader.

    ``mode`` defaults to ``error`` (fail if the target exists): the
    final training sink must never silently clobber a dataset — pass
    ``overwrite`` explicitly to rebuild in place (ADVICE r4)."""
    out = conversations.select(
        F.col("conversation_text").alias("text"),
        F.struct(
            F.col("conv_id").alias("id"),
            F.col("n_turns").cast("long").alias("n_turns"),
            F.length("conversation_text").cast("long").alias("n_chars"),
            F.lit(source).alias("source"),
        ).alias("meta"),
    )
    out.write.mode(mode).option("compression", compression).json(path)
