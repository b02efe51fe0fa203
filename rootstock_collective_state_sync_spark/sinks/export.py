"""Training-shard export sink: write a curated corpus as deterministic
hash shards plus a per-shard integrity manifest, and re-validate a
written export against its manifest.

This is the hand-off point of the curation pipeline (clean -> dedup ->
sample -> pack -> EXPORT): trainers consume fixed shards, and the
manifest makes the export self-describing and tamper-evident — a
re-run (or a different engine) producing the same corpus produces the
same manifest, byte for byte.

Scale shape: sharding is ``key % num_shards`` (row-local), the write
is one hash exchange on the shard id, and the manifest is one
partial-aggregated groupBy over the same pass — no driver-side
content ever materializes. The checksum is a SUM of per-row 32-bit
md5 prefixes: commutative (partition-order independent) and
replicable in ANSI SQL for oracle checking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# NOT underscore-prefixed: Hadoop path filters treat "_"-led names as
# hidden, which makes the manifest invisible to some readers.
MANIFEST_DIR = "manifest"
DATA_DIR = "data"


def row_checksum(key_col: str = "doc_id", text_col: str = "text") -> F.Column:
    """Per-row 32-bit checksum: first 8 hex digits of
    ``md5(key || ':' || text)`` as a long. Summed per shard it forms a
    commutative content fingerprint (sum of n < 2^31 values of < 2^32
    each stays inside int64 headroom for any realistic shard)."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.col(key_col).cast("string"), F.col(text_col)
                ).cast("binary")
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")


def shard_manifest(
    df: DataFrame,
    num_shards: int = 8,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-shard manifest: doc count, total characters, key range,
    commutative content checksum. One groupBy with map-side partial
    aggregation; output is ``num_shards`` rows."""
    return (
        df.select(
            (F.col(key_col) % num_shards).cast("long").alias("shard"),
            F.col(key_col).alias("_key"),
            F.length(F.col(text_col)).cast("long").alias("_chars"),
            row_checksum(key_col, text_col).alias("_ck"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_chars").cast("long").alias("total_chars"),
            F.min("_key").cast("long").alias("min_id"),
            F.max("_key").cast("long").alias("max_id"),
            F.sum("_ck").cast("long").alias("checksum"),
        )
    )


def export_training_shards(
    df: DataFrame,
    path: str,
    num_shards: int = 8,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Write ``df`` under ``path`` as ``data/shard=N`` parquet (one
    hash exchange on the shard id) and the manifest under
    ``_manifest/``. The shard assignment is a pure function of the
    key, so re-exports land rows in identical shards."""
    sharded = df.withColumn(
        "shard", (F.col(key_col) % num_shards).cast("long")
    )
    (
        sharded.repartition(num_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(f"{path}/{DATA_DIR}")
    )
    (
        shard_manifest(df, num_shards, key_col, text_col)
        # the modulus is part of the export's identity: stamped on
        # every manifest row so validation never has to INFER it
        # (an empty top shard used to make the inferred modulus too
        # small — r16 advice / verdict item 6)
        .withColumn("num_shards", F.lit(int(num_shards)).cast("long"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/{MANIFEST_DIR}")
    )


def validate_export(
    spark: SparkSession,
    path: str,
    key_col: str = "doc_id",
    text_col: str = "text",
    num_shards: int | None = None,
) -> DataFrame:
    """Recompute the manifest from the WRITTEN data and diff it
    against the stored manifest. Returns the mismatching shard rows
    (empty = intact): missing shards, lost/duplicated rows, and any
    content change flip the checksum.

    The modulus comes from the manifest's own ``num_shards`` column
    (stamped at export time — the manifest is self-describing, so an
    export with empty shards, even an empty TOP shard, validates
    correctly). Passing ``num_shards`` explicitly turns it into a
    cross-check: a mismatch with the recorded modulus raises rather
    than silently re-assigning every key. Legacy manifests without
    the column fall back to ``max(shard)+1`` inference (NOT row
    count: empty shards write no manifest row, and a wrong modulus
    re-assigns every key — found by the composed r16 e2e with 3 docs
    in 4 shards); an EMPTY legacy manifest cannot yield a modulus and
    raises instead of computing ``key % 0`` (NULL shards)."""
    stored = spark.read.parquet(f"{path}/{MANIFEST_DIR}")
    data = spark.read.parquet(f"{path}/{DATA_DIR}")
    if "num_shards" in stored.columns:
        rec = stored.agg(F.max("num_shards")).first()[0]
        recorded = int(rec) if rec is not None else None
        if recorded is not None:
            if num_shards is not None and num_shards != recorded:
                raise ValueError(
                    f"num_shards={num_shards} contradicts the manifest's "
                    f"recorded modulus {recorded} at {path!r}"
                )
            num_shards = recorded
    if num_shards is None:
        top = stored.agg(F.max("shard")).first()[0]
        num_shards = max(int(top) + 1 if top is not None else 0, stored.count())
        if num_shards == 0:
            raise ValueError(
                f"cannot infer shard modulus from an empty manifest at "
                f"{path!r}; pass num_shards explicitly"
            )
    actual = shard_manifest(
        data.drop("shard"), num_shards, key_col, text_col
    )
    cols = ["shard", "n_docs", "total_chars", "min_id", "max_id", "checksum"]
    return stored.select(cols).exceptAll(actual.select(cols)).unionAll(
        actual.select(cols).exceptAll(stored.select(cols))
    )


def export_jsonl(
    df: DataFrame,
    path: str,
    order_col: str | None = None,
    shards: int | None = None,
) -> None:
    """JSON-Lines export — the lingua franca of training-data
    hand-off (every tokenizer/inspection/labeling tool reads it).
    Each output file is one shard of newline-delimited JSON objects;
    ``order_col`` optionally range-clusters shards so downstream
    sequential readers stream in key order (same layout contract as
    the parquet shard exporter). Compression is left to the caller's
    ``spark.sql.sources`` codec config — text-codec choice is an
    environment decision, not an operator one."""
    w = df
    if shards is not None:
        w = (
            w.repartitionByRange(shards, order_col)
            if order_col
            else w.repartition(shards)
        )
    w.write.mode("overwrite").json(path)


def read_jsonl(spark, path: str, schema) -> DataFrame:
    """Schema-ENFORCED JSONL ingest: an explicit schema (never
    inference — a 100 TB inference pass reads the data twice and
    silently widens types), with corrupt lines quarantined to
    ``_corrupt_record`` instead of failing the job."""
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def export_curriculum_shards(
    df: DataFrame,
    path: str,
    order_col: str = "interleave_key",
    num_shards: int = 8,
) -> DataFrame:
    """Materialize a curriculum ordering (e.g.
    :func:`..operators.sampling.source_interleave`'s closed-form key)
    WITHOUT a global sort: ``repartitionByRange`` assigns each shard a
    contiguous ``order_col`` span (a distributed range exchange —
    sampled bounds, no single-partition stage) and rows are sorted
    only within their shard. A trainer consuming ``shard=0..N-1``
    sequentially, each shard in file order, reads the exact global
    curriculum. Returns the shard manifest
    ``(shard, n_rows, min_key, max_key)`` — spans are disjoint by
    construction, which the reader (or a test) can assert before
    trusting the order.
    """
    ranged = (
        df.repartitionByRange(num_shards, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("shard", F.spark_partition_id().cast("long"))
    )
    ranged.write.mode("overwrite").partitionBy("shard").parquet(
        f"{path}/{DATA_DIR}"
    )
    spark = df.sparkSession
    manifest = (
        spark.read.parquet(f"{path}/{DATA_DIR}")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min(order_col).alias("min_key"),
            F.max(order_col).alias("max_key"),
        )
        .orderBy("shard")
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(
        f"{path}/{MANIFEST_DIR}"
    )
    return manifest
