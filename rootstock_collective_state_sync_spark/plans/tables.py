"""Test-data table access.

The driver materializes a TPC-H-ish star schema plus ``events``
(stream analog), ``documents`` and ``embeddings`` (training-data
pipeline analogs) as one Parquet file per table
(``/root/repo/TESTDATA.md``). Reading them with an explicit
``spark.read.parquet`` keeps predicate pushdown and column pruning
fully available to Catalyst (check ``PushedFilters``/``ReadSchema``
in ``.explain``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

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


# schema cache (r17, guide §5.2): without an explicit schema EVERY
# `spark.read.parquet` call runs a footer-inference job at plan-build
# time — one to three small driver round-trips per query build, on
# every build. The schema of a given test-data file cannot change
# within a session, so infer once per (sf_dir, table) and pass it
# explicitly afterwards. Metadata only — every query still computes
# from the parquet data.
_SCHEMAS: dict = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    # events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    # reader cannot represent natively: read it as long nanos and
    # convert (floor to micros — same truncation DuckDB applies).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    key = (id(spark), sf_dir, name)
    schema = _SCHEMAS.get(key)
    if schema is None:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        _SCHEMAS[key] = df.schema
    else:
        df = spark.read.schema(schema).parquet(f"{sf_dir}/{name}.parquet")
    for f in df.schema.fields:
        if f.name == "ts" and isinstance(f.dataType, T.LongType):
            # integral `div`, not `/`: nanos exceed 2^53, so float
            # division would round and shift some stamps by 1 us
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def array_as_string(col: str, *, scale: int = 6) -> F.Column:
    """Render a numeric array column as one deterministic CSV string.

    The driver's canonicalizer sorts raw result cells with pandas
    ``sort_values`` before hashing; array cells arrive as Python lists
    and crash it (``unhashable type: 'list'``). Registry queries whose
    *final* schema would carry an array therefore render it to a scalar
    string with this helper, keeping the operator functions themselves
    array-returning. Elements go through ``DECIMAL(28,scale)`` so Spark
    and DuckDB produce byte-identical text (fixed scale, no scientific
    notation, ``-0.0`` normalized to ``0.000000``); the DuckDB twin is
    :func:`oracle_array_as_string`.
    """
    return F.expr(
        f"concat_ws(',', transform({col}, "
        f"v -> cast(cast(v as decimal(28,{scale})) as string)))"
    )


def oracle_array_as_string(expr: str, *, scale: int = 6) -> str:
    """DuckDB SQL twin of :func:`array_as_string` (same fixed-scale text)."""
    return (
        f"array_to_string(list_transform({expr}, "
        f"v -> ((v)::DECIMAL(28,{scale}))::VARCHAR), ',')"
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (for the SQL surface)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
