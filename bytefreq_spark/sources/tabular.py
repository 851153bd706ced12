"""Delimited/tabular source with reference header + ragged-row semantics.

Mirrors the reference's tabular path (S2-S4):
* configurable single-char delimiter, default ``|`` (main.rs:686-695);
* header row N: names taken from row N (1-based data order), trimmed,
  spaces → ``_`` (main.rs:846-850, 914-918); rows at or before the header
  are skipped;
* ragged rows: fields beyond the header spawn ``RaggedErr{N}`` columns
  (main.rs:977-999) — here the max arity is discovered with one cheap
  aggregation pass (distributed scans can't grow schema mid-flight).

All columns are strings (profiling-on-read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def normalize_header(name: str) -> str:
    return name.strip().replace(" ", "_")


def read_delimited(
    spark: SparkSession,
    path: str,
    delimiter: str = "|",
    header_row: int = 1,
) -> DataFrame:
    """Read a delimited text file the way the reference does.

    Note: quoted-field RFC 4180 parsing is available via ``spark.read.csv``
    (PERMISSIVE); this reader reproduces the reference's *fallback* naive
    split (main.rs:692-694) which is also its AWK-compatible behavior.
    """
    lines = spark.read.text(path).withColumn(
        "_row", F.monotonically_increasing_id()
    )
    # header: row N in file order. text source preserves order per file;
    # for the single-file case monotonic id order == line order.
    hdr = (
        lines.orderBy("_row").limit(header_row).orderBy(F.desc("_row")).limit(1)
        .collect()[0]["value"]
    )
    names = [normalize_header(c) for c in hdr.split(delimiter)]

    data = lines.filter(F.col("_row") >= header_row).select(
        F.split("value", "\\" + delimiter if delimiter in "|.$^*+?()[]{}" else delimiter)
        .alias("_f"),
        "_row",
    )
    max_arity = data.agg(F.max(F.size("_f"))).collect()[0][0] or len(names)
    cols = list(names) + [
        f"RaggedErr{i}" for i in range(max(0, max_arity - len(names)))
    ]
    return data.select(
        # F.get (not []): returns NULL past the end under ANSI mode
        *[F.get(F.col("_f"), i).alias(c) for i, c in enumerate(cols)]
    )


def field_count_report(df_lines: DataFrame, column: str = "value",
                       delimiter: str = "|") -> DataFrame:
    """A5 over a raw line frame: rows per field-arity."""
    sep = "\\" + delimiter if delimiter in "|.$^*+?()[]{}" else delimiter
    return (
        df_lines.select(F.size(F.split(F.col(column), sep)).alias("n_fields"))
        .groupBy("n_fields").agg(F.count("*").alias("rows")).orderBy("n_fields")
    )
