"""Distributed mask-frequency profiling (the reference's DQ engine, Spark-first).

The reference's entire mutable aggregation state — one ``HashMap<mask,count>``
plus one example map per column behind a global mutex (main.rs:834-838,
1008-1021; AWK ``allcolumns[field,pattern]++`` bytefreq_v1.05.awk:394-401) —
dissolves into a single shuffled hash aggregation:

    melt(all columns) → mask → groupBy(column, pattern) → (count, example)

Catalyst plans this as partial+final HashAggregate with map-side combine, so
the lock-serialized tallies of the reference become shuffle-free partial
aggregation + one exchange on (column, pattern) — the key architectural win
(SURVEY.md §4.1).

Examples: the reference keeps one *random* example per (column, mask) via
Algorithm-R reservoir (main.rs:185-189).  Default here is the deterministic
stand-in ``min(raw)`` (SURVEY.md A2) so results are testable and oracle-
matchable; ``reservoir_examples`` provides the faithful variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .masks import mask_col

# ---------------------------------------------------------------------------
# Melt / unpivot (R1) — the load-bearing reshape
# ---------------------------------------------------------------------------


def melt(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Unpivot ``columns`` (default: all) to long form ``(column, raw)``.

    All values are cast to string first — profiling is stringly-typed on read
    (reference README.md:22 "Data Quality on Read").  Column order index is
    attached so report ordering (O1, main.rs:1087-1089) is reproducible.
    """
    cols = columns or df.columns
    # backticks: profiled column names may contain dots (flattened JSON paths,
    # `.Rules.` outputs) and must not be parsed as struct access
    strung = df.select([F.col(f"`{c}`").cast("string").alias(c) for c in cols])
    long = strung.unpivot([], [f"`{c}`" for c in cols], "column", "raw")
    return long


def melt_with_index(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Like ``melt`` but with the driver-side column index (insertion order)."""
    cols = columns or df.columns
    idx = F.create_map(
        *[x for i, c in enumerate(cols) for x in (F.lit(c), F.lit(i))]
    )
    return melt(df, cols).withColumn("col_idx", idx[F.col("column")])


# ---------------------------------------------------------------------------
# Mask-frequency table (A1 + A2) and DQ report (O1)
# ---------------------------------------------------------------------------


def mask_frequency(
    df: DataFrame,
    columns: list[str] | None = None,
    grain: str = "LU",
    examples: bool = True,
) -> DataFrame:
    """``(column, pattern, count[, example])`` — one row per (column, mask).

    The Spark analogue of the AWK associative-array tallies named in the
    north star; the output is small (low-cardinality masks) and is what gets
    broadcast as the mask-frequency dictionary downstream (J4).

    Scale note: ``min(raw)`` on a string has an immutable aggregation buffer,
    which forces Catalyst to a **SortAggregate** (per-partition sort of the
    melted data).  ``examples=False`` keeps the plan a pure partial+final
    HashAggregate — use it wherever the example column isn't needed (e.g.
    the pipeline's frequency dictionary).
    """
    long = melt(df, columns)
    # M5 (main.rs:34-36): values under a ``.Rules.`` path are rule outputs —
    # identity mask, so enhanced output can be re-profiled without
    # double-masking
    pattern = F.when(
        F.col("column").contains(".Rules."), F.col("raw")
    ).otherwise(mask_col(F.col("raw"), grain))
    masked = long.select("column", pattern.alias("pattern"), "raw")
    aggs = [F.count("*").alias("count")]
    if examples:
        aggs.append(F.min("raw").alias("example"))
    return masked.groupBy("column", "pattern").agg(*aggs)


def dq_report(
    df: DataFrame,
    columns: list[str] | None = None,
    grain: str = "LU",
    top_k: int | None = None,
) -> DataFrame:
    """Report-ordered frequency table: columns in schema order, masks by
    count desc (main.rs:1087-1099), with per-column rank; optional top-k."""
    cols = columns or df.columns
    freq = mask_frequency(df, cols, grain)
    idx = F.create_map(
        *[x for i, c in enumerate(cols) for x in (F.lit(c), F.lit(i))]
    )
    w = Window.partitionBy("column").orderBy(
        F.desc("count"), F.asc("pattern")
    )
    out = (
        freq.withColumn("col_idx", idx[F.col("column")])
        .withColumn("rank", F.row_number().over(w))
    )
    if top_k is not None:
        out = out.filter(F.col("rank") <= top_k)
    return out.orderBy("col_idx", F.desc("count"), "pattern")


def reservoir_examples(
    df: DataFrame,
    columns: list[str] | None = None,
    grain: str = "LU",
    seed: int = 42,
) -> DataFrame:
    """Faithful single-example reservoir (Algorithm-R k=1, main.rs:185-189),
    made deterministic by seeding: pick the row with min xxhash64(raw, seed)
    per (column, pattern) — an unbiased uniform choice, reproducible across
    partitionings (unlike the reference's arrival-order-dependent reservoir).
    """
    long = melt(df, columns)
    masked = long.select(
        "column", mask_col(F.col("raw"), grain).alias("pattern"), "raw"
    )
    return masked.groupBy("column", "pattern").agg(
        F.count("*").alias("count"),
        F.min_by("raw", F.xxhash64("raw", F.lit(seed))).alias("example"),
    )


# ---------------------------------------------------------------------------
# Histograms (A5, A6, A7, A8)
# ---------------------------------------------------------------------------


def char_histogram(df: DataFrame, column: str) -> DataFrame:
    """Character-frequency histogram over a column (CP report, main.rs:500-551).

    ``(char, codepoint, count)`` ordered by codepoint asc (O2).
    """
    chars = df.select(
        F.explode(F.split(F.col(column).cast("string"), "")).alias("char")
    ).filter(F.length("char") == 1)
    return (
        chars.groupBy("char")
        .agg(F.count("*").alias("count"))
        .withColumn("codepoint", F.ascii("char"))
        .select("char", "codepoint", "count")
        .orderBy("codepoint")
    )


def byte_histogram(df: DataFrame, column: str) -> DataFrame:
    """Byte-frequency histogram (charfreq.awk:282-285) on UTF-8 bytes."""
    exploded = df.select(
        F.explode(
            # encode → binary → per-byte ints
            F.transform(
                F.split(F.hex(F.encode(F.col(column).cast("string"), "UTF-8")), "(?<=\\G..)"),
                lambda h: F.conv(h, 16, 10).cast("int"),
            )
        ).alias("byte")
    ).filter(F.col("byte").isNotNull())
    return exploded.groupBy("byte").agg(F.count("*").alias("count")).orderBy("byte")


def field_count_histogram(df: DataFrame, column: str, sep: str = "\\|") -> DataFrame:
    """Rows per field-arity for a delimited string column (A5, main.rs:1003-1005)."""
    return (
        df.select(F.size(F.split(F.col(column), sep)).alias("n_fields"))
        .groupBy("n_fields")
        .agg(F.count("*").alias("rows"))
        .orderBy("n_fields")
    )


def per_file_counts(df: DataFrame) -> DataFrame:
    """Per-source-file row counts (A6, awk ``wc[FILENAME]++``) — the seed of
    the lineage table."""
    return (
        df.select(F.input_file_name().alias("file"))
        .groupBy("file")
        .agg(F.count("*").alias("rows"))
        .orderBy("file")
    )


# ---------------------------------------------------------------------------
# Report cosmetics & legacy report shapes (O4, R2, R3)
# ---------------------------------------------------------------------------


def truncate_example_col(c, max_len: int = 20):
    """O4 (main.rs:621-635): cut long examples at the last word boundary
    within max_len and append '...'; strings within the limit pass through."""
    cut = F.substring(c, 1, max_len)
    word_cut = F.regexp_extract(cut, r"^(.*\S)\s+\S*$", 1)
    trimmed = F.when(F.length(word_cut) > 0, word_cut).otherwise(cut)
    return F.when(F.length(c) <= max_len, c).otherwise(
        F.concat(trimmed, F.lit("..."))
    )


def doubled_columns(df: DataFrame, columns: list[str] | None = None,
                    grain: str = "LU") -> DataFrame:
    """R2 (AWK report=2): each column followed by its DQ_<col> mask."""
    cols = columns or df.columns
    out = df.select([F.col(c).cast("string").alias(c) for c in cols])
    return out.withColumns({f"DQ_{c}": mask_col(F.col(c), grain) for c in cols})


def machine_report(df: DataFrame, columns: list[str] | None = None,
                   grain: str = "LU", source: str = "") -> DataFrame:
    """R3 (AWK report=0): machine-loadable shape
    (report_date, filename, colname, grain, count, pattern, example)."""
    freq = mask_frequency(df, columns, grain)
    return freq.select(
        F.current_date().cast("string").alias("report_date"),
        F.lit(source).alias("filename"),
        F.col("column").alias("colname"),
        F.lit(grain).alias("grain"),
        "count",
        F.col("pattern"),
        "example",
    )
