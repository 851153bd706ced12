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


def _sep_regex(delimiter: str) -> str:
    return "\\" + delimiter if delimiter in "|.$^*+?()[]{}" else delimiter


def delimited_lines_to_columns(
    lines: DataFrame, names: list[str], delimiter: str = "|",
    value_col: str = "value",
) -> DataFrame:
    """Split a frame of raw lines into named string columns with the
    reference's ragged-row semantics (S4, main.rs:977-999): fields beyond the
    header spawn ``RaggedErr{N}`` columns.  Max arity is discovered with one
    cheap aggregation pass (a distributed scan can't grow schema mid-flight).
    """
    data = lines.select(F.split(F.col(value_col), _sep_regex(delimiter)).alias("_f"))
    max_arity = data.agg(F.max(F.size("_f"))).collect()[0][0] or len(names)
    cols = list(names) + [
        f"RaggedErr{i}" for i in range(max(0, max_arity - len(names)))
    ]
    return data.select(
        # F.get (not []): returns NULL past the end under ANSI mode
        *[F.get(F.col("_f"), i).alias(c) for i, c in enumerate(cols)]
    )


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
    # Real 0-based line numbers via zipWithIndex (partition-ordered global
    # index), not monotonically_increasing_id — mono ids are
    # (partition<<33)+offset, so `>= header_row` skips the wrong rows whenever
    # the file splits into >1 partition.  zipWithIndex costs one extra tiny
    # per-partition-count job, acceptable for this profiling entry path
    # (the big-data path is spark.read.csv, see read_csv_rfc4180).
    indexed = spark.read.text(path).rdd.zipWithIndex().map(
        lambda t: (t[0]["value"], t[1])
    )
    lines = spark.createDataFrame(indexed, "value string, _row long")
    hdr = lines.filter(F.col("_row") == header_row - 1).collect()[0]["value"]
    names = [normalize_header(c) for c in hdr.split(delimiter)]

    data = lines.filter(F.col("_row") >= header_row)
    return delimited_lines_to_columns(data, names, delimiter)


def read_csv_rfc4180(
    spark: SparkSession,
    path: str,
    delimiter: str = "|",
    header: bool = True,
) -> DataFrame:
    """RFC 4180 quoted-field delimited reader (S2 primary path).

    The reference's primary tabular parser is the csv crate with full quoting
    (main.rs:638-655): quoted fields may embed the delimiter, doubled quotes
    escape a literal quote.  ``spark.read.csv`` implements exactly these
    semantics JVM-side (splittable, pushdown-friendly — the big-data path);
    header names get the same trim + spaces→``_`` normalization as
    ``read_delimited``.  All-string schema: profiling-on-read.
    """
    df = spark.read.csv(
        path, sep=delimiter, header=header, quote='"', escape='"',
        mode="PERMISSIVE", inferSchema=False,
    )
    return df.toDF(*[normalize_header(c) for c in df.columns])


# ---------------------------------------------------------------------------
# S7: Excel source (reference excel.rs:17-114) — gated on openpyxl
# ---------------------------------------------------------------------------


def excel_cell_to_string(v) -> str:
    """All-cells-to-string semantics of the reference (excel.rs:83-106):
    ints bare, floats with zero fraction as int strings, bools ``true``/
    ``false``, empty → ``""``.  Pure function so the semantics are testable
    even when no Excel reader library is installed."""
    import math

    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isfinite(v) and v == int(v):
            return str(int(v))
        return str(v)
    return str(v)


def read_excel(
    spark: SparkSession, path: str, sheet: int | str = 0, header_row: int = 1
) -> DataFrame:
    """Excel scan via pandas+openpyxl → all-string DataFrame (S7).

    The container ships no Excel codec; this is the gated fallback the
    reference's excel.rs implies (sheet by index or name, every cell
    stringified, header row N with the standard name normalization).
    Driver-side read — Excel files are small config/reference tables, not
    the 100 TB path."""
    try:
        import openpyxl  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "read_excel needs openpyxl, which is not installed in this "
            "container; semantics are covered by excel_cell_to_string tests"
        ) from e
    import pandas as pd

    pdf = pd.read_excel(path, sheet_name=sheet, header=None, dtype=object)
    pdf = pdf.where(pd.notna(pdf), None).map(excel_cell_to_string)
    header = [normalize_header(str(c)) for c in pdf.iloc[header_row - 1]]
    body = pdf.iloc[header_row:]
    body.columns = header
    return spark.createDataFrame(body)


def field_count_report(df_lines: DataFrame, column: str = "value",
                       delimiter: str = "|") -> DataFrame:
    """A5 over a raw line frame: rows per field-arity."""
    sep = _sep_regex(delimiter)
    return (
        df_lines.select(F.size(F.split(F.col(column), sep)).alias("n_fields"))
        .groupBy("n_fields").agg(F.count("*").alias("rows")).orderBy("n_fields")
    )
