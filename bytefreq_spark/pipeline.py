"""Distributed quality-filter pipeline (the north-rule system).

Stage graph (all declarative DataFrame ops; Python only in Arrow-vectorized
pandas-UDF stages):

1. **featurize** — one pandas-UDF stage computing per-turn features, langid,
   perplexity and scrubbed text from the shared kernels (single Arrow
   round-trip; no per-row Python).
2. **mask-frequency dictionary** — distributed ``groupBy(lu_key).count()``
   (the Spark analogue of bytefreq's associative-array tallies) broadcast-
   joined back onto turns (J4).  At 10^12 turns the dictionary stays small
   (low-cardinality masks) — the broadcast is what makes this scale.
3. **prev-turn join** — duplicate-turn detection via a self-join on
   ``(conv_id, turn_idx-1)`` instead of a ``Window.partitionBy(conv_id)``:
   hash-partitioning on the *composite* key spreads a million-turn whale
   conversation over the cluster, where a window would pin it to one task
   (explicit skew handling per the north rule).  ``salt`` on the featurize
   repartition covers residual input-partition skew.
4. **decide** — shared ``decide()`` kernel in a pandas UDF over the joined
   columns (identical arithmetic to the reference implementation).
5. **write** — ``repartitionByRange(conv_id, turn_idx)`` +
   ``sortWithinPartitions`` for stable (conv_id, turn_idx) output order,
   snapshot checkpoints with manifests, per-partition metrics + lineage.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType, DoubleType, LongType, StringType, StructField, StructType,
)

from .langid import detect_language
from .perplexity import perplexity
from .quality import decide, text_features
from .scrub import scrub_series_sparse

FEATURE_SCHEMA = StructType([
    StructField("lu_key", StringType()),
    StructField("n_tokens", LongType()),
    StructField("digit_count", LongType()),
    StructField("weird_count", LongType()),
    StructField("mask_entropy", DoubleType()),
    StructField("lang", StringType()),
    StructField("ppl", DoubleType()),
    StructField("scrubbed_text", StringType()),
])

DECISION_SCHEMA = StructType([
    StructField("keep", BooleanType()),
    StructField("drop_reason", StringType()),
])


def _featurize_udf():
    @F.pandas_udf(FEATURE_SCHEMA)
    def feats(text: pd.Series, scrub_flag: pd.Series) -> pd.DataFrame:
        # lu_key from the PYTHON kernel: the vectorized run-collapse costs
        # ~13 µs core/turn vs ~87 µs for the JVM regexp chain (docs/PLANS.md
        # §lu_key_mask_cost) — the featurize stage pays whichever engine
        # computes it, so the cheap one wins.  NULL text yields NULL lu_key
        # for exact parity with the JVM expression the rescan dictionary
        # branch still uses (mask_col ≡ mask_series elsewhere: test_masks).
        f = text_features(text).drop(columns=["n_chars"])
        f.loc[text.isna(), "lu_key"] = None
        f["lang"] = detect_language(text)
        f["ppl"] = perplexity(text)
        # three-state scrub protocol (flags set JVM-side in ``featurize``):
        # 0 = clean ASCII — no rule can match (prefilter), scrub ≡ identity;
        # 1 = candidate ASCII — the JVM regexp chain scrubs it OUTSIDE the
        #     UDF (scrub.SCRUB_RULES_JAVA dialect equivalence) and the
        #     post-UDF projection composites it in: the pre-scrubbed text
        #     never crosses Arrow in either direction (before r7 it rode
        #     along as a UDF argument and came straight back out);
        # 2 = non-ASCII or NULL — the Python kernel decides, and rows the
        #     rule chain leaves unchanged come back NULL too
        #     (scrub_series_sparse) — on multilingual prose the candidate
        #     rate is ~0%, so the unchanged corpus stops re-shipping on the
        #     Arrow return path just like the ASCII flag-0 rows.
        # Only genuinely REWRITTEN text (any flag) and the NULL→"" contract
        # rows return a value here; everything else is NULL and the JVM
        # restores the identity.  Byte-identical overall, enforced by the
        # scrub differential tests.
        flag = scrub_flag.to_numpy()
        scr = pd.Series(
            np.full(len(text), None, dtype=object), index=text.index)
        py = flag == 2
        if py.any():
            scr[py] = scrub_series_sparse(text[py])
        f["scrubbed_text"] = scr
        return f[[fld.name for fld in FEATURE_SCHEMA.fields]]

    return feats


def _decide_udf():
    @F.pandas_udf(DECISION_SCHEMA)
    def dec(
        lang: pd.Series, ppl: pd.Series, n_chars: pd.Series,
        digit_count: pd.Series, weird_count: pd.Series, mask_entropy: pd.Series,
        lu_count: pd.Series, lu_total: pd.Series, is_dup: pd.Series,
        role: pd.Series,
    ) -> pd.DataFrame:
        return decide(lang, ppl, n_chars, digit_count, weird_count,
                      mask_entropy, lu_count, lu_total, is_dup, role)

    return dec


def with_mask_key(df: DataFrame) -> DataFrame:
    """Native (JVM-only) columns: LU-mask dictionary key + char count.

    This is the RESCAN dictionary path: the mask-frequency pass re-reads the
    input with this projection (Catalyst prunes to the `text` column; zero
    Python) instead of re-running the heavy featurize UDF.  The featurize
    stage itself emits lu_key from the Python kernel since r6 (~7× cheaper
    per turn than this regexp chain — docs/PLANS.md §lu_key_mask_cost); the
    two engines agree exactly (`mask_col` ≡ `mask_series`, test_masks;
    NULL text → NULL key on both sides).
    """
    from .masks import mask_col
    from .quality import LU_KEY_LEN, LU_KEY_SRC_CHARS

    return df.withColumns({
        # mask only a text prefix: the collapse regex on multi-KB turns is
        # the dominant JVM cost, and the dictionary key is truncated anyway
        # (same prefix rule in quality.text_features — frozen contract)
        "lu_key": F.substring(
            mask_col(F.substring(F.col("text"), 1, LU_KEY_SRC_CHARS), "LU"),
            1, LU_KEY_LEN,
        ),
        "n_chars": F.coalesce(F.length("text"), F.lit(0)).cast("long"),
    })


def _lu_key_udf():
    """Arrow-vectorized LU dictionary key: the fused flat-buffer kernel
    (``masks.lu_mask_key_series``) over a JVM-side 512-char prefix.

    This is the same kernel featurize emits ``lu_key`` from, so dictionary
    keys and featurize keys agree STRUCTURALLY (one engine), on top of the
    char-for-char JVM≡Python parity test_masks pins.  NULL text yields NULL
    key — matching both ``with_mask_key`` (mask_col propagates NULL) and
    featurize (explicit ``.loc[text.isna()] = None``)."""
    from .masks import lu_mask_key_series
    from .quality import LU_KEY_LEN, LU_KEY_SRC_CHARS

    @F.pandas_udf(StringType())
    def lu_key(prefix: pd.Series) -> pd.Series:
        out = lu_mask_key_series(prefix, LU_KEY_SRC_CHARS, LU_KEY_LEN)
        out[prefix.isna()] = None
        return out

    return lu_key


def with_mask_key_arrow(
    df: DataFrame, repartition: int | None = None,
) -> DataFrame:
    """The RESCAN dictionary projection via the Arrow kernel: ``(lu_key)``
    only — the frequency dictionary groups by the key and needs nothing
    else, so the Arrow boundary carries exactly one 512-char JVM-side text
    prefix in and one ≤64-char key out (ship only the columns the function
    needs).

    r8: the JVM ``with_mask_key`` chain (translate + 5 regexp passes + the
    backreference collapse) measured 5.1-6.9 s on the 1.86M-turn corpus —
    half the entire pipeline wall — while this kernel does the same masking
    ~7× cheaper per turn (docs/PLANS.md §lu_key_mask_cost).  ``with_mask_key``
    remains the zero-Python reference surface (differential-tested equal).

    ``repartition`` inserts the caller's dict-salt exchange BETWEEN the
    prefix projection and the Arrow stage, so the exchange moves ≤512-char
    prefixes instead of whole rows (project before the exchange): measured
    1.87 s vs 3.35 s on the salted whale_sf1 dict branch.  (Measured in the
    same sweep: with this kernel the whale's fat partition is no longer a
    meaningful straggler — the UNSALTED dict branch read 1.04 s — so the
    dict salt is close to pure exchange cost now; it remains honored as the
    explicit opt-in it is.)"""
    from .quality import LU_KEY_SRC_CHARS

    pref = df.select(
        F.substring(F.col("text"), 1, LU_KEY_SRC_CHARS).alias("_pref")
    )
    if repartition:
        pref = pref.repartition(repartition)
    return pref.select(_lu_key_udf()(F.col("_pref")).alias("lu_key"))


def input_salt_decision(
    df: DataFrame, target: int, skew_tolerance: float = 2.0,
) -> int | None:
    """Measured salt decision (VERDICT_r6 #1): probe the input's partition
    layout with one cheap job and return ``None`` when the layout is already
    acceptable — the featurize round-robin exchange is pure overhead on a
    balanced input (docs/SCALE.md: salt is optional on bucketed Iceberg).

    "Acceptable" = enough partitions to occupy the cluster (≥ target/2) AND
    no partition more than ``skew_tolerance``× the mean by EITHER row count
    or text bytes — a whale conversation is whale-shaped in rows, but a
    longdocs-style file is whale-shaped in bytes at balanced row counts,
    and both starve the featurize stage (r7 review: the original
    rows-only probe passed the byte-skewed shape).  On a real Iceberg
    table the same decision can be made from file-size metadata without
    any job at all — this helper is the sandbox-honest version that
    actually measures.

    r8: the conjunction is evaluated LAZILY in two jobs — a row-count-only
    pass first (column-pruned to nothing: no text bytes touched), and the
    byte-sum pass only when the counts already look acceptable.  The
    decision is identical (same predicate, short-circuited), but a
    row-skewed input — the whale, and the longdocs shape whose zipf turn
    counts are themselves skewed — resolves to keep-the-salt without ever
    streaming its text column (measured ~0.5 s saved per call on the
    176 MB longdocs corpus); a balanced input pays one extra count-only
    job (~0.05 s) before the byte check the skip decision genuinely
    needs."""
    by_part = df.groupBy(F.spark_partition_id().alias("p"))
    counts = [r["cnt"] for r in by_part.agg(
        F.count("*").alias("cnt")).collect()]
    if not _layout_acceptable(counts, None, target, skew_tolerance):
        return target
    if "text" not in df.columns:
        return None
    chars = [r["chars"] for r in by_part.agg(
        F.coalesce(F.sum(F.length("text")), F.lit(0)).alias("chars")
    ).collect()]
    ok = _layout_acceptable(counts, chars, target, skew_tolerance)
    return None if ok else target


def _layout_acceptable(
    counts: list, chars: list | None, target: int,
    skew_tolerance: float = 2.0,
) -> bool:
    """Pure decision core of :func:`input_salt_decision` (property-tested):
    acceptable iff there are enough partitions to occupy the cluster AND
    the layout is balanced by rows AND (when known) by bytes."""
    if not counts:
        return True

    def _balanced(vals: list) -> bool:
        mean = sum(vals) / len(vals)
        return mean == 0 or max(vals) <= skew_tolerance * mean

    return (
        len(counts) >= max(target // 2, 1)
        and _balanced(counts)
        and (chars is None or _balanced(chars))
    )


def featurize(df: DataFrame, salt_partitions: int | None = None) -> DataFrame:
    """Stage 1: per-turn features/lang/ppl/scrub in one Arrow round-trip.

    ``salt_partitions`` forces an even round-robin repartition before the UDF
    stage so a skewed upstream layout (one huge conversation in one input
    file) cannot starve the scoring stage — per-turn work is
    order-independent, so this is free correctness-wise.
    """
    from .scrub import _TOX_STEMS, scrub_col

    if salt_partitions:
        df = df.repartition(salt_partitions)  # round-robin: breaks any skew
    # n_chars stays a JVM projection (one length() call); lu_key moved INTO
    # the featurize UDF (r6): the Python run-collapse kernel computes it ~7×
    # cheaper per turn than mask_col's regexp chain, and both engines run
    # serially on the same task thread, so the cheaper one shortens the
    # stage (measured 0.5 s JVM vs 0.07 s Python wall on the 184k-turn
    # flagship; audit in docs/PLANS.md §lu_key_mask_cost).  The rescan
    # dictionary branch still uses with_mask_key — JVM-only by design.
    df = df.withColumn(
        "n_chars", F.coalesce(F.length("text"), F.lit(0)).cast("long"))
    # ASCII router for the scrub fast path: char count == UTF-8 byte count
    # ⇔ pure ASCII ⇔ the JVM regex chain is byte-identical to the Python
    # kernel (scrub.SCRUB_RULES_JAVA).  The JVM side applies the SAME
    # conservative prefilter the Python kernel uses (every rule needs a
    # digit/'@' or a toxicity stem — on ASCII rows [0-9] ≡ Python's \d):
    # clean rows scrub to THEMSELVES, skipping the 7-regex chain entirely
    # (without this, the JVM path ran the full chain on every ASCII row and
    # was slower than the prefiltered Python kernel on clean short-turn
    # corpora).  Non-ASCII/NULL rows stay NULL here and are scrubbed inside
    # the UDF.  Runs post-salt, so it feeds the Arrow stage directly with
    # no extra exchange.
    ascii_ok = F.length("text") == F.octet_length("text")
    cand = F.col("text").rlike("[0-9@]")
    lowered = F.lower(F.col("text"))
    for stem in _TOX_STEMS:
        cand = cand | lowered.contains(stem)
    # 3-state flag; the JVM-scrubbed candidate text stays a JVM-side column
    # (``_scrub_pre``): ArrowEvalPython ships ONLY the UDF's argument
    # columns to Python, so keeping it out of the UDF signature means the
    # pre-scrubbed text never crosses Arrow at all — the post-UDF projection
    # composites it back in.  (Before r7 it rode through the UDF and back;
    # and before r6, shipping scrub_pre for ALL ascii rows doubled the
    # Arrow payload on clean corpora — measured ~10% featurize cost.)
    scrub_flag = (
        F.when(ascii_ok & ~cand, F.lit(0))
        .when(ascii_ok, F.lit(1))
        .otherwise(F.lit(2))
    ).cast("int")
    df = df.withColumns({
        "_scrub_flag": scrub_flag,
        "_scrub_pre": F.when(ascii_ok & cand, scrub_col(F.col("text"))),
    })
    return (
        df.withColumn(
            "_f", _featurize_udf()(F.col("text"), F.col("_scrub_flag"))
        ).select("*", "_f.*").drop("_f")
        # the UDF returns NULL scrubbed_text for every identity row (clean
        # ASCII flag-0 AND unchanged non-ASCII flag-2) so the Arrow return
        # path never carries unchanged corpus text; flag-1 rows take the
        # JVM-scrubbed column, everything else coalesces back to the input
        .withColumn(
            "scrubbed_text",
            F.when(F.col("_scrub_flag") == 1, F.col("_scrub_pre"))
            .otherwise(F.coalesce("scrubbed_text", "text")),
        )
        .drop("_scrub_flag", "_scrub_pre")
    )


def mask_frequency_dict(featurized: DataFrame) -> DataFrame:
    """Stage 2a: corpus-wide LU-mask frequency dictionary (distributed
    groupBy-count; the bytefreq tally, A1)."""
    return featurized.groupBy("lu_key").agg(F.count("*").alias("lu_count"))


def with_mask_frequency(featurized: DataFrame, freq: DataFrame | None = None) -> DataFrame:
    """Stage 2b: broadcast the dictionary back onto turns (J4)."""
    freq = freq if freq is not None else mask_frequency_dict(featurized)
    # lu_total rides on the dictionary itself so the dict has exactly one
    # consumer — a second consumer (e.g. a separate total agg) would re-run
    # the full input scan that builds it.  Fold the tiny dict to ONE row
    # (entries list + grand total) and re-explode: same single-consumer DAG
    # as a global window but with no single-partition WindowExec (and no
    # 'No Partition Defined' log noise).  Safe because the dict is
    # post-aggregation low-cardinality (bounded by distinct truncated masks).
    one = freq.agg(
        F.collect_list(F.struct("lu_key", "lu_count")).alias("_entries"),
        F.sum("lu_count").alias("lu_total"),
    )
    freq2 = one.select(
        F.explode("_entries").alias("_e"), "lu_total"
    ).select("_e.lu_key", "_e.lu_count", "lu_total")
    return featurized.join(F.broadcast(freq2), "lu_key", "left")


def conversation_layout(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """THE wide shuffle: hash-partition by conv_id, sort by (conv_id, turn_idx).

    This single exchange serves three consumers at once:
    1. the duplicate-turn ``lag`` window (needs conv_id partitioning + turn
       order → planned with NO additional exchange or sort),
    2. the stable (conv_id, turn_idx) output ordering (conversation-contiguous
       files, deterministic row order),
    3. conversation-level aggregates downstream.

    Skew note: a whale conversation lands in one partition, but by this point
    the expensive per-turn UDF work is already done (salted, upstream) — the
    whale only pays a streaming lag + native filters here.
    """
    args = [partitions] if partitions else []
    return df.repartition(*args, "conv_id").sortWithinPartitions(
        "conv_id", "turn_idx"
    )


def with_dup_flag(df: DataFrame) -> DataFrame:
    """Duplicate-turn detection via lag over the conversation layout.

    MUST run on a ``conversation_layout`` frame — then Catalyst plans the
    window with zero extra exchanges (check: no Exchange above the window in
    `.explain`).  For inputs without that layout use ``with_prev_turn``
    (join-based, layout-free) instead.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev = F.lag("text").over(w)
    return df.withColumn(
        "is_dup",
        prev.isNotNull()
        & (prev == F.col("text"))
        & (F.coalesce(F.col("text"), F.lit("")) != ""),
    )


def with_dup_flag_hashed(df: DataFrame, hash_col: str = "_text_h") -> DataFrame:
    """``with_dup_flag`` over a PRE-SHUFFLE 64-bit text hash instead of the
    raw text: the lag window then never needs the text column, so
    ``drop_text=True`` can prune text/tool BEFORE the wide conversation
    shuffle (the dominant data movement at scale — see docs/SCALE.md).

    The hash column must be NULL for NULL text (``xxhash64`` would hash a
    NULL to the seed constant, letting a real text that hashes to the seed
    false-match an adjacent NULL row); with that convention the NULL/empty
    semantics match the exact comparison.  A 64-bit collision between two
    ADJACENT same-conversation turns falsely flags a duplicate: expected
    false dups ≈ n_pairs·2⁻⁶⁴ ≈ 5×10⁻⁸ across 10^12 turns — noise for a
    training-corpus filter (same documented tradeoff as paragraph_dedup's
    hash keys).  Equivalence with the exact flag is differential-tested
    (test_dup_flag_hashed_equals_exact)."""
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev = F.lag(hash_col).over(w)
    return df.withColumn(
        "is_dup",
        prev.isNotNull()
        & (prev == F.col(hash_col))
        & (F.col("n_chars") > 0),
    )


def with_prev_turn(df: DataFrame) -> DataFrame:
    """Alternate duplicate detection: skew-safe self-join on the composite
    key (no layout requirement; costs its own shuffle of both sides)."""
    prev = df.select(
        F.col("conv_id").alias("conv_id"),
        (F.col("turn_idx") + 1).alias("turn_idx"),
        F.col("text").alias("_prev_text"),
    )
    joined = df.join(prev, ["conv_id", "turn_idx"], "left")
    return joined.withColumn(
        "is_dup",
        F.col("_prev_text").isNotNull()
        & (F.col("_prev_text") == F.col("text"))
        & (F.coalesce(F.col("text"), F.lit("")) != ""),
    ).drop("_prev_text")


def decision_cols() -> tuple[F.Column, F.Column]:
    """Native-expression mirror of ``quality.decide`` (same rule order, same
    integer cross-multiplication, same float comparisons — no Arrow
    round-trip).  Parity is enforced by the end-to-end F1 test."""
    from . import quality as Q

    n = F.col("n_chars")
    dc, wc = F.col("digit_count"), F.col("weird_count")
    ent, ppl = F.col("mask_entropy"), F.col("ppl")
    lc = F.coalesce(F.col("lu_count"), F.lit(0))
    lt = F.coalesce(F.col("lu_total"), F.lit(0))
    lang = F.coalesce(F.col("lang"), F.lit("und"))
    role = F.coalesce(F.col("role"), F.lit(""))
    dup = F.coalesce(F.col("is_dup"), F.lit(False))

    reason = (
        F.when(n == 0, "empty")
        .when(n > Q.MAX_CHARS, "too_long")
        .when(~lang.isin(*Q.ALLOWED_LANGS), "lang")
        .when(wc * Q.WEIRD_DEN > n * Q.WEIRD_NUM, "weird_chars")
        .when(dc * Q.DIGIT_DEN > n * Q.DIGIT_NUM, "digits")
        .when(
            lang.isin(*Q.LATIN_LANGS)
            & role.isin("user", "assistant")
            & (ppl > Q.PPL_MAX),
            "perplexity",
        )
        .when(
            (n < Q.RARE_MAX_CHARS) & (lt > 0)
            & (lc * 1_000_000 < lt * Q.RARE_PPM),
            "rare_pattern",
        )
        .when((n >= Q.ENTROPY_MIN_CHARS) & (ent < Q.ENTROPY_MIN), "low_entropy")
        .when(dup, "duplicate")
    )
    return reason.isNull().alias("keep"), reason.alias("drop_reason")


def with_decision(df: DataFrame) -> DataFrame:
    """Stage 4: keep/drop as native expressions (JVM, whole-stage codegen)."""
    keep, reason = decision_cols()
    return df.withColumns({"keep": keep, "drop_reason": reason})


def with_decision_udf(df: DataFrame) -> DataFrame:
    """Pandas-UDF variant of the decision (kernel-identical to the reference
    implementation; kept for differential testing of ``decision_cols``)."""
    dec = _decide_udf()(
        F.col("lang"), F.col("ppl"), F.col("n_chars"), F.col("digit_count"),
        F.col("weird_count"), F.col("mask_entropy"), F.col("lu_count"),
        F.col("lu_total"), F.col("is_dup"), F.col("role"),
    )
    return df.withColumn("_d", dec).select("*", "_d.*").drop("_d")


def stable_order(
    df: DataFrame, partitions: int | None = None, mode: str = "range"
) -> DataFrame:
    """Stage 5: stable (conv_id, turn_idx) ordering for output.

    ``range``: globally sorted output (repartitionByRange samples the input —
    call only on a persisted/snapshotted frame or the whole upstream runs
    twice).  ``hash``: conversation-contiguous, per-partition sorted, no
    sampling pass — the cheap choice at 100 TB where global total order
    across files buys nothing.
    """
    args = [partitions] if partitions else []
    if mode == "hash":
        rp = df.repartition(*args, "conv_id")
    else:
        rp = df.repartitionByRange(*args, "conv_id", "turn_idx")
    return rp.sortWithinPartitions("conv_id", "turn_idx")


def quality_filter(
    df: DataFrame,
    salt_partitions: int | None = None,
    ordered: bool = True,
    drop_text: bool = False,
    freq_source: str = "rescan",
    dict_salt_partitions: int | None = None,
    auto_salt: bool = True,
) -> DataFrame:
    """Full pipeline: transcripts → labeled/scrubbed turns.

    ``freq_source`` picks how the corpus-wide mask-frequency dictionary is
    built — the one stage that inherently needs a second look at the data:

    * ``"rescan"`` (default): dictionary from a second scan of the *input*,
      JVM-only and column-pruned to ``text`` (the cheap native mask
      projection); the heavy pandas-UDF stage runs exactly once.
      Cost at 100 TB: input is columnar parquet, so the rescan reads just the
      text column's compressed bytes (~the dominant column, call it T bytes)
      a second time — total I/O ≈ 2T reads, zero extra writes.
    * ``"persist"``: materialize the featurized frame (DISK_ONLY), build the
      dictionary from its ``lu_key`` and join against the cached copy.
      Cost at 100 TB: one T read plus a write+read of the featurized frame —
      which carries text + scrubbed_text + features ≈ 2-3T — so ≥ 2-3T of
      writes and the same again in reads, on cluster-local disks.

    Rescan wins whenever the input is a columnar format on cheap storage
    (the 100 TB parquet/Iceberg case: a pruned re-read beats writing 2-3T of
    scratch).  Persist wins when the input decode itself is expensive or
    non-columnar (CSV/JSON sources, or a remote store where reads are the
    bottleneck) — then paying local-disk materialization once is cheaper
    than decoding twice.  Measured at sf0.1 in BENCH_r02 (see bench.py).

    ``drop_text`` drops the raw text/tool columns from the output (the
    scrubbed text is the deliverable at scale).  ``ordered`` is kept for API
    compatibility — output is always conversation-contiguous sorted (it
    falls out of the one shuffle).

    ``auto_salt`` makes the featurize salt a MEASURED decision
    (``input_salt_decision``): the round-robin exchange is kept only when
    the input layout probe finds too few or skewed partitions; a balanced
    input (bucketed Iceberg, a freshly-written parquet corpus) skips it,
    removing one full-data exchange from the plan (docs/PLANS.md
    §quality_filter_nosalt proves the shape; the whale corpus measurably
    keeps the salt — test_auto_salt_decision).  With no explicit
    ``salt_partitions`` the probe targets 2× the session's default
    parallelism, so ``auto_salt=True`` alone is a complete config.
    **Default since r8** (VERDICT_r7 #2): measured 22-28% faster on balanced
    input, provably keeps the salt on skew, and the probe costs one cheap
    column-pruned job (0.1 s at sf0.1, ~0.5 s at sf1; free on real Iceberg
    via file metadata).  ``auto_salt=False`` restores the unconditional
    salt; an explicit ``salt_partitions`` still sizes whichever salt the
    probe keeps.
    """
    if auto_salt:
        # without an explicit salt_partitions the probe still runs, against
        # a cluster-sized default target — otherwise `auto_salt=True` alone
        # (the CLI's --auto-salt) would silently never protect a skewed
        # input (r7 review)
        target = salt_partitions or (
            df.sparkSession.sparkContext.defaultParallelism * 2)
        salt_partitions = input_salt_decision(df, target)
    feat = featurize(df, salt_partitions)
    if freq_source == "persist":
        from pyspark import StorageLevel

        feat = feat.persist(StorageLevel.DISK_ONLY)
        freq = mask_frequency_dict(feat)
    else:
        # the rescan branch inherits the INPUT's partition layout.
        # ``dict_salt_partitions`` (explicit opt-in) round-robins it first —
        # historically needed because the JVM mask chain serialized on a
        # fat partition (measured 2.4× on the whale shape in r3).  r8: the
        # rescan masks through the Arrow kernel instead (~7× cheaper per
        # turn than the JVM regexp chain — the chain measured 5-7 s on the
        # 1.86M-turn corpus, HALF the whole pipeline wall); the Arrow
        # boundary carries only a 512-char JVM-side prefix in and the
        # ≤64-char key out, and the opt-in dict-salt exchange is inserted
        # BETWEEN the prefix projection and the Arrow stage so it moves
        # prefixes, not whole rows (measured 1.87 s vs 3.35 s on the salted
        # whale_sf1 dict branch).  With the kernel this fast, the unsalted
        # whale dict branch measured 1.04 s — the fat partition is no
        # longer a meaningful straggler, so the salt is mostly exchange
        # cost and stays an explicit opt-in, default OFF.
        freq = mask_frequency_dict(
            with_mask_key_arrow(df, dict_salt_partitions))
    with_freq = with_mask_frequency(feat, freq)
    # ONE wide shuffle: conversation layout → exchange-free lag window →
    # native decision.  Output is conversation-contiguous and (conv_id,
    # turn_idx)-sorted by construction; no sampling job, no persist needed.
    # The dup lag compares a 64-bit text hash computed BEFORE the shuffle
    # (NULL for NULL text — see with_dup_flag_hashed), so with drop_text
    # the raw text/tool columns are pruned from the exchange payload
    # entirely: at 10^12-turn scale that halves the one full-data shuffle
    # (scrubbed_text is the deliverable; raw text was riding along only to
    # feed the adjacent-duplicate comparison).
    pre = with_freq.withColumn(
        "_text_h",
        F.when(F.col("text").isNotNull(), F.xxhash64("text")),
    )
    if drop_text:
        pre = pre.drop("text", "tool")
    laid_out = conversation_layout(pre)
    decided = with_decision(with_dup_flag_hashed(laid_out)).drop("_text_h")
    if drop_text:
        decided = decided.drop("lu_key")
    return decided


def run_incremental(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    salt_partitions: int | None = None,
    config: dict | None = None,
) -> tuple[DataFrame, int]:
    """Incremental ingest — the 10^12-turn reality: you never reprocess the
    corpus; each batch labels only conversations not yet in the labels
    snapshot and commits new snapshot versions.

    The mask-frequency dictionary is maintained as the additive monoid it is
    (bytefreq's tally is just counts): ``freq(N+1) = freq(N) ⊎ tally(new
    turns)`` — exactly equal to a full-corpus recompute (asserted in
    test_run_incremental), with only the new turns scanned.  Crash safety:
    the labels table is the ONLY commit point (it retains ``lu_key`` —
    which is also why this path deliberately offers no ``drop_text``: the
    freq snapshot is rebuilt from labels on a validity mismatch, so the
    mask key must survive in the committed table; run the checkpointed or
    one-shot pipeline for the text-free output shape); the
    freq snapshot is a derived cache validity-keyed to the labels version,
    rebuilt from labels whenever the key mismatches — a failure between the
    labels and freq commits can never double- or under-count.  New
    conversations are decided against the dictionary as of their ingest;
    conversations are ingest-atomic (all turns arrive together), so the
    dup-lag and ordering semantics are unaffected.  The labels commit here
    rewrites old+new as v(N+1) (the sandbox parquet stand-in); on Iceberg
    this is a fast append of the new files to the table snapshot.

    Returns ``(labels_df, n_new_turns)``.
    """
    config = dict(config or {}, version=1, salt=salt_partitions)
    labels_v0 = snapshot_versions(out_dir, "labels")
    if labels_v0:
        old_labels = read_snapshot(spark, out_dir, "labels")
        # the anti-join's right side is the THIN conv_index snapshot (one
        # distinct conv_id column) when a valid one exists — at 10^12 turns
        # the labels table is wide and huge, and re-scanning + distinct-ing
        # it on EVERY arriving batch is the dominant ingest cost; the index
        # is ~avg_turns_per_conv × narrower.  Like the freq dict, it is a
        # pure CACHE validity-keyed to the labels version it was derived
        # from: stale or missing → rebuilt from labels, so a crash between
        # the two commits can never lose or duplicate conversations.  AQE
        # turns the anti-join into a broadcast join at runtime whenever the
        # index is small enough.
        idx_cfg = dict(config, labels_version=labels_v0[-1])
        if snapshot_valid(out_dir, "conv_index", idx_cfg):
            existing = read_snapshot(spark, out_dir, "conv_index")
        else:
            existing = old_labels.select("conv_id").distinct()
        new = transcripts.join(existing, "conv_id", "left_anti")
    else:
        old_labels, new = None, transcripts
    n_new = new.count()
    if n_new == 0 and old_labels is not None:
        return old_labels, 0

    # THE single source of truth is the labels table (it retains lu_key), so
    # the dictionary has exactly ONE commit point: the labels commit.  The
    # freq snapshot is a pure cache of tally(labels.lu_key), validity-keyed
    # to the labels version it was derived from — a crash between the two
    # commits can never double- or under-count (the cache is simply
    # recomputed from labels when its key doesn't match).
    labels_v = snapshot_versions(out_dir, "labels")
    cur_labels_v = labels_v[-1] if labels_v else 0
    freq_cfg = dict(config, labels_version=cur_labels_v)
    if old_labels is None:
        freq_old = None
    elif snapshot_valid(out_dir, "freq", freq_cfg):
        freq_old = read_snapshot(spark, out_dir, "freq")
    else:  # stale or missing cache → rebuild from the committed labels
        freq_old = (
            old_labels.groupBy("lu_key").agg(F.count("*").alias("lu_count"))
        )
    # same Arrow mask kernel as the one-shot rescan (r8) — the delta tally
    # must agree with featurize's lu_key, which this makes structural; the
    # optional salt exchange moves ≤512-char prefixes, not whole rows
    delta = mask_frequency_dict(with_mask_key_arrow(new, salt_partitions))
    freq = (
        delta if freq_old is None
        else freq_old.unionByName(delta).groupBy("lu_key").agg(
            F.sum("lu_count").alias("lu_count"))
    )

    feat = featurize(new, salt_partitions)
    labeled_new = with_decision(
        with_dup_flag(conversation_layout(with_mask_frequency(feat, freq)))
    )
    combined = (
        labeled_new if old_labels is None
        else old_labels.unionByName(labeled_new)
    )
    write_snapshot(combined, out_dir, "labels", config)  # THE commit point
    labels = read_snapshot(spark, out_dir, "labels")
    # refresh the derived caches, keyed to the version just committed
    new_v = snapshot_versions(out_dir, "labels")[-1]
    write_snapshot(
        labels.groupBy("lu_key").agg(F.count("*").alias("lu_count")),
        out_dir, "freq", dict(config, labels_version=new_v),
    )
    write_snapshot(
        labels.select("conv_id").distinct(),
        out_dir, "conv_index", dict(config, labels_version=new_v),
    )
    return labels, n_new


def conv_bucket_col(n_buckets: int) -> F.Column:
    """Stable conversation bucket: pmod(xxhash64(conv_id), n)."""
    return F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")


def write_labels_partitioned(
    labels: DataFrame, path: str, n_buckets: int = 256,
) -> None:
    """The 10^12-turn labels-table layout: hash-bucket conversations into
    ``n_buckets`` parquet partitions.  Per-conversation reads (inspection,
    audits, incremental reprocessing) then prune to ONE bucket directory
    instead of scanning the table — same PartitionFilters mechanism as the
    IVF layout, asserted in test_labels_bucket_pruning."""
    (
        labels.withColumn("conv_bucket", conv_bucket_col(n_buckets))
        .write.partitionBy("conv_bucket")
        .mode("overwrite")
        .parquet(path)
    )


def read_conversation(
    spark: SparkSession, path: str, conv_id: str, n_buckets: int = 256,
) -> DataFrame:
    """Point lookup against the bucketed labels layout: compute the bucket
    for ``conv_id`` (same xxhash64 expression, evaluated on a literal), read
    only that partition, then filter to the conversation."""
    bucket = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(conv_id)), F.lit(n_buckets)).cast("int").alias("b")
    ).first()["b"]
    return (
        spark.read.parquet(path)
        .filter(F.col("conv_bucket") == int(bucket))
        .filter(F.col("conv_id") == conv_id)
        .orderBy("turn_idx")
    )


# ---------------------------------------------------------------------------
# Snapshots, checkpoint/resume, metrics, lineage
# ---------------------------------------------------------------------------


def _manifest_path(out_dir: str, name: str) -> str:
    return os.path.join(out_dir, f"{name}.manifest.json")


def _load_manifest(out_dir: str, name: str) -> dict | None:
    mf = _manifest_path(out_dir, name)
    if not os.path.exists(mf):
        return None
    with open(mf) as f:
        return json.load(f)


def write_snapshot(df: DataFrame, out_dir: str, name: str, config: dict) -> str:
    """Iceberg-style versioned snapshot commit.

    Data lands in an immutable ``{name}/v{N}`` directory first; the tiny
    manifest (version log + current pointer) is atomically replaced LAST —
    the commit point.  A crash mid-write leaves the previous version current
    and the half-written directory invisible; previous versions stay
    readable (``read_snapshot(version=...)`` time travel) until expired.
    """
    man = _load_manifest(out_dir, name) or {
        "name": name, "current": 0, "versions": {},
    }
    version = int(man["current"]) + 1
    path = os.path.join(out_dir, name, f"v{version}")
    df.write.mode("overwrite").parquet(path)
    man["versions"][str(version)] = {
        "config": config,
        "schema": df.schema.simpleString(),
    }
    man["current"] = version
    tmp = _manifest_path(out_dir, name) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f, sort_keys=True)
    os.replace(tmp, _manifest_path(out_dir, name))  # atomic commit point
    return path


def read_snapshot(
    spark: SparkSession, out_dir: str, name: str, version: int | None = None,
) -> DataFrame:
    """Read a committed snapshot — the current one by default, or any prior
    version still in the log (time travel)."""
    man = _load_manifest(out_dir, name)
    if man is None or not man.get("current"):
        raise FileNotFoundError(f"no committed snapshot '{name}' in {out_dir}")
    v = int(version if version is not None else man["current"])
    if str(v) not in man["versions"]:
        raise FileNotFoundError(f"snapshot '{name}' has no version {v}")
    return spark.read.parquet(os.path.join(out_dir, name, f"v{v}"))


def snapshot_versions(out_dir: str, name: str) -> list[int]:
    man = _load_manifest(out_dir, name)
    return sorted(int(v) for v in (man or {}).get("versions", {}))


def expire_snapshots(out_dir: str, name: str, keep_last: int = 1) -> list[int]:
    """Iceberg-style maintenance: drop all but the newest ``keep_last``
    versions (data dirs deleted, log entries removed, current pointer kept).
    The current version always survives, so ``keep_last`` is clamped to ≥ 1.
    Also sweeps orphan ``v{N}`` dirs the manifest doesn't list (crashed
    expire leftovers / abandoned half-written snapshots) — like Iceberg's
    own maintenance actions, this must not run concurrently with a writer
    on the same snapshot name.  Returns the expired version ids."""
    import shutil

    keep_last = max(keep_last, 1)
    man = _load_manifest(out_dir, name)
    if man is None:
        return []
    versions = sorted(int(v) for v in man["versions"])
    expire = [v for v in versions[:-keep_last] if v != int(man["current"])]
    # manifest-first, delete-second: the manifest is the commit point, so it
    # must never list a version whose data is gone.  A crash after the
    # os.replace merely orphans data dirs; the reverse order would break
    # time travel on every surviving reader.
    for v in expire:
        man["versions"].pop(str(v), None)
    tmp = _manifest_path(out_dir, name) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f, sort_keys=True)
    os.replace(tmp, _manifest_path(out_dir, name))
    for v in expire:
        shutil.rmtree(os.path.join(out_dir, name, f"v{v}"), ignore_errors=True)
    # orphan sweep — the recovery half of manifest-first ordering: any v{N}
    # dir on disk that the committed manifest no longer (or never) lists is
    # either a crashed expire's leftover or a half-written snapshot; without
    # this, repeated crashes would leak data dirs forever.  v{current+1} is
    # EXEMPT: write_snapshot stages data there before its manifest commit,
    # so under a concurrent writer that directory is indistinguishable from
    # a crashed leftover — it is the only version a writer can be staging,
    # and a genuinely crashed v{current+1} is swept by the next expire after
    # a successful commit moves current past it.
    base = os.path.join(out_dir, name)
    live = {f"v{v}" for v in man["versions"]}
    live.add(f"v{int(man['current']) + 1}")
    if os.path.isdir(base):
        for d in os.listdir(base):
            if (d.startswith("v") and d[1:].isdigit() and d not in live
                    and os.path.isdir(os.path.join(base, d))):
                shutil.rmtree(os.path.join(base, d), ignore_errors=True)
    return expire


def snapshot_valid(out_dir: str, name: str, config: dict) -> bool:
    """True iff the CURRENT committed version was produced with ``config``."""
    man = _load_manifest(out_dir, name)
    if man is None or not man.get("current"):
        return False
    cur = man["versions"].get(str(man["current"]), {})
    return cur.get("config") == config


def _file_lineage(df: DataFrame) -> DataFrame:
    """Per source-file row counts (`input_file_name`).  Non-file inputs
    (generators, cached frames) yield a single ''-keyed row; the many-file
    pytest asserts one row per real part file."""
    return (
        df.select(F.input_file_name().alias("file"))
        .groupBy("file").agg(F.count("*").alias("rows"))
    )


def run_with_checkpoints(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    config: dict | None = None,
    salt_partitions: int | None = None,
    drop_text: bool = False,
    auto_salt: bool = True,
) -> DataFrame:
    """Resumable run: each stage materializes a snapshot; a restart reloads
    completed stages (manifest + config fingerprint match) instead of
    recomputing — the sandbox stand-in for Iceberg snapshot checkpoints.

    ``drop_text`` / ``auto_salt`` mirror :func:`quality_filter` (r7 review:
    the CLI accepted both flags but this path silently ignored them): the
    salt decision is resolved BEFORE the config fingerprint, so a resume
    whose input layout now probes differently recomputes instead of
    silently reusing a snapshot built under the other plan, and with
    ``drop_text`` the labels snapshot carries scrubbed text only (raw
    text/tool never cross the conversation exchange — same hashed dup-lag
    as quality_filter).

    r8 (ADVICE_r7 #1): the probe's full input scan is skipped on RESUME —
    when the current labels snapshot was committed with the same config
    apart from the salt, its recorded salt decision is adopted instead of
    re-scanning the input just to recompute the fingerprint.  This is a
    perf-only shortcut: re-running against a *changed* input under the same
    out_dir keeps the old (possibly suboptimal) salt but never affects
    values — the salt only places rows.  Point a new input at a new out_dir
    (or pass auto_salt=False / an explicit salt) to force a fresh decision."""
    os.makedirs(out_dir, exist_ok=True)
    if auto_salt:
        base_cfg = dict(config or {}, version=1, drop_text=drop_text)
        man = _load_manifest(out_dir, "labels")
        cur = (man or {}).get("versions", {}).get(
            str((man or {}).get("current", 0)), {})
        prev_cfg = cur.get("config")
        if prev_cfg is not None and {
            k: v for k, v in prev_cfg.items() if k != "salt"
        } == base_cfg:
            salt_partitions = prev_cfg.get("salt")  # resume: reuse decision
        else:
            target = salt_partitions or (
                spark.sparkContext.defaultParallelism * 2)
            salt_partitions = input_salt_decision(transcripts, target)
    config = dict(config or {}, version=1, salt=salt_partitions,
                  drop_text=drop_text)

    if snapshot_valid(out_dir, "featurized", config):
        feat = read_snapshot(spark, out_dir, "featurized")
    else:
        feat = featurize(transcripts, salt_partitions)
        write_snapshot(feat, out_dir, "featurized", config)
        feat = read_snapshot(spark, out_dir, "featurized")

    if snapshot_valid(out_dir, "labels", config):
        labels = read_snapshot(spark, out_dir, "labels")
        labels_resumed = True
    else:
        pre = with_mask_frequency(feat)
        if drop_text:
            # hashed dup-lag so the raw columns can be pruned before the
            # wide exchange — identical decisions (differential-tested in
            # test_drop_text_equals_default_projection)
            pre = pre.withColumn(
                "_text_h",
                F.when(F.col("text").isNotNull(), F.xxhash64("text")),
            ).drop("text", "tool")
            labels = with_decision(
                with_dup_flag_hashed(conversation_layout(pre))
            ).drop("_text_h", "lu_key")
        else:
            labels = with_decision(with_dup_flag(conversation_layout(pre)))
        write_snapshot(labels, out_dir, "labels", config)
        labels = read_snapshot(spark, out_dir, "labels")
        labels_resumed = False

    # metrics + lineage tables alongside the labels snapshot — derived
    # output, so a fully-resumed run skips rewriting them (otherwise every
    # resume would append another identical snapshot version).  Each is
    # validity-checked INDIVIDUALLY (r7 review): a crash between the
    # metrics commit and the lineage commits must leave a resumable gap,
    # not a permanently missing table.
    if not labels_resumed or not snapshot_valid(out_dir, "metrics", config):
        metrics = (
            labels.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(
                F.count("*").alias("rows"),
                F.sum(F.col("keep").cast("int")).alias("kept"),
                F.approx_count_distinct("conv_id").alias("convs"),
            )
        )
        write_snapshot(metrics, out_dir, "metrics", config)
    if not labels_resumed or not snapshot_valid(out_dir, "lineage", config):
        write_snapshot(_file_lineage(labels), out_dir, "lineage", config)
    # INPUT-file lineage: per source-file row counts over the transcripts
    # frame itself — at 100 TB the input is thousands of parquet files and
    # audits need "which file contributed which rows" against the real
    # file boundaries, not just the labels snapshot's own layout.
    if not labels_resumed or not snapshot_valid(
            out_dir, "input_lineage", config):
        write_snapshot(
            _file_lineage(transcripts), out_dir, "input_lineage", config)
    return labels
