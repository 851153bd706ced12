"""Interleaved A/B: Arrow-return-pruned scrub (r7) vs the previous wiring.

The r7 change stops two payloads from crossing the Arrow boundary in the
featurize stage:

* flag-1 (ASCII candidate) rows: the JVM-scrubbed text used to ride INTO
  the UDF as the ``scrub_pre`` argument and come straight back OUT as
  ``scrubbed_text``; it is now a JVM-side column composited after the UDF.
* flag-2 (non-ASCII) identity rows: ``scrub_series`` returned the full
  unchanged text, re-shipping the corpus on the return path; the sparse
  kernel returns None for identities and the JVM coalesce restores them.

This script measures both variants on two corpora — the ASCII-dominated
default mix (flag-2 rare; tests the compare-overhead side) and the
multilang mix (~50% non-ASCII; tests the payload-saving side) — with the
OLD wiring reconstructed locally so both legs run interleaved inside ONE
session (noisy-neighbor methodology per BENCH/NOTES.md), min-of-N,
cache cleared between reps.

Usage: python scripts/ab_scrub_sparse.py [n_convs] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _featurize_old(df):
    """The pre-change featurize wiring (r6 shape), reconstructed verbatim
    for measurement only: scrub_pre ships through the UDF, flag-2 rows use
    the dense scrub_series."""
    from pyspark.sql import functions as F

    from bytefreq_spark.langid import detect_language
    from bytefreq_spark.perplexity import perplexity
    from bytefreq_spark.pipeline import FEATURE_SCHEMA
    from bytefreq_spark.quality import text_features
    from bytefreq_spark.scrub import _TOX_STEMS, scrub_col, scrub_series

    @F.pandas_udf(FEATURE_SCHEMA)
    def feats(text: pd.Series, scrub_pre: pd.Series,
              scrub_flag: pd.Series) -> pd.DataFrame:
        f = text_features(text).drop(columns=["n_chars"])
        f.loc[text.isna(), "lu_key"] = None
        f["lang"] = detect_language(text)
        f["ppl"] = perplexity(text)
        flag = scrub_flag.to_numpy()
        scr = pd.Series(
            np.full(len(text), None, dtype=object), index=text.index)
        jvm = flag == 1
        if jvm.any():
            scr[jvm] = scrub_pre[jvm]
        py = flag == 2
        if py.any():
            scr[py] = scrub_series(text[py])
        f["scrubbed_text"] = scr
        return f[[fld.name for fld in FEATURE_SCHEMA.fields]]

    df = df.repartition(CPUS * 2)
    df = df.withColumn(
        "n_chars", F.coalesce(F.length("text"), F.lit(0)).cast("long"))
    ascii_ok = F.length("text") == F.octet_length("text")
    cand = F.col("text").rlike("[0-9@]")
    lowered = F.lower(F.col("text"))
    for stem in _TOX_STEMS:
        cand = cand | lowered.contains(stem)
    scrub_flag = (
        F.when(ascii_ok & ~cand, F.lit(0))
        .when(ascii_ok, F.lit(1))
        .otherwise(F.lit(2))
    ).cast("int")
    scrub_pre = F.when(ascii_ok & cand, scrub_col(F.col("text")))
    return (
        df.withColumn("_f", feats(F.col("text"), scrub_pre, scrub_flag))
        .select("*", "_f.*").drop("_f")
        .withColumn("scrubbed_text", F.coalesce("scrubbed_text", "text"))
    )


def main():
    from bytefreq_spark.pipeline import featurize
    from bytefreq_spark.session import get_spark
    from bytefreq_spark.synth import MULTILANG_KINDS, gen_transcripts_spark

    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    spark = get_spark("ab-scrub-sparse", cores=CPUS, shuffle_partitions=CPUS)
    root = tempfile.mkdtemp(prefix="bytefreq_ab_scrub_")
    corpora = {}
    for name, kw in (("default", {}), ("multilang", dict(kinds=MULTILANG_KINDS))):
        path = os.path.join(root, name)
        gen_transcripts_spark(spark, n_convs, partitions=CPUS, **kw).write.mode(
            "overwrite").parquet(path)
        corpora[name] = (path, spark.read.parquet(path).count())

    variants = {
        "old": lambda df: _featurize_old(df),
        "new": lambda df: featurize(df, CPUS * 2),
    }

    def run_once(corpus: str, variant: str) -> float:
        spark.catalog.clearCache()
        df = spark.read.parquet(corpora[corpus][0]).cache()
        df.count()
        t0 = time.time()
        variants[variant](df).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for _ in range(2):  # JIT warm-up on both shapes
        run_once("default", "new")
        run_once("default", "old")

    cells = [(c, v) for c in corpora for v in variants]
    walls = {cell: [] for cell in cells}
    for r in range(rounds):
        order = cells[r % len(cells):] + cells[: r % len(cells)]
        for cell in order:
            walls[cell].append(run_once(*cell))
        print(f"round {r + 1}/{rounds} load={os.getloadavg()[0]:.1f} "
              + " ".join(f"{c}/{v}:{walls[(c, v)][-1]:.2f}s"
                         for c, v in order), flush=True)

    out = {"n_convs": n_convs, "rounds": rounds,
           "loadavg": round(os.getloadavg()[0], 2), "results": {}}
    for corpus, (path, n_turns) in corpora.items():
        o = min(walls[(corpus, "old")])
        n = min(walls[(corpus, "new")])
        out["results"][corpus] = {
            "n_turns": n_turns,
            "old_min_sec": round(o, 3), "new_min_sec": round(n, 3),
            "speedup": round(o / n, 3),
            "new_turns_per_sec": round(n_turns / n, 1),
        }
    print(json.dumps(out))
    spark.stop()
    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
