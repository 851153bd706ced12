"""Stage-level attribution for minhash_near_dups at sf0.1 (VERDICT r3 #3):
is the wall in the signature kernel (the thing the r3 vectorization sped up
2.8x) or in the LSH band self-join + similarity agg?

Methodology: min-of-N per stage, interleaved in ONE process (separate runs
on this host vary +/-60%), cache cleared between reps so nothing is served
from CacheManager.  Stages:

  sigs      — minhash_signatures(docs) materialized (kernel + scan)
  sigs_only — same but text pre-cached, isolating the Arrow kernel
  pairs     — banded self-join + hot-bucket cap from PRE-MATERIALIZED sigs
  sim       — signature-agreement similarity from pre-materialized pairs+sigs
  full      — the whole query (the bench row)

Prints one JSON line; paste the numbers into BENCH/NOTES or the round doc.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("REPS", "3"))


def main():
    from pyspark.sql import functions as F

    from bytefreq_spark.dedup import (
        lsh_candidate_pairs, minhash_near_dups, minhash_signatures,
        minhash_similarity,
    )
    from bytefreq_spark.session import get_spark

    spark = get_spark("minhash-profile", cores=CPUS,
                      shuffle_partitions=max(CPUS, 16))

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    # warm-up: python worker pool + codegen
    @F.pandas_udf("double")
    def _warm(s):
        return s * 1.0

    spark.range(100000, numPartitions=CPUS).select(
        F.sum(_warm(F.col("id").cast("double")))).collect()

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()

    out = {"sf_dir": SF_DIR, "cpus": CPUS, "n_docs": n_docs}
    walls: dict[str, list[float]] = {k: [] for k in
                                     ("sigs", "pairs", "sim", "full")}

    # pre-materialize signatures once for the pairs/sim stages
    sig_dir = f"/tmp/minhash_prof_sigs_{os.getpid()}"
    minhash_signatures(docs).write.mode("overwrite").parquet(sig_dir)

    for _rep in range(REPS):
        spark.catalog.clearCache()

        t0 = time.time()
        mat(minhash_signatures(docs))
        walls["sigs"].append(time.time() - t0)

        sigs = spark.read.parquet(sig_dir)
        t0 = time.time()
        pairs = lsh_candidate_pairs(sigs, "doc_id", 16, 4, max_bucket=64)
        mat(pairs)
        walls["pairs"].append(time.time() - t0)

        t0 = time.time()
        sim = minhash_similarity(
            lsh_candidate_pairs(sigs, "doc_id", 16, 4, max_bucket=64),
            sigs, "doc_id")
        mat(sim.filter(F.col("est_jaccard") >= 0.5))
        walls["sim"].append(time.time() - t0)

        spark.catalog.clearCache()
        t0 = time.time()
        mat(minhash_near_dups(docs, threshold=0.5))
        walls["full"].append(time.time() - t0)

    for k, v in walls.items():
        out[k] = {"min": round(min(v), 3),
                  "all": [round(x, 3) for x in v]}
    # sim includes the pairs join again; the incremental similarity cost is
    # sim - pairs (both from materialized sigs)
    out["attribution"] = {
        "kernel_pct_of_full": round(
            100 * out["sigs"]["min"] / out["full"]["min"], 1),
        "join_pct_of_full": round(
            100 * out["pairs"]["min"] / out["full"]["min"], 1),
    }
    import shutil

    shutil.rmtree(sig_dir, ignore_errors=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
