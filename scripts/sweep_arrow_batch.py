"""Interleaved sweep of spark.sql.execution.arrow.maxRecordsPerBatch on the
flagship quality-filter job (VERDICT_r6 #1: the named, never-swept lever).

The batch size controls Arrow transfer granularity into the featurize pandas
UDF: small batches pay per-batch overhead (serialization framing, kernel
fixed costs — the flat-buffer kernels amortize over rows), large batches
reduce pipelining between the JVM producer and the Python worker and grow
peak memory per worker.  The sweep interleaves all sizes inside ONE session
round-robin (this host's noisy neighbors make sequential A/B worthless —
BENCH/NOTES.md), min-of-N per size, cache cleared + re-established between
reps so CacheManager can't serve a previous rep's internal persist.

Usage: python scripts/sweep_arrow_batch.py [n_convs] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [2_000, 5_000, 10_000, 20_000, 50_000]
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from bytefreq_spark.pipeline import quality_filter
    from bytefreq_spark.session import get_spark
    from bytefreq_spark.synth import gen_transcripts_spark

    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    spark = get_spark("arrow-batch-sweep", cores=CPUS,
                      shuffle_partitions=CPUS)
    root = tempfile.mkdtemp(prefix="bytefreq_arrow_sweep_")
    path = os.path.join(root, "corpus")
    gen_transcripts_spark(spark, n_convs, partitions=CPUS).write.mode(
        "overwrite").parquet(path)
    n_turns = spark.read.parquet(path).count()

    def run_once(batch: int) -> float:
        spark.catalog.clearCache()
        df = spark.read.parquet(path).cache()
        df.count()
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                       str(batch))
        t0 = time.time()
        quality_filter(df, salt_partitions=CPUS * 2).write.format(
            "noop").mode("overwrite").save()
        return time.time() - t0

    # warm-up (JIT through the wide codegen'd plan takes ~4 executions)
    for _ in range(3):
        run_once(10_000)

    walls: dict[int, list[float]] = {s: [] for s in SIZES}
    for r in range(rounds):
        order = SIZES[r % len(SIZES):] + SIZES[:r % len(SIZES)]  # rotate
        for s in order:
            walls[s].append(run_once(s))
        print(f"round {r + 1}/{rounds} load={os.getloadavg()[0]:.1f} "
              + " ".join(f"{s}:{walls[s][-1]:.2f}s" for s in order),
              flush=True)

    out = {
        "n_turns": n_turns,
        "rounds": rounds,
        "loadavg": round(os.getloadavg()[0], 2),
        "results": {
            str(s): {
                "min_sec": round(min(w), 3),
                "all_sec": [round(x, 3) for x in w],
                "turns_per_sec_at_min": round(n_turns / min(w), 1),
            }
            for s, w in walls.items()
        },
    }
    print(json.dumps(out))
    spark.stop()
    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
