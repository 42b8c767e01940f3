"""Stage-level profile of curate_to_sequences at sf0.1 (round 15 §1
measure-first): 1 warmup + 2 timer-mode runs, per-stage wall seconds."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from gecko_spark import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run(spark, timers):
    import examples.corpus_curation as cc

    t0 = time.time()
    seqs, cached = cc.curate_to_sequences(spark, SF, timers=timers)
    try:
        seqs.write.format("noop").mode("overwrite").save()
        timers["final_scan"] = round(time.time() - t0 - sum(timers.values()), 3)
    finally:
        for c in cached:
            c.unpersist()
    return time.time() - t0


def main():
    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    try:
        # warmup (non-timer shape, same as bench)
        import examples.corpus_curation as cc

        seqs, cached = cc.curate_to_sequences(spark, SF)
        seqs.write.format("noop").mode("overwrite").save()
        for c in cached:
            c.unpersist()
        for i in range(2):
            timers = {}
            total = run(spark, timers)
            print(f"RUN {i}: total={total:.3f}  " + "  ".join(
                f"{k}={v}" for k, v in timers.items()))
            sys.stdout.flush()
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
