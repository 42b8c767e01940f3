"""curation_e2e A/B runner: bench-identical thunk, 1 warm + 3 timed."""
import sys
import time

sys.path.insert(0, "/root/repo")
from gecko_spark import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def main():
    spark = get_spark(cpus=32)
    import examples.corpus_curation as cc

    def run():
        seqs, cached = cc.curate_to_sequences(spark, SF)
        try:
            seqs.write.format("noop").mode("overwrite").save()
        finally:
            for c in cached:
                c.unpersist()

    run()
    runs = []
    for _ in range(3):
        t0 = time.time()
        run()
        runs.append(time.time() - t0)
    runs.sort()
    print(f"min={runs[0]:.3f} med={runs[1]:.3f} all={[round(r,3) for r in runs]}")
    spark.stop()


if __name__ == "__main__":
    main()
