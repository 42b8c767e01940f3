"""Job-level attribution of dedup_transitive at sf0.1 (round 15 §1.5):
label phases via setJobDescription, then read per-job wall times from
the Spark UI REST API."""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F  # noqa: E402

from gecko_spark import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def main():
    spark = get_spark(cpus=32, extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    from gecko_spark.operators.dedup import minhash_dedupe_transitive
    from gecko_spark.sources.testdata import load_table

    def run(tag):
        docs = load_table(spark, SF, "documents")
        sc.setJobDescription(f"{tag}")
        out = minhash_dedupe_transitive(
            docs, "doc_id", "text", threshold=0.8, num_hashes=64, bands=16,
            on_nonconvergence="raise",
        )
        out.write.format("noop").mode("overwrite").save()
        sc.setJobDescription(None)

    t0 = time.time(); run("warm0"); print("warm0", round(time.time() - t0, 3))
    t0 = time.time(); run("warm1"); print("warm1", round(time.time() - t0, 3))
    t0 = time.time(); run("timed"); total = time.time() - t0
    print("timed total", round(total, 3))

    ui = sc.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app = apps[0]["id"]
    jobs = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs?status=succeeded")
    )
    rows = []
    for j in jobs:
        if j.get("description") != "timed":
            continue
        st = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        ct = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        # sub-second precision from the GMT strings' fraction part
        def frac(s):
            return float("0." + s.split(".")[1][:3]) if "." in s else 0.0
        dur = (time.mktime(ct) + frac(j["completionTime"])) - (
            time.mktime(st) + frac(j["submissionTime"])
        )
        rows.append((j["jobId"], round(dur, 3), j["numTasks"], j["name"][:90]))
    rows.sort()
    prev_end = None
    for jid, dur, ntasks, name in rows:
        print(f"job {jid:4d}  {dur:7.3f}s  tasks={ntasks:5d}  {name}")
    print("sum job durations:", round(sum(r[1] for r in rows), 3), "vs wall", round(total, 3))
    spark.stop()


if __name__ == "__main__":
    main()
