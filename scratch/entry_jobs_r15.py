"""Job-level attribution of any __spark_entry__ query at sf0.1
(round 15 §1.5): usage  python entry_jobs_r15.py <entry> [<entry>...]"""
import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from gecko_spark import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def frac(s):
    return float("0." + s.split(".")[1][:3]) if "." in s else 0.0


def main():
    names = sys.argv[1:]
    spark = get_spark(cpus=32, extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    import __spark_entry__ as e

    qs = e.queries()
    ui = sc.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]

    for name in names:
        fn = qs[name]

        def run(tag):
            sc.setJobDescription(tag)
            fn(spark, SF).write.format("noop").mode("overwrite").save()
            sc.setJobDescription(None)

        for w in range(2):
            t0 = time.time()
            run(f"warm{w}_{name}")
            print(name, f"warm{w}", round(time.time() - t0, 3))
        t0 = time.time()
        run(f"timed_{name}")
        total = time.time() - t0
        print(name, "timed", round(total, 3))
        jobs = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/jobs?status=succeeded"
            )
        )
        rows = []
        for j in jobs:
            if j.get("description") != f"timed_{name}":
                continue
            st = time.mktime(
                time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            ) + frac(j["submissionTime"])
            ct = time.mktime(
                time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            ) + frac(j["completionTime"])
            rows.append((j["jobId"], round(ct - st, 3), j["numTasks"], j["name"][:80]))
        rows.sort()
        for jid, dur, ntasks, jname in rows:
            print(f"  job {jid:4d}  {dur:7.3f}s  tasks={ntasks:5d}  {jname}")
        print(f"  sum {round(sum(r[1] for r in rows), 3)} vs wall {round(total, 3)}")
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
