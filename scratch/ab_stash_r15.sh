#!/bin/bash
# Interleaved working-tree (B) vs HEAD (A) A/B at process level:
# alternate A B A B A B, one fresh JVM per run, print per-run timings.
# usage: ab_stash_r15.sh <entry> [reps]
set -e
cd /root/repo
ENTRY="$1"
REPS="${2:-3}"
runone() {
  python - "$ENTRY" <<'EOF' 2>/dev/null | tail -1
import sys, time
sys.path.insert(0, "/root/repo")
from gecko_spark import get_spark
spark = get_spark(cpus=32)
import __spark_entry__ as e
fn = e.queries()[sys.argv[1]]
def run():
    fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
run(); run()  # warm
runs = []
for _ in range(3):
    t0 = time.time(); run(); runs.append(time.time() - t0)
runs.sort()
print(f"min={runs[0]:.3f} med={runs[1]:.3f}")
spark.stop()
EOF
}
for i in $(seq 1 "$REPS"); do
  git stash -q
  echo "A(HEAD)  run$i: $(runone)"
  git stash pop -q
  echo "B(tree)  run$i: $(runone)"
done
