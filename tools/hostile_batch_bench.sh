#!/bin/bash
# Hostile micro-batch leg for streaming dedup (round-12 VERDICT item 6):
# BENCH_SKEW's streaming section skews the STATIC side and holds the
# stream fixed; the missing case is the identical-doc flood arriving IN
# one micro-batch. StreamBatchBench's hostile leg streams two equal-size
# batches against the same static index — one healthy, one with 50% of
# texts replaced by the SkewData identical passage — and the static side
# here is the SKEWED 10x corpus, so the flood collides with the index's
# degenerate (band,sig) bucket (capped at 64). Extends BENCH_SKEW.json
# with a "hostile_batch" section.
set -e
cd /root/repo
OUT=/tmp/skewbench
mkdir -p $OUT

if [ ! -d /tmp/graft_skew10/documents.parquet ]; then
  echo "missing /tmp/graft_skew10 — run tools/skew_bench.sh first" >&2
  exit 1
fi

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_INDEX_SF_DIR=/tmp/graft_skew10 SPARK_DRIVER_MEM=32g \
  sbt -batch "runMain graft.tools.StreamBatchBench 8" \
  > $OUT/hostile_batch.log 2>&1 || true
grep "\[sbb\]" $OUT/hostile_batch.log | tail -20

python3 - <<'EOF'
import json, re
art = json.load(open("/root/repo/BENCH_SKEW.json"))
log = open("/tmp/skewbench/hostile_batch.log").read()
legs = re.findall(r"\[sbb\] hostile-leg batch\s+(\d+):\s+(\d+) in,\s+(\d+) admitted,\s+([\d.]+) s", log)
summary = re.search(r"\[sbb\] hostile 50%-identical batch of (\d+) docs: healthy ([\d.]+) s vs hostile ([\d.]+) s \(([\d.]+)x", log)
art["hostile_batch"] = {
    "what": ("st09 admit with a 50%-byte-identical micro-batch vs a healthy "
             "batch of the same size, static side = the SkewData 10x corpus "
             "(the flood collides with the index's degenerate capped bucket). "
             "Batch-side skew cannot blow up the plan by design: the batch "
             "joins only the capped corpus index, bounding the flood at "
             "|hot docs| x bandBucketCap x nBands candidates."),
    "batches": [
        {"batch": int(b), "docs_in": int(n), "admitted": int(a), "sec": float(t)}
        for (b, n, a, t) in legs],
}
if summary:
    art["hostile_batch"]["summary"] = {
        "batch_docs": int(summary.group(1)),
        "healthy_sec": float(summary.group(2)),
        "hostile_sec": float(summary.group(3)),
        "hostile_over_healthy": float(summary.group(4)),
    }
json.dump(art, open("/root/repo/BENCH_SKEW.json", "w"), indent=1)
print("extended BENCH_SKEW.json with hostile_batch")
EOF
