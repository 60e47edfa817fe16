#!/usr/bin/env bash
# Fresh-JVM-per-workload scale-trend capture: each workload's three size
# points run in their OWN spark-submit JVM, so late workloads don't pay
# an hour-old JVM's JIT/GC aging (measured: the single-JVM r5 capture
# read scc's base point 1.8x slower than the same binary fresh). Parts
# land in $PART_DIR and are merged into scale_trend.json by
# graft.MergeTrend, which refuses mixed-protocol merges.
set -euo pipefail
cd "$(dirname "$0")/.."
PART_DIR="${SPARK_GRAFT_TREND_PART_DIR:-/tmp/graft_trend_parts}"
WORKLOADS="pagerank cc lpa triangles scc dedup_clusters_minhash dedup_pairs_exact_baseline"
mkdir -p "$PART_DIR"
parts=()
for w in $WORKLOADS; do
  echo "=== trend workload: $w (fresh JVM) ==="
  SPARK_GRAFT_TREND_ONLY="$w" \
  SPARK_GRAFT_TREND_OUT="$PART_DIR/$w.json" \
    bin/spark-submit-bench.sh graft.ScaleTrend
  parts+=("$PART_DIR/$w.json")
done
bin/spark-submit-bench.sh graft.MergeTrend scale_trend.json "${parts[@]}"
