#!/bin/bash
# r17 follow-up: the first 64x pass for q117/q118/q119/q121 overlapped
# an sf0.01 Verify run on the same host (iteration arrays show the
# mid-run escalation signature), so re-measure those four 64x points
# in fresh quiet JVMs — the r14/r15 "re-measure surprises in a fresh
# JVM" protocol. Appends to the same jsonl; SCALECURVE.md cites these
# rows for the contaminated points.
set -u
cd /root/repo
OUT=bench/scalecurve_r17_remeasure64.jsonl
: > "$OUT"
for q in q117 q118 q119 q121; do
  echo "=== remeasure $q @64x ===" >&2
  SPARK_GRAFT_SCALE_ONLY=$q \
  SPARK_GRAFT_SCALE_FACTORS=64 \
  SPARK_GRAFT_SCALE_ITERS=3 \
  SPARK_GRAFT_CPUS=4 \
  sbt -batch "runMain graft.tools.ScaleCurve /root/testdata/sf0.1" \
    > "/tmp/scalecurve_r17_${q}_re64.log" 2>&1
  grep '^SCALE ' "/tmp/scalecurve_r17_${q}_re64.log" | sed 's/^SCALE //' >> "$OUT"
  grep -q '^SCALE ' "/tmp/scalecurve_r17_${q}_re64.log" \
    || echo "FAMILY $q PRODUCED NO SCALE LINES — see /tmp/scalecurve_r17_${q}_re64.log" >&2
done
echo DONE >&2
