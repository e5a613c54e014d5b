#!/bin/bash
# Round-17 scale curves for the eight r16 operators + the r17 capstone
# (VERDICT r16 task 1). Fresh JVM per family (r14/r15 protocol):
# each sbt runMain forks its own JVM. Factors 1/4/16/64 everywhere;
# 256x for the heavies (q118 classifier, q120 KLL, q122 PageRank)
# runs as a separate pass below.
set -u
cd /root/repo
OUT=bench/scalecurve_r17_q117_q125.jsonl
: > "$OUT"
for q in q117 q118 q119 q120 q121 q122 q123 q124 q125; do
  echo "=== family $q ===" >&2
  SPARK_GRAFT_SCALE_ONLY=$q \
  SPARK_GRAFT_SCALE_FACTORS=1,4,16,64 \
  SPARK_GRAFT_SCALE_ITERS=3 \
  SPARK_GRAFT_CPUS=4 \
  sbt -batch "runMain graft.tools.ScaleCurve /root/testdata/sf0.1" \
    > "/tmp/scalecurve_r17_$q.log" 2>&1
  grep '^SCALE ' "/tmp/scalecurve_r17_$q.log" | sed 's/^SCALE //' >> "$OUT"
  grep -q '^SCALE ' "/tmp/scalecurve_r17_$q.log" \
    || echo "FAMILY $q PRODUCED NO SCALE LINES — see /tmp/scalecurve_r17_$q.log" >&2
done
echo "=== 256x heavies ===" >&2
for q in q118 q120 q122; do
  SPARK_GRAFT_SCALE_ONLY=$q \
  SPARK_GRAFT_SCALE_FACTORS=256 \
  SPARK_GRAFT_SCALE_ITERS=3 \
  SPARK_GRAFT_CPUS=4 \
  sbt -batch "runMain graft.tools.ScaleCurve /root/testdata/sf0.1" \
    > "/tmp/scalecurve_r17_${q}_256x.log" 2>&1
  grep '^SCALE ' "/tmp/scalecurve_r17_${q}_256x.log" | sed 's/^SCALE //' >> "$OUT"
  grep -q '^SCALE ' "/tmp/scalecurve_r17_${q}_256x.log" \
    || echo "FAMILY $q 256x PRODUCED NO SCALE LINES — see /tmp/scalecurve_r17_${q}_256x.log" >&2
done
echo DONE >&2
