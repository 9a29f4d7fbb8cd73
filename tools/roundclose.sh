#!/bin/bash
# Round-close recipe — run on the FINAL tree of a round, in order.
# Exists because several evidence legs are env-gated or separate mains and
# silently miss a plain `sbt test` (the r10 verdict flagged that their
# round-over-round evidence depended on the builder remembering to opt in;
# r11 added the fault legs and artifact regeneration it forgot itself).
# This script IS the memory: it runs everything the round's artifacts claim.
#
# Usage: tools/roundclose.sh            (assumes target/sf1 built; builds it if absent)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/9 unit specs (full suite)"
sbt -batch test 2>&1 | tee /tmp/roundclose_test.log
# Machine-paste the spec count into BASELINE.md's gate row (r13 verdict
# item 6: the hand-typed count drifted off by one). Parses ScalaTest's
# own summary line, so the doc can never disagree with the run.
SUMMARY=$(grep -Eo 'Tests: succeeded [0-9]+, failed [0-9]+, canceled [0-9]+' /tmp/roundclose_test.log | tail -1)
if [ -n "$SUMMARY" ]; then
  OK=$(echo "$SUMMARY" | sed -E 's/.*succeeded ([0-9]+).*/\1/')
  FAILED=$(echo "$SUMMARY" | sed -E 's/.*failed ([0-9]+).*/\1/')
  CANCELED=$(echo "$SUMMARY" | sed -E 's/.*canceled ([0-9]+).*/\1/')
  [ "$FAILED" = 0 ] || { echo "unit specs FAILED ($SUMMARY)"; exit 1; }
  perl -0pi -e "s/<!-- spec-count -->.*?<!-- \\/spec-count -->/<!-- spec-count -->$OK succeeded, $CANCELED canceled<!-- \\/spec-count -->/s" BASELINE.md
  echo "BASELINE.md spec-count <- $OK succeeded, $CANCELED canceled"
else
  echo "WARN: no ScalaTest summary line found; BASELINE.md spec-count not updated"
fi

echo "== 2/9 synth corpus (10x) for the scale legs"
[ -d target/sf1/lineitem.parquet ] || sbt -batch "runMain graft.Synth /root/testdata/sf0.1 target/sf1 10"

echo "== 3/9 env-gated scale legs (1M-event streaming state bounds + twin-beats-baseline timings)"
SPARK_GRAFT_SCALE_SPEC=1 sbt -batch "testOnly graft.ScaleOpsSpec graft.PlanShapeSpec"

echo "== 4/9 correctness gate at sf0.01"
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out

echo "== 5/9 fault injection: batch (executor SIGKILL mid-shuffle, 10x corpus) + streaming (SIGKILL mid micro-batch)"
sbt -batch package
# exclude the -tests jar: `ls | head -1` sorts it FIRST ('-' < '.'), and
# shipping it as spark.jars gives executors a jar with no app classes —
# every task then dies deserializing the DSv2 partition Seq with
# "cannot assign DefaultSerializationProxy" (r13 round-close incident)
APP_JAR=$(ls target/scala-2.13/cybersecurityiocetlspark_*.jar | grep -v -- '-tests' | head -1)
SPARK_GRAFT_JARS="$APP_JAR" SPARK_SCALA_VERSION=2.13 \
  sbt -batch "runMain graft.FaultInject target/sf1 q18_bigorders q21_waiting" 2>/dev/null \
  | grep -E '"metric"|\[fault\]' | tail -3
SPARK_GRAFT_JARS="$APP_JAR" SPARK_SCALA_VERSION=2.13 \
  sbt -batch "runMain graft.FaultInjectStream" 2>/dev/null \
  | grep -E '"metric"|\[fault-stream\]' | tail -3

echo "== 6/9 streaming throughput (1M-record replay -> extraction -> keyed sink)"
sbt -batch "runMain graft.StreamBench" 2>/dev/null | grep '"metric"' | tail -1 | tee /tmp/stream_throughput.json

echo "== 7/9 leak + copy gates (regenerate LEAKCHECK.json / COPYCHECK.json)"
python3 tools/leakcheck.py "${ROUND_NUMBER:-0}"
python3 tools/copycheck.py

echo "== 8/9 bench triple (sf0.1) + stability band"
for i in 1 2 3; do
  # SPARK_GRAFT_CPUS is EXPLICIT: graft.Bench defaults to local[4] when the
  # env is unset, and BASELINE.md's floors are calibrated at local[32] — a
  # fresh shell without the export benches ~1.5-1.7x slow and reads as a
  # phantom regression (r14 incident: 197-263 s at quiet probes).
  SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep '"metric"' | tail -1 > /tmp/roundclose_run$i.json
  cp bench_last.json /tmp/roundclose_full$i.json
done
python3 tools/stability.py /tmp/roundclose_full1.json /tmp/roundclose_full2.json /tmp/roundclose_full3.json

if [ "${ROUNDCLOSE_SF1_GATE:-0}" = 1 ]; then
  echo "== 9/9 (opt-in) full oracle gate at the 10x corpus"
  sbt -batch "runMain graft.Verify target/sf1 /tmp/verify_sf1_full"
  CHECK_DUCKDB_MEMORY=60GB CHECK_DUCKDB_TEMPDIR="$PWD/target/duck_tmp" \
    CHECK_DUCKDB_TEMPCAP=50GB \
    python3 tools/check_chunked.py target/sf1 /tmp/verify_sf1_full 25
fi

echo "== round-close complete; update COVERAGE.md/BASELINE.md from the artifacts above"
