#!/bin/bash
# Quiet-box sf10 SOLO anchor runs (r14 verdict ask #1): one Bench
# invocation per heavy-hitter query against /tmp/sf10, each with its
# own calibration row, appended to a scratch history (solo runs are
# "filtered":true and must never baseline the driver gate). Run ONLY
# on a drained box: check `uptime` 5/15-min load first.
# Since round 16 each row carries BOTH calibration readings
# (cal_cpu before the timed runs, cal_cpu_post after) and the
# contended flag fires on either — a burst arriving after the pre-run
# window (the r15 pass-8 d15 shape) no longer reads clean.
# Usage: tools/anchor_sf10.sh [outdir] [query ...]
set -u
OUTDIR=${1:-/tmp/anchor_r16}
shift || true
QUERIES=${@:-d2_minhash_lsh d12_dedup_pipeline d15_lsh_recall \
  d4_ngram_jaccard d9_semantic_dedup v11_ann_fitted v6_ann_pq \
  k15_time_travel i1_ingest_pipeline}
mkdir -p "$OUTDIR"
cd /root/repo
OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
  java.net java.nio java.util java.util.concurrent \
  java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
  sun.security.action sun.util.calendar; do
  echo --add-opens java.base/$p=ALL-UNNAMED; done)
for q in $QUERIES; do
  sync; sleep 2
  echo "== $q $(date +%H:%M:%S) load=$(cut -d' ' -f1-3 /proc/loadavg)"
  SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_CPUS=32 \
  BENCH_CAL_INTERLEAVE=1 \
  BENCH_OUT="$OUTDIR/$q.json" BENCH_HISTORY="$OUTDIR/history.jsonl" \
  java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Xmx60g -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Bench "$q" 2>"$OUTDIR/$q.stderr" | tail -1
  grep -E "calibration|noise retry|CONTENDED|INDETERMINATE|RE-DERIVE" \
    "$OUTDIR/$q.stderr" || true
done
# cross-attempt-disagreement arbiter (r16 verdict ask #2): stamp every
# history row clean/disputed/best-effort and print the per-query
# machine-readable verdicts — the final arbiter as an artifact field,
# not a hand-read table
java $OPENS -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.bench.AnchorArbiter "$OUTDIR/history.jsonl" || true
