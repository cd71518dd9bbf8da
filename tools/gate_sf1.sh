#!/usr/bin/env bash
# One-command factor-10 full-registry oracle gate (CHECK_SF1_FULL):
#
#   tools/gate_sf1.sh [out_json]      # default CHECK_SF1_FULL.json
#
# 1. regenerates /tmp/graft_sf1-{verbatim,iso} via one cheap
#    BenchScale probe (idempotent — the _GEN_OK marker skips the
#    write when the dirs already exist);
# 2. dumps every registered query against the iso dir (graft.Verify);
# 3. replays every oracle in DuckDB over the same dir with the 900 s
#    per-query watchdog and writes the machine-readable result.
#
# The Spark mains run with plain `java` against the classes sbt last
# compiled, so this script never fights a live sbt shell over
# target/ — run `compile` in the shell first if sources changed.
# Expect ~40–90 min, nearly all DuckDB-side (BASELINE.md §comparison
# recipe references this script).
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-CHECK_SF1_FULL.json}
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
JAVA_OPTS="$ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-24g} -Xms8g
  -XX:+UseParallelGC -Dspark.ui.enabled=false
  -Dspark.sql.session.timeZone=UTC"
echo "[gate_sf1] (re)generating /tmp/graft_sf1-{verbatim,iso}" >&2
SPARK_GRAFT_ONLY=sessionize SPARK_GRAFT_SF1_DIR=/tmp/graft_sf1 \
  SPARK_GRAFT_OUT=/tmp/BENCH_SF1_GEN.json \
  java $JAVA_OPTS -cp "$CP" graft.BenchScale >/dev/null
echo "[gate_sf1] dumping the full registry at /tmp/graft_sf1-iso" >&2
java $JAVA_OPTS -cp "$CP" graft.Verify \
  /tmp/graft_sf1-iso /tmp/graft_sf1_verify
echo "[gate_sf1] DuckDB oracle replay (900 s/query watchdog)" >&2
GRAFT_CHECK_TIMEOUT_S=900 /root/.pyenv/shims/python3 tools/check.py \
  /tmp/graft_sf1-iso /tmp/graft_sf1_verify "$OUT"
# r14 standing sweep: merge-order determinism of every integer-cent
# money/value sum — two SparkSessions with different shuffle
# geometries must produce byte-identical rows (the agg_rollup class
# is caught the round it lands, not at a factor-100 oracle run).
echo "[gate_sf1] money-sum stability probe (shuffle 7 vs 32)" >&2
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} java $JAVA_OPTS -cp "$CP" \
  graft.BenchStability /tmp/graft_sf1-iso \
  q1_agg,q5_local_supplier,q6_revenue,q9_profit,cohort_ltv,win_lag_delta,unpivot_metrics,regr_trend,agg_rollup,agg_cube,win_hopping,win_moving_avg,stream_window_counts \
  BENCH_STABILITY_SF1.json
