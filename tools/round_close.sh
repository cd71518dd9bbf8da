#!/usr/bin/env bash
# Round-close: regenerate the round's evidence artifacts and STAGE them
# so a round can never end with its own evidence untracked (the
# r11–r14 "artifact drift" recurrence, closed per the r14 verdict).
#
#   tools/round_close.sh <round>      # e.g. tools/round_close.sh 15
#
# 1. bench at sf0.1 (BENCH_r<N>.json + BENCH_DETAIL.json refresh);
# 2. correctness dump + DuckDB replay at sf0.01 (CHECK_r<N>_sf001.json)
#    and sf0.1 (CHECK_r<N>.json);
# 3. the factor-10 full-registry gate + money-sum stability probe
#    (CHECK_SF1_FULL.json, BENCH_STABILITY_SF1.json) via gate_sf1.sh;
# 4. leak scan refresh (LEAKCHECK.json) when tools/leakcheck.py exists;
# 5. `git add` of every artifact this script regenerated.
#
# Spark mains run with plain `java` against the classes sbt last
# compiled (run `compile` first). Expect the sf1 gate to dominate
# (~40–90 min, DuckDB-side).
set -euo pipefail
cd "$(dirname "$0")/.."
R=${1:?usage: tools/round_close.sh <round-number>}
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

echo "[round_close] bench at sf0.1 -> BENCH_r$R.json" >&2
# cpus pinned to the house 32 basis: Bench's own default is 4, and
# benchtrend refuses cross-cpus compares (the r14 guard) — a
# round-close bench MUST land on the standing basis
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  java $JAVA_OPTS -cp "$CP" graft.Bench | tail -1 > "BENCH_r$R.json"

echo "[round_close] verify + oracle replay at sf0.01" >&2
java $JAVA_OPTS -cp "$CP" graft.Verify \
  /root/testdata/sf0.01 /tmp/rc_verify_sf001
/root/.pyenv/shims/python3 tools/check.py \
  /root/testdata/sf0.01 /tmp/rc_verify_sf001 "CHECK_r${R}_sf001.json"

echo "[round_close] verify + oracle replay at sf0.1" >&2
java $JAVA_OPTS -cp "$CP" graft.Verify \
  /root/testdata/sf0.1 /tmp/rc_verify_sf01
/root/.pyenv/shims/python3 tools/check.py \
  /root/testdata/sf0.1 /tmp/rc_verify_sf01 "CHECK_r$R.json"

echo "[round_close] factor-10 gate + stability probe" >&2
tools/gate_sf1.sh CHECK_SF1_FULL.json

if [ -f tools/leakcheck.py ]; then
  echo "[round_close] leak scan" >&2
  /root/.pyenv/shims/python3 tools/leakcheck.py > LEAKCHECK.json || true
fi

echo "[round_close] staging artifacts" >&2
git add -f "BENCH_r$R.json" "CHECK_r${R}_sf001.json" "CHECK_r$R.json" \
  CHECK_SF1_FULL.json BENCH_STABILITY_SF1.json
for f in BENCH_DETAIL.json LEAKCHECK.json; do
  [ -f "$f" ] && git add -f "$f"
done
git status --short | sed 's/^/[round_close] /' >&2
echo "[round_close] done — artifacts staged; commit them with the" >&2
echo "[round_close] round's final message." >&2
