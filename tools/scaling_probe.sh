#!/bin/bash
# Parallel-scaling probe (r18, VERDICT r17 #2): at sf0.1 every bench
# query is fixture/fixed-cost-bound, so core count cannot show — the
# driver's suspect_cpus heuristic reads that as "serial engine". This
# probe demonstrates the engine's actual parallel scaling by amplifying
# sf0.1 tenfold (graft.tools.Amplify — deterministic, norm/structure-
# preserving) and solo-benching three compute-heavy families at 8 vs 32
# cores with the STANDARD bench protocol (min-of-3 interleaved, noop
# sink, SPARK_GRAFT_CPUS feeding both master and shuffle partitions).
#
# Usage: tools/scaling_probe.sh  (from /root/repo, after sbt compile)
# Writes tools/scaling_curve_out/probe${FACTOR}x_c{8,32}.json; the summary
# table lands in BASELINE.md.
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=tools/scaling_curve_out
FACTOR="${FACTOR:-40}"
AMP="/tmp/graft_sfx$FACTOR"
QUERIES="q96_percentile_cont,q150_ivf_pq,q42_ngram_jaccard"

CP="target/scala-2.13/classes:src/main/resources:/opt/spark/jars/*"
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done

if [ ! -d "$AMP/documents.parquet" ]; then
  echo "=== amplifying sf0.1 x$FACTOR -> $AMP"
  java $ADDOPENS -Xmx16g -Dspark.ui.enabled=false -cp "$CP" \
    graft.tools.Amplify /root/testdata/sf0.1 "$AMP" "$FACTOR" 2>/dev/null | tail -1
fi

for C in 8 32; do
  echo "=== $C cores"
  SPARK_GRAFT_SF_DIR="$AMP" \
  SPARK_GRAFT_CPUS="$C" \
  SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
  SPARK_GRAFT_BENCH_OUT="$OUT/probe${FACTOR}x_c$C.json" \
  java $ADDOPENS -Xmx24g -XX:ReservedCodeCacheSize=1g -Dspark.ui.enabled=false \
    -cp "$CP" graft.Bench 2>/dev/null | tail -1
done
echo "wrote $OUT/probe${FACTOR}x_c{8,32}.json"
