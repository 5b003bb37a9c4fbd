#!/bin/bash
# Scaling-curve evidence for the similarity/dedup family (VERDICT r3 #5):
# run the LSH-bounded queries at sf0.001 / 0.01 / 0.1 and record wall
# times so growth exponents can be computed (documents table grows ~10x
# per step; a bucket-scoped plan should grow ~linearly in corpus size,
# never quadratically).
#
# Usage: tools/scaling_curve.sh  (from /root/repo, after sbt compile)
# Writes tools/scaling_curve_out/sf{0.001,0.01,0.1}.json
set -euo pipefail
cd "$(dirname "$0")/.."

QUERIES="q40_minhash_lsh,q42_ngram_jaccard,q48_simhash_pairs,q63_embed_neardup,q83_dedup_clusters,q85_contamination,q108_lm_quality,q109_containment"
OUT=tools/scaling_curve_out
mkdir -p "$OUT"

CP="target/scala-2.13/classes:src/main/resources:/opt/spark/jars/*"
# Spark 4 on JDK 17 outside spark-submit (same list as build.sbt)
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for SF in 0.001 0.01 0.1; do
  echo "=== sf$SF"
  SPARK_GRAFT_SF_DIR="/root/testdata/sf$SF" \
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
  SPARK_GRAFT_BENCH_OUT="$OUT/sf$SF.json" \
  java $ADDOPENS -Xmx16g -XX:ReservedCodeCacheSize=1g -Dspark.ui.enabled=false \
    -cp "$CP" graft.Bench 2>/dev/null | tail -1
done
echo "wrote $OUT/sf{0.001,0.01,0.1}.json"
