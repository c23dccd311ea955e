#!/bin/bash
# Chunked stress bench runner (round 11): runs the registry minus the three
# output-quadratic expanded-contract rows in family chunks, one Bench JVM
# per chunk, so a single pathological query can't stall the whole point and
# per-chunk artifacts survive. Usage: run_stress.sh <sfdir> <tag> [chunkdir]
set -u
SF=${1:?sfdir}
TAG=${2:?tag}
CH=${3:-/tmp/chunks}
mkdir -p /tmp/stress_$TAG
for f in "$CH"/*.txt; do
  name=$(basename "$f" .txt)
  out=/tmp/stress_$TAG/$name.json
  [ -s "$out" ] && { echo "skip $name (exists)"; continue; }
  echo "=== chunk $name ($(wc -w < "$f") queries) @ $SF ==="
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=32 GRAFT_BENCH_OUT=$out \
    SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g} \
    timeout 3600 sbt -batch "runMain graft.Bench $(cat "$f")" \
    > /tmp/stress_$TAG/$name.log 2>&1
  echo "chunk $name rc=$? $(tail -c 300 "$out" 2>/dev/null | head -c 120)"
done
echo ALL_CHUNKS_DONE
