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
# A chunk is "done" only if its artifact parses as JSON AND carries every
# query named in the chunk file (in queries or errors) — a partially
# written artifact from a killed run, or one from an older chunk
# definition, must re-run, not be silently reused.
chunk_ok() { python3 - "$1" "$2" <<'EOF'
import json, sys
try:
    d = json.load(open(sys.argv[1]))
    want = set(open(sys.argv[2]).read().split())
    have = set(d.get("queries", {})) | set(d.get("errors", {}))
    sys.exit(0 if want <= have else 1)
except Exception:
    sys.exit(1)
EOF
}
for f in "$CH"/*.txt; do
  name=$(basename "$f" .txt)
  out=/tmp/stress_$TAG/$name.json
  if [ -s "$out" ]; then
    if chunk_ok "$out" "$f"; then echo "skip $name (valid artifact)"; continue
    else echo "re-run $name (stale/partial artifact)"; rm -f "$out"; fi
  fi
  echo "=== chunk $name ($(wc -w < "$f") queries) @ $SF ==="
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=32 GRAFT_BENCH_OUT=$out \
    SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g} \
    timeout "${STRESS_CHUNK_TIMEOUT:-3600}" sbt -batch "runMain graft.Bench $(cat "$f")" \
    > /tmp/stress_$TAG/$name.log 2>&1
  rc=$?
  if [ $rc -ne 0 ] && ! chunk_ok "$out" "$f"; then
    echo "chunk $name FAILED rc=$rc (artifact removed)"; rm -f "$out"
  else
    echo "chunk $name rc=$rc $(tail -c 300 "$out" 2>/dev/null | head -c 120)"
  fi
done
echo ALL_CHUNKS_DONE
