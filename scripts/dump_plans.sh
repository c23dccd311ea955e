#!/bin/bash
# Dump `.explain("formatted")` plans per query into files.
# usage: scripts/dump_plans.sh <sfDir> <outDir> <suffix> <query> [query ...]
# Runs graft.ExplainAudit (in the repo this script lives next to) and splits
# its output on the "========== <name> ==========" markers into
# <outDir>/<name>_<suffix>.txt — the plans/rNN evidence files the judge
# checks plan claims against.
set -euo pipefail
sfdir="$1"; outdir="$2"; suffix="$3"; shift 3
repo="$(cd "$(dirname "$0")/.." && pwd)"
mkdir -p "$outdir"
tmp="$(mktemp)"
(cd "$repo" && sbt -batch "runMain graft.ExplainAudit $sfdir $*" 2>/dev/null) > "$tmp"
awk -v outdir="$outdir" -v suffix="$suffix" '
  # older checkouts (pre-r17 build.sbt) wrap forked stdout in "[info] "
  { sub(/^\[info\] /, "") }
  /^========== .* ==========$/ {
    if (f) close(f)
    name = $2
    f = outdir "/" name "_" suffix ".txt"
    next
  }
  f { print > f }
' "$tmp"
rm -f "$tmp"
ls -la "$outdir" | grep "_$suffix.txt" | tail -n +1
