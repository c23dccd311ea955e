#!/bin/bash
# Round-12: one-corpus-family stress re-measurement. The committed 100x and
# 1000x-cold points were measured on an earlier corpus generation; the
# regenerated /tmp/sfx1000 (preserve_insertion_order=false, streamed copy)
# has a different physical row order, so cross-posture/cross-scale deltas
# were confounded. Re-measure 100x cold+warm and 1000x cold on the CURRENT
# generator so all four points (with the already-measured 1000x warm) share
# one corpus family.
set -u
cd /root/repo
echo "=== step 1: regenerate /tmp/sfx100 ==="
if [ ! -f /tmp/sfx100/lineitem.parquet ]; then
  STRESS_GEN_MEM=20GB STRESS_GEN_THREADS=16 \
    python3 scripts/make_stress_data.py /root/testdata/sf0.1 /tmp/sfx100 100 \
    > /tmp/sfx100_gen.log 2>&1 || { echo GEN_FAILED; exit 1; }
fi
echo "=== step 2: 100x COLD (fresh fingerprint -> first-write posture) ==="
SPARK_DRIVER_MEM=48g bash scripts/run_stress.sh /tmp/sfx100 r12c100
echo "=== step 3: 100x WARM (layouts pre-written by step 2) ==="
SPARK_DRIVER_MEM=48g bash scripts/run_stress.sh /tmp/sfx100 r12w100
echo "=== step 4: 1000x COLD (move layout dir aside) ==="
if [ -d /tmp/graft_build_cache/6bb22cb781fb4120 ]; then
  mv /tmp/graft_build_cache/6bb22cb781fb4120 /tmp/graft_bc_sfx1000_warm_saved
fi
SPARK_DRIVER_MEM=64g bash scripts/run_stress.sh /tmp/sfx1000 r12c1000
echo ALL_RESTRESS_DONE
