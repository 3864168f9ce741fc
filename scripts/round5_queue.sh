#!/bin/bash
# Round-5 serial TPU job queue (run after the 512^3 smoke frees the chip).
# Ordered by VERDICT priority; failures don't block later jobs.
set -x
cd /root/repo

# 1. Zel'dovich-IC discard-margin sweep (VERDICT r4 missing-4): verify the
#    leaf-gap truncation hypothesis and find the margin that closes <1e-3.
#    Also the missing IC row at interlace='read'.
for M in 0.0 0.12; do
  timeout 2400 python scripts/oracle_flagship.py --n 256 --targets 256 \
    --rs-cells 2.0 --interlace read --discard-margin $M \
    --out artifacts/zeld_margin_$M.json \
    > /tmp/oracle_zeld_m$M.log 2>&1
done

# 2. (error x time) frontier, uniform state: rs 1.75 + read
#    (VERDICT r4 weak-1 / next-7).  Caps from the r4 rs-1.75 geometry.
timeout 2400 python scripts/oracle_flagship.py --n 256 --targets 256 \
  --rs-cells 1.75 --interlace read --uniform-ic \
  --open-cap 192 --p2p-cap 192 --open-cap-levels 160,96,96 \
  --out artifacts/frontier_rs175_read_uniform.json \
  > /tmp/oracle_f175u.log 2>&1

# 3. M2L-active flagship row (VERDICT r4 missing-3 / next-6): S=16 +
#    theta 1.0, segmented p2p table, m2l cap raised.
timeout 3600 python scripts/oracle_flagship.py --n 256 --targets 256 \
  --rs-cells 2.0 --leaf-size 16 --theta 1.0 --m2l-cap 256 \
  --p2p-cap 64 --p2p-passes 2 --open-cap 96 --open-cap-levels '' \
  --out artifacts/m2l_active_256.json \
  > /tmp/oracle_m2l.log 2>&1

# 4. Merger rerun at pre-sized caps (VERDICT r4 weak-3 / next-8).
timeout 2400 python scripts/run_reference_ics.py --which merger \
  > /tmp/merger_rerun.log 2>&1

# 5. Production 256^3 at FULL shipped defaults incl. the read-mode momentum
#    projection (closes the BENCH_NOTES provenance caveat) + regenerates the
#    z=0 snapshot for clustered oracle rows.
timeout 3000 python scripts/run_pk_parity.py --n 256 --sorted \
  > /tmp/run256.log 2>&1

# 6. z=0 clustered rows on the fresh snapshot: shipped rs2.0+read confirm,
#    then the rs1.75+read frontier point.
timeout 2400 python scripts/oracle_flagship.py --n 256 --targets 256 \
  --rs-cells 2.0 --interlace read --snapshot artifacts/pk256_1.0000.0 \
  --out artifacts/z0_rs20_read_postproj.json \
  > /tmp/oracle_z020.log 2>&1
timeout 2400 python scripts/oracle_flagship.py --n 256 --targets 256 \
  --rs-cells 1.75 --interlace read --snapshot artifacts/pk256_1.0000.0 \
  --open-cap 192 --p2p-cap 192 --open-cap-levels 160,96,96 \
  --out artifacts/frontier_rs175_read_z0.json \
  > /tmp/oracle_f175z.log 2>&1

echo QUEUE_DONE
