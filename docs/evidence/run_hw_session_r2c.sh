#!/bin/bash
# Serialized hardware session (r2c): run ONLY after the r2b quality run and
# the CPU suite are done (benches concurrent with other load are garbage —
# CLAUDE.md). Usage: nohup bash docs/evidence/run_hw_session_r2c.sh &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# 1. step breakdown incl. RegNet depth ladder + pool/resize isolates
python -u docs/evidence/bench_step_breakdown_r2.py \
  > docs/evidence/bench_step_breakdown_r2c.log 2>&1

# 2. official bench sanity (same methodology the driver uses)
python -u bench.py > docs/evidence/bench_official_r2c.log 2>&1

echo DONE
