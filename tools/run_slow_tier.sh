#!/usr/bin/env bash
# Run the slow test tier in chunks so a stale golden or broken slow test
# can't hide for rounds (VERDICT r2 weak-item 10). Usage:
#   tools/run_slow_tier.sh         # all chunks
#   tools/run_slow_tier.sh 2       # just chunk 2 (of 3)
set -uo pipefail
cd "$(dirname "$0")/.."

# Chunks grouped by subsystem so each stays under ~15 min on 2 CPUs.
CHUNK1="tests/test_sw_core.py tests/test_atm_core.py tests/test_atm_distributed.py tests/test_distributed.py tests/test_parity_dycore.py tests/test_atm_mtn_wave.py tests/test_atm_regional.py tests/test_driver.py"
CHUNK2="tests/test_ocean_core.py tests/test_ocean_ztilde.py tests/test_ocean_bgc.py tests/test_ocean_land_ice_flux.py tests/test_ocean_init_configs.py tests/test_ocean_analysis.py tests/test_ocean_gm.py tests/test_ocean_kpp.py tests/test_ocean_vmix_eos.py tests/test_ocean_particles.py tests/test_ocean_tracer_extras.py tests/test_ocean_forcing.py"
CHUNK3=""  # everything else (seaice, landice, physics, framework, ops)

run_chunk() {
  local n="$1"; shift
  echo "=== slow tier chunk $n ==="
  if [ "$n" = 3 ]; then
    # chunk 3 = all slow tests not in chunks 1/2
    python -m pytest tests/ -q -m slow \
      --ignore=tests/test_sw_core.py --ignore=tests/test_atm_core.py \
      --ignore=tests/test_atm_distributed.py --ignore=tests/test_distributed.py \
      --ignore=tests/test_parity_dycore.py --ignore=tests/test_atm_mtn_wave.py \
      --ignore=tests/test_atm_regional.py --ignore=tests/test_driver.py \
      --ignore=tests/test_ocean_core.py --ignore=tests/test_ocean_ztilde.py \
      --ignore=tests/test_ocean_bgc.py --ignore=tests/test_ocean_land_ice_flux.py \
      --ignore=tests/test_ocean_init_configs.py --ignore=tests/test_ocean_analysis.py \
      --ignore=tests/test_ocean_gm.py --ignore=tests/test_ocean_kpp.py \
      --ignore=tests/test_ocean_vmix_eos.py --ignore=tests/test_ocean_particles.py \
      --ignore=tests/test_ocean_tracer_extras.py --ignore=tests/test_ocean_forcing.py
  else
    local files; eval "files=\$CHUNK$n"
    python -m pytest $files -q -m slow
  fi
}

if [ $# -ge 1 ]; then
  run_chunk "$1"
else
  rc=0
  for n in 1 2 3; do run_chunk "$n" || rc=1; done
  exit $rc
fi
