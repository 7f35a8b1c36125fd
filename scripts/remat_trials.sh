#!/bin/bash
# A/B the TPU remat-compression flags against the Step1X@704px int8
# full-size `_rest` program, compile-only (docs/KERNELS.md §5).  Each
# trial prints one JSON line (memory analysis + .remat_compressed
# counts) to stdout and appends to REMAT_TRIALS.jsonl.
#
# Run on the real chip (compiles go to the remote compiler; nothing
# executes, so the ~60 s execution watchdog does not apply).  ~1-2 min
# per trial with a warm compile server.
set -u
cd "$(dirname "$0")/.."
OUT=REMAT_TRIALS.jsonl
PROBE="python scripts/probe_rest_memory.py --dd 19 --ds 38 --grid 44 \
       --t-txt 128 --cap 512 --cache-int8 --count-remat"

trial() {  # trial '<json or empty>'
  local opts="$1"
  echo "=== REGIONE_COMPILER_OPTIONS=${opts:-<unset>}" >&2
  if [ -z "$opts" ]; then
    env -u REGIONE_COMPILER_OPTIONS timeout 900 $PROBE 2>/dev/null | tail -1 | tee -a "$OUT"
  else
    REGIONE_COMPILER_OPTIONS="$opts" timeout 900 $PROBE 2>/dev/null | tail -1 | tee -a "$OUT"
  fi
}

trial ''
trial '{"xla_tpu_user_reserved_hbm_bytes": "0"}'
trial '{"xla_tpu_max_hbm_size_mib": "17408"}'
trial '{"xla_tpu_rematerialization_min_size_in_bytes": "100000000"}'
trial '{"xla_tpu_rematerialization_algo": "LINEAR_ORDER_MIP"}'
trial '{"xla_tpu_scheduler_percent_shared_memory_limit": "110"}'
# second wave: scheduler-side memory slack + combinations of the above
# (a rejected flag name costs one empty trial line, nothing else)
trial '{"xla_jf_rematerialization_percent_shared_memory_limit": "110"}'
trial '{"xla_tpu_rematerialization_percent_shared_memory_limit": "110"}'
trial '{"xla_tpu_rematerialization_min_size_in_bytes": "100000000", "xla_tpu_scheduler_percent_shared_memory_limit": "110"}'
trial '{"xla_tpu_user_reserved_hbm_bytes": "0", "xla_tpu_rematerialization_min_size_in_bytes": "100000000"}'
