#!/usr/bin/env bash
# Benchmark sweep over problem dimensions, mirroring the reference's shell
# wrappers (parity: /root/reference/tt_ipm.sh:5-7,99-117):
#
#   bash scripts/sweep.sh <problem> <start_dim> <end_dim> <rank> [--track_mem]
#
# Runs configs/<problem>_<dim>.yaml for each dim with the reference's
# per-dim timeout budget (40000*dim seconds) and tees logs to results/.
set -euo pipefail

# Silence the XLA:CPU AOT cache loader's per-entry machine-feature E-spam
# (a pseudo-feature comparison wart — see ttipm_tpu/config.py); must be in
# the environment before the interpreter starts because sitecustomize
# imports jax at startup.
export TF_CPP_MIN_LOG_LEVEL=3

PROBLEM=${1:?usage: sweep.sh <problem> <start_dim> <end_dim> <rank> [--track_mem]}
START_DIM=${2:?start_dim}
END_DIM=${3:?end_dim}
RANK=${4:?rank}
TRACK_MEM=${5:-}

REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "$REPO_ROOT"
mkdir -p results

for dim in $(seq "$START_DIM" "$END_DIM"); do
  cfg="configs/${PROBLEM}_${dim}.yaml"
  if [[ ! -f "$cfg" ]]; then
    echo "skip: $cfg not found"
    continue
  fi
  log="results/${PROBLEM}_${dim}_rank${RANK}.txt"
  echo "=== ${PROBLEM} dim=${dim} rank=${RANK} ==="
  timeout "$((40000 * dim))" \
    python -m ttipm_tpu.utils.runner \
      --problem "$PROBLEM" --config "$cfg" --rank "$RANK" ${TRACK_MEM} \
    2>&1 | tee "$log" || echo "dim ${dim} exited nonzero (timeout or error)"
done
