#!/usr/bin/env bash
# Final KD+QAT training (reference scripts/train_final.sh:13-16 parity).
# The reference wraps torchrun --nproc_per_node=N; on TPU there is no
# launcher — one process per host, and the device mesh handles the chips.
# Extra args pass straight through (e.g. --config qat_search/best_params.yaml).
set -euo pipefail
exec python -m qat_vit_tpu.train.trainer "$@"
