#!/usr/bin/env bash
# Checkpoint comparison (reference scripts/evaluate.sh:7-13 parity —
# except this one runs; the reference's evaluator.py is a SyntaxError).
#
# Usage (positional, like the reference):
#   ./scripts/evaluate.sh [QAT_CKPT] [QUANT_CKPT] [extra comparator flags...]
set -euo pipefail

QAT_CKPT="${1:-./qat_output/best_qat.msgpack}"
QUANT_CKPT="${2:-./qat_output/best_converted.msgpack}"
shift $(( $# > 2 ? 2 : $# )) || true

exec python -m qat_vit_tpu.evaluation.comparator \
  --qat-ckpt "${QAT_CKPT}" \
  --quant-ckpt "${QUANT_CKPT}" \
  "$@"
