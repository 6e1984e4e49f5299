#!/usr/bin/env bash
# Checkpoint comparison (reference scripts/evaluate.sh:11-13 parity —
# except this one runs; the reference's evaluator.py is a SyntaxError).
set -euo pipefail
exec python -m qat_vit_tpu.evaluation.comparator "$@"
