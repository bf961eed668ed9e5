#!/usr/bin/env bash
# Classification file -> VW vectors, optionally collapsed to lineages
# (reference: scripts/transform.sh).
set -euo pipefail
infile=$1
if [ "${2:-}" == "collapse" ]; then
  rkmh-tpu-vwize -i "$infile" -C 1 | rkmh-tpu-collapse-subtypes
else
  rkmh-tpu-vwize -n -i "$infile" -C 1
fi
