#!/usr/bin/env bash
# Train the binary coinfection VW model (reference: scripts/train_the_wabbit.sh).
# Requires vowpal wabbit (`vw`) on PATH; vectors come from rkmh-tpu-vwize.
set -euo pipefail
command -v vw >/dev/null || { echo "vw (Vowpal Wabbit) not found on PATH" >&2; exit 1; }
cat "$1" | shuf | vw --passes=25 --cache_file cache.f --binary --interactions vvvv -f trained.model
