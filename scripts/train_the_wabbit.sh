#!/usr/bin/env bash
# Train the binary coinfection model (reference: scripts/train_the_wabbit.sh).
# Uses vowpal wabbit when on PATH, the built-in jax trainer otherwise.
set -euo pipefail
if command -v vw >/dev/null; then
    cat "$1" | shuf | vw --passes=25 --cache_file cache.f --binary --interactions vvvv -f trained.model
else
    cat "$1" | shuf | rkmh-tpu-wabbit --passes=25 --binary --interactions vvvv -f trained.model -
fi
