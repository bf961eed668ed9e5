#!/usr/bin/env bash
# Train the 5-way (A/B/C/D/coinfected) model (reference: scripts/train_multiway.sh).
# Uses vowpal wabbit when on PATH, the built-in jax trainer otherwise.
set -euo pipefail
if command -v vw >/dev/null; then
    cat "$1" | shuf | vw --passes=25 --cache_file cache.f --binary --ect 5 --interactions vvv -f multiway.model --ignore s
else
    cat "$1" | shuf | rkmh-tpu-wabbit --passes=25 --ect 5 --interactions vvv -f multiway.model --ignore s -
fi
