#!/usr/bin/env bash
# Train the 5-way (A/B/C/D/coinfected) VW model (reference: scripts/train_multiway.sh).
set -euo pipefail
command -v vw >/dev/null || { echo "vw (Vowpal Wabbit) not found on PATH" >&2; exit 1; }
cat "$1" | shuf | vw --passes=25 --cache_file cache.f --binary --ect 5 --interactions vvv -f multiway.model --ignore s
