#!/usr/bin/env bash
# Apply pre-trained Vowpal Wabbit coinfection/lineage models to a sample
# (equivalent of the reference's model_docker/run_models.sh, which pipes
# rkmh hpv16 output through vw-8.2 with 4 shipped .model files).
#
# Usage: run_models.sh <reads.fq> <refpath> [modeldir]
# Models are trained with scripts/train_the_wabbit.sh / train_multiway.sh
# from rkmh-tpu-vwize vectors; this script only applies them.
set -euo pipefail

reads=$1
refpath=${2:-data}
modeldir=${3:-$(dirname "$0")}

if command -v vw >/dev/null; then VW=vw; MODEL_EXT=model
else VW=rkmh-tpu-wabbit; MODEL_EXT=npz; fi   # built-in jax fallback

work=$(mktemp -d)
trap 'rm -rf "$work"' EXIT

rkmh-tpu hpv16 -f "$reads" -R "$refpath" -k 18 -s 4000 > "$work/sample.cls"
rkmh-tpu-vwize -n -i "$work/sample.cls" -C 0 > "$work/sample.vw"

for model in coinf_binary coinf_interactions lineage_ect sublineage_ect; do
    if [ -f "$modeldir/$model.$MODEL_EXT" ]; then
        $VW -i "$modeldir/$model.$MODEL_EXT" -t -p "$work/$model.pred" "$work/sample.vw" 2>/dev/null
        echo "== $model =="
        paste -d' ' "$work/$model.pred" <(echo "$(basename "$reads")")
    else
        echo "== $model == (no $model.$MODEL_EXT in $modeldir; train with scripts/train_the_wabbit.sh)" >&2
    fi
done
