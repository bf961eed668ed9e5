#!/usr/bin/env bash
# Apply the 4 shipped coinfection/lineage models to a reads file
# (equivalent of the reference's model_docker/run_models.sh, which pipes
# a VW-vectorized sample through vw-8.2 with 4 shipped .model files).
#
# Usage: run_models.sh <reads.fq> [refpath] [modeldir]
#
# The sample is classified against the 10 HPV16 sublineage references
# (refpath/new_refs.fa, k=18 s=4000 — the config in the reference model
# names), quantified to per-sublineage count features (vwize --format
# stream), and scored by each model.  Models ship as .npz (the jax VW
# trainer, scripts/train_models.py); a real vw binary + .model files are
# used instead when both are present.
set -euo pipefail

reads=$1
refpath=${2:-/root/reference/data}
modeldir=${3:-$(dirname "$0")}

if command -v vw >/dev/null && ls "$modeldir"/*.model >/dev/null 2>&1
then VW=vw; MODEL_EXT=model
else VW=rkmh-tpu-wabbit; MODEL_EXT=npz; fi   # built-in jax fallback

work=$(mktemp -d)
trap 'rm -rf "$work"' EXIT

rkmh-tpu stream -r "$refpath/new_refs.fa" -f "$reads" -k 18 -s 4000 \
    > "$work/sample.rk"
rkmh-tpu-vwize -n --format stream -i "$work/sample.rk" -C 0 \
    -s A1 A2 A3 A4 B1 B2 C1 D1 D2 D3 > "$work/sample.vw"

for model in coinf_binary coinf_interactions lineage_ect sublineage_ect; do
    if [ -f "$modeldir/$model.$MODEL_EXT" ]; then
        $VW -i "$modeldir/$model.$MODEL_EXT" -t -p "$work/$model.pred" \
            "$work/sample.vw" 2>/dev/null
        echo "== $model =="
        paste -d' ' "$work/$model.pred" <(echo "$(basename "$reads")")
    else
        echo "== $model == (no $model.$MODEL_EXT in $modeldir; train with scripts/train_models.py)" >&2
    fi
done
