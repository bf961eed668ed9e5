#!/usr/bin/env bash
# Apply the 4 shipped coinfection/lineage models to a reads file
# (equivalent of the reference's model_docker/run_models.sh, which pipes
# a VW-vectorized sample through vw-8.2 with 4 shipped .model files).
#
# Usage: run_models.sh <reads.fq> [refpath] [modeldir] [refblobdir]
#   refblobdir (default /root/reference/model_docker): dir of the
#   reference's vw binary .model blobs, applied natively when present
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

# The reference's own 4 shipped vw-8.3.1 binary blobs (if mounted) are
# applied too: rkmh-tpu-wabbit reads the vw binary format natively
# (rkmh_tpu/ml/vw_model.py), fed the wabbitized per-read sketch vectors
# their pipeline used (reference model_docker/run_models.sh:3-10 pipes
# `hash -w`-style vectors through vw -i blob -p).
refblobdir=${4:-/root/reference/model_docker}

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

if ls "$refblobdir"/*.model >/dev/null 2>&1; then
    rkmh-tpu hash -w -k 18 -s 4000 -f "$reads" > "$work/sample.wab"
    for blob in "$refblobdir"/*.model; do
        rkmh-tpu-wabbit -i "$blob" -t -p "$work/blob.pred" \
            "$work/sample.wab" 2>/dev/null
        echo "== $(basename "$blob") =="
        # per-read predictions: report the majority/mean per sample
        python3 - "$work/blob.pred" "$(basename "$reads")" <<'PY'
import sys
vals = [float(l.split()[0]) for l in open(sys.argv[1]) if l.strip()]
from collections import Counter
ints = all(v == int(v) for v in vals)
if ints and vals and max(vals) <= 16:   # class ids: majority vote
    print(Counter(int(v) for v in vals).most_common(1)[0][0], sys.argv[2])
else:                                   # margins: mean
    print(f"{sum(vals)/max(len(vals),1):.6f}", sys.argv[2])
PY
    done
fi
