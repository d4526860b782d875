#!/usr/bin/env bash
# One-command real-scene parity path (VERDICT r2 #7; BASELINE.json:5 gate).
#
# This harness has no network egress, so the datasets must be mounted or
# copied in. Expected layouts (the canonical public distributions):
#
#   $DATA/nerf_synthetic/<scene>/        # blender: transforms_{train,val,test}.json
#       transforms_train.json            #          + train/ val/ test/ PNG dirs
#   $DATA/nerf_llff_data/<scene>/        # LLFF: poses_bounds.npy + images_<f>/
#       poses_bounds.npy
#
# Usage:
#   DATA=/data OUT=runs/parity bash scripts/fetch_and_parity.sh blender
#   DATA=/data OUT=runs/parity bash scripts/fetch_and_parity.sh llff
#
# Per scene: train the matching preset, then one `fashion-nerf parity`
# sweep emits a JSON row per scene (psnr/ssim vs the Mildenhall et al. 2020
# Table-4 anchor, delta, pass/fail at the 0.1 dB gate) plus a summary line.
set -euo pipefail

KIND=${1:?usage: fetch_and_parity.sh blender|llff}
DATA=${DATA:?set DATA=/path/to/datasets}
OUT=${OUT:-runs/parity}
STEPS=${STEPS:-200000}
export PYTHONPATH="$(cd "$(dirname "$0")/.." && pwd)/src:${PYTHONPATH:-}"

if [ "$KIND" = blender ]; then
  ROOT="$DATA/nerf_synthetic"; CFG=blender_lego; MARKER=transforms_train.json
else
  ROOT="$DATA/nerf_llff_data"; CFG=llff_fern; MARKER=poses_bounds.npy
fi

for scene_dir in "$ROOT"/*/; do
  scene=$(basename "$scene_dir")
  [ -f "$scene_dir/$MARKER" ] || continue
  echo "=== training $scene ($STEPS steps) ==="
  python -m fashion_nerf.cli train --config "$CFG" \
      --set data.root="$scene_dir" --set train.iters="$STEPS" \
      --out "$OUT/$scene"
done

echo "=== parity sweep ==="
python -m fashion_nerf.cli parity --config "$CFG" \
    --set data.root="$ROOT" --out "$OUT"
