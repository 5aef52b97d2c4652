#!/usr/bin/env bash
# Fetch the reference's released checkpoints (mirrors
# model/pretrained/download_model.sh in XiSHEN0220/RANSAC-Flow). These .pth
# files load directly via models.convert.load_alignment_checkpoint /
# load_resnet50_trunk / the segNet converter.
#
# NOTE: requires network access; the development sandbox has none.
set -euo pipefail

DEST="${1:-model_zoo}"
mkdir -p "$DEST"
cd "$DEST"

BASE="http://www.cmap.polytechnique.fr/~xi.shen/RANSAC-Flow/model/pretrained"

FILES=(
  ade20k_resnet50dilated_encoder.pth     # segNet encoder (ADE20k)
  ade20k_resnet50dilated_decoder.pth     # segNet decoder
  MegaDepth_Theta1_Eta001_Grad0_0.807.pth  # paper-results model
  MegaDepth_Theta1_Eta001_Grad1_0.774.pth  # visual-results model
  MegaDepth_TestFT.pth                   # fine-tuned variants
  RobotCar_TestFT.pth
  KITTI_TestFT.pth
  resnet50_moco.pth                      # MoCo coarse features
)

for f in "${FILES[@]}"; do
  if [ ! -f "$f" ]; then
    echo "fetching $f"
    curl -fLO "$BASE/$f" || wget "$BASE/$f"
  fi
done
echo "done -> $DEST"
