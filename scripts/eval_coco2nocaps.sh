#!/bin/bash
# TTA-free caption eval COCO->NoCaps per-domain + CLIPScore
# (reference: caption/scripts/eval_coco2nocaps.sh)
ann_root=${1:?dir with nocaps_val_{417_in,2670_near,1413_out}-domain.json}
imgs=${2:?nocaps image root}
ckpt=${3:?supervised mapper checkpoint}
for split in val_417_in-domain val_2670_near-domain val_1413_out-domain; do
  python -m rlcf_tpu.cli.tta_caption --annotations "$ann_root/nocaps_${split}.json" \
      --images_root "$imgs" \
      --checkpoint "$ckpt" --opt_checkpoint "${OPT_125M:-}" \
      --opt_vocab "${OPT_VOCAB:?}" --opt_merges "${OPT_MERGES:?}" \
      --clip_model_type ViT-B/16 --clip_checkpoint "${CLIP_VIT_B16:-}" \
      --reward_arch ViT-B/16 --reward_checkpoint "${CLIP_VIT_B16:-}" \
      --normalize_prefix 1 --tta_steps 0 \
      --output "exp/eval_c2n_${split}"
  python -m rlcf_tpu.cli.clipscore_eval "exp/eval_c2n_${split}/results_clipscore.json" "$imgs" \
      --clip_checkpoint "${CLIP_VIT_B32:-}"
done
