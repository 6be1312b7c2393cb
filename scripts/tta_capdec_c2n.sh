#!/bin/bash
# Caption TTA COCO->NoCaps (reference: caption/scripts/tta_capdec_c2n.sh)
ann=${1:?annotation json}
imgs=${2:?image root}
ckpt=${3:?supervised mapper checkpoint}
python -m rlcf_tpu.cli.tta_caption --annotations "$ann" --images_root "$imgs" \
    --checkpoint "$ckpt" --opt_checkpoint "${OPT_125M:-}" \
    --opt_vocab "${OPT_VOCAB:?}" --opt_merges "${OPT_MERGES:?}" \
    --clip_model_type ViT-B/16 --clip_checkpoint "${CLIP_VIT_B16:-}" \
    --reward_arch ViT-L/14 --reward_checkpoint "${CLIP_VIT_L14:-}" \
    --tta_steps 4 --tta_lr 3e-6 --sample_k 6 --output exp/cap_c2n
python -m rlcf_tpu.cli.clipscore_eval exp/cap_c2n/results_clipscore.json "$imgs" \
    --clip_checkpoint "${CLIP_VIT_B32:-}"
