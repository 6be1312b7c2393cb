"""rlcf_tpu — TPU-native test-time adaptation (TTA) framework with CLIP rewards.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of mzhaoshuai/RLCF
(ICLR'24 "Test-Time Adaptation with CLIP Reward"): per-sample REINFORCE episodes
that adapt a policy model (CLIP classifier / retriever / CLIP-prefix captioner)
against a frozen CLIP reward model, expressed as pure jitted episode functions
vmapped and sharded over a TPU device mesh.

Layout:
  tokenizer   — CLIP BPE tokenizer (pure Python host-side)
  models      — CLIP (ViT + ModifiedResNet towers), OPT decoder, prefix mappers,
                torch-checkpoint converters
  core        — episode engine, REINFORCE/entropy/KD losses, reward model,
                confidence selection, policy state discipline
  data        — TPU-native AugMix view generation, dataset loaders, class metadata
  tasks       — classification / retrieval / caption drivers
  metrics     — top-k, recall@k, caption metrics, CLIPScore
  parallel    — mesh construction and episode sharding
  ops         — Pallas TPU kernels
"""

__version__ = "0.1.0"
