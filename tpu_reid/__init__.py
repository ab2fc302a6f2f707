"""tpu-reid: TPU-native CLIP re-identification framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
SuperbTUM/Multimodal-ReID (see SURVEY.md): zero-shot and prompt-learning
person/vehicle ReID with a fully on-device retrieval tail.

Layout:
  models/     pure-functional CLIP towers (ViT incl. deep-prompt IVLP/MaPLe,
              causal text transformer, ModifiedResNet), prompt learners,
              BPE tokenizer, BNNeck/Adapter/JPM heads
  ops/        Pallas TPU kernels for the hot paths (attention, distmat+topk,
              jaccard L1-min)
  parallel/   mesh construction, sharded embedding extraction, collectives
  retrieval/  distance matrices, CMC/mAP, k-reciprocal re-ranking (on device)
  data/       dataset parsers, PK sampler, XLA-fused preprocessing, prompt text
  train/      losses, schedules, two-stage trainers, GPA, XBM, multitask
  weights/    PyTorch checkpoint -> JAX pytree converters
  runtime/    checkpointing (orbax), metrics logging, profiling hooks
  cli/        zero_shot / prompt_learning / multitask entry points
"""

__version__ = "0.1.0"
