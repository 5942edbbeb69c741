"""Grasp-Any-Region TPU: a TPU-native region-level multimodal LLM framework.

Re-designed from scratch for JAX/XLA/Pallas/pjit with the capabilities of the
reference CUDA/torch project Haochen-Wang409/Grasp-Any-Region (GAR): given an
image (or video frames), one or more binary region masks (or points/boxes via
SAM), and a text instruction, produce region captions / multi-region QA.

Layout:
  core/      configs, mesh/topology, dtype policy, weight loading
  ops/       XLA + Pallas compute ops (attention, roi_align, rope, pooling)
  models/    PE-ViT vision tower, Llama decoder, GAR assembly, generation
  parallel/  sharding rules (dp/fsdp/tp/sp) over jax.sharding.Mesh
  data/      host-side preprocessing: tiling, rasterization, tokenizer, chat
  train/     optax train step, checkpointing, export
  evaluation/ benchmark harnesses (GAR-Bench, DLC-Bench, Ferret, MDVP)
"""

__version__ = "0.1.0"
