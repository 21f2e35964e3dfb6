"""prismer_tpu — a TPU-native (JAX/XLA/Pallas/pjit) vision-language framework.

A from-scratch re-design of the capabilities of NVlabs/prismer (reference:
/root/reference) for TPU hardware:

  * multi-modal expert-augmented ViT encoder + RoBERTa-style causal decoder
    with lightweight adaptors (reference: model/prismer.py, model/modules/*)
  * Perceiver experts-resampler (reference: model/modules/resampler.py)
  * KV-cached, jit-compiled beam search / rank inference (the reference decodes
    cache-less and re-computes the full sequence each step — we do not)
  * expert-label data pipeline with on-device CLIP-feature in-painting
    (the reference in-paints 64-channel float maps per-sample on CPU;
    we ship uint8 id maps and gather on device)
  * data/tensor parallel training over a `jax.sharding.Mesh` (the reference
    uses HF accelerate + NCCL DDP/FSDP)

Everything is batch-first, statically shaped, bf16-by-default with fp32
LayerNorm/softmax islands, and functional (params as pytrees).
"""

__version__ = "0.1.0"
