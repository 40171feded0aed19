"""multimodalvc_tpu: a TPU-native multi-modal AVSR / voice-conversion framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
EnriqueOO97/MultiModalVC (an MMS-LLaMA fork): audio-visual speech
recognition with an LLM decoder, LLM-conditioned speech synthesis, and
HiFi-GAN vocoding — built for TPU meshes rather than ported from CUDA.

Layer map (bottom-up):
  ops/        pure-function compute primitives (STFT/mel, attention,
              resampling, masking, beam search) — Pallas kernels where hot.
  nn/         flax.linen building blocks (transformer, conformer, Q-Former,
              LLaMA, Whisper encoder, AV-HuBERT, HiFi-GAN, ResNet frontend).
  models/     registered product model assemblies (AVSR, Speech, NoLLM, E2E,
              vocoder) mirroring the reference's model zoo.
  data/       manifest/video/audio pipeline, length-bucketed batching,
              host->device prefetch.
  criterions/ loss modules (LM loss, mel L1 + MCD/SSIM, HiFi-GAN GAN loss).
  parallel/   device-mesh axes (data/fsdp/tensor/sequence/expert) + sharding
              rules; XLA collectives over ICI replace NCCL.
  runtime/    trainer (jit'd train step, grad accum, clipping), checkpoint
              (orbax + torch-free .pt import), metrics, train loop.
  cli/        train/eval/generate entry points driven by YAML + overrides.
  native/     C++ host-side ops (bucketed batching, edit distance, balanced
              assignment, n-gram blocking) via ctypes.
"""

__version__ = "0.1.0"
