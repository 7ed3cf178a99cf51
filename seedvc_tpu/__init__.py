"""seedvc_tpu — a TPU-native voice-conversion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
Seed-VC system (zero-shot voice conversion, singing voice conversion, v2
accent/style conversion, real-time streaming VC):

- ``core``      — configs, mesh/sharding helpers, precision policy, PRNG.
- ``dsp``       — STFT/mel/kaldi-fbank frontends, resampling, FIR design, SOLA.
- ``nn``        — neural building blocks (RMSNorm, AdaLN, RoPE attention,
                  SwiGLU, WaveNet post-net, snake activations, ConvNeXtV2,
                  TDNN/CAM layers, BSQ).
- ``models``    — DiT estimators (v1/v2), CFM samplers, length regulators,
                  CAMPPlus, BigVGAN, HiFT, RMVPE, AR transformer, content
                  encoders.
- ``ops``       — Pallas TPU kernels for the hot fused ops.
- ``parallel``  — device-mesh construction and sharding rules (DP/TP/CFG-split).
- ``pipelines`` — offline conversion, streaming conversion with persistent state.
- ``train``     — data pipeline, optimizers, trainer, Orbax checkpointing.
"""

__version__ = "0.1.0"
