"""e2e_tts_tpu — a TPU-native text-to-speech framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
InterlinkLabs/e2e-tts (reference layout documented in SURVEY.md):

- ``text``      Vietnamese-first G2P frontend, symbol table, normalization.
- ``audio``     mel-spectrogram and feature extraction ops (JAX + host-side).
- ``ops``       pure jittable ops: masking, length regulation, MAS, CTC
                forward-sum, attention kernels (Pallas).
- ``nn``        flax modules: FFT/conformer/fastformer/long-short/reformer
                blocks, variance adaptor, postnet, HiFi-GAN, iSTFTNet,
                discriminators.
- ``models``    the acoustic FastSpeech2 model and vocoder wiring.
- ``parallel``  device-mesh construction and sharding rules.
- ``train``     optax optimizers/schedules, train steps, orbax checkpoints.
- ``data``      filelist building, feature caching, bucketed batching.
- ``serve``     bucketed-jit synthesis engine and the public Synthesizer API.
- ``compat``    torch-checkpoint -> JAX parameter conversion for parity tests.

Unlike the reference (single-device PyTorch), every compute path here is
designed for XLA: static shapes with masks, ``lax.scan`` for recurrences, and
``jax.sharding`` meshes for multi-chip scaling.
"""

__version__ = "0.1.0"
