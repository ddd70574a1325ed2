"""BiSinger-TPU: a TPU-native bilingual singing-voice-synthesis framework.

Re-implements the capabilities of BiSinger (ASRU 2023, arXiv:2309.14089,
reference: /root/reference) as an idiomatic JAX/XLA/Pallas/pjit stack:

  - FastSpeech2MIDI (FFT-Singer) encoder/decoder with the ESM language-fusion
    block (`bisinger_tpu.models.fs2`)
  - Shallow Gaussian diffusion mel decoder with DDPM/PLMS `lax.scan` samplers
    (`bisinger_tpu.models.diffusion`)
  - HiFi-GAN vocoder with NSF harmonic source (`bisinger_tpu.models.hifigan`)
  - PitchExtractor CNN (`bisinger_tpu.models.pe`)
  - Bilingual text frontend, binarizer, and bucketed static-shape data pipeline
    (`bisinger_tpu.data`)
  - SPMD training over a `jax.sharding.Mesh` (`bisinger_tpu.parallel`)

Everything device-side is pure-functional JAX; host-side tooling (config,
binarizer, text processing) is plain Python.
"""

__version__ = "0.1.0"
