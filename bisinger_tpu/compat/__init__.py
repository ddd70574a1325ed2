"""Interop with the PyTorch reference implementation (BiSinger).

  - `ref_loader`: import the reference's torch modules from a read-only
    checkout (stubbing its optional audio deps) and load its YAML config
    cascade — used by the parity test-suite and by checkpoint migration.
  - `torch_params`: torch `state_dict` -> flax params conversion for the
    acoustic models (FastSpeech2/FastSpeech2MIDI, DiffNet, GaussianDiffusion,
    PitchExtractor), complementing `vocoders.torch_import` (HiFi-GAN/PWG).
"""
