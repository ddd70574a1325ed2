from bisinger_tpu.vocoders.base_vocoder import get_vocoder_cls, register_vocoder

# side-effect imports populate the registry (the reference's
# vocoders/__init__.py does the same) — without them,
# get_vocoder_cls({"vocoder": "HifiGAN"}) hits an empty table
from bisinger_tpu.vocoders import hifigan as _hifigan  # noqa: E402,F401
from bisinger_tpu.vocoders import pwg as _pwg  # noqa: E402,F401

__all__ = ["get_vocoder_cls", "register_vocoder"]
