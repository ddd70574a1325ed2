from bisinger_tpu.vocoders.base_vocoder import get_vocoder_cls, register_vocoder

__all__ = ["get_vocoder_cls", "register_vocoder"]
