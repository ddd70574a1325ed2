from bisinger_tpu.utils.text_encoder import TokenTextEncoder, build_phone_encoder

__all__ = ["TokenTextEncoder", "build_phone_encoder"]
