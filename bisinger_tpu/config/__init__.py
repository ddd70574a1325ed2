from bisinger_tpu.config.hparams import HParams, load_hparams, set_hparams

__all__ = ["HParams", "load_hparams", "set_hparams"]
