"""Built-in default hyperparameters.

Base values from the reference's `configs/config_base.yaml` (plus a few
keys only defined deeper in its cascade or in the BiSinger experiment
configs, noted inline where the chosen level matters). The YAML tree in
this repo's `configs/` replicates the cascade itself
(config_base -> tts/base -> tts/fs2 -> singing/base -> usr/...), so a
config file only needs to state what it changes. Keys keep the
reference names since they are the public API users carry over.

TPU-specific additions are grouped at the bottom.
"""

DEFAULT_HPARAMS = {
    # ------------------------------------------------------------------ task
    "task_cls": "",
    "work_dir": "",
    "exp_name": "",
    "infer": False,
    "seed": 1234,
    "debug": False,
    # --------------------------------------------------------------- dataset
    "raw_data_dir": "",
    "processed_data_dir": "",
    "binary_data_dir": "",
    "binarizer_cls": "bisinger_tpu.data.binarizer.SingingBinarizer",
    "raw_json_fn": "",
    "datasets": [],
    "test_prefixes": [],
    "test_num": 100,
    "valid_num": 100,
    "endless_ds": True,
    "sort_by_len": True,
    "ds_workers": 1,
    "binarization_args": {
        "shuffle": False,
        "with_txt": True,
        "with_wav": False,
        "with_align": True,
        "with_spk_embed": False,
        "with_f0": True,
        "with_f0cwt": False,
    },
    "loud_norm": False,
    "reset_phone_dict": True,
    # ----------------------------------------------------------------- audio
    "audio_num_mel_bins": 80,
    "audio_sample_rate": 24000,
    "hop_size": 128,
    "win_size": 512,
    "fft_size": 512,
    "fmin": 30,
    "fmax": 12000,
    "min_level_db": -120,
    "mel_vmin": -6.0,
    "mel_vmax": 1.5,
    "wav2spec_eps": 1e-6,
    "max_frames": 5000,
    "max_input_tokens": 1550,
    "frames_multiple": 1,
    # ----------------------------------------------------------------- model
    "dropout": 0.1,
    "enc_layers": 4,
    "dec_layers": 4,
    "hidden_size": 256,
    "num_heads": 2,
    "enc_ffn_kernel_size": 9,
    "dec_ffn_kernel_size": 9,
    "ffn_act": "gelu",
    "ffn_padding": "SAME",
    "encoder_type": "fft",
    "decoder_type": "fft",
    "use_pos_embed": True,
    "rel_pos": True,
    # ------------------------------------------------------------- duration
    "predictor_hidden": -1,
    "predictor_kernel": 5,
    "predictor_layers": 5,
    "dur_predictor_kernel": 3,
    "dur_predictor_layers": 5,
    "predictor_dropout": 0.5,
    "dur_loss": "mse",
    # -------------------------------------------------------- pitch / energy
    "use_pitch_embed": True,
    "pitch_type": "frame",  # frame|ph|cwt
    "use_uv": True,
    "cwt_hidden_size": 128,
    "cwt_layers": 2,
    "cwt_loss": "l1",
    "cwt_add_f0_loss": False,
    "cwt_std_scale": 0.8,
    "cwt_scales": 10,
    "pitch_ar": False,
    "pitch_loss": "l1",
    "pitch_norm": "log",
    "pitch_extractor": "parselmouth",
    "use_energy_embed": False,
    # --------------------------------------------------------------- speaker
    "use_spk_id": True,
    "use_split_spk_id": False,
    "use_spk_embed": False,
    "num_spk": 1,
    # ----------------------------------------------------------------- MIDI
    "use_midi": True,
    "use_gt_f0": False,
    "use_gt_dur": False,
    "switch_midi2f0_step": None,
    # ---------------------------------------------------------------- losses
    "mel_loss": "l1:0.5|ssim:0.5",
    "lambda_f0": 1.0,
    "lambda_uv": 1.0,
    "lambda_energy": 0.1,
    "lambda_ph_dur": 1.0,
    "lambda_sent_dur": 1.0,
    "lambda_word_dur": 1.0,
    "predictor_grad": 0.1,
    # ------------------------------------------------------------- diffusion
    "timesteps": 1000,
    "K_step": 1000,
    "diff_loss_type": "l1",
    "diff_decoder_type": "wavenet",
    "schedule_type": "linear",
    "max_beta": 0.02,
    "residual_layers": 20,
    "residual_channels": 256,
    "dilation_cycle_length": 4,
    "keep_bins": 80,
    "spec_min": [-6.0] * 80,
    "spec_max": [0.0] * 80,
    "gaussian_start": True,
    "pndm_speedup": 5,
    "fs2_ckpt": "",
    # --------------------------------------------------------------- vocoder
    "vocoder": "bisinger_tpu.vocoders.hifigan.HifiGAN",
    "vocoder_ckpt": "",
    "use_nsf": True,
    "resblock": "1",
    "resblock_kernel_sizes": [3, 7, 11],
    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    # product(upsample_rates) must equal hop_size (128)
    "upsample_rates": [8, 4, 2, 2],
    "upsample_kernel_sizes": [16, 8, 4, 4],
    "upsample_initial_channel": 512,
    "use_denoise": False,
    "pe_enable": False,
    "pe_ckpt": "",
    # ---------------------------------------------------------- optimization
    "lr": 2.0,
    "warmup_updates": 2000,
    "optimizer_adam_beta1": 0.9,
    "optimizer_adam_beta2": 0.98,
    "weight_decay": 0.0,
    "clip_grad_norm": 1.0,
    "decay_steps": 100000,
    "accumulate_grad_batches": 1,
    # ---------------------------------------------------------- train / eval
    "load_ckpt": "",
    "save_ckpt": True,
    "save_best": False,
    "num_ckpt_keep": 3,
    "log_interval": 100,
    "num_sanity_val_steps": 5,
    "val_check_interval": 2000,
    "max_epochs": 1000,
    "max_updates": 160000,
    # reference configs/config_base.yaml:38 (the YAML cascade in
    # configs/ then overrides per level: tts/base 30000, tts/fs2 32000,
    # singing/base 20000, experiment configs 36000-40000)
    "max_tokens": 31250,
    "max_sentences": 100000,
    "max_eval_tokens": -1,
    "max_eval_sentences": -1,
    "train_set_name": "train",
    "valid_set_name": "valid",
    "test_set_name": "test",
    "num_valid_plots": 5,
    "num_test_samples": 0,
    "test_ids": [],
    "save_gt": False,
    "save_f0": False,
    "gen_dir_name": "",
    "profile_infer": False,
    "out_wav_norm": False,
    "test_input_dir": "",
    # ---------------------------------------------------------- TPU-specific
    "mesh_shape": {"data": -1, "model": 1},  # -1 = all remaining devices
    "compute_dtype": "bfloat16",  # activations; params/optimizer stay fp32
    "bucket_frames": [512, 1024, 2048, 4096],  # static mel-length buckets
    "bucket_tokens": [64, 128, 256, 512],  # static phone-length buckets
    # inference batch-axis buckets: the serving micro-batcher's group
    # size varies request-to-request, and each distinct size is a
    # separate XLA program — pad the batch up to one of these so steady
    # state reuses a handful of compiled programs ([] disables)
    "bucket_batch_sizes": [1, 2, 4, 8, 16, 32, 64],
    "max_words": 128,  # static word count for word-dur loss segment-sum
    "remat": False,  # jax.checkpoint on transformer blocks
    # long-form mode: name of the mesh axis to shard mel frames over
    # ('' = off). Trace under `with mesh:` — see parallel/sequence.py.
    "sequence_parallel_axis": "",
}
