"""Config tests: JSON round-trip, derived STFT params, forward-compat keys,
run-dir persistence semantics."""

import dataclasses

import pytest

from tacotron_tpu.config import (AudioConfig, Config, ModelConfig,
                                 load_config, save_config)


def test_defaults_match_reference_effective_values():
    cfg = Config()
    # reference hparams after its layered update() blocks (SURVEY §2.2)
    assert cfg.audio.sample_rate == 24000
    assert cfg.audio.n_fft == 2048
    assert cfg.audio.hop_length == 300
    assert cfg.audio.win_length == 1200
    assert cfg.model.dropout_prob == 0.8
    assert cfg.model.post_rnn_size == 256
    assert cfg.model.reduction_factor == 4
    assert cfg.model.attention_type == "bah_mon"
    assert cfg.train.batch_size == 16
    assert cfg.data.min_tokens == 50


def test_json_roundtrip(tmp_path):
    cfg = Config().replace(
        model=ModelConfig(model_type="deepvoice", num_speakers=3,
                          enc_prenet_sizes=(128, 64)))
    path = str(tmp_path / "config.json")
    save_config(cfg, path)
    back = load_config(path)
    assert back == cfg
    assert isinstance(back.model.enc_prenet_sizes, tuple)


def test_forward_compatible_unknown_keys():
    cfg = Config.from_json(
        '{"model": {"embedding_size": 128, "a_future_knob": true}}')
    assert cfg.model.embedding_size == 128
    assert cfg.audio.sample_rate == 24000  # untouched sections default


def test_frozen():
    cfg = Config()
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.model.embedding_size = 1


def test_debug_string_sorted():
    s = Config().debug_string()
    assert s.startswith("Hyperparameters:")
    lines = [l.strip() for l in s.splitlines()[1:]]
    assert lines == sorted(lines)
    assert any("model.embedding_size: 256" in l for l in lines)


def test_tune_scan_unroll():
    """TPU-tuned unrolls apply only on tpu and only over default values."""
    import dataclasses
    from tacotron_tpu.config import Config, tune_scan_unroll

    cfg = Config()
    tuned = tune_scan_unroll(cfg, platform="tpu")
    assert tuned.model.decoder_unroll == 8 and tuned.model.rnn_unroll == 8
    # non-TPU platforms: untouched
    cpu = tune_scan_unroll(cfg, platform="cpu")
    assert cpu.model.decoder_unroll == 1 and cpu.model.rnn_unroll == 1
    # explicit user values are respected even on tpu
    manual = cfg.replace(model=dataclasses.replace(cfg.model, rnn_unroll=2))
    kept = tune_scan_unroll(manual, platform="tpu")
    assert kept.model.decoder_unroll == 1 and kept.model.rnn_unroll == 2
    # platform=None resolves via jax (cpu in tests) without error
    auto = tune_scan_unroll(cfg)
    assert auto.model.rnn_unroll in (1, 8)


def test_scale_model_widths():
    """The reference's SCALE_FACTOR width divider (hparams.py:3-6) as a
    pure function: widths divide, structure and output dims do not, and
    the scaled model still builds and runs a forward pass."""
    import jax
    import jax.numpy as jnp

    from tacotron_tpu.config import ModelConfig, scale_model_widths
    from tacotron_tpu.models.tacotron import Tacotron

    base = ModelConfig()
    assert scale_model_widths(base, 1) == base
    s = scale_model_widths(base, 4)
    assert s.embedding_size == 64
    assert s.enc_prenet_sizes == (64, 32)
    assert s.dec_rnn_size == 64
    assert s.post_proj_sizes == (64, 80)   # last stays num_mels
    assert s.num_mels == base.num_mels and s.num_freq == base.num_freq
    assert s.enc_bank_size == base.enc_bank_size
    assert s.reduction_factor == base.reduction_factor
    with pytest.raises(ValueError):
        scale_model_widths(base, 0)

    model = Tacotron(s)
    inputs = jnp.zeros((1, 8), jnp.int32)
    lengths = jnp.full((1,), 8, jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), inputs, lengths,
                           max_steps=2, train=False)
    out = model.apply(variables, inputs, lengths, max_steps=2, train=False)
    assert out["linear_outputs"].shape == (1, 2 * s.reduction_factor,
                                           s.num_freq)


def test_model_config_scaled_method():
    """ModelConfig.scaled is the method form of scale_model_widths."""
    from tacotron_tpu.config import ModelConfig, scale_model_widths
    assert ModelConfig().scaled(4) == scale_model_widths(ModelConfig(), 4)


def test_tpu_recommended_preset():
    """Config.tpu_recommended() composes every measured TPU win (bf16 +
    unroll 8 + on-device features + large batch) on top of a base config
    without clobbering unrelated fields (round-3 verdict ask #3)."""
    import dataclasses

    cfg = Config.tpu_recommended()
    assert cfg.model.compute_dtype == "bfloat16"
    assert cfg.model.decoder_unroll == 8 and cfg.model.rnn_unroll == 8
    assert cfg.train.on_device_features is True
    assert cfg.data.store_waveform is True
    # B=32: the measured convergence/throughput sweet spot
    # (docs/BATCH_STUDY.md; B=64 converges measurably worse per sample)
    assert cfg.train.batch_size == 32

    base = Config().replace(
        data=dataclasses.replace(Config().data,
                                 cleaners="english_cleaners",
                                 min_tokens=5))
    out = Config.tpu_recommended(base, batch_size=64)
    assert out.data.cleaners == "english_cleaners"
    assert out.data.min_tokens == 5
    assert out.train.batch_size == 64
    assert out.model.compute_dtype == "bfloat16"
    # JSON round-trip keeps the preset
    assert Config.from_json(out.to_json()) == out
