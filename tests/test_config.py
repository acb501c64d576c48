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
