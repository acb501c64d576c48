"""Multi-speaker evaluation harness tests: acoustic statistics on known
signals, the per-speaker/cross-speaker report over a real batched synthesis
(random weights, CPU, tiny decode), and the CLI."""

import json

import numpy as np

from tacotron_tpu.config import Config, ModelConfig
from tacotron_tpu.synth import Synthesizer
from tacotron_tpu.tools.speaker_eval import (acoustic_stats,
                                             evaluate_speakers, main)


def test_acoustic_stats_known_signal():
    sr = 24000
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    wav = np.concatenate([tone, np.zeros(sr, np.float32)])
    s = acoustic_stats(wav, sr)
    assert abs(s["duration_s"] - 2.0) < 1e-6
    # RMS of a 0.5-amp sine over half the signal: 0.5/sqrt(2)/sqrt(2)
    np.testing.assert_allclose(s["rms"], 0.25, rtol=0.02)
    np.testing.assert_allclose(s["peak"], 0.5, rtol=0.01)
    assert 0.4 < s["silence_fraction"] < 0.6
    # centroid of a pure 440 Hz tone sits at the tone (voiced frames only)
    assert 380 < s["spectral_centroid_hz"] < 520

    # degenerate inputs don't crash
    assert acoustic_stats(np.zeros(8, np.float32), sr)["rms"] == 0.0
    z = acoustic_stats(np.zeros(8192, np.float32), sr)
    assert z["silence_fraction"] == 1.0


def test_evaluate_speakers_report():
    cfg = Config().replace(model=ModelConfig(
        num_speakers=2, model_type="deepvoice", max_iters=4))
    synth = Synthesizer().init_random(cfg)
    report = evaluate_speakers(synth, texts=["안녕하세요", "반갑습니다"],
                               speakers=[0, 1], max_steps=4,
                               fast_vocoder=False)
    assert set(report["speakers"]) == {"0", "1"}
    for rec in report["speakers"].values():
        assert len(rec["utterances"]) == 2
        u = rec["utterances"][0]
        assert {"text", "num_tokens", "attention", "audio"} <= u.keys()
        assert {"ok", "gate", "ok_sharpness", "ok_soft_monotonic",
                "coverage", "focus", "monotonicity"} <= \
            u["attention"].keys()
        # default attention is bah_mon -> the soft-monotonic gate rules,
        # and the verdict it produced is the one `ok` reports
        assert u["attention"]["gate"] == "soft_monotonic"
        assert u["attention"]["ok"] == u["attention"]["ok_soft_monotonic"]
        assert u["audio"]["duration_s"] > 0
        agg = rec["aggregate"]
        assert 0.0 <= agg["attention_ok_rate"] <= 1.0
        assert agg["attention_gate"] == "soft_monotonic"
        assert 0.0 <= agg["attention_ok_rate_sharpness"] <= 1.0
        assert 0.0 <= agg["attention_ok_rate_soft_monotonic"] <= 1.0
        assert agg["attention_ok_rate"] == \
            agg["attention_ok_rate_soft_monotonic"]
        assert agg["mean_seconds_per_token"] > 0
    cross = report["cross_speaker"]
    assert cross["num_speakers"] == 2
    assert cross["attention_gate"] == "soft_monotonic"
    assert {"worst_attention_ok_rate_sharpness",
            "worst_attention_ok_rate_soft_monotonic"} <= cross.keys()
    assert cross["rms_spread_ratio"] >= 1.0
    assert cross["seconds_per_token_spread_ratio"] >= 1.0
    # the whole report is JSON-serializable (the CLI writes it verbatim)
    json.dumps(report)


def test_speaker_eval_cli(tmp_path):
    out = tmp_path / "report.json"
    main(["--random_init", "--texts", "안녕", "--max_steps", "4",
          "--out", str(out), "--save_dir", str(tmp_path / "wavs")])
    report = json.loads(out.read_text())
    assert "0" in report["speakers"]
    assert (tmp_path / "wavs" / "spk0_utt0.wav").is_file()
