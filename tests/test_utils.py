"""Utils tests: ValueWindow, run dirs, infolog, str2bool, duration tool."""

import os

import numpy as np
import pytest

from tacotron_tpu.config import AudioConfig
from tacotron_tpu.dsp import host as dsp
from tacotron_tpu.tools.duration import dataset_totals, wav_duration
from tacotron_tpu.utils import (ValueWindow, init_log, log, prepare_dirs,
                                str2bool)


def test_value_window():
    w = ValueWindow(3)
    for v in [1, 2, 3, 4]:
        w.append(v)
    assert w.count == 3
    assert w.average == pytest.approx(3.0)  # keeps last 3: 2,3,4
    w.reset()
    assert w.count == 0 and w.average == 0.0


def test_prepare_dirs(tmp_path):
    run = prepare_dirs(str(tmp_path / "logs"), ["/data/spk0/data",
                                                "/data/spk1/data"])
    assert os.path.isdir(run)
    base = os.path.basename(run)
    assert base.startswith("data+data_")


def test_infolog_writes_file(tmp_path):
    path = str(tmp_path / "train.log")
    init_log(path, "testrun")
    log("hello from the test")
    with open(path) as fh:
        content = fh.read()
    assert "hello from the test" in content
    assert "testrun" in content


def test_str2bool():
    assert str2bool("true") and str2bool("1") and str2bool("Yes")
    assert not str2bool("false") and not str2bool("0")
    with pytest.raises(ValueError):
        str2bool("maybe")


def test_duration_tool(tmp_path):
    cfg = AudioConfig()
    wav = np.zeros(24000, np.float32)
    wav[0] = 1.0  # avoid div-by-zero in peak normalize
    dsp.save_audio(wav, str(tmp_path / "a.wav"), cfg)
    dsp.save_audio(np.concatenate([wav, wav]), str(tmp_path / "b.wav"), cfg)
    assert wav_duration(str(tmp_path / "a.wav")) == pytest.approx(1.0)
    totals = dataset_totals([str(tmp_path / "*.wav")])
    (n, seconds), = totals.values()
    assert n == 2 and seconds == pytest.approx(3.0)


def test_crc32c_known_vectors():
    """Castagnoli CRC known-answer tests (RFC 3720 / kernel test vectors)."""
    from tacotron_tpu.utils.tb_events import _crc32c
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA


def test_tb_event_writer_roundtrip(tmp_path):
    """Events written by TBEventWriter parse back (TFRecord framing + Event
    proto), preserving steps, tags, and float32 values."""
    from tacotron_tpu.utils import TBEventWriter, read_tb_scalars
    w = TBEventWriter(str(tmp_path))
    w.scalars(1, {"train/loss": 0.5, "train/lr": 1e-3})
    w.scalars(2, {"train/loss": 0.25, "skipme": "not-a-float"})
    w.close()
    recs = read_tb_scalars(w.path)
    by = {(r["step"], r["tag"]): r["value"] for r in recs}
    assert by[(1, "train/loss")] == pytest.approx(0.5)
    assert by[(1, "train/lr")] == pytest.approx(1e-3, rel=1e-6)
    assert by[(2, "train/loss")] == pytest.approx(0.25)
    assert not any(r["tag"] == "skipme" for r in recs)
    assert all(r["wall_time"] > 0 for r in recs)


def test_metrics_logger_mirrors_tensorboard(tmp_path):
    """MetricsLogger(tb_logdir=...) writes both metrics.jsonl and a parseable
    events.out.tfevents.* with <kind>/<key> tags."""
    import glob
    from tacotron_tpu.utils import MetricsLogger, read_metrics, read_tb_scalars
    path = str(tmp_path / "metrics.jsonl")
    with MetricsLogger(path, tb_logdir=str(tmp_path)) as m:
        m.write(10, {"loss": 1.5, "grad_norm": 0.1})
        m.write(10, {"loss": 2.0}, kind="eval")
    assert len(read_metrics(path)) == 2
    (events,) = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    tags = {(r["step"], r["tag"]): r["value"] for r in read_tb_scalars(events)}
    assert tags[(10, "train/loss")] == pytest.approx(1.5)
    assert tags[(10, "train/grad_norm")] == pytest.approx(0.1)
    assert tags[(10, "eval/loss")] == pytest.approx(2.0)
