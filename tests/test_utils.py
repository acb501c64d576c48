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
