"""Corpus-toolchain tests: silence splitting on synthetic audio, fuzzy
ASR/script alignment, offline ASR batch flow with a fake recognizer."""

import json
import os

import numpy as np

from tacotron_tpu.config import AudioConfig
from tacotron_tpu.dsp import host as dsp
from tacotron_tpu.tools import (align_text, detect_nonsilent, similarity,
                                split_on_silence)
from tacotron_tpu.tools.alignment import align_batch, search_optimal
from tacotron_tpu.tools.asr import transcribe_batch


def _speech_like(sr, seconds, f0=220.0):
    t = np.arange(int(sr * seconds)) / sr
    return (0.5 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)


def test_detect_nonsilent():
    sr = 24000
    silence = np.zeros(sr, np.float32)
    speech = _speech_like(sr, 2.0)
    y = np.concatenate([silence, speech, silence, speech, silence])
    intervals = detect_nonsilent(y, top_db=40)
    assert len(intervals) == 2
    # intervals cover the speech (within a frame of slack)
    assert abs(intervals[0][0] - sr) < 2048
    assert abs(intervals[0][1] - 3 * sr) < 2048


def test_split_on_silence(tmp_path):
    sr = 24000
    cfg = AudioConfig()
    parts = [np.zeros(sr, np.float32)]
    for k in range(3):
        parts += [_speech_like(sr, 4.0, 200 + 40 * k),
                  np.zeros(sr, np.float32)]
    y = np.concatenate(parts)
    path = str(tmp_path / "long.wav")
    dsp.save_audio(y, path, cfg)
    outs = split_on_silence(path, min_segment_length=3.0,
                            max_segment_length=8.0, breath_removal=False)
    assert len(outs) == 3
    seg = dsp.load_audio(outs[0], cfg)
    assert 3.0 < len(seg) / sr < 8.0


def test_similarity_and_search_optimal():
    assert similarity("안녕하세요.", "안녕하세요") == 1.0
    assert similarity("abc", "xyz") == 0.0
    # ASR text contained in the scripted sentence -> ASR text wins
    assert search_optimal("오늘은 날씨가 좋다", "날씨가 좋다") == "날씨가 좋다"
    # script trimmed to the span the ASR covers
    out = search_optimal("그리고 오늘은 날씨가 정말 좋았습니다",
                         "오늘은 날씨가 정말")
    assert out.startswith("오늘은")


def test_align_text_confidence_levels():
    cands = ["오늘은 날씨가 정말 좋습니다", "내일은 비가 온다고 합니다"]
    confident = align_text("오늘은 날씨가 정말 좋습니다", cands)
    assert isinstance(confident, str)
    # no good candidate -> kept as uncertain single-element list
    uncertain = align_text("전혀 관계 없는 문장입니다", cands,
                           score_threshold=0.8)
    assert isinstance(uncertain, list) and len(uncertain) == 1


def test_align_batch_roundtrip(tmp_path):
    rec = {"a.wav": "오늘은 날씨가 좋습니다", "b.wav": "완전히 다른 이야기"}
    (tmp_path / "recognition.json").write_text(
        json.dumps(rec, ensure_ascii=False))
    (tmp_path / "script.txt").write_text(
        "오늘은 날씨가 좋습니다\n내일은 비가 옵니다\n")
    out = align_batch(str(tmp_path / "recognition.json"),
                      str(tmp_path / "script.txt"),
                      score_threshold=0.6)
    assert isinstance(out["a.wav"], str)
    assert isinstance(out["b.wav"], list)
    saved = json.loads((tmp_path / "alignment.json").read_text())
    assert set(saved) == {"a.wav", "b.wav"}


def test_transcribe_batch_with_fake_recognizer(tmp_path):
    cfg = AudioConfig()
    for i in range(2):
        dsp.save_audio(_speech_like(24000, 1.0), str(tmp_path / f"c{i}.wav"),
                       cfg)
    calls = []

    def fake_recognize(audio_16k, language):
        calls.append(language)
        assert abs(len(audio_16k) - 16000) < 100  # resampled to 16 kHz
        return f"가짜 전사 {len(calls)}"

    out = transcribe_batch(str(tmp_path / "*.wav"),
                           recognize_fn=fake_recognize)
    assert len(out) == 2 and len(calls) == 2
    # sidecar cache: second run does not call the recognizer
    out2 = transcribe_batch(str(tmp_path / "*.wav"),
                            recognize_fn=fake_recognize)
    assert out2 == out and len(calls) == 2
    assert os.path.exists(tmp_path / "recognition.json")


def test_book_align():
    from tacotron_tpu.tools.book_align import BookIndex, align_book
    book = ("옛날 옛적에 한 소년이 살았습니다 소년은 매일 아침 일찍 일어나 "
            "숲으로 갔습니다 숲에서 그는 여러 동물 친구들을 만났습니다 "
            "어느 날 커다란 곰이 나타나 소년에게 말을 걸었습니다 "
            "둘은 곧 가장 친한 친구가 되었습니다")
    rec = {
        # clean ASR of a middle span
        "c1.wav": "숲에서 그는 여러 동물 친구들을 만났습니다",
        # ASR with one wrong word: still anchors via surviving ngrams
        "c2.wav": "어느 날 커다란 호랑이가 나타나 소년에게 말을 걸었습니다",
        # out-of-book babble: low confidence -> uncertain list
        "c3.wav": "완전히 관련 없는 내용의 문장입니다 전혀 다른 이야기",
    }
    out = align_book(rec, book, ngram=2, confidence_threshold=0.3)
    assert out["c1.wav"] == "숲에서 그는 여러 동물 친구들을 만났습니다"
    assert isinstance(out["c2.wav"], str) and "곰이" in out["c2.wav"]
    assert isinstance(out["c3.wav"], list)

    idx = BookIndex(book, 2)
    start, end, cov = idx.locate(rec["c1.wav"])
    assert cov == 1.0
    assert " ".join(idx.words[start:end]) == rec["c1.wav"]
