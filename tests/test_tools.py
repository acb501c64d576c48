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


# ---------------------------------------------------------------------------
# site-specific scrapers (offline: parsing rules on fixtures, injected fetch)
# ---------------------------------------------------------------------------

LISTING_XML = """<?xml version="1.0"?><root>
  <news><news_id> NB11515152 </news_id></news>
  <news><news_id>NB11515153</news_id></news>
</root>"""

ARTICLE_XML = """<root>
<article_contents><![CDATA[
<div>앵커 멘트입니다. 오늘의 주요 뉴스를 전해드립니다.<br/>
[김철수 기자 : 현장 분위기는 차분합니다.]
두 번째 문장입니다… 계속 이어집니다 (취재진 제공).
☞ 자세한 내용은 (http://example.com/full) 에서
(http://example.com/)
마지막 문장입니다.</div>
]]></article_contents>
<vod_path>http://vod.example.com/master.m3u8</vod_path>
</root>"""

MASTER_M3U8 = """#EXTM3U
#EXT-X-STREAM-INF:BANDWIDTH=1280000
variant/stream.m3u8
"""

MEDIA_M3U8 = """#EXTM3U
#EXTINF:10.0,
seg0.ts
#EXTINF:10.0,
seg1.ts
#EXT-X-ENDLIST
"""

RSS_XML = """<rss><channel>
<item><title>[KBS] 친절한 인나씨 17회</title>
  <guid>http://cdn.example.com/pod/show_a_20170501_ep.mp4</guid></item>
<item><title>[KBS] 반납예정일 3회</title>
  <guid>http://cdn.example.com/pod/show_b_20170502_ep.mp4</guid></item>
<item><title>[KBS] 친절한 인나씨 16-17회 합본</title>
  <guid>http://cdn.example.com/pod/show_a_20170503_ep.mp4</guid></item>
<item><title>[KBS] 다른 프로그램</title>
  <guid>http://cdn.example.com/pod/show_c_20170504_ep.mp4</guid></item>
<item><title>귀욤열매 드세요 1회</title>
  <enclosure url="http://cdn.example.com/pod/show_d_20170505_ep.mp3"
             type="audio/mpeg"/></item>
</channel></rss>"""


def test_scrape_news_listing_and_article():
    from tacotron_tpu.tools.scrape import NewsApiScraper

    fetched = []

    def fake_fetch(url):
        fetched.append(url)
        if "PGI=1" in url:
            return LISTING_XML
        if "PGI=" in url:
            return "<root></root>"
        if "NID=NB11515152" in url:
            return ARTICLE_XML
        if url.endswith("master.m3u8"):
            return MASTER_M3U8
        if url.endswith("stream.m3u8"):
            return MEDIA_M3U8
        raise AssertionError(url)

    s = NewsApiScraper("http://api.example.com/news",
                       list_params={"NJC": "NJC300"},
                       article_params={"NJC": "NJC400"},
                       fetch=fake_fetch)
    ids = s.collect_news_ids()
    assert ids == ["NB11515152", "NB11515153"]

    sentences, original, vod = s.fetch_article("NB11515152")
    assert vod == "http://vod.example.com/master.m3u8"
    # reporter quote, promo blurb, urls and parentheticals are gone
    joined = " ".join(sentences)
    assert "김철수" not in joined and "http" not in joined
    assert "취재진" not in joined and "☞" not in joined
    assert sentences[0] == "앵커 멘트입니다."
    # like the reference, … -> . happens after sentence split (no re-split)
    assert any(s.startswith("두 번째 문장입니다.") for s in sentences)
    assert "…" not in joined
    assert sentences[-1] == "마지막 문장입니다."
    assert "<div>" not in original and "앵커 멘트입니다" in original

    segs = s.resolve_segments(vod)
    assert segs == ["http://vod.example.com/variant/seg0.ts",
                    "http://vod.example.com/variant/seg1.ts"]


def test_scrape_news_download(tmp_path, monkeypatch):
    from tacotron_tpu.tools import scrape

    def fake_fetch(url):
        if "NID=" in url:
            return ARTICLE_XML
        if url.endswith("master.m3u8"):
            return MASTER_M3U8
        return MEDIA_M3U8

    s = scrape.NewsApiScraper("http://api.example.com/news",
                              fetch=fake_fetch,
                              fetch_bytes=lambda url: b"TS" + url[-7:].encode())
    # no ffmpeg in the sandboxed test: stub the audio extraction call
    calls = []
    monkeypatch.setattr(scrape.shutil, "which", lambda name: "/bin/true")
    monkeypatch.setattr(scrape.subprocess, "run",
                        lambda *a, **k: calls.append(a[0]))
    out = s.download("NB11515152", str(tmp_path))
    assert open(out["text"], encoding="utf-8").read().startswith("앵커 멘트입니다.")
    assert open(out["video"], "rb").read() == b"TSseg0.tsTSseg1.ts"
    assert calls and calls[0][0] == "/bin/true"
    assert os.path.exists(tmp_path / "assets" / "original-NB11515152.txt")


def test_podcast_feed_selection(tmp_path):
    from tacotron_tpu.tools.scrape import KBS_YUINNA, PodcastFeed

    feed = PodcastFeed("http://feed.example.com/rss",
                       fetch=lambda url: RSS_XML,
                       fetch_bytes=lambda url: b"AUDIO:" + url.encode())
    items = feed.parse_items(RSS_XML)
    assert len(items) == 5 and items[0][0] == "[KBS] 친절한 인나씨 17회"
    # enclosure fallback when <guid> is absent
    assert items[4][1].endswith("show_d_20170505_ep.mp3")

    picked = feed.select_episodes(items, KBS_YUINNA["accept_list"])
    # re-run title with '-' and the unlisted programme are filtered out
    assert set(picked) == {"20170501", "20170502", "20170505"}

    paths = feed.download_all(str(tmp_path), KBS_YUINNA["accept_list"],
                              max_num=2)
    assert [os.path.basename(p) for p in paths] == ["20170501.mp4",
                                                    "20170502.mp4"]
    assert open(paths[0], "rb").read().startswith(b"AUDIO:")


class TestDurations:
    """Multi-format duration parsing (the reference's TinyTag coverage,
    /root/reference/audio/get_duration.py:14-56) on synthetic files."""

    def test_mp3_cbr_estimate(self, tmp_path):
        from tacotron_tpu.tools.duration import mp3_duration
        # MPEG-1 Layer III, 128 kbps, 44100 Hz: frame = 417 bytes
        header = bytes([0xFF, 0xFB, 0x90, 0x00])
        frame = header + bytes(413)
        path = tmp_path / "t.mp3"
        path.write_bytes(frame * 10)
        got = mp3_duration(str(path))
        assert abs(got - 10 * 417 * 8 / 128000) < 1e-6

    def test_mp3_id3_skip_and_xing(self, tmp_path):
        import struct
        from tacotron_tpu.tools.duration import mp3_duration
        # a cover-art-sized ID3v2 tag (larger than the 256 KB scan
        # buffer) must be seeked past, not scanned through
        n = 300 * 1024
        tag_body = bytes(n)
        id3 = b"ID3" + bytes([3, 0, 0]) + bytes(
            [(n >> 21) & 0x7F, (n >> 14) & 0x7F,
             (n >> 7) & 0x7F, n & 0x7F])
        header = bytes([0xFF, 0xFB, 0x90, 0x00])
        xing = (bytes(32) + b"Xing" + struct.pack(">I", 1)
                + struct.pack(">I", 100))
        frame = (header + xing + bytes(417 - 4 - len(xing)))
        path = tmp_path / "v.mp3"
        plain = header + bytes(413)  # following CBR frames (417 bytes)
        path.write_bytes(id3 + tag_body + frame + plain * 10)
        got = mp3_duration(str(path))
        assert abs(got - 100 * 1152 / 44100) < 1e-6

    def test_mp3_false_sync_rejected(self, tmp_path):
        from tacotron_tpu.tools.duration import mp3_duration
        # A plausible-looking header (MPEG-1 L3, 32 kbps -> frame 104
        # bytes) buried in garbage, NOT followed by another frame: the
        # parser must skip it and lock onto the real 128 kbps stream.
        false_sync = bytes([0xFF, 0xFB, 0x20, 0x00]) + bytes(200)
        header = bytes([0xFF, 0xFB, 0x90, 0x00])
        frame = header + bytes(413)
        path = tmp_path / "g.mp3"
        path.write_bytes(false_sync + frame * 10)
        size = len(false_sync) + 417 * 10
        # CBR estimate from the REAL frame position/bitrate
        expected = (size - len(false_sync)) * 8.0 / 128000
        assert abs(mp3_duration(str(path)) - expected) < 1e-6

    def test_m4a_mvhd(self, tmp_path):
        import struct
        from tacotron_tpu.tools.duration import m4a_duration
        mvhd_body = (bytes([0]) + bytes(3) + bytes(8)          # v0 + dates
                     + struct.pack(">I", 1000)                 # timescale
                     + struct.pack(">I", 2500) + bytes(80))    # duration
        mvhd = struct.pack(">I4s", 8 + len(mvhd_body), b"mvhd") + mvhd_body
        moov = struct.pack(">I4s", 8 + len(mvhd), b"moov") + mvhd
        ftyp = struct.pack(">I4s", 16, b"ftyp") + b"M4A " + bytes(4)
        path = tmp_path / "t.m4a"
        path.write_bytes(ftyp + moov)
        assert abs(m4a_duration(str(path)) - 2.5) < 1e-9

    def test_dispatch_and_totals(self, tmp_path):
        import numpy as np
        from tacotron_tpu.config import AudioConfig
        from tacotron_tpu.dsp import host as dsp
        from tacotron_tpu.tools.duration import audio_duration, get_durations
        cfg = AudioConfig(sample_rate=8000)
        wav = tmp_path / "a.wav"
        dsp.save_audio(np.zeros(8000, np.float32), str(wav), cfg)
        assert abs(audio_duration(str(wav)) - 1.0) < 1e-6
        header = bytes([0xFF, 0xFB, 0x90, 0x00])
        (tmp_path / "b.mp3").write_bytes((header + bytes(413)) * 4)
        durations = get_durations([str(wav), str(tmp_path / "b.mp3"),
                                   str(tmp_path / "missing.wav")])
        assert len(durations) == 2


def test_melody_corpus_tone_instrument_self_consistency():
    """The convergence study's measurement instrument validated against
    ground truth: a melody_wav synthesized directly from tokens must score
    100% token-tone accuracy and sit inside its speaker band — otherwise
    study numbers would measure the instrument, not the model."""
    import os
    import sys
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    from convergence_study import dominant_hz, token_tone_accuracy
    from make_synthetic_corpus import (melody_wav, speaker_band_hz,
                                       token_frequency)
    from tacotron_tpu.text import text_to_sequence

    text = "오늘은 아침에 노래를 불러요"
    tokens = text_to_sequence(text, ["korean_cleaners"])
    for spk in (0, 1):
        wav = melody_wav(tokens, spk, 24000)
        acc = token_tone_accuracy(wav, text, spk, 24000)
        assert acc["accuracy"] == 1.0 and acc["n_segments"] > 10
        lo, hi = speaker_band_hz(spk)
        assert lo * 0.9 <= dominant_hz(wav, 24000) < hi * 1.1
    # disjoint speaker bands; bin-aligned tones (exact FFT grid multiples)
    assert speaker_band_hz(0)[1] < speaker_band_hz(1)[0]
    f = token_frequency(13, 0, 24000)
    assert abs(f / (24000 / 2048.0) - round(f / (24000 / 2048.0))) < 1e-9


def test_melody_var_corpus_instrument_and_discriminance():
    """The VARIABLE-RATE corpus's measurement instrument, validated two
    ways against ground truth: (a) a melody_var wav read with the
    variable-rate slot bounds scores 100% — synthesis and measurement
    share token_slot_bounds, so they can never disagree; (b) the SAME wav
    read with the uniform-rate bounds scores far below — i.e. the
    instrument genuinely discriminates non-uniform alignment, so a model
    that advanced one token per step regardless of duration could not
    score well on the melody_var study."""
    import os
    import sys
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    from convergence_study import token_tone_accuracy
    from make_synthetic_corpus import (VAR_MAX_STEPS, VAR_MIN_STEPS,
                                       melody_wav, token_duration_steps,
                                       token_slot_bounds)
    from tacotron_tpu.text import text_to_sequence

    # durations: deterministic, in range, and genuinely varied over the
    # jamo id range (a constant function would be the uniform corpus)
    durs = [token_duration_steps(i) for i in range(80)]
    assert all(VAR_MIN_STEPS <= d <= VAR_MAX_STEPS for d in durs)
    assert len(set(durs)) == VAR_MAX_STEPS - VAR_MIN_STEPS + 1

    text = "오늘은 아침에 노래를 불러요"
    tokens = text_to_sequence(text, ["korean_cleaners"])
    # the sentence itself must exercise several durations
    assert len({token_duration_steps(int(t)) for t in tokens}) >= 2

    sr = 24000
    for spk in (0, 1):
        wav = melody_wav(tokens, spk, sr, variable_rate=True)
        bounds = token_slot_bounds(tokens, sr, True)
        assert len(wav) == bounds[-1][1]  # slots tile the wav exactly
        var_acc = token_tone_accuracy(wav, text, spk, sr,
                                      variable_rate=True)
        assert var_acc["accuracy"] == 1.0 and var_acc["n_segments"] > 10
        assert var_acc["measured_fraction"] == 1.0
        uni_acc = token_tone_accuracy(wav, text, spk, sr,
                                      variable_rate=False)
        assert uni_acc["accuracy"] < 0.6, uni_acc
        # a truncated decode (collapsed attention emitting a stump) is a
        # MISS for every unmeasurable slot, not a shorter denominator —
        # otherwise a 2-slot stump could score 100%
        stump = token_tone_accuracy(wav[:len(wav) // 4], text, spk, sr,
                                    variable_rate=True)
        assert stump["n_segments"] == var_acc["n_segments"]
        assert stump["accuracy"] <= 0.35
        assert stump["measured_fraction"] <= 0.35


def test_melody_var_fits_serving_step_budget():
    """Re-validation of the serving steps_per_token=4.0 decode budget
    (synth/synthesizer.py) against the variable-rate corpus: its worst
    case — every token at VAR_MAX_STEPS decoder steps — is exactly what
    the budget must cover, for every sentence in the melody pool plus
    the fixed TEXTS."""
    import math
    import os
    import sys
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    from make_synthetic_corpus import (TEXTS, sentence_pool,
                                       token_duration_steps)
    from tacotron_tpu.synth.synthesizer import (STEPS_PER_TOKEN,
                                                adaptive_max_steps)
    from tacotron_tpu.text import text_to_sequence

    for text in sentence_pool() + TEXTS:
        tokens = text_to_sequence(text, ["korean_cleaners"])
        true_steps = sum(token_duration_steps(int(t)) for t in tokens)
        budget = adaptive_max_steps(len(tokens), min_iters=1,
                                    max_iters=200)
        assert true_steps <= budget, (text, true_steps, budget)
        # and the margin is structural, not luck: worst-case duration
        # never exceeds the per-token budget rate
        assert STEPS_PER_TOKEN >= 3
        assert true_steps <= math.ceil(STEPS_PER_TOKEN * len(tokens))


def test_mulaw_quality_lsd_floor():
    """scripts/mulaw_quality.py's LSD: identical signals score 0; with the
    -60 dB dynamic-range floor the metric ignores quantization noise in
    silent bins (which otherwise dominates: the unfloored value explodes
    even though the audible band is untouched)."""
    import sys
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    from mulaw_quality import log_spectral_distance, snr_db

    rng = np.random.default_rng(0)
    t = np.arange(24000 * 2) / 24000.0
    tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float64)
    assert log_spectral_distance(tone, tone) == 0.0

    # mu-law-like additive noise at -50 dBFS: inaudible next to the tone,
    # but it fills bins that are silent in the reference
    noisy = tone + 3e-3 * rng.standard_normal(tone.shape)
    floored = log_spectral_distance(tone, noisy)
    raw = log_spectral_distance(tone, noisy, floor_db=None)
    assert floored < 1.0, floored          # under the audibility rule of thumb
    assert raw > 5 * max(floored, 1e-9)    # unfloored is noise-floor-driven
    assert snr_db(tone, noisy) > 40.0
