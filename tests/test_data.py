"""Data-layer tests on a synthetic corpus: builder schema, loss_coeff policy,
feeder filtering/bucketing/splitting, end-to-end batch into the train step.
"""

import json
import os

import numpy as np
import pytest

from tacotron_tpu.config import (Config, DataConfig, ModelConfig, TrainConfig)
from tacotron_tpu.data import (DataFeeder, build_from_path, read_metadata,
                               resolve_loss_coeffs)
from tacotron_tpu.dsp import host as dsp


def _tiny_config():
    return Config().replace(
        data=DataConfig(min_tokens=1, min_iters=1, max_iters=100,
                        bucket_size_tokens=16, bucket_size_frames=32,
                        batches_per_group=2),
        train=TrainConfig(batch_size=2, initial_phase_step=0))


def _make_corpus(root, n=6, seed=0, sr=24000):
    """Write n short sine wavs + metadata.csv; return metadata path."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    lines = []
    cfg = _tiny_config()
    texts = ["안녕하세요 만나서 반갑습니다",
             "오늘은 날씨가 정말 좋네요",
             "음성 합성 시스템을 시험합니다",
             "스물 네 시간 열두 달",
             "어제는 비가 조금 내렸어요",
             "내일 아침 일찍 만나요"]
    for i in range(n):
        dur = 0.4 + 0.2 * (i % 3)
        t = np.arange(int(dur * sr)) / sr
        wav = 0.5 * np.sin(2 * np.pi * (200 + 50 * i) * t).astype(np.float32)
        path = os.path.join(root, f"utt{i:03d}.wav")
        dsp.save_audio(wav, path, cfg.audio)
        lines.append(f"{path}|{texts[i % len(texts)]}")
    meta = os.path.join(root, "metadata.csv")
    with open(meta, "w") as fh:
        fh.write("\n".join(lines))
    return meta


def test_builder_schema_and_roundtrip(tmp_path):
    meta = _make_corpus(str(tmp_path / "spk0"))
    cfg = _tiny_config()
    stats = build_from_path(meta, cfg, num_workers=1)
    assert stats.num_built == 6
    data_dir = str(tmp_path / "spk0" / "data")
    files = sorted(os.listdir(data_dir))
    assert len(files) == 6
    with np.load(os.path.join(data_dir, files[0])) as d:
        assert d["linear"].ndim == 2 and d["linear"].shape[1] == 1025
        assert d["mel"].shape[1] == 80
        assert d["linear"].shape[0] == d["mel"].shape[0]
        assert d["tokens"].dtype == np.int32
        assert float(d["loss_coeff"]) == 1.0
    # rebuild is a no-op (cached)
    stats2 = build_from_path(meta, cfg, num_workers=1)
    assert stats2.num_built == 6


def test_loss_coeff_policy():
    info = {"a.wav": "sure", "b.wav": ["uncertain"], "c.wav": ["x", "y"]}
    # level 1: single-candidate lists are down-weighted then skipped
    texts, coeffs = resolve_loss_coeffs(info, TrainConfig(
        ignore_recognition_level=1))
    assert set(texts) == {"a.wav", "c.wav"}
    assert coeffs["c.wav"] == 1.0
    # level 0: keep everything at full weight
    texts0, coeffs0 = resolve_loss_coeffs(info, TrainConfig(
        ignore_recognition_level=0))
    assert set(texts0) == {"a.wav", "b.wav", "c.wav"}
    assert all(c == 1.0 for c in coeffs0.values())
    # level 2: every ASR-derived (list) utterance skipped
    texts2, _ = resolve_loss_coeffs(info, TrainConfig(
        ignore_recognition_level=2))
    assert set(texts2) == {"a.wav"}


def test_metadata_json(tmp_path):
    p = tmp_path / "alignment.json"
    p.write_text(json.dumps({"a.wav": "text one", "b.wav": ["maybe"]}))
    info = read_metadata(str(p))
    assert info["b.wav"] == ["maybe"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    cfg = _tiny_config()
    dirs = []
    for spk in range(2):
        meta = _make_corpus(str(root / f"spk{spk}"), seed=spk)
        build_from_path(meta, cfg, num_workers=1)
        dirs.append(str(root / f"spk{spk}" / "data"))
    return dirs


def test_feeder_batches(corpus):
    cfg = _tiny_config()
    feeder = DataFeeder(corpus, cfg, data_type="train", batch_size=2,
                        n_test=1)
    batch = next(feeder.batches())
    r = cfg.model.reduction_factor
    assert batch.inputs.shape[0] == 2
    assert batch.inputs.shape[1] % cfg.data.bucket_size_tokens == 0
    assert batch.mel_targets.shape[1] % r == 0
    assert batch.mel_targets.shape[1] % cfg.data.bucket_size_frames == 0
    assert batch.linear_targets.shape[2] == 1025
    assert set(np.unique(batch.speaker_id)) <= {0, 1}
    # input_lengths reflect true token counts, not the padded bucket
    assert (batch.input_lengths <= batch.inputs.shape[1]).all()
    assert (batch.input_lengths > 0).all()


def test_feeder_train_test_split(corpus):
    cfg = _tiny_config()
    train = DataFeeder(corpus, cfg, data_type="train", batch_size=2, n_test=1)
    test = DataFeeder(corpus, cfg, data_type="test", batch_size=2, n_test=1)
    train_paths = {p for ps in train.path_dict.values() for p in ps}
    test_paths = {p for ps in test.path_dict.values() for p in ps}
    assert train_paths.isdisjoint(test_paths)
    assert len(test_paths) == 2  # one held-out per dir
    # test feeder repeats one static batch
    it = test.batches()
    b1, b2 = next(it), next(it)
    np.testing.assert_array_equal(b1.inputs, b2.inputs)


def test_feeder_per_host_sharding(corpus):
    cfg = _tiny_config()
    shard0 = DataFeeder(corpus, cfg, data_type="train", batch_size=2,
                        n_test=0, process_index=0, process_count=2)
    shard1 = DataFeeder(corpus, cfg, data_type="train", batch_size=2,
                        n_test=0, process_index=1, process_count=2)
    p0 = {p for ps in shard0.path_dict.values() for p in ps}
    p1 = {p for ps in shard1.path_dict.values() for p in ps}
    assert p0.isdisjoint(p1)
    assert len(p0) + len(p1) == 12


def test_feeder_prefetch_thread(corpus):
    cfg = _tiny_config()
    feeder = DataFeeder(corpus, cfg, data_type="train", batch_size=2,
                        n_test=1).start(prefetch=2)
    try:
        b = feeder.get(timeout=30)
        assert b.inputs.shape[0] == 2
    finally:
        feeder.stop()


def test_feeder_filters_inadequate(corpus, tmp_path):
    """Default corpus policy (120..796 frames, >=50 tokens) drops these tiny
    utterances entirely."""
    cfg = Config()  # reference defaults
    with pytest.raises(ValueError, match="no usable"):
        DataFeeder(corpus, cfg, data_type="train", batch_size=2, n_test=0)


def test_feeder_feeds_train_step(corpus):
    import jax
    from tacotron_tpu.parallel import make_mesh, shard_batch
    from tacotron_tpu.train import (Batch, create_train_state, make_optimizer,
                                    make_train_step)
    cfg = _tiny_config()
    feeder = DataFeeder(corpus, cfg, data_type="train", batch_size=8, n_test=0)
    batch = next(feeder.batches())
    plan = make_mesh()
    opt = make_optimizer(cfg.train)
    state = create_train_state(cfg, jax.random.PRNGKey(0), opt)
    step = make_train_step(cfg, plan)
    state, m = step(state, Batch(*shard_batch(plan, batch)),
                    jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    assert not bool(m["diverged"])


def test_feeder_sampling_ratios(corpus):
    """main_data_greedy_factor biases the per-dataset sampling weights
    (reference datafeeder.py:110-125); initial greedy phase draws from the
    main dataset only (datafeeder.py:222-232)."""
    from tacotron_tpu.config import TrainConfig, DataConfig
    import dataclasses
    cfg = _tiny_config()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, main_data=("spk0",), main_data_greedy_factor=1.0,
        initial_phase_step=0))
    feeder = DataFeeder(corpus, cfg, data_type="train", batch_size=2,
                        n_test=0)
    r0 = feeder.data_ratio[feeder.data_dirs[0]]
    r1 = feeder.data_ratio[feeder.data_dirs[1]]
    assert abs(r0 - 2 / 3) < 1e-6 and abs(r1 - 1 / 3) < 1e-6

    # greedy phase: all examples come from the main dataset (speaker 0)
    cfg2 = cfg.replace(train=dataclasses.replace(
        cfg.train, initial_phase_step=1000, initial_data_greedy=True))
    feeder2 = DataFeeder(corpus, cfg2, data_type="train", batch_size=2,
                         n_test=0)
    batch = next(feeder2.batches())
    assert set(np.unique(batch.speaker_id)) == {0}


def test_feeder_bucket_shapes(corpus):
    """bucket_shapes() covers every batch shape the feeder emits, and
    collapses to the single corpus-max shape under pad_to_corpus_max."""
    import dataclasses
    cfg = _tiny_config()
    feeder = DataFeeder(corpus, cfg, data_type="train", batch_size=2,
                        n_test=0)
    shapes = feeder.bucket_shapes()
    assert shapes and shapes == sorted(set(shapes))
    it = feeder.batches()
    for _ in range(8):
        b = next(it)
        assert (b.inputs.shape[1], b.mel_targets.shape[1]) in shapes

    cfg_max = cfg.replace(data=dataclasses.replace(
        cfg.data, pad_to_corpus_max=True))
    feeder_max = DataFeeder(corpus, cfg_max, data_type="train", batch_size=2,
                            n_test=0)
    max_shapes = feeder_max.bucket_shapes()
    assert len(max_shapes) == 1
    b = next(feeder_max.batches())
    assert (b.inputs.shape[1], b.mel_targets.shape[1]) == max_shapes[0]

    # reachability filter: with correlated lengths (short text <-> short
    # audio) the ladder must NOT be the full toks x frames cross product —
    # (max tokens, min frames) can never be a batch shape because no
    # example attaining the max token bucket fits under the min frame
    # bucket.  Records are (n_tokens, n_frames) pre-bucketing.
    feeder.length_records = [(4, 40), (40, 400), (80, 800)]
    shapes = feeder.bucket_shapes()
    toks = {t for t, _ in shapes}
    frames = {f for _, f in shapes}
    assert len(shapes) < len(toks) * len(frames)
    assert (max(toks), min(frames)) not in shapes
    # diagonal pairs and the all-max pair stay reachable
    assert (max(toks), max(frames)) in shapes


def test_train_driver_prewarm(corpus, tmp_path):
    """prewarm=True compiles the bucket ladder before step 1 and the loop
    still runs; with pad_to_corpus_max the ladder is one program, so the
    prewarm step IS the training program (no extra compile cost here)."""
    import dataclasses
    import jax
    from tacotron_tpu.parallel import make_mesh
    from tacotron_tpu.train.driver import train

    cfg = _tiny_config()
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, test_interval=100,
                                  checkpoint_interval=100,
                                  decay_learning_rate_mode=1),
        data=dataclasses.replace(cfg.data, pad_to_corpus_max=True))
    plan = make_mesh(devices=jax.devices()[:2])
    run_dir = str(tmp_path / "run_prewarm")
    state = train(run_dir, corpus, cfg, num_steps=2, log_every=1, plan=plan,
                  prewarm=True)
    assert int(state.step) == 2
    with open(os.path.join(run_dir, "train.log")) as fh:
        text = fh.read()
    assert "prewarming 1 bucket program(s)" in text
    assert "prewarm done" in text


def test_train_driver_wall_budget(corpus, tmp_path):
    """max_seconds stops the loop cleanly once the wall budget elapses:
    with a 0-second budget the loop exits before step 1, the stop is
    logged, and the (step-0) state is still checkpointed for resume —
    the equal-wall-clock study-arm / preemptible-job knob."""
    import dataclasses
    import jax
    from tacotron_tpu.parallel import make_mesh
    from tacotron_tpu.train.driver import train

    cfg = _tiny_config()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, test_interval=100, checkpoint_interval=100,
        decay_learning_rate_mode=1))
    plan = make_mesh(devices=jax.devices()[:2])
    run_dir = str(tmp_path / "run_budget")
    state = train(run_dir, corpus, cfg, num_steps=50, log_every=1,
                  plan=plan, max_seconds=0.0)
    assert int(state.step) == 0
    with open(os.path.join(run_dir, "train.log")) as fh:
        assert "wall budget" in fh.read()
    # resumable: a second call picks the checkpoint up and trains past it
    state = train(run_dir, corpus, cfg, num_steps=2, log_every=1,
                  plan=plan)
    assert int(state.step) == 2


def test_train_driver_writes_metrics_and_provenance(corpus, tmp_path):
    """The driver persists per-interval scalars (metrics.jsonl — the
    reference's TB summary set, train.py:50-77) and git provenance
    (train.py:43-47), and the eval-text self-check passes at startup."""
    import dataclasses
    from tacotron_tpu.train.driver import train
    from tacotron_tpu.utils import read_metrics

    cfg = _tiny_config()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, test_interval=2, checkpoint_interval=2,
        decay_learning_rate_mode=1))
    import jax
    from tacotron_tpu.parallel import make_mesh
    plan = make_mesh(devices=jax.devices()[:2])  # batch 2 over 2 devices
    run_dir = str(tmp_path / "run")
    state = train(run_dir, corpus, cfg, num_steps=3, log_every=1, plan=plan,
                  test_dump_dir=str(tmp_path / "samples"))
    assert int(state.step) == 3

    # qualitative dumps at the test interval (reference train.py:246-270):
    # teacher-forced GL wav + alignment png, via the jitted dump forward
    assert os.path.exists(str(tmp_path / "samples" / "step000000002.wav"))
    assert os.path.exists(str(tmp_path / "samples" / "step000000002.png"))

    trains = read_metrics(os.path.join(run_dir, "metrics.jsonl"),
                          kind="train")
    assert len(trains) >= 3
    assert {"loss", "mel_loss", "linear_loss", "learning_rate",
            "grad_norm", "param_norm", "sec_per_step"} <= trains[0].keys()
    evals = read_metrics(os.path.join(run_dir, "metrics.jsonl"), kind="eval")
    assert evals and "train_test_gap" in evals[0]

    with open(os.path.join(run_dir, "git_info.txt")) as fh:
        assert fh.read().startswith("hash: ")


def test_train_driver_divergence_guard(corpus, tmp_path):
    """The loss-explosion guard (reference train.py:228-230) still fires
    under the dispatch-ahead loop, where metrics are flushed in batches
    rather than fetched per step: an absurd learning rate must raise
    DivergenceError by the end-of-run flush at the latest."""
    import dataclasses
    import jax
    from tacotron_tpu.parallel import make_mesh
    from tacotron_tpu.train.driver import DivergenceError, train

    cfg = _tiny_config()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, test_interval=1000, checkpoint_interval=1000,
        decay_learning_rate_mode=1, initial_learning_rate=1e6))
    plan = make_mesh(devices=jax.devices()[:2])
    with pytest.raises(DivergenceError):
        train(str(tmp_path / "run_div"), corpus, cfg, num_steps=10,
              log_every=1, plan=plan)
    with open(os.path.join(str(tmp_path / "run_div"), "train.log")) as fh:
        assert "Loss exploded" in fh.read()


def test_feeder_pad_to_corpus_max(corpus):
    """pad_to_corpus_max yields one static shape for every batch."""
    import dataclasses
    cfg = _tiny_config()
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, pad_to_corpus_max=True))
    feeder = DataFeeder(corpus, cfg, data_type="train", batch_size=2,
                        n_test=0)
    it = feeder.batches()
    shapes = {next(it).mel_targets.shape for _ in range(6)}
    assert len(shapes) == 1
    tok_shapes = {b.inputs.shape for b in [next(it) for _ in range(4)]}
    assert len(tok_shapes) == 1


def test_make_synthetic_corpus_feeds_builder(tmp_path):
    """scripts/make_synthetic_corpus.py output drives the npz builder
    (the first two stages of scripts/e2e_drive.sh)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "scripts", "make_synthetic_corpus.py")
    out = str(tmp_path / "corpus")
    subprocess.run(
        [sys.executable, script, out, "--speakers", "1",
         "--utterances", "2", "--batch_size", "2"],
        check=True, capture_output=True, timeout=300)
    meta = os.path.join(out, "spk0", "metadata.csv")
    assert os.path.isfile(meta)
    with open(os.path.join(out, "config.json")) as fh:
        cfg = Config.from_json(fh.read())
    stats = build_from_path(meta, cfg, num_workers=1)
    assert stats.num_built == 2
    files = os.listdir(os.path.join(out, "spk0", "data"))
    assert len(files) == 2


def test_on_device_features_pipeline(tmp_path):
    """The waveform training path (DataConfig.store_waveform +
    TrainConfig.on_device_features): the builder stores int16 wavs, the
    feeder ships them instead of spectrograms (7.4x less H2D), the train
    step extracts features on device — and the loss matches the
    precomputed-target path on the same utterances."""
    import dataclasses

    import jax

    from tacotron_tpu.data.feeder import CorpusFormatError, DataFeeder
    from tacotron_tpu.train import (Batch, create_train_state,
                                    make_optimizer, make_train_step)

    meta = _make_corpus(str(tmp_path / "spk0"), n=6)
    base = _tiny_config()
    wav_cfg = base.replace(
        data=dataclasses.replace(base.data, store_waveform=True),
        train=dataclasses.replace(base.train, on_device_features=True))
    build_from_path(meta, wav_cfg, num_workers=1)

    feeder = DataFeeder([str(tmp_path / "spk0" / "data")], wav_cfg,
                        data_type="train", batch_size=2, n_test=1)
    batch = next(feeder.batches())
    assert batch.mel_targets is None and batch.linear_targets is None
    assert batch.waveforms.dtype == np.int16
    hop = wav_cfg.audio.hop_length
    frame_len = batch.waveforms.shape[1] // hop + 1
    assert batch.waveforms.shape == (2, (frame_len - 1) * hop)

    # loss equivalence vs the precomputed-target path on the same batch
    opt = make_optimizer(wav_cfg.train)
    state = create_train_state(wav_cfg, jax.random.PRNGKey(0), opt)
    step_wav = make_train_step(wav_cfg)
    _, m_wav = step_wav(state, batch, jax.random.PRNGKey(1))

    # exact contract: the on-device features equal host features of the
    # SAME padded int16 waveforms — so the loss must match tightly when
    # the precomputed targets are built from them
    from tacotron_tpu.dsp import host as dsp_host
    wav_f = batch.waveforms.astype(np.float32) / 32767.0
    mel_t = np.stack([dsp_host.melspectrogram(w, base.audio).T
                      for w in wav_f])
    lin_t = np.stack([dsp_host.spectrogram(w, base.audio).T
                      for w in wav_f])
    same_targets = batch._replace(waveforms=None,
                                  mel_targets=mel_t.astype(np.float32),
                                  linear_targets=lin_t.astype(np.float32))
    state2 = create_train_state(base, jax.random.PRNGKey(0), opt)
    step_spec = make_train_step(base)
    _, m_same = step_spec(state2, same_targets, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m_wav["loss"]),
                               float(m_same["loss"]), rtol=2e-3)

    # vs the builder's stored targets: only the utterance-final frames
    # (zero-pad vs reflect-pad analysis context) and int16 quantization
    # differ — a bounded deviation on these very short test utterances,
    # documented in dsp.chip.features_from_waveform
    spec_feeder = DataFeeder([str(tmp_path / "spk0" / "data")], base,
                             data_type="train", batch_size=2, n_test=1)
    spec_batch = next(spec_feeder.batches())
    # same files in the same order (same seed/striping): tokens identical
    np.testing.assert_array_equal(spec_batch.inputs, batch.inputs)
    state3 = create_train_state(base, jax.random.PRNGKey(0), opt)
    _, m_spec = step_spec(state3, spec_batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m_wav["loss"]),
                               float(m_spec["loss"]), rtol=0.15)

    # a corpus without wavs + on_device_features is a config error
    meta2 = _make_corpus(str(tmp_path / "spk1"), n=6)
    build_from_path(meta2, base, num_workers=1)
    bad = DataFeeder([str(tmp_path / "spk1" / "data")], wav_cfg,
                     data_type="train", batch_size=2, n_test=1)
    with pytest.raises(CorpusFormatError):
        next(bad.batches())


def test_train_prefetch_matches_synchronous(corpus, tmp_path):
    """prefetch_depth>0 overlaps H2D transfer with compute but consumes the
    exact same batch sequence: parameters after N steps are bitwise equal
    to the synchronous loop's (round-3 verdict ask #2)."""
    import dataclasses
    import jax
    from tacotron_tpu.parallel import make_mesh
    from tacotron_tpu.train.driver import train

    cfg = _tiny_config()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, test_interval=100, checkpoint_interval=100,
        decay_learning_rate_mode=1))
    plan = make_mesh(devices=jax.devices()[:2])
    s_sync = train(str(tmp_path / "sync"), corpus, cfg, num_steps=4,
                   plan=plan, prefetch_depth=0)
    s_pre = train(str(tmp_path / "pre"), corpus, cfg, num_steps=4,
                  plan=plan, prefetch_depth=2)
    assert int(s_sync.step) == int(s_pre.step) == 4
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        s_sync.params, s_pre.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        s_sync.batch_stats, s_pre.batch_stats)


def test_resident_feeder_matches_host(corpus):
    """ResidentDataFeeder emits the exact batch sequence the streaming
    feeder does under pad_to_corpus_max (same rng stream): small fields
    equal, and gathering the store rows reproduces the big tensors."""
    import dataclasses
    from tacotron_tpu.data.resident import ResidentDataFeeder

    base = _tiny_config()
    cfg_max = base.replace(data=dataclasses.replace(
        base.data, pad_to_corpus_max=True))
    host = DataFeeder(corpus, cfg_max, data_type="train", batch_size=2,
                      n_test=1, seed=7)
    res = ResidentDataFeeder(corpus, base, data_type="train", batch_size=2,
                             n_test=1, seed=7)
    store = res.host_store()
    hb, rb = host.batches(), res.batches()
    for _ in range(6):
        b = next(hb)
        small, idx = next(rb)
        np.testing.assert_array_equal(b.inputs, small.inputs)
        np.testing.assert_array_equal(b.input_lengths, small.input_lengths)
        np.testing.assert_array_equal(b.loss_coeff, small.loss_coeff)
        np.testing.assert_array_equal(b.speaker_id, small.speaker_id)
        np.testing.assert_array_equal(b.target_lengths, small.target_lengths)
        np.testing.assert_array_equal(b.mel_targets,
                                      store["mel_targets"][idx])
        np.testing.assert_array_equal(b.linear_targets,
                                      store["linear_targets"][idx])


def test_resident_feeder_guards(corpus):
    """Config/usage errors fail fast: test split, multi-process, byte cap."""
    import dataclasses
    import pytest
    from tacotron_tpu.data.resident import ResidentDataFeeder

    cfg = _tiny_config()
    with pytest.raises(ValueError, match="train-only"):
        ResidentDataFeeder(corpus, cfg, data_type="test")
    with pytest.raises(ValueError, match="single-process"):
        ResidentDataFeeder(corpus, cfg, process_count=2)
    small_cap = cfg.replace(train=dataclasses.replace(
        cfg.train, resident_corpus_max_bytes=1024))
    with pytest.raises(ValueError, match="resident_corpus_max_bytes"):
        ResidentDataFeeder(corpus, small_cap)


def test_train_resident_matches_streaming(corpus, tmp_path):
    """device_resident_corpus trains on ON-DEVICE gathered batches but
    consumes the same example stream: parameters after N steps are
    bitwise equal to the streaming pad_to_corpus_max loop's."""
    import dataclasses
    import jax
    from tacotron_tpu.parallel import make_mesh
    from tacotron_tpu.train.driver import train

    cfg = _tiny_config()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, test_interval=100, checkpoint_interval=100,
        decay_learning_rate_mode=1))
    stream_cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, pad_to_corpus_max=True))
    resident_cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, device_resident_corpus=True))
    plan = make_mesh(devices=jax.devices()[:2])
    s_stream = train(str(tmp_path / "stream"), corpus, stream_cfg,
                     num_steps=4, plan=plan, prefetch_depth=0)
    s_res = train(str(tmp_path / "res"), corpus, resident_cfg,
                  num_steps=4, plan=plan)
    assert int(s_stream.step) == int(s_res.step) == 4
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        s_stream.params, s_res.params)
    run_log = open(str(tmp_path / "res" / "train.log")).read()
    assert "resident corpus:" in run_log


def test_resident_feeder_waveform_mode(tmp_path):
    """Resident store in waveform mode (on_device_features): gathered
    int16 rows equal the streaming feeder's padded waveform batches."""
    import dataclasses
    from tacotron_tpu.data.resident import ResidentDataFeeder

    meta = _make_corpus(str(tmp_path / "spk0"), n=6)
    base = _tiny_config()
    wav_cfg = base.replace(
        data=dataclasses.replace(base.data, store_waveform=True),
        train=dataclasses.replace(base.train, on_device_features=True))
    build_from_path(meta, wav_cfg, num_workers=1)
    dirs = [str(tmp_path / "spk0" / "data")]

    host_cfg = wav_cfg.replace(data=dataclasses.replace(
        wav_cfg.data, pad_to_corpus_max=True))
    host = DataFeeder(dirs, host_cfg, data_type="train", batch_size=2,
                      n_test=1, seed=3)
    res = ResidentDataFeeder(dirs, wav_cfg, data_type="train", batch_size=2,
                             n_test=1, seed=3)
    store = res.host_store()
    assert store["waveforms"].dtype == np.int16
    hb, rb = host.batches(), res.batches()
    for _ in range(4):
        b = next(hb)
        small, idx = next(rb)
        np.testing.assert_array_equal(b.inputs, small.inputs)
        np.testing.assert_array_equal(b.waveforms, store["waveforms"][idx])
