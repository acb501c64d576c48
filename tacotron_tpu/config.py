"""Typed, immutable configuration for the TPU-native Tacotron framework.

Replaces the reference's process-global mutable ``tf.contrib.training.HParams``
singleton (``/root/reference/hparams.py:8-150``) with frozen dataclasses threaded
explicitly through constructors.  Default values reproduce the hyperparameters
that are *actually in effect* in the reference after its layered ``update()``
blocks (``hparams.py:26-29`` sets sample_rate=24000; the ``elif True`` Deep
Voice 2 block at ``hparams.py:83-94`` sets dropout_prob=0.8, post_rnn_size=256).

Configs serialize to/from JSON so that a run directory records the exact
configuration it was trained with (reference: ``utils/__init__.py:100-126``).
"""

from __future__ import annotations

import dataclasses
import json
import re
from typing import Any, Tuple


@dataclasses.dataclass(frozen=True)
class AudioConfig:
    """STFT / mel / Griffin-Lim parameters (reference ``hparams.py:14-29,144-145``)."""

    num_mels: int = 80
    num_freq: int = 1025
    sample_rate: int = 24000
    frame_length_ms: float = 50.0
    frame_shift_ms: float = 12.5
    preemphasis: float = 0.97
    min_level_db: float = -100.0
    ref_level_db: float = 20.0
    griffin_lim_iters: int = 60
    power: float = 1.5  # magnitude exponent applied before Griffin-Lim
    # On-chip Griffin-Lim engine.  "auto" (default) resolves at dispatch:
    # the "fused" single-Pallas-kernel iteration on TPU (the whole
    # frame->DFT->project->iDFT->OLA step VMEM-resident per batch item,
    # measured +23% over matmul_half at B=32 — ops/pallas/gl_fused.py),
    # "matmul_half" elsewhere (interpret-mode pallas on CPU is needlessly
    # slow for tests).  Explicit engines: "matmul_half" runs the DFT as
    # bf16 MXU matmuls in u/v split-bin form — ~2.3x fewer MACs than
    # "matmul_bf16" with zero relayouts; "matmul_bf16" is the dense
    # single-stage variant; "fft" is the bit-careful XLA FFT path used
    # for strict parity checks; "fused" forces the Pallas iteration
    # kernel (note its documented edge deviation: the carried signal is
    # re-framed at full OLA length instead of center-slice+reflect-pad,
    # so the ~n_fft/2 samples at each end converge against OLA-spill
    # context — interior waveform corr vs fft is BETTER than
    # matmul_half's); "pallas" fuses only the magnitude-projection
    # spectral step; "matmul_split" factorizes the DFT into two
    # VMEM-sized stages (Cooley-Tukey) — both measured parity-not-win,
    # see dsp/chip.py.
    griffin_lim_impl: str = "auto"
    # Overlap-add implementation inside the Griffin-Lim loop: "pallas"
    # (fused single-kernel OLA, ops/pallas/ola.py — keeps the windowed
    # frames / chunk tensor / shifted copies in VMEM instead of HBM;
    # measured +19% whole-loop at batch 32), "xla" (shifted-add
    # formulation), or "auto" (default: pallas on TPU, xla elsewhere —
    # interpret-mode pallas on CPU is needlessly slow for tests).
    ola_impl: str = "auto"
    # Fast Griffin-Lim (Perraudin et al. 2013) momentum: y' = t + a*(t - t_prev)
    # where t is the plain GL update.  0.0 (default) = classic Griffin-Lim,
    # exact reference parity.  At 0.99, ~30 iterations match the spectral
    # convergence of 60 plain iterations — a ~2x serving-cost lever.
    griffin_lim_momentum: float = 0.0

    @property
    def n_fft(self) -> int:
        # reference audio/__init__.py:119
        return (self.num_freq - 1) * 2

    @property
    def hop_length(self) -> int:
        # reference audio/__init__.py:120
        return int(self.frame_shift_ms / 1000 * self.sample_rate)

    @property
    def win_length(self) -> int:
        # reference audio/__init__.py:121
        return int(self.frame_length_ms / 1000 * self.sample_rate)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Tacotron + Deep Voice 2 architecture (reference ``hparams.py:31-94``)."""

    # One of: "single" (no speaker conditioning), "deepvoice" (per-site initial
    # state injection), "simple" (speaker-embed concat).  reference hparams.py:33,
    # models/tacotron.py:41-94.
    model_type: str = "single"
    num_speakers: int = 1
    speaker_embedding_size: int = 16

    # Output dimensions; must agree with AudioConfig.num_mels / num_freq
    # (reference ``hparams.py:16-17`` keeps one copy in the global dict).
    num_mels: int = 80
    num_freq: int = 1025

    embedding_size: int = 256
    dropout_prob: float = 0.8

    # Encoder
    enc_prenet_sizes: Tuple[int, ...] = (256, 128)
    enc_bank_size: int = 16
    enc_bank_channel_size: int = 128
    enc_maxpool_width: int = 2
    enc_highway_depth: int = 4
    enc_rnn_size: int = 128
    enc_proj_sizes: Tuple[int, ...] = (128, 128)
    enc_proj_width: int = 3

    # Attention: "bah_mon" (Bahdanau monotonic, the default), "bah", "bah_norm",
    # "luong", "luong_scaled" (reference models/tacotron.py:132-152).
    attention_type: str = "bah_mon"
    attention_size: int = 256
    attention_state_size: int = 256

    # Decoder
    dec_layer_num: int = 2
    dec_rnn_size: int = 256
    dec_prenet_sizes: Tuple[int, ...] = (256, 128)

    # Post-net CBHG
    post_bank_size: int = 8
    post_bank_channel_size: int = 256
    post_maxpool_width: int = 2
    post_highway_depth: int = 4
    post_rnn_size: int = 256
    post_proj_sizes: Tuple[int, ...] = (256, 80)
    post_proj_width: int = 3

    reduction_factor: int = 4
    max_iters: int = 200  # decoder step cap (reference models/tacotron.py:210)
    # Decoder steps per input token, used by the synthesizer's
    # length-adaptive decode budget (synth.synthesizer.adaptive_max_steps).
    # Default 4.0 covers the worst case the reference's corpus filter
    # admits (796 frames at min_tokens=50, datasets/datafeeder.py:97-98);
    # raise it for voices/symbol sets that speak more frames per token
    # (the synthesizer warns when a decode consumes the whole budget).
    steps_per_token: float = 4.0

    # Numerics: params/math in float32 by default for parity with the reference;
    # flip to bfloat16 to run matmuls on the MXU at twice the throughput.
    compute_dtype: str = "float32"

    # XLA loop unrolling of the time scans (copies of the step body per
    # loop iteration).  Tacotron steps are small matmuls, so unrolling
    # amortizes per-iteration loop overhead on TPU at some compile-time
    # cost; measured step times in scripts/train_profile.py.  1 = off.
    decoder_unroll: int = 1   # attention-decoder scan
    rnn_unroll: int = 1       # encoder/post-net BiGRU scans

    def scaled(self, factor: int) -> "ModelConfig":
        """Method form of :func:`scale_model_widths` — the reference's
        ``SCALE_FACTOR`` width divider (``hparams.py:3-6``):
        ``ModelConfig().scaled(2)``."""
        return scale_model_widths(self, factor)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization schedule (reference ``hparams.py:120-136``,
    ``models/tacotron.py:305-336``)."""

    batch_size: int = 16
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    initial_learning_rate: float = 0.002
    # 0 = Noam warmup (4k steps fresh / 40k finetune); 1 = exponential decay
    decay_learning_rate_mode: int = 0
    warmup_steps_fresh: float = 4000.0
    warmup_steps_finetune: float = 40000.0
    grad_clip_norm: float = 1.0

    prioritize_loss: bool = False
    recognition_loss_coeff: float = 0.2
    ignore_recognition_level: int = 1

    # Guided attention (Tachibana et al. 2017, DC-TTS eq. 3): soft diagonal
    # prior on the alignment matrix, a quality lever for low-data training.
    # 0.0 (default) = off, exact reference loss parity.
    guided_attention_weight: float = 0.0
    guided_attention_sigma: float = 0.2
    # Linear anneal of guided_attention_weight to ZERO over this many
    # steps (0 = constant weight).  The prior is scaffolding: it
    # bootstraps alignment past the early copy-previous-frame basin, but
    # held at convergence it keeps pulling durations toward the uniform
    # diagonal and its gradient competes with the recon loss's late
    # spectral sharpening (measured: a variable-rate run held at 0.3 for
    # all 20k steps aligned 100% but left spectral peaks ~1 FFT bin
    # blurred — docs/convergence_var).  Annealing frees late training;
    # the attention_mass telemetry verifies alignment survives unguided.
    guided_attention_decay_steps: int = 0

    # On-device feature extraction: the feeder ships int16 waveforms and
    # the train step computes mel/linear targets on chip
    # (dsp.chip.features_from_waveform) — 7.4x less host->device traffic
    # per step than precomputed f32 spectrograms.  Requires a corpus built
    # with DataConfig.store_waveform.  Off by default for exact loss
    # parity with the reference's precomputed-target pipeline.
    on_device_features: bool = False

    # Device-resident corpus (data/resident.py): upload the whole corpus
    # to HBM once and gather each batch on device — per-step host->device
    # traffic drops from megabytes to the ~128-byte index array.  The win
    # on tunneled transports is 2-fold (throughput AND a measured
    # host-memory leak in the transport's transfer path, docs/PERF.md);
    # single-process only; corpus must fit under the byte limit below.
    device_resident_corpus: bool = False
    resident_corpus_max_bytes: int = 4 << 30

    initial_data_greedy: bool = True
    initial_phase_step: int = 8000
    main_data_greedy_factor: float = 0.0
    main_data: Tuple[str, ...] = ("",)

    checkpoint_interval: int = 1000
    summary_interval: int = 100
    test_interval: int = 500
    max_checkpoints_to_keep: int = 5


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Corpus filtering and batching (reference ``hparams.py:139-142``,
    ``datasets/datafeeder.py:96-99``)."""

    cleaners: str = "korean_cleaners"
    # "korean" (80-symbol jamo set, the reference default) or "english"
    # (ASCII set the reference shipped commented out)
    symbol_set: str = "korean"
    min_tokens: int = 50
    min_iters: int = 30
    max_iters: int = 200
    skip_inadequate: bool = False
    batches_per_group: int = 32
    # Pad every batch's token/frame axes up to a small set of bucket shapes so
    # XLA compiles a handful of programs instead of one per batch (the reference
    # pads to the per-batch max, which would trigger recompilation under jit).
    bucket_size_tokens: int = 32
    bucket_size_frames: int = 64
    # Pad every batch to the corpus-wide maximum instead: exactly ONE train
    # program (no per-bucket recompiles, ~15 s each on TPU) at the cost of
    # more padding FLOPs. Worth it when utterance lengths are homogeneous.
    pad_to_corpus_max: bool = False
    # Also store the int16 waveform in each built .npz (schema-compatible
    # extra key "wav") so training can use on-device feature extraction
    # (TrainConfig.on_device_features).
    store_waveform: bool = False

    def cleaner_names(self) -> Tuple[str, ...]:
        """The ``cleaners`` field parsed into names — the ONE place the
        comma-separated string is interpreted (builder, trainer,
        synthesizer and bench all call this)."""
        return tuple(c.strip() for c in self.cleaners.split(","))


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit/NamedSharding.

    The reference is single-process, single-device (SURVEY.md section 2.5); this
    is a new, first-class component.  ``data`` shards the batch (DP over ICI);
    ``model`` optionally shards wide projection/embedding tables (TP).
    """

    data_axis: str = "data"
    model_axis: str = "model"
    # -1 = use all devices on the data axis
    data_parallelism: int = -1
    model_parallelism: int = 1


@dataclasses.dataclass(frozen=True)
class Config:
    audio: AudioConfig = dataclasses.field(default_factory=AudioConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)

    # ------------------------------------------------------------------ JSON

    def to_json(self, indent: int = 2) -> str:
        return json.dumps(dataclasses.asdict(self), indent=indent, sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "Config":
        try:
            raw = json.loads(text)
        except json.JSONDecodeError:
            # hand-edited configs commonly carry trailing commas; the
            # reference's hparams loader tolerated them
            # (utils/__init__.py:83-126) — so do we.  String literals are
            # matched first so a ",}" INSIDE a value is never rewritten.
            stripped = re.sub(
                r'("(?:[^"\\]|\\.)*")|,(\s*[}\]])',
                lambda m: m.group(1) or m.group(2), text)
            raw = json.loads(stripped)
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: dict) -> "Config":
        def build(dc_cls, d: dict):
            fields = {f.name: f for f in dataclasses.fields(dc_cls)}
            kwargs: dict[str, Any] = {}
            for key, value in d.items():
                if key not in fields:
                    continue  # forward-compatible: ignore unknown keys
                if isinstance(value, list):
                    value = tuple(value)
                kwargs[key] = value
            return dc_cls(**kwargs)

        return cls(
            audio=build(AudioConfig, raw.get("audio", {})),
            model=build(ModelConfig, raw.get("model", {})),
            train=build(TrainConfig, raw.get("train", {})),
            data=build(DataConfig, raw.get("data", {})),
            mesh=build(MeshConfig, raw.get("mesh", {})),
        )

    def replace(self, **sections) -> "Config":
        return dataclasses.replace(self, **sections)

    @classmethod
    def tpu_recommended(cls, base: "Config" = None,
                        batch_size: int = 32) -> "Config":
        """The ONE composed TPU training preset (``train.py --preset tpu``).

        Applies every individually-measured TPU win on top of ``base``
        (default config if omitted):

        - ``compute_dtype="bfloat16"``: +26% steady-state step throughput,
          convergence equivalent to f32 (docs/BF16_STUDY.md; params and
          optimizer state stay f32 either way);
        - ``decoder_unroll=rnn_unroll=8``: +36% f32 step time
          (scripts/train_profile.py), output-identical;
        - ``on_device_features=True`` + ``store_waveform=True``: int16
          waveform wire + on-chip mel/linear extraction — 7.4x fewer H2D
          bytes per step (5.4x measured wall win on the tunneled link);
          corpora must be built with this config so the .npz carries the
          waveform;
        - ``batch_size=32``: 1.6x samples/s vs B=16 with a modest
          per-sample convergence cost (docs/BATCH_STUDY.md: at a 128k-
          sample budget B=32 reaches 0.012 vs B=16's 0.007 final loss;
          the docs/CONVERGENCE.md run trains B=32 to full held-out
          quality).  B=64 is NOT the default: it buys only ~9% more
          samples/s over B=32 yet converges measurably worse per sample
          on small corpora (0.029 at the same budget, warmup already
          rescaled) — raise the batch only with a sample budget to
          match, and rescale the step-based Noam warmup by 16/B when
          you do.

        Exact-reference-parity defaults stay on ``Config()``; this preset
        is where TPU production training should start.

        Two opt-ins to consider on top (not composed here because they
        depend on the deployment): ``device_resident_corpus`` when the
        corpus fits HBM (measured 7x the fresh-batch live loop on a
        tunneled host link — data/resident.py, docs/PERF.md), and for
        SMALL corpora trained to a quality target, ``batch_size=16``
        reaches held-out quality sooner in wall-clock
        (docs/BATCH_STUDY.md equal-wall arms).
        """
        base = base if base is not None else cls()
        return base.replace(
            model=dataclasses.replace(
                base.model, compute_dtype="bfloat16",
                decoder_unroll=8, rnn_unroll=8),
            train=dataclasses.replace(
                base.train, on_device_features=True,
                batch_size=batch_size),
            data=dataclasses.replace(base.data, store_waveform=True),
        )

    def debug_string(self) -> str:
        """Sorted hyperparameter dump (reference ``hparams.py:153-156``)."""
        flat = {}
        for section_name, section in dataclasses.asdict(self).items():
            for key, value in section.items():
                flat[f"{section_name}.{key}"] = value
        lines = [f"    {k}: {flat[k]}" for k in sorted(flat)]
        return "Hyperparameters:\n" + "\n".join(lines)


def save_config(config: Config, path: str) -> None:
    with open(path, "w") as fh:
        fh.write(config.to_json())


def load_config(path: str) -> Config:
    with open(path) as fh:
        return Config.from_json(fh.read())


def scale_model_widths(model: ModelConfig, factor: int) -> ModelConfig:
    """The reference's ``SCALE_FACTOR`` width divider as a pure function
    (``/root/reference/hparams.py:3-6``): every hidden width the reference
    wraps in ``f()`` is divided by ``factor`` (speaker/char embeddings,
    prenet/bank/proj/rnn/attention sizes — ``hparams.py:34-65``); output
    dimensions (num_mels/num_freq) and structural counts (bank K, highway
    depth, layers, r) are untouched, exactly as in the reference.  Use to
    spin down a debug- or edge-sized model:

        cfg.replace(model=scale_model_widths(cfg.model, 4))
    """
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")

    def f(n: int) -> int:
        return max(1, n // factor)

    return dataclasses.replace(
        model,
        speaker_embedding_size=f(model.speaker_embedding_size),
        embedding_size=f(model.embedding_size),
        enc_prenet_sizes=tuple(f(n) for n in model.enc_prenet_sizes),
        enc_bank_channel_size=f(model.enc_bank_channel_size),
        enc_rnn_size=f(model.enc_rnn_size),
        enc_proj_sizes=tuple(f(n) for n in model.enc_proj_sizes),
        attention_size=f(model.attention_size),
        attention_state_size=f(model.attention_state_size),
        dec_rnn_size=f(model.dec_rnn_size),
        dec_prenet_sizes=tuple(f(n) for n in model.dec_prenet_sizes),
        post_bank_channel_size=f(model.post_bank_channel_size),
        post_rnn_size=f(model.post_rnn_size),
        # the last post projection must stay num_mels for the residual add
        # (the reference hard-codes 80 there, hparams.py:65)
        post_proj_sizes=tuple(
            f(n) for n in model.post_proj_sizes[:-1]
        ) + (model.post_proj_sizes[-1],),
    )


def tune_scan_unroll(config: Config, platform: str | None = None) -> Config:
    """TPU-tuned time-scan unrolling.

    Returns ``config`` with ``model.decoder_unroll``/``model.rnn_unroll``
    raised to 8 when running on TPU and both are still at their default 1.
    A pure schedule knob — outputs are identical
    (tests/test_model.py::test_scan_unroll_equivalence); measured on
    TPU v5e at B=16/T=192: 8.78 -> 6.44 ms/step f32 (+36%), 7.17 -> 6.09
    bf16 (scripts/train_profile.py; unroll 16 regresses).  Costs ~25 s of
    extra XLA compile per program, so it is applied by the training/bench
    entry points rather than unconditionally.  Values the user set
    explicitly are left alone.
    """
    if platform is None:
        import jax
        platform = jax.default_backend()
    if platform != "tpu" or config.model.decoder_unroll != 1 \
            or config.model.rnn_unroll != 1:
        return config
    return config.replace(model=dataclasses.replace(
        config.model, decoder_unroll=8, rnn_unroll=8))
