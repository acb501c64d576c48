"""Serving-side synthesis: batched greedy decode + Griffin-Lim vocoding.

TPU-native successor to the reference ``Synthesizer``
(``/root/reference/synthesizer.py:28-299``):

- the inference graph + ``sess.run`` become one jitted apply per
  (input-bucket, max_steps) shape, cached across calls;
- text lengths are bucketed to a few static shapes (the reference pads to
  the batch max, which would recompile under jit);
- Griffin-Lim runs on-chip (``dsp.chip``) for batch throughput, or on host
  (numpy) when requested;
- attention-based end trimming, post-hoc attention modes (argmax one-hot /
  sharpening / pruning) and dB silence trimming reproduce
  ``synthesizer.py:171-205,242-269``.
"""

from __future__ import annotations

import dataclasses
import os
import re
import time
import warnings
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.feeder import _round_up
from ..dsp import chip as dsp_chip
from ..dsp import host as dsp_host
from ..models.tacotron import Tacotron
from ..text import text_to_sequence
from ..text.symbols import EOS_ID, vocab_size_for
from ..train.checkpoint import CheckpointManager, load_run_config
from ..train.optim import make_optimizer
from ..train.state import abstract_train_state, create_train_state


def _model_for(config: Config) -> Tacotron:
    return Tacotron(config.model,
                    vocab_size=vocab_size_for(config.data.symbol_set))


# Decode-step bucket ladder for length-adaptive serving.  A small fixed set
# of step counts keeps the jit-program cache bounded (like token buckets);
# values are multiples of 50 up to the reference's hard decode cap
# (``/root/reference/models/tacotron.py:210``).
STEP_LADDER = (50, 100, 150, 200)

# Decoder steps per input token.  Sized to the corpus filter's admitted
# WORST case, not typical speaking rate: the reference admits up to
# ``r*max_iters - r = 796`` frames (199 steps) for utterances at the
# ``min_tokens = 50`` bound (``datasets/datafeeder.py:97-98``,
# ``hparams.py:139-141``) — ~4 steps/token — so with 4.0 no utterance the
# reference could train on can be truncated relative to its own 200-step
# decode cap.  Typical Korean speech runs ~2 steps/jamo, so short texts
# still skip most of the budget; texts >= 50 tokens get the full cap,
# exactly the pre-adaptive behavior.
STEPS_PER_TOKEN = 4.0


def adaptive_max_steps(num_tokens: int, min_iters: int, max_iters: int,
                       steps_per_token: float = STEPS_PER_TOKEN,
                       ladder: Sequence[int] = STEP_LADDER) -> int:
    """Decode-step budget for an utterance of ``num_tokens`` tokens.

    The reference stops its greedy decode on an all-zero stop frame
    (``/root/reference/models/helpers.py:26-32``) — a data-dependent exit
    that XLA cannot compile into a fixed-shape TPU program.  The TPU-first
    equivalent: derive the budget from the token count (speech length is
    ~linear in text length), clip to the reference's [min_iters, max_iters]
    bounds, and round UP to a small step-bucket ladder so repeated calls
    reuse compiled programs.  Short texts then pay ~a quarter of the
    full-cap decode+vocode cost instead of always decoding
    ``max_iters=200`` steps.
    """
    need = int(np.ceil(steps_per_token * max(1, num_tokens)))
    need = min(max(need, min_iters), max_iters)
    for rung in ladder:
        if need <= rung <= max_iters:
            return rung
    return max_iters


def prewarm_step_rungs(cfg, token_buckets: Sequence[int],
                       max_steps: Optional[int] = None) -> dict:
    """Decode-step rungs :meth:`Synthesizer.prewarm` must compile per token
    bucket — exactly the set :func:`adaptive_max_steps` can choose at
    serving time (same ``cfg.model.steps_per_token``, so a non-default
    value prewarms the programs ``synthesize`` will actually pick).
    Batches land in bucket ``b`` only when their longest text exceeds the
    previous bucket, so rungs reachable only from shorter texts are
    excluded (each fused program costs ~15 s of XLA compile)."""
    buckets = sorted(token_buckets)
    rungs = {}
    for i, bucket in enumerate(buckets):
        if max_steps is not None:
            rungs[bucket] = [max_steps]
            continue
        lo = buckets[i - 1] + 1 if i > 0 else 1
        rungs[bucket] = sorted({
            adaptive_max_steps(t, cfg.data.min_iters, cfg.model.max_iters,
                               steps_per_token=cfg.model.steps_per_token)
            for t in range(lo, bucket + 1)})
    return rungs


def mulaw_encode(x: jnp.ndarray) -> jnp.ndarray:
    """mu-law companding (mu=255) of ``x`` in [-1, 1] to uint8 codes
    (0..255, 128 = zero) — the on-device half of the ``wire_format=
    "mulaw8"`` serving path (1 byte/sample across the host link)."""
    x = jnp.clip(x, -1.0, 1.0)
    y = jnp.sign(x) * jnp.log1p(255.0 * jnp.abs(x)) / jnp.log(256.0)
    return (jnp.round(y * 127.0) + 128.0).astype(jnp.uint8)


def _mulaw_table() -> np.ndarray:
    y = (np.arange(256, dtype=np.float32) - 128.0) / 127.0
    x = np.sign(y) * (np.power(256.0, np.abs(y)) - 1.0) / 255.0
    # the encoder emits codes 1..255; clip so the unreachable code 0
    # (e.g. corrupt data) cannot overshoot full scale
    return np.clip(x, -1.0, 1.0)


_MULAW_TABLE = _mulaw_table()


def mulaw_decode(codes: np.ndarray) -> np.ndarray:
    """Host-side inverse of :func:`mulaw_encode`: uint8 codes -> float32
    in [-1, 1].  A 256-entry lookup — the elementwise ``pow`` formulation
    measured 17 ms of host time on a batch-32 fetch; the gather is ~1 ms."""
    return _MULAW_TABLE[codes]


#: sentence-final punctuation (drives the longer stitch gap and the
#: primary split points in :func:`split_text`)
_SENT_FINAL = ".!?"
#: split AFTER sentence punctuation only when whitespace (or end) follows,
#: so decimals ("2.5를"), ellipses mid-phrase and quoted punctuation never
#: split — and, because these are zero-width split POINTS rather than
#: token matches, no input text can be dropped
_SENT_SPLIT_RE = re.compile(r"(?<=[.!?])\s+")
#: secondary split points inside an oversized sentence
_CLAUSE_SPLIT_RE = re.compile(r"(?<=[,;:·])\s*")


def split_text(text: str, max_chunk_tokens: int,
               cleaners: Sequence[str],
               symbol_set: str = "korean") -> List[str]:
    """Split ``text`` into chunks of at most ``max_chunk_tokens`` frontend
    tokens, cutting at sentence boundaries first, then clause punctuation,
    then word boundaries.  Consecutive short sentences are packed into one
    chunk so the batched decode stays efficient.

    Token counts are measured with the real frontend
    (:func:`text_to_sequence`), so jamo decomposition is accounted for.
    """

    def ntok(s: str) -> int:
        return len(text_to_sequence(s, list(cleaners), symbol_set=symbol_set))

    def atoms(s: str) -> List[str]:
        """Pieces of ``s`` that each fit the budget.  (ntok re-runs the
        frontend on the growing piece, but pieces are bounded by the
        chunk budget, so total work stays linear in document length.)"""
        if ntok(s) <= max_chunk_tokens:
            return [s]
        out: List[str] = []
        clauses = [c for c in _CLAUSE_SPLIT_RE.split(s) if c.strip()]
        if len(clauses) == 1:
            clauses = s.split()
        for c in clauses:
            if ntok(c) <= max_chunk_tokens:
                out.append(c)
            else:  # single clause still too big: split on words
                def hard(word: str) -> List[str]:
                    """Last-resort character-level split of a single
                    over-budget 'word' — whitespace/punctuation-free runs
                    happen in real documents (URLs, long digit strings,
                    no-space CJK) and would otherwise blow past the
                    prewarmed token buckets and be truncated by the
                    decode-step cap."""
                    if ntok(word) <= max_chunk_tokens:
                        return [word]
                    parts: List[str] = []
                    acc = ""
                    for ch in word:
                        cand = acc + ch
                        if acc and ntok(cand) > max_chunk_tokens:
                            parts.append(acc)
                            acc = ch
                        else:
                            acc = cand
                    if acc:
                        parts.append(acc)
                    return parts

                words = [p for w in c.split() for p in hard(w)]
                cur = ""
                for w in words:
                    cand = (cur + " " + w).strip()
                    if cur and ntok(cand) > max_chunk_tokens:
                        out.append(cur)
                        cur = w
                    else:
                        cur = cand
                if cur:
                    out.append(cur)
        return out

    sentences = [s for s in _SENT_SPLIT_RE.split(text) if s.strip()]
    pieces: List[str] = []
    for s in sentences:
        pieces.extend(atoms(s.strip()))

    # greedy packing of consecutive pieces
    chunks: List[str] = []
    cur = ""
    for p in pieces:
        cand = (cur + " " + p).strip()
        if cur and ntok(cand) > max_chunk_tokens:
            chunks.append(cur)
            cur = p
        else:
            cur = cand
    if cur:
        chunks.append(cur)
    return chunks


def attention_trim_index(alignment: np.ndarray, seq_len: int,
                         reduction_factor: int) -> int:
    """Spectrogram-frame index to cut at, from the alignment's argmax path
    (reference ``synthesizer.py:242-263``)."""
    attention_argmax = alignment.argmax(0)  # [T_dec]
    end_idx = min(seq_len - 1, int(attention_argmax.max()))
    max_counter = min(int((attention_argmax == end_idx).sum()), 5)
    end_idx_counter = 0
    jdx = 0
    for jdx, attend_idx in enumerate(attention_argmax):
        if len(attention_argmax) > jdx + 1:
            if attend_idx == end_idx:
                end_idx_counter += 1
            if (attend_idx == end_idx
                    and attention_argmax[jdx + 1] > end_idx):
                break
            if end_idx_counter >= max_counter:
                break
        else:
            break
    return reduction_factor * jdx + 3


def attention_trim_frames(alignments: jnp.ndarray,
                          input_lengths: jnp.ndarray,
                          reduction_factor: int) -> jnp.ndarray:
    """Vectorized on-device :func:`attention_trim_index`:
    [N, T_in, T_dec] alignments -> per-utterance cut frame [N].

    Same decision procedure as the host loop (reference
    ``synthesizer.py:242-263``), expressed as cumsum/argmax so the whole
    batch trims inside the fused synthesis program — no host round trip of
    the spectrograms.
    """
    T_in = alignments.shape[1]
    T_dec = alignments.shape[2]
    # restrict the argmax to the true text length (host code slices
    # alignments[:seq_len] first)
    row_ok = jnp.arange(T_in)[None, :, None] < input_lengths[:, None, None]
    masked = jnp.where(row_ok, alignments, -jnp.inf)
    a = jnp.argmax(masked, axis=1)                          # [N, T_dec]
    end_idx = jnp.minimum(input_lengths - 1, jnp.max(a, axis=1))
    is_end = a == end_idx[:, None]
    max_counter = jnp.minimum(jnp.sum(is_end, axis=1), 5)
    cnt = jnp.cumsum(is_end, axis=1)
    nxt = jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
    cond_advance = is_end & (nxt > end_idx[:, None])
    cond_counter = cnt >= max_counter[:, None]
    # the host loop only evaluates conditions while j+1 < T_dec
    valid = (cond_advance | cond_counter).at[:, -1].set(False)
    jdx = jnp.where(jnp.any(valid, axis=1),
                    jnp.argmax(valid, axis=1), T_dec - 1)
    return reduction_factor * jdx + 3


def trim_silence_db(audio: np.ndarray, top_db: float = 50.0,
                    frame_length: int = 5120,
                    hop_length: int = 256) -> np.ndarray:
    """Drop the trailing silence below ``top_db`` under the peak RMS
    (librosa.effects.trim semantics; reference ``synthesizer.py:266-269``
    keeps everything up to the last non-silent sample)."""
    if audio.size < frame_length:
        return audio
    _, rms = dsp_host.frame_rms(audio, frame_length, hop_length)
    db = dsp_host.rms_db_below_peak(rms)
    if db is None:
        return audio
    nonsilent = np.flatnonzero(db > -top_db)
    if nonsilent.size == 0:
        return audio
    end = min(len(audio),
              int(nonsilent[-1] + 1) * hop_length + frame_length)
    return audio[:end]


def posthoc_attention(alignments: np.ndarray, mode: int) -> np.ndarray:
    """Post-hoc manual-attention transforms (``synthesizer.py:171-205``):
    1 = argmax one-hot, 2 = sharpen (power 2, renormalized), 3 = prune
    (argmax one-hot; the shipped reference code for 3 equals 1)."""
    out = np.zeros_like(alignments)
    if mode in (1, 3):
        for i, al in enumerate(alignments):      # al: [T_in, T_dec]
            argmax = al.argmax(0)
            out[i][(argmax, np.arange(len(argmax)))] = 1.0
        return out
    if mode == 2:
        sq = alignments ** 2
        denom = np.maximum(sq.sum(axis=1, keepdims=True), 1e-8)
        return sq / denom
    raise ValueError(f"unknown manual_attention_mode {mode}")


def attention_health(alignment: np.ndarray,
                     coverage_threshold: float = 0.2,
                     min_coverage: float = 0.5,
                     min_focus: float = 0.25,
                     min_monotonicity: float = 0.6,
                     soft_monotonic: bool = False) -> Dict[str, float]:
    """Per-utterance attention diagnostics for one [T_in, T_dec] alignment
    (cropped to the true input length).

    Three signatures of a failed decode (a quality lever beyond the
    reference, which only exposes manual attention globally,
    ``eval.py:126-127``):

    - ``coverage``: fraction of input tokens whose max attention over the
      decode exceeds ``coverage_threshold`` — collapsed attention skips
      text;
    - ``focus``: mean over decode steps of the max attention weight —
      diffuse attention mumbles;
    - ``monotonicity``: fraction of decode steps whose argmax does not
      move backward by more than 2 tokens — Tacotron attention should
      sweep left to right.

    ``ok`` is the conjunction of the three thresholds.

    Also reported: ``path_coverage`` — the fraction of input tokens the
    argmax path comes within 2 positions of.  Soft-monotonic attention
    (``bah_mon``, the default type) is wide by construction — its
    per-step weights diffuse like a random walk even when perfectly
    aligned, so ``focus``/``coverage`` under-rate it; the argmax path
    still traces the diagonal, which ``path_coverage`` captures (see
    docs/CONVERGENCE.md for a measured example: focus 0.02,
    path_coverage 1.0, per-token acoustics correct).

    ``soft_monotonic=True`` judges ``ok`` by what soft-monotonic
    attention can actually exhibit — ``path_coverage >= min_coverage``
    and monotonicity — instead of the sharpness gates.
    :meth:`Synthesizer.synthesize_robust` and
    ``tools.speaker_eval`` select this automatically for ``bah_mon``
    models (a sharpness gate there would retry every healthy decode).

    Because the two gate families set different bars, a cross-attention-
    type comparison that read only ``ok`` would silently compare against
    different standards — so BOTH verdicts are always reported
    (``ok_sharpness``, ``ok_soft_monotonic``) along with ``gate``, the
    family that produced ``ok``.
    """
    alignment = np.asarray(alignment, np.float32)
    coverage = float((alignment.max(axis=1)
                      > coverage_threshold).mean())
    focus = float(alignment.max(axis=0).mean())
    path = alignment.argmax(axis=0)
    monotonicity = (1.0 if len(path) < 2 else
                    float((np.diff(path) >= -2).mean()))
    n_in = alignment.shape[0]
    visited = np.zeros(n_in, bool)
    for p in np.unique(path):
        visited[max(0, p - 2):p + 3] = True
    path_coverage = float(visited.mean())
    ok_soft = bool(path_coverage >= min_coverage
                   and monotonicity >= min_monotonicity)
    ok_sharp = bool(coverage >= min_coverage and focus >= min_focus
                    and monotonicity >= min_monotonicity)
    return {
        "ok": ok_soft if soft_monotonic else ok_sharp,
        "gate": "soft_monotonic" if soft_monotonic else "sharpness",
        "ok_sharpness": ok_sharp,
        "ok_soft_monotonic": ok_soft,
        "coverage": coverage,
        "focus": focus,
        "monotonicity": monotonicity,
        "path_coverage": path_coverage,
    }


def make_sharded_synthesis(config: Config, plan, max_steps: int):
    """Mesh-sharded batched synthesis: greedy decode + on-chip Griffin-Lim,
    batch sharded over the ``data`` axis, params replicated.

    The multi-chip serving program (SURVEY §2.5 "batched decode
    collectives"): each chip decodes and vocodes its batch shard; XLA
    inserts no cross-chip collectives on this path beyond the initial
    broadcast — throughput scales linearly with chips.  Returns
    ``fn(variables, inputs, input_lengths, speaker_id) -> (wavs,
    alignments)``, jitted with shardings baked in.
    """
    model = _model_for(config)
    batch_sh = plan.batch()
    repl = plan.replicated()
    # conservative OLA choice under SPMD: the fused Pallas OLA is validated
    # single-chip; how the partitioner handles a pallas_call with a
    # batch-sharded operand is unverifiable without multi-chip hardware,
    # so the sharded program pins the XLA formulation unless the caller
    # explicitly forces "pallas".  Measured cost of the conservatism
    # (single-chip, B=32 classic GL, docs/PERF.md engine race): pinned
    # matmul_half + XLA OLA = 1014 a-s/s vs the auto single-chip
    # matmul_half + Pallas OLA = 1065 — an expected ~5% per-chip gap the
    # moment multi-chip hardware exists to validate the Pallas kernels
    # under partitioning (then: flip the pins, re-run the equality test)
    audio_cfg = config.audio
    if audio_cfg.ola_impl == "auto":
        audio_cfg = dataclasses.replace(audio_cfg, ola_impl="xla")
    if audio_cfg.griffin_lim_impl == "auto":
        # same conservatism for the fused GL iteration kernel: pin the
        # pure-XLA-compatible engine when the caller left the choice open
        audio_cfg = dataclasses.replace(audio_cfg,
                                        griffin_lim_impl="matmul_half")
    elif audio_cfg.griffin_lim_impl == "fused":
        # explicit incompatible knobs raise (same contract as ola_impl
        # above) instead of being silently rewritten
        raise ValueError(
            "griffin_lim_impl='fused' (a Pallas kernel) is not validated "
            "under SPMD partitioning; use 'auto' or an XLA engine "
            "('matmul_half'/'matmul_bf16'/'fft') for sharded synthesis")

    def fn(variables, inputs, input_lengths, speaker_id):
        out = model.apply(variables, inputs, input_lengths,
                          speaker_id=speaker_id, train=False,
                          max_steps=max_steps)
        wavs = dsp_chip.batched_linear_to_waveform(out["linear_outputs"],
                                                   audio_cfg)
        return wavs, out["alignments"]

    spk_sh = batch_sh if config.model.num_speakers > 1 else None
    return jax.jit(fn,
                   in_shardings=(repl, batch_sh, batch_sh, spk_sh),
                   out_shardings=(batch_sh, batch_sh))


class Synthesizer:
    """Load once, synthesize many (reference ``synthesizer.py:28-67``)."""

    def __init__(self):
        self.config: Optional[Config] = None
        self.model: Optional[Tacotron] = None
        self.variables = None
        self._compiled: Dict[Tuple[int, int, int], callable] = {}

    # ------------------------------------------------------------------ load

    def load(self, run_dir: str, step: Optional[int] = None,
             config: Optional[Config] = None) -> "Synthesizer":
        self.config = config or load_run_config(run_dir)
        self.model = _model_for(self.config)
        optimizer = make_optimizer(self.config.train)
        # abstract template: restore without compiling a train-mode init
        template = abstract_train_state(self.config, optimizer)
        mgr = CheckpointManager(run_dir, self.config)
        try:
            state = mgr.restore(template, step=step)
        finally:
            mgr.close()
        self.variables = {"params": state.params,
                          "batch_stats": state.batch_stats}
        return self

    def init_random(self, config: Config,
                    seed: int = 0) -> "Synthesizer":
        """Fresh random weights (testing / benchmarking without a run)."""
        self.config = config
        self.model = _model_for(config)
        optimizer = make_optimizer(config.train)
        state = create_train_state(config, jax.random.PRNGKey(seed),
                                   optimizer)
        self.variables = {"params": state.params,
                          "batch_stats": state.batch_stats}
        return self

    # ------------------------------------------------------------- compile

    def _forward(self, bucket_len: int, max_steps: int, manual: bool):
        key = (bucket_len, max_steps, int(manual))
        if key not in self._compiled:
            model = self.model

            def fwd(variables, inputs, input_lengths, speaker_id,
                    manual_alignments, is_manual):
                return model.apply(
                    variables, inputs, input_lengths,
                    speaker_id=speaker_id, train=False, max_steps=max_steps,
                    manual_alignments=manual_alignments,
                    is_manual=is_manual)

            self._compiled[key] = jax.jit(fwd)
        return self._compiled[key]

    # serving-batch sweet spot measured on TPU v5e: batch-16 Griffin-Lim
    # maximizes throughput; larger batches spill VMEM (B=64 was 7x slower)
    VOCODER_MAX_BATCH = 16

    def _fused(self, bucket_len: int, max_steps: int, manual: bool,
               trim: bool, fast: bool = False, wire: str = "int16"):
        """ONE jitted program: decode -> on-device attention trim -> masked
        batched Griffin-Lim -> int16 waveform.

        Fusing matters doubly on tunneled TPU backends: the [N, T, 1025]
        spectrogram never crosses the host link (round-tripping it measured
        ~330 ms for 13 MB), and the only fetches are the int16 audio and the
        small alignments.

        ``fast=True`` swaps the vocoder to momentum Griffin-Lim (30 iters,
        momentum 0.99) — measured spectral convergence equal to the classic
        60-iteration schedule (scripts/synth_sweep.py, tests/test_dsp.py)
        at ~2x the vocoder throughput.

        ``wire="mulaw8"`` ships the waveform as 8-bit mu-law (G.711-style,
        mu=255) instead of int16 — half the bytes on the serving path's
        dominant cost, the bulk fetch.  ~38 dB quantization SNR: opt in
        for remote/tunneled links where bandwidth dominates."""
        key = ("fused", bucket_len, max_steps, int(manual), int(trim),
               int(fast), wire)
        if key not in self._compiled:
            model = self.model
            audio_cfg = self.config.audio
            if fast:
                audio_cfg = dataclasses.replace(
                    audio_cfg, griffin_lim_iters=30,
                    griffin_lim_momentum=0.99)
            r = self.config.model.reduction_factor

            def fn(variables, inputs, input_lengths, speaker_id,
                   manual_alignments, is_manual):
                out = model.apply(
                    variables, inputs, input_lengths, speaker_id=speaker_id,
                    train=False, max_steps=max_steps,
                    manual_alignments=manual_alignments, is_manual=is_manual)
                linear = out["linear_outputs"]       # [N, steps*r, F]
                aligns = out["alignments"]           # [N, T_in, steps]
                n_frames = linear.shape[1]
                if trim:
                    ends = jnp.maximum(
                        attention_trim_frames(aligns, input_lengths, r), r)
                    ends = jnp.minimum(ends, n_frames)
                else:
                    ends = jnp.full((linear.shape[0],), n_frames, jnp.int32)
                mask = (jnp.arange(n_frames)[None, :]
                        < ends[:, None])[..., None]
                wavs = dsp_chip.batched_linear_to_waveform(
                    linear * mask, audio_cfg)
                # Per-utterance peak normalization BEFORE int16 quantization
                # (host save_audio semantics, dsp/host.py:40): Griffin-Lim
                # output amplitude is unbounded, so a bare *32767 clip would
                # square-wave any waveform whose peak exceeds 1.0.
                peak = jnp.max(jnp.abs(wavs), axis=1, keepdims=True)
                denom = jnp.maximum(0.01, peak)
                denom_db = 20.0 * jnp.log10(denom[:, 0])
                if wire == "mulaw8":
                    # mu-law companding of the peak-normalized waveform:
                    # 1 byte/sample on the wire, decoded on host
                    wav_q = mulaw_encode(wavs / denom)

                    def u16_rows(vals):
                        """int32 [N] (0..65535) -> lo/hi uint8 rows."""
                        rows = jnp.zeros((2, wav_q.shape[1]), jnp.uint8)
                        rows = rows.at[0, :vals.shape[0]].set(
                            (vals & 0xFF).astype(jnp.uint8))
                        rows = rows.at[1, :vals.shape[0]].set(
                            ((vals >> 8) & 0xFF).astype(jnp.uint8))
                        return rows

                    denom_q = (jnp.clip(jnp.round(denom_db * 100.0),
                                        -32767, 32767).astype(jnp.int32)
                               + 32768)
                    packed = jnp.concatenate(
                        [wav_q, u16_rows(ends.astype(jnp.int32)),
                         u16_rows(denom_q)], axis=0)
                    return packed, aligns
                wav_i16 = jnp.clip(wavs * (32767.0 / denom),
                                   -32768, 32767).astype(jnp.int16)
                # pack ends (frame counts, < 32767) plus the per-utterance
                # normalization denominator (as dB*100, 0.01 dB resolution)
                # as two extra int16 rows so audio+lengths+scale arrive in
                # ONE host fetch — on tunneled backends every fetch pays a
                # fixed ~45 ms round trip.  The host undoes the scaling, so
                # the chip path returns TRUE amplitudes like the host path
                # (loudness statistics, e.g. tools/speaker_eval.py, would
                # otherwise be measured on peak-normalized audio).
                ends_row = jnp.zeros((1, wav_i16.shape[1]), jnp.int16)
                ends_row = ends_row.at[0, :ends.shape[0]].set(
                    ends.astype(jnp.int16))
                denom_row = jnp.zeros((1, wav_i16.shape[1]), jnp.int16)
                denom_row = denom_row.at[0, :denom_db.shape[0]].set(
                    jnp.clip(jnp.round(denom_db * 100.0),
                             -32767, 32767).astype(jnp.int16))
                packed = jnp.concatenate([wav_i16, ends_row, denom_row],
                                         axis=0)
                return packed, aligns

            self._compiled[key] = jax.jit(fn)
        return self._compiled[key]

    def cleaner_names(self) -> List[str]:
        """The configured text-cleaner pipeline as a list
        (:meth:`DataConfig.cleaner_names`)."""
        return list(self.config.data.cleaner_names())

    # -------------------------------------------------------------- prewarm

    def prewarm(self, token_buckets: Sequence[int] = (32, 64),
                batch_sizes: Sequence[int] = (1,),
                max_steps: Optional[int] = None,
                attention_trim: bool = True,
                fast_vocoder: bool = True,
                wire_format: str = "int16") -> int:
        """Compile the fused serving programs ahead of the first request.

        The first request at a new (token-bucket, chunk-size) shape pays
        20–40 s of XLA compilation (the persistent compilation cache only
        helps across restarts, not the first run ever).  A server calls
        this at startup so user-facing latency is always the execute cost.
        Mirrors the trainer's ``--prewarm`` bucket-ladder pass
        (train/driver.py).

        With ``max_steps=None`` each token bucket is prewarmed at every
        decode-step rung :func:`adaptive_max_steps` can choose for texts
        that actually route to it — batches land in bucket ``b`` only
        when their longest text exceeds the previous bucket, so rungs
        reachable only from shorter texts are not compiled (a full
        decode+GL program costs ~15 s of XLA compile each).

        Returns the number of programs executed (compiled or cache-hit).
        """
        assert self.variables is not None, "call load() or init_random()"
        cfg = self.config
        spk_on = cfg.model.num_speakers > 1
        n = 0
        buckets = sorted(token_buckets)
        rungs = prewarm_step_rungs(cfg, buckets, max_steps)
        for bucket in buckets:
            for steps in rungs[bucket]:
                fn = self._fused(bucket, steps, manual=False,
                                 trim=attention_trim, fast=fast_vocoder,
                                 wire=wire_format)
                for nb in batch_sizes:
                    inputs = jnp.zeros((nb, bucket), jnp.int32)
                    lengths = jnp.ones((nb,), jnp.int32)
                    spk = jnp.zeros((nb,), jnp.int32) if spk_on else None
                    packed, _ = fn(self.variables, inputs, lengths, spk,
                                   None, jnp.asarray(False))
                    jax.block_until_ready(packed)
                    n += 1
        return n

    # ----------------------------------------------------------- synthesize

    def synthesize(self, texts: Optional[Sequence[str]] = None,
                   sequences: Optional[Sequence[Sequence[int]]] = None,
                   speaker_ids: Optional[Sequence[int]] = None,
                   max_steps: Optional[int] = None,
                   manual_alignments: Optional[np.ndarray] = None,
                   manual_attention_mode: int = 0,
                   attention_trim: bool = True,
                   librosa_trim: bool = True,
                   vocode: str = "chip",
                   token_bucket: int = 32,
                   return_alignments: bool = True,
                   fast_vocoder: bool = False,
                   collect_timings: bool = False,
                   wire_format: str = "int16",
                   ) -> Dict[str, List[np.ndarray]]:
        """texts -> waveforms.

        Returns dict with ``wavs`` (list of float32 arrays at true
        Griffin-Lim amplitude — the chip path undoes its internal int16
        peak normalization, so chip and host vocoders return the same
        scale), ``alignments``
        (list of [T_in, T_dec]), ``linear`` (list of [T_dec*r, F]) and
        ``sequences``.

        ``return_alignments=False`` skips fetching the alignment matrices
        from the device (``alignments`` comes back empty) — on tunneled TPU
        backends each extra fetch pays a host-link round trip, so
        audio-only servers should turn it off.

        ``fast_vocoder=True`` (chip path only) uses momentum Griffin-Lim
        (30 iters, momentum 0.99; spectral convergence equal to classic 60
        iterations) — the recommended serving configuration.

        ``max_steps=None`` (the default, and what ``app.py`` serves with)
        derives the decode-step budget from the batch's longest text via
        :func:`adaptive_max_steps` instead of always decoding the full
        ``max_iters=200`` cap — short texts skip most of the decode+vocode
        cost; trimming behaves identically.  Pass ``max_steps`` explicitly
        to pin a fixed budget.

        ``wire_format="mulaw8"`` (chip path only) ships the audio across
        the host link as 8-bit mu-law instead of int16 — half the bytes on
        the dominant serving cost (the bulk fetch), ~38 dB quantization
        SNR.  Opt in when the host link is bandwidth-bound (tunneled or
        remote backends); the returned waveforms are float32 at true
        amplitude either way.

        ``collect_timings=True`` (chip path) adds a ``timings`` dict to the
        result splitting the call into phases — ``frontend`` (text ->
        padded id batch), ``dispatch`` (async program launches),
        ``device`` (on-chip compute, isolated by a 1-element probe fetch),
        ``fetch`` (bulk waveform transfer over the host link), ``post``
        (host-side unpack/trim) — the serving host-link budget.  The probe
        sync costs one extra link round trip, so leave it off in
        production.
        """
        assert self.variables is not None, "call load() or init_random()"
        t_start = time.perf_counter() if collect_timings else 0.0
        cfg = self.config
        cleaners = self.cleaner_names()
        if sequences is None:
            sequences = [text_to_sequence(t, cleaners,
                                          symbol_set=cfg.data.symbol_set)
                         for t in texts]
        seq_lens = [len(s) for s in sequences]
        N = len(sequences)

        bucket = _round_up(max(seq_lens), token_bucket)
        inputs = np.zeros((N, bucket), np.int32)
        for i, s in enumerate(sequences):
            inputs[i, :len(s)] = s
        # input_lengths from EOS position (+1 so the length includes the EOS
        # token, matching training-time lengths — a deliberate deviation from
        # reference synthesizer.py:120, which uses the bare EOS index).  For
        # caller-supplied sequences without an EOS, argmax of all-False is 0
        # and would mask the whole input; fall back to the true length.
        has_eos = (inputs == EOS_ID).any(axis=1)
        input_lengths = np.where(
            has_eos, np.argmax(inputs == EOS_ID, axis=1) + 1,
            np.asarray(seq_lens)).astype(np.int32)

        # Length-adaptive decode budget when the caller does not pass one
        # (what app.py / eval.py serve with): see adaptive_max_steps.
        adaptive = max_steps is None
        steps = (max_steps if max_steps is not None else
                 adaptive_max_steps(max(seq_lens), cfg.data.min_iters,
                                    cfg.model.max_iters,
                                    steps_per_token=cfg.model.steps_per_token))
        spk = (np.asarray(speaker_ids, np.int32)
               if speaker_ids is not None else np.zeros((N,), np.int32))
        if cfg.model.num_speakers <= 1:
            spk = None

        if manual_alignments is not None:
            T_dec = steps
            man = np.zeros((N, T_dec, bucket), np.float32)
            # accept [N, T_in, T_dec] and transpose per reference convention
            src = np.transpose(manual_alignments, (0, 2, 1))
            man[:, :min(T_dec, src.shape[1]), :min(bucket, src.shape[2])] = \
                src[:, :T_dec, :bucket]
            is_manual = jnp.asarray(True)
        else:
            man = None
            is_manual = jnp.asarray(False)

        if vocode not in ("chip", "host", "none"):
            raise ValueError(f"unknown vocode mode {vocode!r}")
        if wire_format not in ("int16", "mulaw8"):
            raise ValueError(f"unknown wire_format {wire_format!r}")
        if wire_format != "int16" and vocode != "chip":
            raise ValueError("wire_format applies to the chip path only")

        if manual_attention_mode > 0:
            # first pass just for the computed alignments (small fetch),
            # then re-synthesize with the post-hoc manual alignments
            fwd = self._forward(bucket, steps, man is not None)
            out = fwd(self.variables, jnp.asarray(inputs),
                      jnp.asarray(input_lengths),
                      None if spk is None else jnp.asarray(spk),
                      None if man is None else jnp.asarray(man), is_manual)
            alignments = np.asarray(out["alignments"])
            new_man = posthoc_attention(alignments, manual_attention_mode)
            return self.synthesize(
                sequences=sequences, speaker_ids=speaker_ids,
                max_steps=steps,
                manual_alignments=np.asarray(new_man),
                manual_attention_mode=0, attention_trim=attention_trim,
                librosa_trim=librosa_trim, vocode=vocode,
                token_bucket=token_bucket,
                return_alignments=return_alignments,
                fast_vocoder=fast_vocoder, wire_format=wire_format)

        r = cfg.model.reduction_factor
        hop = cfg.audio.hop_length
        full_frames = steps * r  # an end at the cap = possible truncation
        budget_hits = 0
        wavs: List[np.ndarray] = []
        aligns: List[np.ndarray] = []
        specs: Optional[List[np.ndarray]] = None
        timings: Optional[Dict[str, float]] = None
        t_frontend = time.perf_counter() if collect_timings else 0.0

        if vocode == "chip":
            # fused decode+trim+GL program; batch processed in chunks of
            # VOCODER_MAX_BATCH rows padded to powers of two for a stable
            # jit cache ({1,2,4,8,16} x token buckets).  Dispatch ALL chunks
            # first, fetch afterwards: jax dispatch is async, so chunk k+1
            # computes on-device while chunk k's waveforms cross the host
            # link (the dominant serving cost on tunneled backends).
            fn = self._fused(bucket, steps, man is not None, attention_trim,
                             fast=fast_vocoder, wire=wire_format)
            pending = []
            for lo in range(0, N, self.VOCODER_MAX_BATCH):
                hi = min(N, lo + self.VOCODER_MAX_BATCH)
                nb = 1 << (hi - lo - 1).bit_length()
                c_in = np.zeros((nb, bucket), np.int32)
                c_in[:hi - lo] = inputs[lo:hi]
                c_len = np.ones((nb,), np.int32)
                c_len[:hi - lo] = input_lengths[lo:hi]
                c_spk = None
                if spk is not None:
                    c_spk = np.zeros((nb,), np.int32)
                    c_spk[:hi - lo] = spk[lo:hi]
                c_man = None
                if man is not None:
                    c_man = np.zeros((nb,) + man.shape[1:], np.float32)
                    c_man[:hi - lo] = man[lo:hi]
                pending.append((lo, hi, fn(
                    self.variables, jnp.asarray(c_in), jnp.asarray(c_len),
                    None if c_spk is None else jnp.asarray(c_spk),
                    None if c_man is None else jnp.asarray(c_man),
                    is_manual)))
            if collect_timings:
                t_dispatch = time.perf_counter()
                # 1-element probe from the LAST chunk: chunks execute in
                # dispatch order, so this returns only once every chunk's
                # device compute is done, at ~no transfer cost — isolating
                # on-chip compute from the bulk fetch that follows
                float(pending[-1][2][0][0, 0])
                t_device = time.perf_counter()
            fetched = [(lo, hi, np.asarray(packed),
                        np.asarray(al) if return_alignments else None)
                       for lo, hi, (packed, al) in pending]
            if collect_timings:
                t_fetch = time.perf_counter()
            for lo, hi, packed, al in fetched:
                if wire_format == "mulaw8":
                    # uint8 layout: wav rows + ends lo/hi + denom lo/hi
                    wav_rows = packed[:-4]
                    ends = (packed[-4].astype(np.int32)
                            | (packed[-3].astype(np.int32) << 8))
                    denom_db = ((packed[-2].astype(np.int32)
                                 | (packed[-1].astype(np.int32) << 8))
                                - 32768).astype(np.float32) / 100.0
                    denom = 10.0 ** (denom_db / 20.0)
                    expanded = mulaw_decode(wav_rows)
                    for i in range(hi - lo):
                        budget_hits += int(ends[i]) >= full_frames
                        n_samples = min(expanded.shape[1],
                                        int(ends[i]) * hop)
                        wavs.append(expanded[i, :n_samples] * denom[i])
                        if al is not None:
                            aligns.append(al[i, :seq_lens[lo + i], :])
                    continue
                wav_i16, ends, denom_q = packed[:-2], packed[-2], packed[-1]
                # undo the on-device peak normalization (dB*100 row) so the
                # chip path returns true amplitudes like the host path
                denom = 10.0 ** (denom_q.astype(np.float32) / 100.0 / 20.0)
                for i in range(hi - lo):
                    budget_hits += int(ends[i]) >= full_frames
                    n_samples = min(wav_i16.shape[1], int(ends[i]) * hop)
                    wavs.append(wav_i16[i, :n_samples].astype(np.float32)
                                * (denom[i] / 32767.0))
                    if al is not None:
                        aligns.append(al[i, :seq_lens[lo + i], :])
        else:
            fwd = self._forward(bucket, steps, man is not None)
            out = fwd(self.variables, jnp.asarray(inputs),
                      jnp.asarray(input_lengths),
                      None if spk is None else jnp.asarray(spk),
                      None if man is None else jnp.asarray(man), is_manual)
            alignments = np.asarray(out["alignments"])  # [N, bucket, T_dec]
            linear = np.asarray(out["linear_outputs"])  # [N, T_dec*r, F]
            specs = []
            for i in range(N):
                spec = linear[i]
                align = alignments[i, :seq_lens[i], :]
                if attention_trim:
                    end = attention_trim_index(align, seq_lens[i], r)
                    budget_hits += end >= full_frames
                    spec = spec[:max(end, r)]
                specs.append(spec)
                aligns.append(align)
            if vocode == "host":
                for spec in specs:
                    wavs.append(dsp_host.inv_spectrogram(spec.T, cfg.audio))
            else:  # "none"
                wavs = [np.zeros((0,), np.float32) for _ in specs]

        if librosa_trim and vocode != "none":
            wavs = [trim_silence_db(w) for w in wavs]

        if adaptive and attention_trim and budget_hits \
                and steps < cfg.model.max_iters:
            # A decode that runs to the END of a length-adaptive budget was
            # probably cut mid-utterance (normal decodes stop earlier and
            # get trimmed).  Silent truncation is the failure mode of the
            # adaptive budget — make it loud.
            warnings.warn(
                f"{budget_hits}/{N} utterance(s) consumed the entire "
                f"adaptive decode budget ({steps} steps at "
                f"{cfg.model.steps_per_token} steps/token) and may be "
                f"truncated; raise ModelConfig.steps_per_token or pass "
                f"max_steps explicitly", stacklevel=2)

        if collect_timings and vocode == "chip":
            t_end = time.perf_counter()
            timings = {
                "frontend_ms": (t_frontend - t_start) * 1e3,
                "dispatch_ms": (t_dispatch - t_frontend) * 1e3,
                "device_ms": (t_device - t_dispatch) * 1e3,
                "fetch_ms": (t_fetch - t_device) * 1e3,
                "post_ms": (t_end - t_fetch) * 1e3,
                "total_ms": (t_end - t_start) * 1e3,
            }

        # NOTE: the fused chip path never materializes the spectrograms on
        # the host (that transfer is the serving bottleneck on tunneled
        # backends), so "linear" is None there; use vocode="host"/"none" if
        # you need the spectrograms.
        result = {"wavs": wavs, "alignments": aligns, "linear": specs,
                  "sequences": list(sequences)}
        if timings is not None:
            result["timings"] = timings
        return result

    def synthesize_robust(self, texts: Optional[Sequence[str]] = None,
                          sequences: Optional[Sequence[Sequence[int]]] = None,
                          speaker_ids: Optional[Sequence[int]] = None,
                          retry_mode: int = 1,
                          health_kwargs: Optional[Dict] = None,
                          **kwargs) -> Dict[str, List]:
        """:meth:`synthesize` + per-utterance attention health check +
        automatic retry of failed utterances with post-hoc manual attention
        (``manual_attention_mode=retry_mode``: 1 = argmax one-hot,
        2 = sharpen).

        Adds ``attention_health`` (list of :func:`attention_health` dicts,
        evaluated on the FIRST pass) and ``retried`` (indices re-decoded)
        to the result.  ``retry_mode=0`` diagnoses without retrying.
        Alignments are required for the diagnosis, so
        ``return_alignments`` is forced on.  The retry applies
        :func:`posthoc_attention` to the ALREADY-FETCHED first-pass
        alignments and re-decodes once with them as manual alignments —
        not via ``manual_attention_mode`` (which would burn an extra
        full decode just to recompute the same alignments).
        """
        kwargs.pop("return_alignments", None)
        if kwargs.get("manual_attention_mode"):
            raise ValueError(
                "manual_attention_mode conflicts with synthesize_robust's "
                "own retry pass; use plain synthesize() for a global "
                "manual-attention mode")
        res = self.synthesize(texts=texts, sequences=sequences,
                              speaker_ids=speaker_ids,
                              return_alignments=True, **kwargs)
        hk = dict(health_kwargs or {})
        # soft-monotonic attention never exhibits sharpness; judging it by
        # the sharpness gates would retry every healthy decode
        hk.setdefault("soft_monotonic",
                      self.config.model.attention_type == "bah_mon")
        health = [attention_health(al, **hk)
                  for al in res["alignments"]]
        res["attention_health"] = health
        bad = [i for i, h in enumerate(health) if not h["ok"]]
        res["retried"] = bad if retry_mode else []
        if bad and retry_mode:
            bad_aligns = [res["alignments"][i] for i in bad]
            t_in = max(al.shape[0] for al in bad_aligns)
            t_dec = max(al.shape[1] for al in bad_aligns)
            man = np.zeros((len(bad), t_in, t_dec), np.float32)
            for j, al in enumerate(bad_aligns):
                man[j, :al.shape[0], :al.shape[1]] = al
            retry = self.synthesize(
                sequences=[res["sequences"][i] for i in bad],
                speaker_ids=(None if speaker_ids is None
                             else [speaker_ids[i] for i in bad]),
                manual_alignments=posthoc_attention(man, retry_mode),
                return_alignments=True, **kwargs)
            for j, i in enumerate(bad):
                res["wavs"][i] = retry["wavs"][j]
                res["alignments"][i] = retry["alignments"][j]
        return res

    # ------------------------------------------------- long-text stitching

    def synthesize_long(self, text: str, speaker_id: int = 0,
                        max_chunk_tokens: int = 120,
                        gap_sentence_ms: float = 180.0,
                        gap_clause_ms: float = 80.0,
                        fade_ms: float = 10.0,
                        robust: bool = True,
                        **kwargs) -> Dict:
        """Synthesize a text of ANY length as one waveform.

        The decoder is capped at ``max_iters`` steps (~10 s of speech at
        the reference defaults), so long inputs must be chunked.  The
        reference shipped ``short_concat`` for this
        (``/root/reference/synthesizer.py:301-367``) — dead code that
        trims overlap words by walking the attention argmax and pads a
        meaningless 10/20 *samples* of silence between chunks.  The
        TPU-first replacement:

        - :func:`split_text` cuts at sentence/clause boundaries into
          chunks of at most ``max_chunk_tokens`` frontend tokens (no
          overlap words, so no surplus-trimming heuristics needed);
        - ALL chunks decode in ONE batched call — on TPU the batch
          dimension is nearly free, so an N-sentence paragraph costs
          about one utterance's latency, where the reference looped
          sentence by sentence;
        - per-chunk attention end-trimming (the tested
          :func:`attention_trim_index` path) removes trailing babble,
          then chunks are joined with real silence: ``gap_sentence_ms``
          after sentence-final punctuation, ``gap_clause_ms`` after a
          mid-sentence split.

        ``robust=True`` routes through :meth:`synthesize_robust`, so a
        chunk whose attention collapses is automatically re-decoded with
        post-hoc manual alignment before stitching.

        Returns ``{"wav": float32 [T], "chunks": [str], "parts":
        <underlying synthesize result>}``.
        """
        cfg = self.config
        chunks = split_text(text, max_chunk_tokens, self.cleaner_names(),
                            symbol_set=cfg.data.symbol_set)
        if not chunks:
            raise ValueError("no synthesizable text after splitting")
        call = self.synthesize_robust if robust else self.synthesize
        res = call(texts=chunks,
                   speaker_ids=[speaker_id] * len(chunks), **kwargs)
        sr = cfg.audio.sample_rate
        # short linear fades at every piece edge: attention/dB trim can cut
        # a chunk at a non-zero sample, which clicks against the inserted
        # silence (and at the document's ends, against playback start/stop)
        fade = int(sr * fade_ms / 1000.0)  # fade_ms=0 disables
        pieces: List[np.ndarray] = []
        for i, (chunk, wav) in enumerate(zip(chunks, res["wavs"])):
            wav = np.asarray(wav, np.float32)
            n = min(fade, len(wav))
            if n > 0:
                wav = wav.copy()
                wav[:n] *= np.linspace(0.0, 1.0, n, dtype=np.float32)
                wav[-n:] *= np.linspace(1.0, 0.0, n, dtype=np.float32)
            pieces.append(wav)
            if i == len(chunks) - 1:
                continue
            gap = (gap_sentence_ms if chunk.rstrip()[-1:] in _SENT_FINAL
                   else gap_clause_ms)
            pieces.append(np.zeros(int(sr * gap / 1000.0), np.float32))
        return {"wav": np.concatenate(pieces), "chunks": chunks,
                "parts": res}

    # ------------------------------------------------------------- save

    def save_results(self, results: Dict, out_dir: str,
                     prefix: str = "synth") -> List[str]:
        from ..utils.plot import plot_alignment
        os.makedirs(out_dir, exist_ok=True)
        paths = []
        # alignments is [] when synthesize ran with return_alignments=False
        # (the fast serving preset) — still save every waveform, just skip
        # the plots, instead of letting zip() truncate to nothing.
        aligns = results["alignments"] or [None] * len(results["wavs"])
        for i, (wav, align, seq) in enumerate(zip(
                results["wavs"], aligns, results["sequences"])):
            wav_path = os.path.join(out_dir, f"{prefix}_{i}.wav")
            dsp_host.save_audio(wav, wav_path, self.config.audio)
            if align is not None:
                plot_alignment(align, wav_path.replace(".wav", ".png"),
                               token_ids=seq, input_length=len(seq))
            paths.append(wav_path)
        return paths
