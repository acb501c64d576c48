"""Tacotron + Deep Voice 2 multi-speaker model, TPU-native.

Functional re-design of the reference graph (``/root/reference/models/
tacotron.py:21-271``).  The TF ``dynamic_decode`` + five nested RNNCell
wrappers (``models/tacotron.py:154-210``, ``models/rnn_wrappers.py``) collapse
into one explicit per-step function scanned with ``nn.scan``/``lax.scan``:
decoder state lives in registers/VMEM for the whole decode, encoder
keys/values are loop invariants, and both teacher-forced training and greedy
inference are the *same* scan with a different input source.

Exact step semantics preserved from the reference wrapper stack:

  1. cell_in   = concat([input frame, prev attention context])       (rnn_wrappers.py:249)
  2. pre       = prenet(cell_in)    [+ speaker embed if 'simple']    (rnn_wrappers.py:367-378)
  3. attn_rnn  = GRU(attention_state_size)(pre)                      (tacotron.py:127-130)
  4. align     = attention(attn_rnn, keys, prev_align)               (rnn_wrappers.py:304-341)
               (optionally overridden by manual alignments)
  5. context   = align @ values                                      (rnn_wrappers.py:333)
  6. concat    = [attn_rnn, context] (+ speaker if 'simple')         (rnn_wrappers.py:405-415)
  7. h         = Dense(dec_rnn_size)(concat)                         (tacotron.py:170)
  8. h         = h + GRU_i(h)   for each decoder layer (residual)    (tacotron.py:171-172)
  9. frames    = Dense(num_mels * r)(h)                              (tacotron.py:178-179)

Speaker conditioning variants (reference ``tacotron.py:41-94``):
  - 'single':    no speaker inputs.
  - 'deepvoice': speaker embed -> softsign dense per site: CBHG pre-highway
                 bias, encoder BiGRU init, attention GRU init, each decoder
                 GRU init.  (speaker_embedding_size == 1 uses raw per-site
                 embedding tables.)
  - 'simple':    speaker embed concatenated at decoder prenet output and at
                 post-CBHG output.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from ..ops.attention import initial_alignments, make_attention
from ..ops.rnn import GRUCell
from ..text.symbols import VOCAB_SIZE
from .modules import CBHG, Prenet, SpeakerEmbedding


class DecoderCarry(NamedTuple):
    attn_state: jnp.ndarray          # [N, attention_state_size]
    context: jnp.ndarray             # [N, memory_dim]
    alignments: jnp.ndarray          # [N, T_in]
    dec_states: Tuple[jnp.ndarray, ...]  # per-layer [N, dec_rnn_size]
    prev_frame: jnp.ndarray          # [N, num_mels] (greedy feed)
    keys: jnp.ndarray                # [N, T_in, attention_size] (invariant)
    values: jnp.ndarray              # [N, T_in, memory_dim] (invariant)
    speaker: Any                     # [N, E] or () (invariant)
    is_manual: Any                   # scalar bool or () (invariant)


class SpeakerConditioning(NamedTuple):
    """Per-site speaker injections (None when unused)."""

    embed: Any = None               # [N, E] for 'simple'
    before_highway: Any = None      # [N, enc_prenet[-1]]
    encoder_rnn_init: Any = None    # [N, 2*enc_rnn_size]
    attention_rnn_init: Any = None  # [N, attention_state_size]
    decoder_rnn_inits: Any = None   # tuple of [N, dec_rnn_size]


class DecoderStep(nn.Module):
    """One decoder step; scanned over time by :class:`Tacotron`."""

    cfg: ModelConfig
    greedy: bool
    train: bool

    @nn.compact
    def __call__(self, carry: DecoderCarry, step_in):
        cfg = self.cfg
        x_t, manual_t = step_in
        x = carry.prev_frame if self.greedy else x_t

        # (1) concat input with previous context, (2) prenet
        cell_in = jnp.concatenate([x, carry.context], axis=-1)
        pre = Prenet(cfg.dec_prenet_sizes, cfg.dropout_prob,
                     name="prenet")(cell_in, self.train)
        if cfg.model_type == "simple":
            pre = jnp.concatenate([pre, carry.speaker], axis=-1)

        # (3) attention RNN
        attn_state, _ = GRUCell(cfg.attention_state_size,
                                name="attention_rnn")(carry.attn_state, pre)

        # (4) alignments (+ manual override), (5) context
        computed = make_attention(
            cfg.attention_type, cfg.attention_size, name="attention")(
                attn_state, carry.keys, carry.alignments)
        if manual_t is not None:
            computed = jnp.where(carry.is_manual, manual_t, computed)
        context = jnp.einsum("nt,ntd->nd", computed, carry.values)

        # (6) concat attention output
        concat = jnp.concatenate([attn_state, context], axis=-1)
        if cfg.model_type == "simple":
            concat = jnp.concatenate([concat, carry.speaker], axis=-1)

        # (7) projection + (8) residual GRU stack
        h = nn.Dense(cfg.dec_rnn_size, dtype=x.dtype,
                     name="decoder_input_projection")(concat)
        new_dec_states = []
        for i in range(cfg.dec_layer_num):
            state, out = GRUCell(cfg.dec_rnn_size,
                                 name=f"decoder_rnn_{i + 1}")(
                carry.dec_states[i], h)
            new_dec_states.append(state)
            h = h + out

        # (9) r-frame projection
        frames = nn.Dense(cfg.num_mels * cfg.reduction_factor, dtype=x.dtype,
                          name="frame_projection")(h)

        new_carry = DecoderCarry(
            attn_state=attn_state,
            context=context,
            alignments=computed,
            dec_states=tuple(new_dec_states),
            prev_frame=frames[:, -cfg.num_mels:],
            keys=carry.keys,
            values=carry.values,
            speaker=carry.speaker,
            is_manual=carry.is_manual)
        return new_carry, (frames, computed)


class Tacotron(nn.Module):
    """Full Tacotron graph: encoder, attention decoder scan, post-net."""

    cfg: ModelConfig
    vocab_size: int = VOCAB_SIZE

    # ------------------------------------------------------------ speaker

    def _speaker_conditioning(
            self, speaker_id: Optional[jnp.ndarray]) -> SpeakerConditioning:
        cfg = self.cfg
        if cfg.num_speakers <= 1:
            return SpeakerConditioning()
        if cfg.model_type == "simple":
            return SpeakerConditioning(
                embed=SpeakerEmbedding(
                    cfg.num_speakers, cfg.speaker_embedding_size,
                    name="speaker_embedding")(speaker_id))
        if cfg.model_type != "deepvoice":
            raise ValueError(
                f"multi-speaker requires model_type 'deepvoice' or "
                f"'simple', got {cfg.model_type!r}")
        if cfg.speaker_embedding_size == 1:
            # raw per-site embedding tables (reference tacotron.py:52-66)
            init = nn.initializers.truncated_normal(stddev=0.1)
            return SpeakerConditioning(
                before_highway=nn.Embed(
                    cfg.num_speakers, cfg.enc_prenet_sizes[-1],
                    embedding_init=init, name="before_highway")(speaker_id),
                encoder_rnn_init=nn.Embed(
                    cfg.num_speakers, cfg.enc_rnn_size * 2,
                    embedding_init=init,
                    name="encoder_rnn_init_state")(speaker_id),
                attention_rnn_init=nn.Embed(
                    cfg.num_speakers, cfg.attention_state_size,
                    embedding_init=init,
                    name="attention_rnn_init_state")(speaker_id),
                decoder_rnn_inits=tuple(
                    nn.Embed(cfg.num_speakers, cfg.dec_rnn_size,
                             embedding_init=init,
                             name=f"decoder_rnn_init_states_{i + 1}")(
                                 speaker_id)
                    for i in range(cfg.dec_layer_num)))
        embed = SpeakerEmbedding(cfg.num_speakers, cfg.speaker_embedding_size,
                                 name="speaker_embedding")(speaker_id)
        softsign = jax.nn.soft_sign
        return SpeakerConditioning(
            before_highway=softsign(nn.Dense(
                cfg.enc_prenet_sizes[-1], name="deep_before_highway")(embed)),
            encoder_rnn_init=softsign(nn.Dense(
                cfg.enc_rnn_size * 2, name="deep_encoder_rnn_init")(embed)),
            attention_rnn_init=softsign(nn.Dense(
                cfg.attention_state_size,
                name="deep_attention_rnn_init")(embed)),
            decoder_rnn_inits=tuple(
                softsign(nn.Dense(
                    cfg.dec_rnn_size,
                    name=f"deep_decoder_rnn_init_{i + 1}")(embed))
                for i in range(cfg.dec_layer_num)))

    # ------------------------------------------------------------ encoder

    def encode(self, inputs: jnp.ndarray, input_lengths: jnp.ndarray,
               cond: SpeakerConditioning, train: bool) -> jnp.ndarray:
        """Token ids [N, T_in] -> encoder memory [N, T_in, 2*enc_rnn_size]."""
        cfg = self.cfg
        embedded = nn.Embed(
            self.vocab_size, cfg.embedding_size,
            embedding_init=nn.initializers.truncated_normal(stddev=0.5),
            name="char_embedding")(inputs)
        embedded = embedded.astype(jnp.dtype(cfg.compute_dtype))
        pre = Prenet(cfg.enc_prenet_sizes, cfg.dropout_prob,
                     name="encoder_prenet")(embedded, train)
        return CBHG(
            cfg.enc_bank_size, cfg.enc_bank_channel_size, cfg.enc_maxpool_width,
            cfg.enc_highway_depth, cfg.enc_rnn_size, cfg.enc_proj_sizes,
            cfg.enc_proj_width, unroll=cfg.rnn_unroll, name="encoder_cbhg")(
                pre, input_lengths, train,
                before_highway=cond.before_highway,
                rnn_init_state=cond.encoder_rnn_init)

    # ------------------------------------------------------------ decoder

    def _initial_carry(self, memory: jnp.ndarray, keys: jnp.ndarray,
                       cond: SpeakerConditioning,
                       is_manual) -> DecoderCarry:
        cfg = self.cfg
        N, T_in, memory_dim = memory.shape
        dtype = memory.dtype
        attn_init = (cond.attention_rnn_init
                     if cond.attention_rnn_init is not None
                     else jnp.zeros((N, cfg.attention_state_size), dtype))
        dec_inits = (cond.decoder_rnn_inits
                     if cond.decoder_rnn_inits is not None
                     else tuple(jnp.zeros((N, cfg.dec_rnn_size), dtype)
                                for _ in range(cfg.dec_layer_num)))
        return DecoderCarry(
            attn_state=attn_init,
            context=jnp.zeros((N, memory_dim), dtype),
            alignments=initial_alignments(cfg.attention_type, N, T_in, dtype),
            dec_states=dec_inits,
            prev_frame=jnp.zeros((N, cfg.num_mels), dtype),
            keys=keys,
            values=memory,
            speaker=cond.embed,
            is_manual=is_manual)

    def _run_decoder(self, memory: jnp.ndarray, num_steps: int,
                     decoder_inputs: Optional[jnp.ndarray],
                     cond: SpeakerConditioning, train: bool,
                     manual_alignments: Optional[jnp.ndarray],
                     is_manual) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Scan the decoder; returns (frames [N, steps, M*r],
        alignment history [N, steps, T_in])."""
        cfg = self.cfg
        greedy = decoder_inputs is None
        N = memory.shape[0]

        # One-time encoder-memory key projection (TF's attention
        # ``memory_layer``), hoisted out of the decode scan.
        keys = nn.Dense(cfg.attention_size, use_bias=False,
                        dtype=memory.dtype,
                        name="attention_memory_layer")(memory)
        carry = self._initial_carry(memory, keys, cond, is_manual)

        if greedy:
            xs_frames = jnp.zeros((N, num_steps, cfg.num_mels), memory.dtype)
        else:
            xs_frames = decoder_inputs
        xs = (xs_frames, manual_alignments)

        scan = nn.scan(
            DecoderStep,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=1, out_axes=1, unroll=cfg.decoder_unroll)
        step = scan(cfg, greedy=greedy, train=train, name="decoder")
        _, (frames, align_history) = step(carry, xs)
        return frames, align_history

    # ------------------------------------------------------------- forward

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, input_lengths: jnp.ndarray,
                 speaker_id: Optional[jnp.ndarray] = None,
                 mel_targets: Optional[jnp.ndarray] = None,
                 train: bool = False,
                 max_steps: Optional[int] = None,
                 manual_alignments: Optional[jnp.ndarray] = None,
                 is_manual: Optional[jnp.ndarray] = None):
        """Forward pass.

        Teacher-forced when ``mel_targets`` is given (training/eval), greedy
        autoregressive otherwise (synthesis).  Returns a dict with
        ``mel_outputs`` [N, T_out, M], ``linear_outputs`` [N, T_out, F], and
        ``alignments`` [N, T_in, T_dec].
        """
        cfg = self.cfg
        r = cfg.reduction_factor
        compute_dtype = jnp.dtype(cfg.compute_dtype)
        cond = self._speaker_conditioning(speaker_id)
        if compute_dtype != jnp.float32:
            cond = jax.tree.map(lambda x: x.astype(compute_dtype), cond)
        memory = self.encode(inputs, input_lengths, cond, train)

        if mel_targets is not None:
            # teacher forcing: feed every r-th target frame, shifted right by
            # one group behind a zero GO frame (reference helpers.py:44,60-67)
            taken = mel_targets.astype(compute_dtype)[:, r - 1::r, :]
            go = jnp.zeros_like(taken[:, :1])
            decoder_inputs = jnp.concatenate([go, taken[:, :-1]], axis=1)
            num_steps = decoder_inputs.shape[1]
        else:
            decoder_inputs = None
            num_steps = max_steps if max_steps is not None else cfg.max_iters

        frames, align_history = self._run_decoder(
            memory, num_steps, decoder_inputs, cond, train,
            manual_alignments, is_manual)

        N = inputs.shape[0]
        mel_outputs = frames.reshape(N, num_steps * r, cfg.num_mels)

        post = CBHG(
            cfg.post_bank_size, cfg.post_bank_channel_size,
            cfg.post_maxpool_width, cfg.post_highway_depth, cfg.post_rnn_size,
            cfg.post_proj_sizes, cfg.post_proj_width, unroll=cfg.rnn_unroll,
            name="post_cbhg")(mel_outputs, None, train)
        if cfg.model_type == "simple" and cfg.num_speakers > 1:
            tiled = jnp.broadcast_to(
                cond.embed[:, None, :],
                (N, post.shape[1], cond.embed.shape[-1]))
            post = jnp.concatenate([tiled, post], axis=-1)
        linear_outputs = nn.Dense(cfg.num_freq, dtype=post.dtype,
                                  name="linear_projection")(post)

        # losses/vocoding always see float32 regardless of compute dtype
        return {
            "mel_outputs": mel_outputs.astype(jnp.float32),
            "linear_outputs": linear_outputs.astype(jnp.float32),
            "alignments": jnp.transpose(align_history, (0, 2, 1)).astype(
                jnp.float32),
        }
