"""Pure-numpy TF1-semantics oracle of the full Tacotron forward pass.

Round-2 verdict item 2: per-op tests cannot catch *wiring* errors — what
concatenates with what inside the decoder step, which frame feeds back,
where the speaker embedding enters.  This module is an independent,
deliberately naive re-implementation of the reference graph
(``/root/reference/models/tacotron.py:21-271`` and the wrapper stack in
``models/rnn_wrappers.py``) written as explicit Python loops over
batch/time, consuming the *same* flax parameter tree as
``tacotron_tpu.models.tacotron.Tacotron``.  ``tests/test_forward_oracle.py``
asserts the flax model allclose against it for all three model_types.

It therefore doubles as executable documentation of the reference graph:

    embedding -> enc prenet -> CBHG(bank->BN->maxpool->proj convs->
    residual->highway->BiGRU) -> per-step attention decoder
    (prenet -> attention GRU -> monotonic attention -> context ->
     projection -> residual GRU stack -> r-frame projection) ->
    post CBHG -> linear head

``forward(train=False)``: inference semantics (dropout off, BatchNorm on
moving stats) — the deterministic path used for checkpoint-parity
synthesis.  ``forward(train=True)``: teacher-forced training semantics —
BatchNorm on batch statistics with EMA moving-stat updates at every site
(run with dropout_prob=0 for determinism); catches batch-vs-moving-stats
wiring swaps that the inference oracle cannot see.
"""

from __future__ import annotations

import numpy as np

F = np.float32


# ------------------------------------------------------------- primitives


def dense(p, x):
    return x @ p["kernel"] + p.get("bias", 0.0)


def dense_nobias(p, x):
    return x @ p["kernel"]


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def softsign(x):
    return x / (1.0 + np.abs(x))


def gru_step(p, h, x):
    """TF1 GRUCell (/root/reference via tf.contrib.rnn.GRUCell):
    gates [r, u] over concat([x, h]); candidate over concat([x, r*h])."""
    gates = sigmoid(dense(p["gates"], np.concatenate([x, h], axis=-1)))
    r, u = np.split(gates, 2, axis=-1)
    c = np.tanh(dense(p["candidate"], np.concatenate([x, r * h], axis=-1)))
    return u * h + (1.0 - u) * c


def bigru(p, xs, lengths, initial_state):
    """tf.nn.bidirectional_dynamic_rnn over GRUCells
    (reference ``models/modules.py:88-96``): per-example masking by
    ``sequence_length``, outputs zero past the length, [fw, bw] concat."""
    N, T, _ = xs.shape
    units = p["fw"]["candidate"]["kernel"].shape[-1]
    if initial_state is not None:
        init_fw, init_bw = np.split(initial_state, 2, axis=-1)
    else:
        init_fw = np.zeros((N, units), F)
        init_bw = np.zeros((N, units), F)
    if lengths is None:
        lengths = np.full((N,), T, np.int64)
    out = np.zeros((N, T, 2 * units), F)
    for n in range(N):
        L = int(lengths[n])
        h = init_fw[n:n + 1]
        for t in range(L):
            h = gru_step(p["fw"], h, xs[n:n + 1, t])
            out[n, t, :units] = h[0]
        h = init_bw[n:n + 1]
        for t in range(L - 1, -1, -1):
            h = gru_step(p["bw"], h, xs[n:n + 1, t])
            out[n, t, units:] = h[0]
    return out


def conv1d_same(x, kernel, bias):
    """TF SAME conv1d (cross-correlation), padding (w-1)//2 left."""
    w, cin, cout = kernel.shape
    N, T, _ = x.shape
    pad_left = (w - 1) // 2
    xp = np.pad(x, ((0, 0), (pad_left, w - 1 - pad_left), (0, 0)))
    out = np.zeros((N, T, cout), F)
    for tap in range(w):
        out += xp[:, tap:tap + T, :] @ kernel[tap]
    return out + bias


def batchnorm_inference(params, stats, x, eps=1e-3):
    """tf.layers.batch_normalization, inference mode (moving stats)."""
    inner_p = params["BatchNorm_0"]
    inner_s = stats["BatchNorm_0"]
    return (x - inner_s["mean"]) / np.sqrt(inner_s["var"] + eps) \
        * inner_p["scale"] + inner_p["bias"]


def batchnorm_train(params, stats, x, momentum=0.99, eps=1e-3):
    """tf.layers.batch_normalization, TRAINING mode (``training=True`` at
    the reference call sites keyed on ``is_training``,
    ``/root/reference/models/modules.py:37-46``): normalize by THIS batch's
    per-channel statistics over (batch, time), biased variance, and
    EMA-update the moving stats (momentum 0.99).  Returns (y, new_stats).
    """
    p = params["BatchNorm_0"]
    s = stats["BatchNorm_0"]
    mean = x.mean(axis=(0, 1)).astype(F)
    var = x.var(axis=(0, 1)).astype(F)  # biased, like tf/flax
    y = (x - mean) / np.sqrt(var + eps) * p["scale"] + p["bias"]
    new = {"BatchNorm_0": {
        "mean": (momentum * s["mean"] + (1.0 - momentum) * mean).astype(F),
        "var": (momentum * s["var"] + (1.0 - momentum) * var).astype(F)}}
    return y.astype(F), new


def max_pool_same(x, width):
    pad_left = (width - 1) // 2
    xp = np.pad(x, ((0, 0), (pad_left, width - 1 - pad_left), (0, 0)),
                constant_values=-np.inf)
    T = x.shape[1]
    return np.max(np.stack([xp[:, i:i + T] for i in range(width)]), axis=0)


def prenet(p, x):
    """Dense-ReLU stack, dropout off (reference ``modules.py:18-25``)."""
    i = 1
    while f"dense_{i}" in p:
        x = np.maximum(0.0, dense(p[f"dense_{i}"], x))
        i += 1
    return x


def highway(p, x):
    h = np.maximum(0.0, dense(p["H"], x))
    t = sigmoid(dense(p["T"], x))
    return h * t + x * (1.0 - t)


def cbhg(params, stats, x, lengths, before_highway=None,
         rnn_init_state=None, train=False):
    """Reference ``models/modules.py:27-96``.  The conv bank runs as K
    separate SAME convs (the reference's formulation); the flax side fuses
    them into one wide conv — parameter names are shared (kernel_1..K, one
    bias/BN over the concatenated channels).

    ``train=True`` switches every BatchNorm site to batch statistics with
    EMA updates (the reference's ``is_training`` keying) and returns
    ``(output, new_stats)`` instead of just the output."""
    new_stats = {}

    def bn(name, val):
        if train:
            y, ns = batchnorm_train(params[name], stats[name], val)
            new_stats[name] = ns
            return y
        return batchnorm_inference(params[name], stats[name], val)

    bank = params["conv_bank"]
    K = max(int(name.split("_")[1]) for name in bank if name != "bias")
    channels = bank["kernel_1"].shape[-1]
    branches = []
    for k in range(1, K + 1):
        bias_k = bank["bias"][(k - 1) * channels: k * channels]
        branches.append(conv1d_same(x, bank[f"kernel_{k}"], bias_k))
    conv = np.concatenate(branches, axis=-1)
    conv = bn("bank_bn", np.maximum(0.0, conv))

    pooled = max_pool_same(conv, 2)

    proj = pooled
    idx = 1
    while f"proj_{idx}" in params:
        p = params[f"proj_{idx}"]
        proj = conv1d_same(proj, p["kernel"], p["bias"])
        if f"proj_{idx + 1}" in params:  # ReLU on all but the last
            proj = np.maximum(0.0, proj)
        proj = bn(f"proj_{idx}_bn", proj)
        idx += 1

    hw = proj + x
    if before_highway is not None:
        hw = hw + before_highway[:, None, :]
    if "highway_dim_fix" in params:
        hw = dense(params["highway_dim_fix"], hw)
    d = 1
    while f"highway_{d}" in params:
        hw = highway(params[f"highway_{d}"], hw)
        d += 1
    out = bigru(params["bigru"], hw.astype(F), lengths, rnn_init_state)
    return (out, new_stats) if train else out


# -------------------------------------------------------------- attention


def monotonic_attention(p_choose, previous):
    """Raffel et al. (2017) parallel-mode recurrence, exactly TF's
    ``monotonic_attention(mode='parallel')`` with its ``safe_cumprod``
    clipping."""
    clipped = np.clip(1.0 - p_choose, 1e-10, 1.0)
    cumprod = np.exp(np.cumsum(np.log(clipped), axis=-1))
    exclusive = np.concatenate(
        [np.ones_like(cumprod[:, :1]), cumprod[:, :-1]], axis=-1)
    return p_choose * exclusive * np.cumsum(
        previous / np.clip(exclusive, 1e-10, 1.0), axis=-1)


def attention_step(p, attention_type, query, keys, prev_alignments):
    """One scoring step of the TF1 mechanisms the reference selects
    between (``/root/reference/models/tacotron.py:132-152``)."""
    if attention_type in ("bah_mon", "bah", "bah_norm"):
        processed = dense_nobias(p["query_layer"], query)
        pre_tanh = keys + processed[:, None, :]
        if attention_type == "bah_norm":
            v = p["attention_v"][:, 0]
            vn = p["attention_g"] * v / np.linalg.norm(v)
            score = np.tanh(pre_tanh + p["attention_b"]) @ vn
        else:
            score = (np.tanh(pre_tanh) @ p["attention_v"])[:, :, 0]
    elif attention_type in ("luong", "luong_scaled"):
        score = np.einsum("nu,ntu->nt", query, keys)
        if attention_type == "luong_scaled":
            score = p["attention_g"] * score
    else:
        raise ValueError(attention_type)

    if attention_type == "bah_mon":
        p_choose = sigmoid(score + p["score_bias"])
        return monotonic_attention(p_choose, prev_alignments)
    e = np.exp(score - score.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


# ---------------------------------------------------------------- forward


def speaker_conditioning(params, cfg, speaker_id):
    """Reference ``models/tacotron.py:41-94``."""
    cond = {"embed": None, "before_highway": None, "encoder_rnn_init": None,
            "attention_rnn_init": None, "decoder_rnn_inits": None}
    if cfg.num_speakers <= 1:
        return cond
    if cfg.model_type == "simple":
        cond["embed"] = params["speaker_embedding"]["embedding"][speaker_id]
        return cond
    if cfg.speaker_embedding_size == 1:
        cond["before_highway"] = params["before_highway"][
            "embedding"][speaker_id]
        cond["encoder_rnn_init"] = params["encoder_rnn_init_state"][
            "embedding"][speaker_id]
        cond["attention_rnn_init"] = params["attention_rnn_init_state"][
            "embedding"][speaker_id]
        cond["decoder_rnn_inits"] = tuple(
            params[f"decoder_rnn_init_states_{i + 1}"]["embedding"][
                speaker_id]
            for i in range(cfg.dec_layer_num))
        return cond
    embed = params["speaker_embedding"]["embedding"][speaker_id]
    cond["before_highway"] = softsign(
        dense(params["deep_before_highway"], embed))
    cond["encoder_rnn_init"] = softsign(
        dense(params["deep_encoder_rnn_init"], embed))
    cond["attention_rnn_init"] = softsign(
        dense(params["deep_attention_rnn_init"], embed))
    cond["decoder_rnn_inits"] = tuple(
        softsign(dense(params[f"deep_decoder_rnn_init_{i + 1}"], embed))
        for i in range(cfg.dec_layer_num))
    return cond


def forward(variables, cfg, inputs, input_lengths, speaker_id=None,
            mel_targets=None, max_steps=None, train=False):
    """Full forward.  Mirrors ``Tacotron.__call__`` outputs: dict with
    mel/linear/alignments.

    ``train=False``: inference semantics (dropout off, BatchNorm on moving
    stats) — the deterministic checkpoint-parity path.  ``train=True``:
    teacher-forced TRAINING semantics — every BatchNorm site normalizes by
    batch statistics and EMA-updates its moving stats (the reference's
    ``is_training`` keying, ``/root/reference/models/tacotron.py:26``);
    the result dict gains ``batch_stats`` (the updated tree).  Dropout is
    structural only: run with ``cfg.dropout_prob == 0`` for determinism —
    the point of the train path is catching batch-vs-moving-stats wiring
    swaps, which dropout cannot mask."""
    if train:
        assert cfg.dropout_prob == 0.0, \
            "train-mode oracle is deterministic only with dropout_prob=0"
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    N = inputs.shape[0]
    r = cfg.reduction_factor
    M = cfg.num_mels

    cond = speaker_conditioning(params, cfg, speaker_id)

    # ---- encoder (reference tacotron.py:34-39, 100-112)
    embedded = params["char_embedding"]["embedding"][inputs].astype(F)
    pre = prenet(params["encoder_prenet"], embedded)
    enc_out = cbhg(params["encoder_cbhg"], stats.get("encoder_cbhg", {}),
                   pre, np.asarray(input_lengths),
                   before_highway=cond["before_highway"],
                   rnn_init_state=cond["encoder_rnn_init"], train=train)
    memory, enc_new_stats = enc_out if train else (enc_out, {})

    # ---- decoder (reference tacotron.py:154-210 + rnn_wrappers.py)
    keys = dense_nobias(params["attention_memory_layer"], memory)
    dec = params["decoder"]

    greedy = mel_targets is None
    if greedy:
        num_steps = max_steps if max_steps is not None else cfg.max_iters
    else:
        taken = mel_targets[:, r - 1::r, :]
        go = np.zeros_like(taken[:, :1])
        decoder_inputs = np.concatenate([go, taken[:, :-1]], axis=1)
        num_steps = decoder_inputs.shape[1]

    attn_state = (cond["attention_rnn_init"]
                  if cond["attention_rnn_init"] is not None
                  else np.zeros((N, cfg.attention_state_size), F))
    dec_states = (list(cond["decoder_rnn_inits"])
                  if cond["decoder_rnn_inits"] is not None
                  else [np.zeros((N, cfg.dec_rnn_size), F)
                        for _ in range(cfg.dec_layer_num)])
    context = np.zeros((N, memory.shape[-1]), F)
    if cfg.attention_type == "bah_mon":
        alignments = np.zeros((N, memory.shape[1]), F)
        alignments[:, 0] = 1.0  # Dirac initial state of monotonic attention
    else:
        alignments = np.zeros((N, memory.shape[1]), F)
    prev_frame = np.zeros((N, M), F)

    frames_hist, align_hist = [], []
    for t in range(num_steps):
        x = prev_frame if greedy else decoder_inputs[:, t]
        # AttentionWrapper cell_input_fn: concat([inputs, attention])
        cell_in = np.concatenate([x, context], axis=-1)
        p = prenet(dec["prenet"], cell_in)
        if cfg.model_type == "simple" and cond["embed"] is not None:
            # DecoderPrenetWrapper concat (rnn_wrappers.py:372-376)
            p = np.concatenate([p, cond["embed"]], axis=-1)
        attn_state = gru_step(dec["attention_rnn"], attn_state, p)
        # unscaled Luong attention owns no parameters at all
        alignments = attention_step(dec.get("attention", {}),
                                    cfg.attention_type,
                                    attn_state, keys, alignments)
        context = np.einsum("nt,ntd->nd", alignments, memory)
        # ConcatOutputAndAttentionWrapper (rnn_wrappers.py:405-415)
        concat = np.concatenate([attn_state, context], axis=-1)
        if cfg.model_type == "simple" and cond["embed"] is not None:
            concat = np.concatenate([concat, cond["embed"]], axis=-1)
        h = dense(dec["decoder_input_projection"], concat)
        for i in range(cfg.dec_layer_num):
            dec_states[i] = gru_step(dec[f"decoder_rnn_{i + 1}"],
                                     dec_states[i], h)
            h = h + dec_states[i]
        frames = dense(dec["frame_projection"], h)
        prev_frame = frames[:, -M:]
        frames_hist.append(frames)
        align_hist.append(alignments)

    mel_outputs = np.stack(frames_hist, axis=1).reshape(
        N, num_steps * r, M).astype(F)

    # ---- post-net (reference tacotron.py:219-235)
    post_out = cbhg(params["post_cbhg"], stats.get("post_cbhg", {}),
                    mel_outputs, None, train=train)
    post, post_new_stats = post_out if train else (post_out, {})
    if cfg.model_type == "simple" and cond["embed"] is not None:
        tiled = np.broadcast_to(
            cond["embed"][:, None, :],
            (N, post.shape[1], cond["embed"].shape[-1]))
        post = np.concatenate([tiled, post], axis=-1)
    linear_outputs = dense(params["linear_projection"], post).astype(F)

    out = {
        "mel_outputs": mel_outputs,
        "linear_outputs": linear_outputs,
        "alignments": np.stack(align_hist, axis=2).astype(F),  # [N,T_in,T_dec]
    }
    if train:
        out["batch_stats"] = {"encoder_cbhg": enc_new_stats,
                              "post_cbhg": post_new_stats}
    return out
