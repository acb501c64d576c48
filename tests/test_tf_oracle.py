"""Cross-validation against TensorFlow 2.21 as an independent oracle.

Round-2 verdict finding: every parity claim in ``compat/`` and ``dsp/`` was
self-referential (the repo's writer tested against the repo's reader, chip
DSP against host DSP).  TensorFlow IS installed in this environment, so the
claims are validated here against TF itself:

- the TF1 TensorBundle codec (``compat/bundle.py``) against
  ``tf.compat.v1.train.Saver`` (TF writes / we read) and
  ``tf.train.load_checkpoint`` (we write / TF reads) — the same C++
  bundle code that wrote the published son/park checkpoints
  (``/root/reference/download.py:82-109``);
- the GRU recurrence (``ops/rnn.py::GRUCell``) against Keras ``GRUCell``
  (``reset_after=False``), an independent implementation of the same
  math the reference's ``tf.contrib.rnn.GRUCell`` computes
  (``/root/reference/models/modules.py:88-96``) — with the repo's
  [x, h] @ W / [r, u]-gate layout remapped to Keras' split [z, r, h]
  kernels, so a bug in either the recurrence or the claimed layout fails
  the test;
- BatchNorm semantics (``models/modules.py::BatchNorm``: momentum 0.99,
  eps 1e-3, biased batch variance, moving-stat EMA) against Keras
  ``BatchNormalization`` in both training and inference modes;
- the STFT/iSTFT framing + FFT + overlap-add (``dsp/chip.py``,
  ``dsp/host.py``) against ``tf.signal.stft`` / ``tf.signal.inverse_stft``
  at the reference's parameters (n_fft 2048, hop 300, win 1200 — the
  in-graph inversion twin, ``/root/reference/audio/__init__.py:87-122``);
- the periodic Hann window against both tf.signal and scipy.

All tests skip cleanly when TensorFlow is absent.
"""

import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tacotron_tpu.compat.bundle import (read_checkpoint,  # noqa: E402
                                        write_checkpoint)
from tacotron_tpu.config import AudioConfig  # noqa: E402
from tacotron_tpu.dsp import chip, host  # noqa: E402
from tacotron_tpu.dsp.primitives import (padded_window,  # noqa: E402
                                         periodic_hann)
from tacotron_tpu.models.modules import BatchNorm  # noqa: E402
from tacotron_tpu.ops.rnn import GRUCell  # noqa: E402


# ------------------------------------------------------------------ bundle


def _saver_checkpoint(tmp_path, arrays):
    """Write ``{name: array}`` with tf.compat.v1.train.Saver; return prefix."""
    g = tf.Graph()
    with g.as_default():
        for name, arr in arrays.items():
            tf.compat.v1.get_variable(
                name, initializer=tf.constant(arr), dtype=arr.dtype)
        saver = tf.compat.v1.train.Saver()
        with tf.compat.v1.Session(graph=g) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            return saver.save(
                sess, os.path.join(str(tmp_path), "model.ckpt"),
                global_step=20171015, write_meta_graph=False)


def _oracle_arrays(rng):
    """A variable set exercising dtypes, ranks, and >1 restart interval
    (16 keys) in the index table, with reference-like scope names."""
    arrays = {
        "model/inference/embedding": rng.standard_normal(
            (80, 256)).astype(np.float32),
        "model/inference/decoder/dense/kernel": rng.standard_normal(
            (256, 320)).astype(np.float32),
        "model/inference/decoder/dense/bias": np.zeros(320, np.float32),
        "global_step": np.asarray(20171015, np.int64),
        "scalar_f64": np.asarray(2.5, np.float64),
        "rank3": rng.standard_normal((3, 4, 5)).astype(np.float32),
        "ints32": rng.integers(-100, 100, size=(7,)).astype(np.int32),
    }
    for i in range(20):  # force multiple prefix-compression restarts
        arrays[f"model/inference/cbhg/conv1d_{i}/kernel"] = (
            rng.standard_normal((3, 16, 16)).astype(np.float32))
    return arrays


def test_tf_saver_writes_codec_reads(tmp_path):
    """TF's C++ bundle writer -> compat.bundle reader, exact bytes."""
    rng = np.random.default_rng(0)
    arrays = _oracle_arrays(rng)
    prefix = _saver_checkpoint(tmp_path, arrays)
    got = read_checkpoint(prefix)
    assert set(got) == set(arrays)
    for name, arr in arrays.items():
        assert got[name].dtype == arr.dtype, name
        assert got[name].shape == arr.shape, name
        np.testing.assert_array_equal(got[name], arr, err_msg=name)


def test_codec_writes_tf_reads(tmp_path):
    """compat.bundle writer -> TF's C++ bundle reader, exact bytes."""
    rng = np.random.default_rng(1)
    arrays = _oracle_arrays(rng)
    prefix = os.path.join(str(tmp_path), "model.ckpt-42")
    write_checkpoint(prefix, arrays)
    reader = tf.train.load_checkpoint(prefix)
    shape_map = reader.get_variable_to_shape_map()
    assert set(shape_map) == set(arrays)
    for name, arr in arrays.items():
        got = reader.get_tensor(name)
        assert got.dtype == arr.dtype, name
        assert np.asarray(got).shape == arr.shape, name
        np.testing.assert_array_equal(got, arr, err_msg=name)


def test_codec_round_trip_through_tf(tmp_path):
    """we write -> TF Saver restores into a graph -> TF saves -> we read."""
    rng = np.random.default_rng(2)
    arr = rng.standard_normal((5, 8)).astype(np.float32)
    ours = os.path.join(str(tmp_path), "ours.ckpt-1")
    write_checkpoint(ours, {"v": arr})
    g = tf.Graph()
    with g.as_default():
        v = tf.compat.v1.get_variable("v", shape=(5, 8), dtype=tf.float32)
        saver = tf.compat.v1.train.Saver()
        with tf.compat.v1.Session(graph=g) as sess:
            saver.restore(sess, ours)
            theirs = saver.save(sess, os.path.join(str(tmp_path), "tf.ckpt"),
                                write_meta_graph=False)
    np.testing.assert_array_equal(read_checkpoint(theirs)["v"], arr)


# --------------------------------------------------------------------- GRU


def _keras_weights_from_ours(params, in_dim, units):
    """Map our TF1-layout GRU params to Keras GRUCell(reset_after=False).

    Ours (claimed TF1 layout, ops/rnn.py:9-11): gates/kernel [in+u, 2u]
    with [r, u] column order over concat([x, h]); candidate/kernel
    [in+u, u] over concat([x, r*h]).  Keras: kernel [in, 3u] and
    recurrent_kernel [u, 3u] in [z, r, h] column order, bias [3u];
    h' = z*h + (1-z)*tanh(x W_h + (r*h) U_h + b_h) — identical math with
    z == our u.  If either our recurrence or the layout claim were wrong,
    the remap would not reproduce Keras' outputs.
    """
    gk = params["gates"]["kernel"]
    gb = params["gates"]["bias"]
    ck = params["candidate"]["kernel"]
    cb = params["candidate"]["bias"]
    u = units
    kernel = np.concatenate(
        [gk[:in_dim, u:2 * u], gk[:in_dim, :u], ck[:in_dim]], axis=1)
    recurrent = np.concatenate(
        [gk[in_dim:, u:2 * u], gk[in_dim:, :u], ck[in_dim:]], axis=1)
    bias = np.concatenate([gb[u:2 * u], gb[:u], cb])
    return [kernel, recurrent, bias]


def test_gru_cell_matches_keras():
    in_dim, units, batch = 13, 11, 4
    cell = GRUCell(units)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((batch, in_dim)).astype(np.float32)
    h = rng.standard_normal((batch, units)).astype(np.float32)
    params = cell.init(jax.random.PRNGKey(0), jnp.asarray(h),
                       jnp.asarray(x))["params"]
    # random (non-default-init) weights so the bias path is exercised
    params = jax.tree.map(
        lambda p: jnp.asarray(
            rng.standard_normal(p.shape).astype(np.float32)), params)
    ours, _ = cell.apply({"params": params}, jnp.asarray(h), jnp.asarray(x))

    keras_cell = tf.keras.layers.GRUCell(
        units, reset_after=False, activation="tanh",
        recurrent_activation="sigmoid")
    keras_cell.build((batch, in_dim))
    keras_cell.set_weights(_keras_weights_from_ours(
        jax.tree.map(np.asarray, params), in_dim, units))
    theirs, _ = keras_cell(tf.constant(x), tf.constant(h))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_gru_sequence_matches_keras():
    """Multi-step recurrence: 25 steps through both cells stay allclose."""
    in_dim, units, batch, steps = 8, 6, 3, 25
    cell = GRUCell(units)
    rng = np.random.default_rng(4)
    xs = rng.standard_normal((steps, batch, in_dim)).astype(np.float32)
    h0 = np.zeros((batch, units), np.float32)
    params = cell.init(jax.random.PRNGKey(0), jnp.asarray(h0),
                       jnp.asarray(xs[0]))["params"]
    params = jax.tree.map(
        lambda p: jnp.asarray(
            (0.5 * rng.standard_normal(p.shape)).astype(np.float32)), params)

    keras_cell = tf.keras.layers.GRUCell(
        units, reset_after=False, activation="tanh",
        recurrent_activation="sigmoid")
    keras_cell.build((batch, in_dim))
    keras_cell.set_weights(_keras_weights_from_ours(
        jax.tree.map(np.asarray, params), in_dim, units))

    h_ours = jnp.asarray(h0)
    h_theirs = tf.constant(h0)
    for t in range(steps):
        h_ours, _ = cell.apply({"params": params}, h_ours,
                               jnp.asarray(xs[t]))
        h_theirs, _ = keras_cell(tf.constant(xs[t]), h_theirs)
        np.testing.assert_allclose(np.asarray(h_ours), h_theirs.numpy(),
                                   rtol=1e-4, atol=1e-5, err_msg=f"step {t}")


# --------------------------------------------------------------- BatchNorm


def test_batchnorm_matches_keras_train_and_infer():
    n, t, c = 6, 10, 5
    rng = np.random.default_rng(5)
    x = (3.0 * rng.standard_normal((n, t, c)) + 1.5).astype(np.float32)
    gamma = rng.uniform(0.5, 1.5, c).astype(np.float32)
    beta = rng.uniform(-0.5, 0.5, c).astype(np.float32)
    mmean = rng.standard_normal(c).astype(np.float32)
    mvar = rng.uniform(0.5, 2.0, c).astype(np.float32)

    bn = BatchNorm()
    variables = {
        "params": {"BatchNorm_0": {"scale": jnp.asarray(gamma),
                                   "bias": jnp.asarray(beta)}},
        "batch_stats": {"BatchNorm_0": {"mean": jnp.asarray(mmean),
                                        "var": jnp.asarray(mvar)}},
    }

    keras_bn = tf.keras.layers.BatchNormalization(momentum=0.99,
                                                  epsilon=1e-3)
    keras_bn.build((n, t, c))
    keras_bn.set_weights([gamma, beta, mmean, mvar])

    # training mode: normalized output AND the moving-stat EMA update
    ours_train, mutated = bn.apply(variables, jnp.asarray(x), train=True,
                                   mutable=["batch_stats"])
    theirs_train = keras_bn(tf.constant(x), training=True)
    np.testing.assert_allclose(np.asarray(ours_train),
                               theirs_train.numpy(), rtol=1e-4, atol=1e-5)
    new_mean, new_var = keras_bn.get_weights()[2:]
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["BatchNorm_0"]["mean"]),
        new_mean, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["BatchNorm_0"]["var"]),
        new_var, rtol=1e-5, atol=1e-6)

    # inference mode: moving-stat normalization
    keras_bn.set_weights([gamma, beta, mmean, mvar])
    ours_inf = bn.apply(variables, jnp.asarray(x), train=False)
    theirs_inf = keras_bn(tf.constant(x), training=False)
    np.testing.assert_allclose(np.asarray(ours_inf), theirs_inf.numpy(),
                               rtol=1e-4, atol=1e-5)


# -------------------------------------------------------------- STFT/iSTFT


REF_AUDIO = AudioConfig()  # n_fft 2048, hop 300, win 1200 (hparams.py:14-29)


def _tf_centered_stft(y, config):
    """tf.signal.stft made librosa-equivalent: reflect center pad the
    signal, frame at n_fft with the centered padded Hann.  Frame layout and
    count then match dsp.host/chip exactly, so any disagreement is in the
    framing arithmetic or FFT, not in convention."""
    n_fft = config.n_fft
    window = padded_window(config.win_length, n_fft).astype(np.float32)
    y_padded = np.pad(y, n_fft // 2, mode="reflect")
    return tf.signal.stft(
        tf.constant(y_padded), frame_length=n_fft,
        frame_step=config.hop_length, fft_length=n_fft,
        window_fn=lambda length, dtype: tf.constant(window, dtype=dtype),
        pad_end=False).numpy()


def test_host_stft_matches_tf_signal():
    rng = np.random.default_rng(6)
    y = rng.standard_normal(24000).astype(np.float32)  # 1 s @ 24 kHz
    ours = host.stft(y, REF_AUDIO)  # [n_freq, frames]
    theirs = _tf_centered_stft(y, REF_AUDIO).T
    assert ours.shape == theirs.shape
    scale = np.abs(theirs).max()
    np.testing.assert_allclose(ours / scale, theirs / scale, atol=2e-6)


def test_chip_stft_matches_tf_signal():
    rng = np.random.default_rng(7)
    y = rng.standard_normal(24000).astype(np.float32)
    ours = np.asarray(chip.stft(jnp.asarray(y), REF_AUDIO))  # [frames, bins]
    theirs = _tf_centered_stft(y, REF_AUDIO)
    assert ours.shape == theirs.shape
    scale = np.abs(theirs).max()
    np.testing.assert_allclose(ours / scale, theirs / scale, atol=2e-5)


def test_istft_matches_tf_signal_interior():
    """inverse_stft with inverse_stft_window_fn vs our OLA, interior
    samples (tf's window_fn assumes complete overlap, so its first/last
    ~n_fft samples normalize differently from exact edge accounting —
    compare the region where both are exact)."""
    config = REF_AUDIO
    n_fft, hop = config.n_fft, config.hop_length
    rng = np.random.default_rng(8)
    y = rng.standard_normal(24000).astype(np.float32)
    spec = _tf_centered_stft(y, config)  # [frames, bins]

    window = padded_window(config.win_length, n_fft).astype(np.float32)
    theirs_padded = tf.signal.inverse_stft(
        tf.constant(spec), frame_length=n_fft, frame_step=hop,
        fft_length=n_fft,
        window_fn=tf.signal.inverse_stft_window_fn(
            hop,
            forward_window_fn=lambda length, dtype: tf.constant(
                window, dtype=dtype))).numpy()
    theirs = theirs_padded[n_fft // 2: n_fft // 2 + len(y)]

    ours_host = host.istft(spec.T, config)
    ours_chip = np.asarray(
        chip.istft(jnp.asarray(spec), len(y), config))

    sl = slice(n_fft, len(y) - n_fft)
    np.testing.assert_allclose(ours_host[sl], theirs[sl], atol=2e-5)
    np.testing.assert_allclose(ours_chip[sl], theirs[sl], atol=5e-5)
    # and both reconstruct the original signal there (COLA holds)
    np.testing.assert_allclose(ours_host[sl], y[sl], atol=2e-4)


def test_periodic_hann_matches_tf_and_scipy():
    from scipy.signal import get_window
    for length in (1200, 2048, 800):
        ours = periodic_hann(length)
        theirs_tf = tf.signal.hann_window(length, periodic=True).numpy()
        theirs_scipy = get_window("hann", length, fftbins=True)
        np.testing.assert_allclose(ours, theirs_tf, atol=1e-6)
        np.testing.assert_allclose(ours, theirs_scipy, atol=1e-12)
