"""TF1 TensorBundle codec tests: round-trip write->read without TF, crc32c
vectors, and the variable-name mapping into flax trees."""

import numpy as np
import pytest

from tacotron_tpu.compat.bundle import (crc32c, masked_crc32c,
                                        read_checkpoint, write_checkpoint)
from tacotron_tpu.compat.tf1 import map_tf1_variables


def test_crc32c_vectors():
    # RFC 3720 test vectors for CRC32C (Castagnoli)
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_bundle_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "model/inference/embedding": rng.standard_normal(
            (80, 256)).astype(np.float32),
        "model/inference/prenet/dense_1/kernel": rng.standard_normal(
            (256, 128)).astype(np.float32),
        "model/inference/prenet/dense_1/bias": np.zeros(128, np.float32),
        "global_step": np.asarray(1234, np.int64).reshape(()),
        "a/very/long/name/" + "x" * 100: rng.standard_normal(
            (3, 5)).astype(np.float64),
    }
    prefix = str(tmp_path / "model.ckpt-1234")
    write_checkpoint(prefix, tensors)
    back = read_checkpoint(prefix)
    assert set(back) == set(tensors)
    for name in tensors:
        np.testing.assert_array_equal(back[name], tensors[name])
        assert back[name].dtype == tensors[name].dtype


def test_bundle_many_keys(tmp_path):
    """Exercise prefix compression + restart array with many similar keys."""
    tensors = {f"model/layer_{i:03d}/kernel":
               np.full((4, 4), i, np.float32) for i in range(100)}
    prefix = str(tmp_path / "model.ckpt-7")
    write_checkpoint(prefix, tensors)
    back = read_checkpoint(prefix)
    assert len(back) == 100
    np.testing.assert_array_equal(back["model/layer_042/kernel"],
                                  np.full((4, 4), 42, np.float32))


def test_map_tf1_variables_core_paths():
    rng = np.random.default_rng(1)
    tensors = {
        "model/inference/embedding":
            rng.standard_normal((80, 256)).astype(np.float32),
        "model/inference/prenet/dense_1/kernel":
            rng.standard_normal((256, 256)).astype(np.float32),
        "model/inference/encoder_cbhg/conv_bank/conv1d_1/conv1d/kernel":
            rng.standard_normal((1, 128, 128)).astype(np.float32),
        "model/inference/encoder_cbhg/conv_bank/conv1d_2/conv1d/kernel":
            rng.standard_normal((2, 128, 128)).astype(np.float32),
        "model/inference/encoder_cbhg/conv_bank/conv1d_1/conv1d/bias":
            np.zeros(128, np.float32),
        "model/inference/encoder_cbhg/conv_bank/conv1d_2/conv1d/bias":
            np.ones(128, np.float32),
        "model/inference/encoder_cbhg/conv_bank/conv1d_1/"
        "batch_normalization/gamma": np.ones(128, np.float32),
        "model/inference/encoder_cbhg/conv_bank/conv1d_2/"
        "batch_normalization/gamma": 2 * np.ones(128, np.float32),
        "model/inference/encoder_cbhg/conv_bank/conv1d_1/"
        "batch_normalization/moving_mean": np.zeros(128, np.float32),
        "model/inference/encoder_cbhg/conv_bank/conv1d_2/"
        "batch_normalization/moving_mean": np.ones(128, np.float32),
        "model/inference/encoder_cbhg/bidirectional_rnn/fw/gru_cell/"
        "gates/kernel": rng.standard_normal((256, 256)).astype(np.float32),
        "model/inference/encoder_cbhg/highway_1/H/kernel":
            rng.standard_normal((128, 128)).astype(np.float32),
        "model/inference/memory_layer/kernel":
            rng.standard_normal((256, 256)).astype(np.float32),
        "model/optimizer/whatever/Adam": np.zeros(3, np.float32),
        "model/inference/mystery_variable": np.zeros(3, np.float32),
    }
    params, stats, unmatched = map_tf1_variables(tensors)
    assert params["char_embedding"]["embedding"].shape == (80, 256)
    assert params["encoder_prenet"]["dense_1"]["kernel"].shape == (256, 256)
    # fused bank: per-branch kernels kept, biases/BN concatenated in order
    assert params["encoder_cbhg"]["conv_bank"]["kernel_1"].shape == (
        1, 128, 128)
    np.testing.assert_array_equal(
        params["encoder_cbhg"]["conv_bank"]["bias"][128:],
        np.ones(128, np.float32))
    np.testing.assert_array_equal(
        params["encoder_cbhg"]["bank_bn"]["BatchNorm_0"]["scale"][128:],
        2 * np.ones(128, np.float32))
    np.testing.assert_array_equal(
        stats["encoder_cbhg"]["bank_bn"]["BatchNorm_0"]["mean"][128:],
        np.ones(128, np.float32))
    assert params["encoder_cbhg"]["bigru"]["fw"]["gates"]["kernel"].shape \
        == (256, 256)
    assert params["encoder_cbhg"]["highway_1"]["H"]["kernel"].shape == (
        128, 128)
    assert params["attention_memory_layer"]["kernel"].shape == (256, 256)
    # optimizer slots skipped silently; unknown inference vars reported
    assert unmatched == ["inference/mystery_variable"]
