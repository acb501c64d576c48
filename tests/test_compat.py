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


def _variant_config(mt, ns, ses, att="bah_mon"):
    import dataclasses
    from tacotron_tpu.config import Config
    cfg = Config()
    return cfg.replace(model=dataclasses.replace(
        cfg.model, model_type=mt, num_speakers=ns,
        speaker_embedding_size=ses, attention_type=att))


@pytest.mark.parametrize("mt,ns,ses,att", [
    ("single", 1, 16, "bah_mon"),
    ("deepvoice", 4, 16, "bah_mon"),
    ("deepvoice", 4, 1, "bah_mon"),
    ("simple", 4, 16, "bah_mon"),
    ("single", 1, 16, "bah_norm"),
])
def test_tf1_bundle_roundtrip_zero_residue(tmp_path, mt, ns, ses, att):
    """export -> TF1 bundle -> import: zero unmatched, zero unfilled, and
    every leaf bit-identical — so loading a real son/park checkpoint
    (/root/reference/download.py:82-109) reduces to a download."""
    import jax
    from tacotron_tpu.compat import (export_tf1_checkpoint,
                                     import_tf1_checkpoint, import_report)
    from tacotron_tpu.compat.names import import_tf1
    from tacotron_tpu.compat.bundle import read_checkpoint
    from tacotron_tpu.train.state import create_model

    cfg = _variant_config(mt, ns, ses, att)
    model = create_model(cfg)
    inputs = np.zeros((2, 8), np.int32)
    lengths = np.full((2,), 8, np.int32)
    spk = np.zeros((2,), np.int32) if ns > 1 else None
    variables = model.init(
        {"params": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        inputs, lengths, speaker_id=spk, train=False, max_steps=4)
    params0 = variables["params"]
    stats0 = variables.get("batch_stats", {})

    prefix = str(tmp_path / "model.ckpt-777")
    export_tf1_checkpoint(prefix, params0, stats0, cfg)

    tensors = read_checkpoint(prefix)
    params, stats, unmatched, unfilled = import_tf1(tensors, cfg)
    assert unmatched == [], unmatched[:5]
    assert unfilled == [], unfilled[:5]

    # bit-identical leaves -> bit-identical forward
    flat0 = jax.tree_util.tree_flatten_with_path(params0)[0]
    flat1 = dict(
        ("/".join(str(getattr(k, "key", k)) for k in path), leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0])
    assert len(flat0) == len(flat1)
    for path, leaf in flat0:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        np.testing.assert_array_equal(np.asarray(leaf), flat1[key],
                                      err_msg=key)

    out0 = model.apply({"params": params0, "batch_stats": stats0},
                       inputs, lengths, speaker_id=spk, train=False,
                       max_steps=4)
    out1 = model.apply({"params": params, "batch_stats": stats},
                       inputs, lengths, speaker_id=spk, train=False,
                       max_steps=4)
    np.testing.assert_array_equal(np.asarray(out0["linear_outputs"]),
                                  np.asarray(out1["linear_outputs"]))

    report = import_report(prefix, cfg)
    assert "unmatched source variables: 0" in report
    assert "rule targets not in bundle: 0" in report


def test_tf1_synthetic_reference_bundle(tmp_path):
    """A bundle carrying the complete transcribed reference name inventory
    (decoder wrapper-stack scopes included) imports with zero residue and
    drives a forward pass."""
    from tacotron_tpu.compat import tf1_variable_inventory, write_checkpoint
    from tacotron_tpu.compat import import_tf1_checkpoint
    from tacotron_tpu.train.state import create_model

    cfg = _variant_config("deepvoice", 2, 16)
    inv = tf1_variable_inventory(cfg)
    # the decoder wrapper-stack scopes are present and exact
    dec = ("model/inference/decoder/output_projection_wrapper/multi_rnn_cell"
           "/cell_0/output_projection_wrapper/"
           "concat_output_and_attention_wrapper/attention_wrapper")
    assert f"{dec}/bahdanau_monotonic_attention/attention_score_bias" in inv
    assert f"{dec}/decoder_prenet_wrapper/gru_cell/gates/kernel" in inv
    assert inv[f"{dec}/bahdanau_monotonic_attention/attention_v"] == (256,)

    rng = np.random.default_rng(5)
    tensors = {}
    for name, shape in inv.items():
        if name == "model/global_step":
            tensors[name] = np.asarray(1000, np.int64)
        elif name.endswith("moving_variance"):
            tensors[name] = rng.uniform(0.5, 1.5, shape).astype(np.float32)
        else:
            tensors[name] = (0.05 * rng.standard_normal(shape)).astype(
                np.float32)
    prefix = str(tmp_path / "model.ckpt-1000")
    write_checkpoint(prefix, tensors)

    params, stats, unmatched = import_tf1_checkpoint(prefix, cfg)
    assert unmatched == []
    model = create_model(cfg)
    out = model.apply(
        {"params": params, "batch_stats": stats},
        np.zeros((1, 8), np.int32), np.full((1,), 8, np.int32),
        speaker_id=np.zeros((1,), np.int32), train=False, max_steps=4)
    assert np.isfinite(np.asarray(out["linear_outputs"])).all()


def test_compat_cli_roundtrip(tmp_path):
    """The user-facing migration path: run dir -> `export` -> TF1 bundle
    -> `import` -> new run dir, parameters bit-identical end to end."""
    import dataclasses
    import json
    import os

    import jax

    from tacotron_tpu.compat.__main__ import main as compat_main
    from tacotron_tpu.config import Config, ModelConfig, save_config
    from tacotron_tpu.train.checkpoint import CheckpointManager
    from tacotron_tpu.train.optim import make_optimizer
    from tacotron_tpu.train.state import create_train_state

    cfg = Config().replace(model=ModelConfig(
        embedding_size=32, enc_prenet_sizes=(32, 16), enc_bank_size=4,
        enc_bank_channel_size=16, enc_highway_depth=2, enc_rnn_size=16,
        enc_proj_sizes=(16, 16), attention_size=16, attention_state_size=16,
        dec_layer_num=2, dec_rnn_size=16, dec_prenet_sizes=(16, 8),
        post_bank_size=2, post_bank_channel_size=16, post_highway_depth=2,
        post_rnn_size=16, post_proj_sizes=(16, 80)))
    run_a = str(tmp_path / "run_a")
    opt = make_optimizer(cfg.train)
    state = create_train_state(cfg, jax.random.PRNGKey(3), opt)
    mgr = CheckpointManager(run_a, cfg, async_save=False)
    mgr.save(state)
    mgr.close()

    prefix = str(tmp_path / "tf1" / "model.ckpt-777")
    assert compat_main(["export", run_a, prefix]) == 0
    assert os.path.exists(prefix + ".index")

    cfg_json = os.path.join(run_a, "config.json")
    # report runs clean on the exported bundle
    assert compat_main(["report", prefix, "--config", cfg_json]) == 0

    run_b = str(tmp_path / "run_b")
    assert compat_main(
        ["import", prefix, "--run_dir", run_b, "--config", cfg_json]) == 0

    template = create_train_state(cfg, jax.random.PRNGKey(9), opt)
    mgr_b = CheckpointManager(run_b, cfg, async_save=False)
    restored = mgr_b.restore(template)
    mgr_b.close()
    assert int(restored.step) == 0
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.batch_stats),
                    jax.tree.leaves(restored.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a wrong --config is rejected loudly, not silently mis-mapped
    bad_cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, enc_rnn_size=24))
    bad_path = str(tmp_path / "bad.json")
    save_config(bad_cfg, bad_path)
    assert compat_main(["import", prefix, "--run_dir",
                        str(tmp_path / "run_c"), "--config", bad_path]) == 1


def test_resolve_checkpoint_prefix(tmp_path):
    """A run DIRECTORY resolves to its newest model.ckpt-N — the
    reference's discovery rule (models/__init__.py:10-17)."""
    import os

    import pytest

    from tacotron_tpu.compat.bundle import write_checkpoint
    from tacotron_tpu.compat.tf1 import resolve_checkpoint_prefix

    d = str(tmp_path)
    for step in (100, 2000, 350):
        write_checkpoint(os.path.join(d, f"model.ckpt-{step}"),
                         {"v": np.zeros((2,), np.float32)})
    # an exact prefix passes through untouched
    p = os.path.join(d, "model.ckpt-100")
    assert resolve_checkpoint_prefix(p) == p
    # a directory resolves to the numerically newest step (2000 > 350)
    assert resolve_checkpoint_prefix(d).endswith("model.ckpt-2000")
    empty = tmp_path / "sub"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        resolve_checkpoint_prefix(str(empty))
