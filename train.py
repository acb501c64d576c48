#!/usr/bin/env python3
"""Training CLI (reference ``/root/reference/train.py:278-322``).

Usage::

    python train.py --data_paths=datasets/spk1/data,datasets/spk2/data
    python train.py --data_paths=... --load_path=logs/run_x        # resume
    python train.py --data_paths=... --initialize_path=logs/run_x # warm start
"""

from __future__ import annotations

import argparse
import dataclasses
import os

from tacotron_tpu.config import Config, load_config, tune_scan_unroll
from tacotron_tpu.train.driver import train
from tacotron_tpu.utils import prepare_dirs


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_paths", required=True,
                        help="comma-separated npz data dirs (one per speaker)")
    parser.add_argument("--log_dir", default="logs")
    parser.add_argument("--load_path", default=None,
                        help="run dir to resume (keeps step)")
    parser.add_argument("--initialize_path", default=None,
                        help="run dir to warm-start from (resets step)")
    parser.add_argument("--config", default=None,
                        help="config.json overriding the defaults")
    parser.add_argument("--preset", default=None, choices=["tpu"],
                        help="'tpu' applies Config.tpu_recommended() on top "
                             "of the loaded config: bf16 compute + scan "
                             "unroll 8 + on-device feature extraction + "
                             "batch 32 (docs/BF16_STUDY.md, BATCH_STUDY.md)")
    parser.add_argument("--num_steps", type=int, default=100000)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--model_type", default=None,
                        choices=["single", "deepvoice", "simple"])
    parser.add_argument("--seed", type=int, default=123)
    parser.add_argument("--skip_path_filter", action="store_true",
                        help="bypass corpus frame/token filtering "
                             "(reference train.py:291-292 debug flag)")
    parser.add_argument("--blacklists", default="",
                        help="comma-separated path substrings to exclude "
                             "(reference datafeeder.py:31 son/yuinna list)")
    parser.add_argument("--webhook_url", default=None,
                        help="POST notifications here on divergence etc. "
                             "(reference Slack hook, utils/infolog.py)")
    parser.add_argument("--guided_attention_weight", type=float, default=None,
                        help="weight of the soft-diagonal attention prior "
                             "(DC-TTS eq. 3); 0 = off (reference parity)")
    parser.add_argument("--profile", action="store_true",
                        help="capture a jax.profiler trace of steps 10-15")
    parser.add_argument("--prewarm", action="store_true",
                        help="compile the whole bucket ladder before step 1 "
                             "(no mid-training compile stalls)")
    parser.add_argument("--scan_unroll", default="auto",
                        help="XLA unroll of the decoder/BiGRU time scans: "
                             "'auto' (8 on TPU, 1 elsewhere — measured "
                             "+36%% f32 step throughput, scripts/"
                             "train_profile.py), or an integer forcing "
                             "both knobs")
    parser.add_argument("--prefetch_depth", type=int, default=None,
                        help="device batches transferred ahead of the "
                             "compute step (H2D/compute overlap); 0 = "
                             "synchronous transfer on the critical path; "
                             "default: auto — 0 on the tunneled dev "
                             "backend where deferred wire moves make the "
                             "thread counterproductive (docs/PERF.md), "
                             "2 elsewhere")
    parser.add_argument("--sync_every", type=int, default=25,
                        help="steps between host metric flushes (dispatch-"
                             "ahead depth); 1 = fully synchronous like the "
                             "reference's sess.run loop")
    parser.add_argument("--distributed", action="store_true",
                        help="join a multi-host pod slice "
                             "(jax.distributed.initialize)")
    parser.add_argument("--on_device_features", action="store_true",
                        help="ship int16 waveforms and extract mel/linear "
                             "targets on chip (7.4x less H2D per step; "
                             "needs a corpus built with "
                             "DataConfig.store_waveform)")
    parser.add_argument("--device_resident", action="store_true",
                        help="upload the whole corpus to HBM once and "
                             "gather each batch on device (~128 B/step "
                             "wire; measured 7x the fresh-batch live "
                             "loop on a tunneled host link). Single "
                             "process; corpus must fit "
                             "TrainConfig.resident_corpus_max_bytes "
                             "(data/resident.py, docs/PERF.md)")
    parser.add_argument("--guided_attention_decay_steps", type=int,
                        default=None,
                        help="linearly anneal the guided-attention weight "
                             "to 0 over this many steps (the prior is "
                             "alignment scaffolding; docs/convergence_var)")
    args = parser.parse_args(argv)

    from tacotron_tpu import enable_compilation_cache
    enable_compilation_cache()
    if args.distributed:
        from tacotron_tpu.parallel import distributed_initialize, runtime_info
        distributed_initialize()
        print(f"[*] distributed: {runtime_info()}")

    data_paths = [p for p in args.data_paths.split(",") if p]
    config = load_config(args.config) if args.config else Config()
    if args.preset == "tpu":
        config = Config.tpu_recommended(config)

    # num_speakers = number of data dirs (reference train.py:113,301)
    model_kw = {"num_speakers": len(data_paths)}
    if args.model_type:
        model_kw["model_type"] = args.model_type
    elif len(data_paths) > 1 and config.model.model_type == "single":
        model_kw["model_type"] = "deepvoice"
    config = config.replace(
        model=dataclasses.replace(config.model, **model_kw))
    if args.batch_size:
        config = config.replace(
            train=dataclasses.replace(config.train,
                                      batch_size=args.batch_size))
    if args.on_device_features:
        config = config.replace(train=dataclasses.replace(
            config.train, on_device_features=True))
    if args.guided_attention_weight is not None:
        config = config.replace(train=dataclasses.replace(
            config.train,
            guided_attention_weight=args.guided_attention_weight))
    if args.guided_attention_decay_steps is not None:
        config = config.replace(train=dataclasses.replace(
            config.train,
            guided_attention_decay_steps=args.guided_attention_decay_steps))
    if args.device_resident:
        config = config.replace(train=dataclasses.replace(
            config.train, device_resident_corpus=True))

    if args.scan_unroll == "auto":
        config = tune_scan_unroll(config)
    else:
        u = int(args.scan_unroll)
        config = config.replace(model=dataclasses.replace(
            config.model, decoder_unroll=u, rnn_unroll=u))

    if args.load_path:
        run_dir = args.load_path
    else:
        run_dir = prepare_dirs(args.log_dir, data_paths)

    train(run_dir, data_paths, config,
          num_steps=args.num_steps,
          initialize_path=args.initialize_path,
          seed=args.seed,
          test_dump_dir=os.path.join(run_dir, "samples"),
          profile_dir=(os.path.join(run_dir, "profile")
                       if args.profile else None),
          webhook_url=args.webhook_url,
          skip_path_filter=args.skip_path_filter,
          blacklists=[b for b in args.blacklists.split(",") if b],
          prewarm=args.prewarm,
          sync_every=args.sync_every,
          prefetch_depth=args.prefetch_depth)


if __name__ == "__main__":
    main()
