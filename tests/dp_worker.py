"""Worker process for the true multi-process data-parallel test.

Run by ``tests/test_multiprocess_dp.py`` as N separate OS processes, each
with 8//N virtual CPU devices: ``jax.distributed.initialize`` forms the
real process group (the SURVEY §2.5 scale-out path), each process's
DataFeeder reads its disjoint corpus stripe
(``data/feeder.py`` ``process_index``/``process_count``), local batches
are stitched into global arrays by ``parallel.mesh.shard_batch``, and the
sharded train step reduces gradients across processes.  After ``--steps``
steps, process 0 writes the final parameters to ``--out`` so the parent
test can assert they equal a single-process 8-device run over the same
global batch stream.

Also runnable with ``--num_processes 1`` (8 local devices): emulates the
two stripes in one process (two feeders, concatenated rows) — the
equivalence baseline.
"""

import argparse
import os
import sys


def build_config():
    # imports deferred: jax platform/flags must be set before first jax use
    from tacotron_tpu.config import (Config, DataConfig, ModelConfig,
                                     TrainConfig)
    return Config().replace(
        model=ModelConfig(
            embedding_size=32, enc_prenet_sizes=(32, 16), enc_bank_size=4,
            enc_bank_channel_size=16, enc_highway_depth=2, enc_rnn_size=16,
            enc_proj_sizes=(16, 16), attention_size=16,
            attention_state_size=16, dec_layer_num=2, dec_rnn_size=16,
            dec_prenet_sizes=(16, 8), post_bank_size=2,
            post_bank_channel_size=16, post_highway_depth=2,
            post_rnn_size=16, post_proj_sizes=(16, 80)),
        data=DataConfig(min_tokens=1, min_iters=1, max_iters=100,
                        batches_per_group=2, pad_to_corpus_max=True),
        train=TrainConfig(batch_size=8, initial_phase_step=0))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    local_devices = 8 // args.num_processes
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                               f"{local_devices}")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

    import jax
    jax.config.update("jax_platforms", "cpu")

    from tacotron_tpu.parallel.distributed import initialize, runtime_info
    if args.num_processes > 1:
        initialize(coordinator_address=f"localhost:{args.port}",
                   num_processes=args.num_processes,
                   process_id=args.process_id)

    import numpy as np

    from tacotron_tpu.data.feeder import DataFeeder
    from tacotron_tpu.parallel import make_mesh, shard_batch
    from tacotron_tpu.train import (Batch, create_train_state,
                                    make_optimizer, make_train_step)

    info = runtime_info()
    assert info["global_devices"] == 8, info
    cfg = build_config()
    plan = make_mesh()
    global_batch = cfg.train.batch_size
    local_batch = global_batch // jax.process_count()

    if args.num_processes == 1:
        # emulate the two stripes in-process: the equivalence baseline
        # (stripe-local batch is half the global batch, exactly as each
        # process of the 2-process run builds it)
        feeders = [
            DataFeeder([args.corpus], cfg, data_type="train",
                       batch_size=global_batch // 2, n_test=2,
                       process_index=i, process_count=2)
            for i in range(2)]
        iters = [f.batches() for f in feeders]

        def next_global_batch():
            parts = [next(it) for it in iters]
            return Batch(*[
                None if parts[0][i] is None else np.concatenate(
                    [np.asarray(p[i]) for p in parts], axis=0)
                for i in range(len(parts[0]))])
    else:
        feeder = DataFeeder([args.corpus], cfg, data_type="train",
                            batch_size=local_batch, n_test=2,
                            process_index=jax.process_index(),
                            process_count=jax.process_count())
        it = feeder.batches()

        def next_global_batch():
            return next(it)

    opt = make_optimizer(cfg.train)
    state = create_train_state(cfg, jax.random.PRNGKey(0), opt)
    repl = plan.replicated()
    if jax.process_count() > 1:
        # lift the identically-initialized host-local state/rng to global
        # replicated arrays (multi-controller jit requires global inputs)
        state = jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                repl, np.asarray(x)), state)
    step = make_train_step(cfg, plan)
    rng = jax.random.PRNGKey(1)
    if jax.process_count() > 1:
        rng = jax.make_array_from_process_local_data(repl, np.asarray(rng))

    debug = os.environ.get("DP_WORKER_DEBUG")
    losses = []
    for t in range(args.steps):
        host_batch = next_global_batch()
        if debug:
            sums = [None if f is None else float(np.sum(np.asarray(f)))
                    for f in host_batch]
            shapes = [None if f is None else np.asarray(f).shape
                      for f in host_batch]
            print(f"[p{jax.process_index()}] step {t} local sums={sums} "
                  f"shapes={shapes}", flush=True)
        batch = Batch(*shard_batch(plan, host_batch))
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))

    if jax.process_index() == 0:
        flat, _ = jax.tree_util.tree_flatten_with_path(state.params)
        arrays = {jax.tree_util.keystr(path): np.asarray(leaf)
                  for path, leaf in flat}
        arrays["__losses__"] = np.asarray(losses, np.float64)
        np.savez(args.out, **arrays)
        print(f"saved {args.out} ({len(arrays)} arrays)")


if __name__ == "__main__":
    main()
