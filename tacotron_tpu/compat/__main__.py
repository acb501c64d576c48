"""Reference-checkpoint interchange CLI.

The migration path for users of the reference
(``/root/reference/download.py:82-109`` ships ``son``/``park`` TF1
bundles):

    # inspect how a TF1 bundle maps onto this framework
    python -m tacotron_tpu.compat report logs/park/model.ckpt-200000

    # convert it into a run directory this framework trains/serves from
    python -m tacotron_tpu.compat import logs/park/model.ckpt-200000 \\
        --run_dir runs/park
    python -m tacotron_tpu.synth --load_path runs/park "text"

    # and back: export a trained run as a TF1 bundle the reference's
    # Saver.restore can read
    python -m tacotron_tpu.compat export runs/park out/model.ckpt-1

The underlying codec is validated byte-exact against TensorFlow itself
(``tests/test_tf_oracle.py``); the name mapping round-trips with zero
residue for every model_type (``tests/test_compat.py``).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Optional, Sequence


def _load_config(path: Optional[str]):
    from ..config import Config, load_config
    return load_config(path) if path else Config()


def cmd_report(args) -> int:
    from .tf1 import import_report
    config = _load_config(args.config) if args.config else None
    print(import_report(args.prefix, config))
    return 0


def cmd_import(args) -> int:
    import jax
    import jax.numpy as jnp

    from ..train.checkpoint import CheckpointManager
    from ..train.optim import make_optimizer
    from ..train.state import create_train_state
    from .tf1 import import_tf1_checkpoint

    config = _load_config(args.config)
    params, stats, unmatched = import_tf1_checkpoint(args.prefix, config)
    if unmatched and not args.force:
        print(f"[!] {len(unmatched)} source variables did not map:",
              file=sys.stderr)
        for name in unmatched:
            print(f"    ? {name}", file=sys.stderr)
        print("[!] pass --force to import anyway (unmatched variables "
              "are dropped), or fix --config to match the bundle's "
              "architecture", file=sys.stderr)
        return 1

    opt = make_optimizer(config.train)
    template = create_train_state(config, jax.random.PRNGKey(0), opt)

    # the imported trees must be congruent with the model's own init tree
    # (a silent mismatch would surface much later, at restore/apply time)
    t_imp = jax.tree_util.tree_structure({"p": params, "s": stats})
    t_ref = jax.tree_util.tree_structure(
        {"p": jax.tree.map(lambda x: 0, template.params),
         "s": jax.tree.map(lambda x: 0, template.batch_stats)})
    if t_imp != t_ref and not args.force:
        print("[!] imported tree structure does not match the model "
              "built from --config; run the 'report' subcommand to see "
              "the residue, or pass --force", file=sys.stderr)
        return 1

    state = template.replace(
        params=jax.tree.map(jnp.asarray, params),
        batch_stats=jax.tree.map(jnp.asarray, stats))
    mgr = CheckpointManager(args.run_dir, config, async_save=False)
    mgr.save(state)
    mgr.close()
    print(f"[*] imported {args.prefix} -> {args.run_dir} "
          f"(step 0, {len(jax.tree.leaves(params))} param leaves)")
    return 0


def cmd_export(args) -> int:
    import jax
    import numpy as np

    from ..train.checkpoint import CheckpointManager, load_run_config
    from ..train.optim import make_optimizer
    from ..train.state import create_train_state
    from .tf1 import export_tf1_checkpoint

    config = load_run_config(args.run_dir)
    opt = make_optimizer(config.train)
    template = create_train_state(config, jax.random.PRNGKey(0), opt)
    mgr = CheckpointManager(args.run_dir, config, async_save=False)
    state = mgr.restore(template, step=args.step)
    mgr.close()
    os.makedirs(os.path.dirname(os.path.abspath(args.prefix)), exist_ok=True)
    export_tf1_checkpoint(
        args.prefix,
        jax.tree.map(np.asarray, state.params),
        jax.tree.map(np.asarray, state.batch_stats),
        config)
    print(f"[*] exported step {int(state.step)} -> {args.prefix}"
          f"{{.index,.data-00000-of-00001}}")
    return 0


def main(argv: Optional[Sequence[str]] = None) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m tacotron_tpu.compat",
        description="TF1 reference-checkpoint interchange")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("report", help="show how a TF1 bundle maps")
    p.add_argument("prefix", help="model.ckpt-N prefix, or a directory "
                                  "(newest bundle is picked)")
    p.add_argument("--config", default=None,
                   help="config.json for the exact rule table "
                        "(omit for the lenient regex mapper)")
    p.set_defaults(fn=cmd_report)

    p = sub.add_parser("import",
                       help="TF1 bundle -> run dir (Orbax checkpoint)")
    p.add_argument("prefix")
    p.add_argument("--run_dir", required=True)
    p.add_argument("--config", default=None,
                   help="architecture of the bundle (defaults to the "
                        "reference defaults)")
    p.add_argument("--force", action="store_true",
                   help="import even with unmatched variables")
    p.set_defaults(fn=cmd_import)

    p = sub.add_parser("export",
                       help="run dir -> TF1 bundle (reference-readable)")
    p.add_argument("run_dir")
    p.add_argument("prefix", help="output model.ckpt-N prefix")
    p.add_argument("--step", type=int, default=None)
    p.set_defaults(fn=cmd_export)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
