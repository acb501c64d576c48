"""Synthesis CLI: ``python -m tacotron_tpu.synth --load_path RUN "text"``
(reference ``/root/reference/synthesizer.py:370-389``)."""

from __future__ import annotations

import argparse
import os

from ..config import Config
from .synthesizer import Synthesizer


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="synthesize speech")
    parser.add_argument("text", nargs="+", help="text(s) to synthesize")
    parser.add_argument("--load_path", default=None,
                        help="run directory with checkpoints + config.json")
    parser.add_argument("--random_init", action="store_true",
                        help="use fresh random weights (smoke testing)")
    parser.add_argument("--sample_path", default="samples")
    parser.add_argument("--speaker_id", type=int, default=0)
    parser.add_argument("--checkpoint_step", type=int, default=None)
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--manual_attention_mode", type=int, default=0,
                        choices=[0, 1, 2, 3])
    parser.add_argument("--no_attention_trim", action="store_true")
    parser.add_argument("--no_librosa_trim", action="store_true")
    parser.add_argument("--vocode", default="chip",
                        choices=["chip", "host", "none"])
    parser.add_argument("--long", action="store_true",
                        help="treat each text as a long document: "
                             "sentence-split, batch-decode the chunks in "
                             "one call, stitch with silence "
                             "(Synthesizer.synthesize_long)")
    args = parser.parse_args(argv)

    from tacotron_tpu import enable_compilation_cache
    enable_compilation_cache()

    synth = Synthesizer()
    if args.random_init or args.load_path is None:
        if not args.random_init:
            parser.error("--load_path is required (or pass --random_init)")
        synth.init_random(Config())
    else:
        synth.load(args.load_path, step=args.checkpoint_step)

    if args.long:
        results = {"wavs": [], "alignments": [], "sequences": []}
        for text in args.text:
            out = synth.synthesize_long(
                text, speaker_id=args.speaker_id, robust=False,
                max_steps=args.max_steps,
                attention_trim=not args.no_attention_trim,
                librosa_trim=not args.no_librosa_trim,
                vocode=args.vocode)
            print(f"[*] split into {len(out['chunks'])} chunk(s)")
            results["wavs"].append(out["wav"])
            results["alignments"].append(None)
            results["sequences"].append([])
    else:
        results = synth.synthesize(
            texts=args.text,
            speaker_ids=[args.speaker_id] * len(args.text),
            max_steps=args.max_steps,
            manual_attention_mode=args.manual_attention_mode,
            attention_trim=not args.no_attention_trim,
            librosa_trim=not args.no_librosa_trim,
            vocode=args.vocode)
    paths = synth.save_results(results, args.sample_path)
    for p in paths:
        print(f"[*] saved {p} ({os.path.getsize(p)} bytes)")


if __name__ == "__main__":
    main()
