"""Synthesis layer: batched greedy decode, vocoding, trimming, CLI."""

from .synthesizer import (Synthesizer, attention_health,
                          attention_trim_index, posthoc_attention,
                          split_text, trim_silence_db)

__all__ = ["Synthesizer", "attention_health", "attention_trim_index",
           "posthoc_attention", "split_text", "trim_silence_db"]
