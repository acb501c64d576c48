"""Text <-> symbol-id codec.

Equivalent of the reference's ``text/__init__.py``: runs the configured
cleaners, maps symbols to ids (dropping anything outside the vocabulary and
any PAD/EOS produced by a cleaner), and appends a single EOS id.  Supports the
keithito ARPAbet curly-brace passthrough (``{HH AH0 ...}``) for API parity
(reference ``text/__init__.py:16,42-50``) even though the active Korean symbol
set contains no ARPAbet symbols.

No global config: cleaner names are an explicit argument (default Korean).
"""

from __future__ import annotations

import re
from typing import Iterable, Sequence

import numpy as np

from . import cleaners as _cleaners_module
from .cleaners import get_cleaner
from .korean import jamo_to_korean
from .symbols import (ALL_SYMBOLS, EOS, EOS_ID, PAD, PAD_ID, VOCAB_SIZE,
                      char_to_id, id_to_char, symbols)

__all__ = [
    "text_to_sequence", "sequence_to_text", "tokens_to_ids",
    "ALL_SYMBOLS", "EOS", "EOS_ID", "PAD", "PAD_ID", "VOCAB_SIZE",
    "char_to_id", "id_to_char", "symbols", "jamo_to_korean", "get_cleaner",
]

_CURLY_RE = re.compile(r"(.*?)\{(.+?)\}(.*)")

DEFAULT_CLEANERS = ("korean_cleaners",)


def text_to_sequence(
        text: str,
        cleaner_names: Sequence[str] = DEFAULT_CLEANERS,
        as_token: bool = False):
    """Convert text to an int32 array of symbol ids, EOS-terminated."""
    sequence: list[int] = []
    while text:
        match = _CURLY_RE.match(text)
        if not match:
            sequence.extend(_encode(_clean(text, cleaner_names)))
            break
        sequence.extend(_encode(_clean(match.group(1), cleaner_names)))
        sequence.extend(_encode("@" + s for s in match.group(2).split()))
        text = match.group(3)

    sequence.append(EOS_ID)
    if as_token:
        return sequence_to_text(sequence, combine_jamo=True)
    return np.asarray(sequence, dtype=np.int32)


def tokens_to_ids(tokens: Iterable[str]) -> np.ndarray:
    """Map pre-tokenized symbols (e.g. jamo) to ids, appending EOS."""
    return np.asarray(
        [char_to_id[t] for t in tokens if _keep(t)] + [EOS_ID], dtype=np.int32)


def sequence_to_text(
        sequence: Iterable[int],
        skip_eos_and_pad: bool = False,
        combine_jamo: bool = False) -> str:
    """Invert ``text_to_sequence`` (reference ``text/__init__.py:61-79``)."""
    result = ""
    for symbol_id in sequence:
        symbol = id_to_char.get(int(symbol_id))
        if symbol is None:
            continue
        if len(symbol) > 1 and symbol.startswith("@"):
            symbol = "{%s}" % symbol[1:]
        if skip_eos_and_pad and symbol in (EOS, PAD):
            continue
        result += symbol
    result = result.replace("}{", " ")
    return jamo_to_korean(result) if combine_jamo else result


def _clean(text: str, cleaner_names: Sequence[str]):
    for name in cleaner_names:
        text = get_cleaner(name.strip())(text)
    return text


def _encode(cleaned) -> list[int]:
    """Symbols (string or token list) -> ids, dropping PAD/EOS/unknowns."""
    return [char_to_id[s] for s in cleaned if _keep(s)]


def _keep(symbol: str) -> bool:
    return symbol in char_to_id and symbol not in (PAD, EOS)
