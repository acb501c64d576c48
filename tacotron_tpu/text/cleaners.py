"""Text cleaner registry.

Cleaners are composable text transforms selected by name (comma-separated in
``DataConfig.cleaners``), mirroring the reference registry
(``/root/reference/text/cleaners.py``).  Unlike the reference — whose
``english_cleaners`` crashes with a NameError because ``convert_to_ascii`` and
``normalize_numbers`` are never imported (``cleaners.py:84-91``) — every
cleaner here is functional and dependency-free (ASCII transliteration uses
``unicodedata`` instead of the unavailable Unidecode package).
"""

from __future__ import annotations

import re
import unicodedata

from .english_numbers import normalize_numbers
from .korean import tokenize as _korean_tokenize

_WHITESPACE_RE = re.compile(r"\s+")

_ABBREVIATIONS = [
    (re.compile(rf"\b{abbr}\.", re.IGNORECASE), expansion)
    for abbr, expansion in [
        ("mrs", "misess"), ("mr", "mister"), ("dr", "doctor"),
        ("st", "saint"), ("co", "company"), ("jr", "junior"),
        ("maj", "major"), ("gen", "general"), ("drs", "doctors"),
        ("rev", "reverend"), ("lt", "lieutenant"), ("hon", "honorable"),
        ("sgt", "sergeant"), ("capt", "captain"), ("esq", "esquire"),
        ("ltd", "limited"), ("col", "colonel"), ("ft", "fort"),
    ]
]


def korean_cleaners(text: str):
    """Korean pipeline: normalization + jamo tokenization.

    Returns a list of jamo tokens (EOS-terminated), like the reference
    (``cleaners.py:22-25``); the codec layer drops the trailing EOS and
    re-appends its own.
    """
    return _korean_tokenize(text)


def convert_to_ascii(text: str) -> str:
    decomposed = unicodedata.normalize("NFKD", text)
    return decomposed.encode("ascii", "ignore").decode("ascii")


def lowercase(text: str) -> str:
    return text.lower()


def collapse_whitespace(text: str) -> str:
    return _WHITESPACE_RE.sub(" ", text)


def expand_abbreviations(text: str) -> str:
    for pattern, expansion in _ABBREVIATIONS:
        text = pattern.sub(expansion, text)
    return text


def expand_numbers(text: str) -> str:
    return normalize_numbers(text)


def basic_cleaners(text: str) -> str:
    """Lowercase + whitespace collapse, no transliteration."""
    return collapse_whitespace(lowercase(text))


def transliteration_cleaners(text: str) -> str:
    """ASCII transliteration for non-English latin-script text."""
    return collapse_whitespace(lowercase(convert_to_ascii(text)))


def english_cleaners(text: str) -> str:
    """English pipeline: transliteration, numbers, abbreviations."""
    text = convert_to_ascii(text)
    text = lowercase(text)
    text = expand_numbers(text)
    text = expand_abbreviations(text)
    text = collapse_whitespace(text)
    return text


_REGISTRY = {
    "korean_cleaners": korean_cleaners,
    "english_cleaners": english_cleaners,
    "basic_cleaners": basic_cleaners,
    "transliteration_cleaners": transliteration_cleaners,
}


def get_cleaner(name: str):
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(f"Unknown cleaner: {name}") from None
