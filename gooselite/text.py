"""Text utilities: innerTrim, WordStats, StopWords.

[canon: goose/text.py — StopWords.get_stopword_count, innerTrim]
(SURVEY.md A8; reference checkout empty at build time, SURVEY.md §0.1).
"""

from __future__ import annotations

import re
import string
from dataclasses import dataclass, field

from gooselite.stopwords_data import DEFAULT_LANGUAGE, STOPWORDS

# \s with a str pattern matches Unicode whitespace incl. \xa0 (nbsp) —
# exactly the "innerTrim" normalization of SURVEY.md §2.4 (A15):
# collapse \s+ to one space, then strip.
_WHITESPACE_RE = re.compile(r"\s+")

# string.punctuation removal table [canon: goose/text.py remove_punctuation]
_PUNCT_TABLE = str.maketrans("", "", string.punctuation)


def inner_trim(value: str) -> str:
    """Collapse all whitespace runs to a single space and strip.

    str.split() with no separator splits on the same Unicode whitespace
    class as \\s+ for str patterns (incl. \\xa0) and drops leading/trailing
    runs — identical output to the regex, ~3× faster on the hot path.
    """
    if not value:
        return ""
    return " ".join(value.split())


def remove_punctuation(content: str) -> str:
    return content.translate(_PUNCT_TABLE)


@dataclass
class WordStats:
    """Per-text-block statistics [canon: goose/text.py WordStats]."""

    word_count: int = 0
    stop_word_count: int = 0
    stop_words: list[str] = field(default_factory=list)


def resolve_language(lang: str | None) -> str:
    """Map a lang code to a shipped stopword table; unknown/None → 'en'.

    The `lang` column is primary per BASELINE.json:6 ("keyed by the lang
    column"); callers should pass meta-lang as fallback before None
    (SURVEY.md A5).
    """
    if lang:
        code = lang.strip().lower()[:2]
        if code in STOPWORDS:
            return code
    return DEFAULT_LANGUAGE


def stopword_count_fast(content: str, lang: str | None = None) -> int:
    """``get_stopword_count(content, lang).stop_word_count`` without the
    inner-trim and overlap-list allocations — the scoring hot path only
    ever consumes the count.

    Equivalence proof: the canonical path inner-trims, strips punctuation,
    lowercases, splits on single spaces, and counts tokens in the table.
    Punctuation stripping never touches whitespace, and the table holds no
    empty string, so counting over ``raw.translate().lower().split()``
    (whitespace split, empties dropped, trim-insensitive) yields the
    identical count; byte-identity is guarded by the golden suite.
    """
    if not content:
        return 0
    table = STOPWORDS[resolve_language(lang)]
    n = 0
    for w in content.translate(_PUNCT_TABLE).lower().split():
        if w in table:
            n += 1
    return n


def get_stopword_count(content: str, lang: str | None = None) -> WordStats:
    """Count tokens of `content` present in the per-language stopword set.

    [canon: goose/text.py StopWords.get_stopword_count]: strip punctuation,
    split on single spaces (content is expected inner-trimmed), membership
    test lowercased.
    """
    ws = WordStats()
    if not content:
        return ws
    table = STOPWORDS[resolve_language(lang)]
    # lowercase the whole block once (lower() never adds/removes spaces,
    # so the split is unchanged) instead of per candidate word
    candidate_words = remove_punctuation(content).lower().split(" ")
    overlapping = [w for w in candidate_words if w in table]
    ws.word_count = len(candidate_words)
    ws.stop_word_count = len(overlapping)
    ws.stop_words = overlapping
    return ws
