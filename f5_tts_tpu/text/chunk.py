"""Long-text chunking (reference src/f5_tts/infer/utils_infer.py:73-102):
sentence-split on latin/CJK punctuation, greedy pack by utf-8 byte budget."""

from __future__ import annotations

import re


def chunk_text(text: str, max_chars: int = 135) -> list[str]:
    """Split ``text`` into chunks of at most ``max_chars`` utf-8 bytes each
    (sentence boundaries preserved)."""
    chunks: list[str] = []
    current = ""
    sentences = re.split(r"(?<=[;:,.!?])\s+|(?<=[；：，。！？])", text)
    for sentence in sentences:
        if not sentence:
            continue
        latin_end = bool(sentence) and len(sentence[-1].encode("utf-8")) == 1
        piece = sentence + " " if latin_end else sentence
        if len(current.encode("utf-8")) + len(sentence.encode("utf-8")) <= max_chars:
            current += piece
        else:
            if current:
                chunks.append(current.strip())
            current = piece
    if current:
        chunks.append(current.strip())
    # drop whitespace-only chunks (the reference can emit one for degenerate
    # whitespace input; an empty chunk would synthesize a junk blob)
    return [c for c in chunks if c]
