"""Text normalization — the per-turn equality contract.

Re-expresses ``normalize_text`` from the reference
(crates/core/src/inference.rs:228-233): replace CRLF with LF, strip the
end-of-sentence sentinel, trim surrounding whitespace.  This exact function
defines what "per-turn text equality" means for the golden-fixture gate, so
both the extractor and the fixture generator call it.

``earliest_divergence`` mirrors benchsuite/common.py:99-107 (first index at
which two sequences differ, including a length difference), reused for
mismatch reporting in pytest.
"""

from __future__ import annotations

from typing import Optional, Sequence

SENTINEL = "<｜end▁of▁sentence｜>"


def normalize_text(s: Optional[str]) -> str:
    """CRLF -> LF, strip sentinel occurrences, trim outer whitespace."""
    if s is None:
        return ""
    s = s.replace("\r\n", "\n")
    if SENTINEL in s:
        s = s.replace(SENTINEL, "")
    return s.strip()


def earliest_divergence(a: Sequence, b: Sequence) -> Optional[int]:
    """First index where ``a`` and ``b`` differ; None when equal.

    Works on strings (char index) and lists (element index).  A pure length
    difference diverges at ``min(len(a), len(b))``.
    """
    n = min(len(a), len(b))
    for i in range(n):
        if a[i] != b[i]:
            return i
    if len(a) != len(b):
        return n
    return None
