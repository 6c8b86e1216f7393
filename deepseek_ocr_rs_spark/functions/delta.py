"""Streaming delta extraction (W4/F4/X5 analogs).

Re-expresses crates/core/src/streaming.rs:4-68 exactly: given successive
snapshots of a growing text, emit only the new suffix — longest-common-prefix
diff — while suppressing U+FFFD replacement chars mid-stream (a partial
multibyte sequence at a chunk boundary must not leak) until the final flush.

Contract parity with the reference:
  * ``extract_delta`` on divergence returns ``current[lcp:]`` (only the
    suffix after the longest common prefix — streaming.rs:10-18), never the
    whole of ``current``.
  * ``DeltaTracker.advance`` truncates the delta at the FIRST replacement
    char anywhere in it (streaming.rs:52-58), emitting the clean prefix; a
    delta that STARTS with U+FFFD emits nothing and leaves state untouched.
  * On the final call (``is_final`` / ``finish``) the full delta passes
    through, including genuine replacement chars.
"""

from __future__ import annotations

REPLACEMENT = "�"


def extract_delta(previous: str, current: str) -> str:
    """The suffix of ``current`` after its longest common prefix with
    ``previous`` (streaming.rs:4-18).  If ``current`` extends ``previous``
    this is exactly the newly-appended text; on divergence it is everything
    from the first differing character on."""
    if current.startswith(previous):
        return current[len(previous):]
    n = min(len(previous), len(current))
    i = 0
    while i < n and previous[i] == current[i]:
        i += 1
    return current[i:]


class DeltaTracker:
    """Stateful tracker: feed snapshots, get printable deltas.

    Mirrors DeltaTracker::advance (streaming.rs:20-68):
    * ``advance(current)`` emits the new clean text, holding back anything
      from the first U+FFFD on (the next snapshot may complete the
      codepoint, replacing it with real text);
    * ``advance(current, is_final=True)`` / ``finish(current)`` flushes
      everything, including genuinely-malformed replacement chars.
    """

    __slots__ = ("_previous",)

    def __init__(self, initial: str = "") -> None:
        # ``initial`` lets a stateful streaming operator resume the tracker
        # from its stored per-key snapshot across micro-batches/restarts
        self._previous = initial

    @property
    def snapshot(self) -> str:
        """Full text recorded so far (streaming.rs snapshot())."""
        return self._previous

    def advance(self, current: str, is_final: bool = False) -> str:
        raw = extract_delta(self._previous, current)
        if not raw:
            self._previous = current
            return raw
        if not is_final:
            idx = raw.find(REPLACEMENT)
            if idx == 0:
                return ""  # delta is pure incomplete-codepoint; hold it all
            if idx > 0:
                raw = raw[:idx]
                self._previous += raw
                return raw
        self._previous = current
        return raw

    def finish(self, current: str) -> str:
        """Final flush: emit everything outstanding, including a real
        trailing U+FFFD if the input was genuinely malformed."""
        return self.advance(current, is_final=True)
