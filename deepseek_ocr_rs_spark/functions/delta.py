"""Streaming delta extraction (W4/F4/X5 analogs).

Re-expresses crates/core/src/streaming.rs:4-68: given successive snapshots
of a growing text, emit only the new suffix — longest-common-prefix diff —
while suppressing a trailing U+FFFD replacement char until the final flush
(a partial multibyte sequence at a chunk boundary must not leak).
"""

from __future__ import annotations

from typing import Tuple

REPLACEMENT = "�"


def extract_delta(previous: str, current: str) -> str:
    """Longest-common-prefix diff: the new suffix of ``current``.

    If ``current`` no longer starts with the common prefix the stream was
    reset — return all of ``current`` (streaming.rs:10-14 behavior).
    """
    n = min(len(previous), len(current))
    i = 0
    while i < n and previous[i] == current[i]:
        i += 1
    if i < len(previous):  # regression/rewrite -> treat as reset
        return current
    return current[i:]


class DeltaTracker:
    """Stateful tracker: feed snapshots, get printable deltas.

    Mirrors DeltaTracker::advance + flush_remaining (streaming.rs:20-68):
    * monotone guard: a snapshot shorter than what was emitted resets state
      (the X4 out-of-order/duplicate drop);
    * a trailing U+FFFD is held back until ``finish`` in case the next
      snapshot completes the codepoint.
    """

    __slots__ = ("_emitted",)

    def __init__(self) -> None:
        self._emitted = ""

    def advance(self, snapshot: str) -> str:
        delta = extract_delta(self._emitted, snapshot)
        if delta == snapshot and self._emitted and not snapshot.startswith(
            self._emitted
        ):
            self._emitted = ""  # reset
        hold = ""
        if delta.endswith(REPLACEMENT):
            delta, hold = delta[: -len(REPLACEMENT)], REPLACEMENT
        self._emitted += delta
        # the held replacement char is NOT recorded: if the next snapshot
        # completes the codepoint the clean text replaces it
        return delta

    def finish(self, snapshot: str) -> str:
        """Final flush: emit everything outstanding, including a real
        trailing U+FFFD if the input was genuinely malformed."""
        delta = extract_delta(self._emitted, snapshot)
        self._emitted = snapshot
        return delta
