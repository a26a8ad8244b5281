"""Per-layer token-reduction schedules.

Mirrors the reference semantics of ``tome/utils.py:parse_r``
(reference: tome/utils.py:83-108): the schedule is *static* — it is
computed in Python at model-build time, so every transformer layer has
a fixed token count and XLA compiles one program with per-layer shapes.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple, Union

RSpec = Union[int, Tuple[int, float], Sequence[int]]


def parse_r(num_layers: int, r: RSpec) -> List[int]:
    """Expand an r specification into a per-layer list of length ``num_layers``.

    Accepted forms (identical to the reference):
      - ``int``: constant r per layer.
      - ``(r, inflect)``: linear ramp with mean r; ``inflect`` in [-1, 1]
        tilts the schedule downward (-1, "decreasing") or upward (+1).
      - list of ints: explicit per-layer r, zero-padded to ``num_layers``.
    """
    inflect = 0.0
    if isinstance(r, (list,)):
        if len(r) < num_layers:
            return list(r) + [0] * (num_layers - len(r))
        return list(r)
    if isinstance(r, tuple):
        r, inflect = r

    min_val = int(r * (1.0 - inflect))
    max_val = 2 * r - min_val
    step = (max_val - min_val) / (num_layers - 1)
    return [int(min_val + step * i) for i in range(num_layers)]


def token_counts(n0: int, rs: Sequence[int], protected: int = 0) -> List[int]:
    """Token count *entering* each layer given initial count ``n0`` and the
    per-layer r schedule, applying the reference's 50% clamp
    (reference: tome/merge.py:43-44). Returns ``num_layers + 1`` entries,
    the last being the final token count."""
    counts = [n0]
    n = n0
    for r in rs:
        r_eff = max(0, min(int(r), (n - protected) // 2))
        n = n - r_eff
        counts.append(n)
    return counts


def effective_r(n: int, r: int, protected: int = 0) -> int:
    """The clamped r actually applied at a layer with ``n`` tokens."""
    return max(0, min(int(r), (n - protected) // 2))
