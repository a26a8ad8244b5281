"""parse_r parity vs the reference tome/utils.py oracle."""

import pytest

from vtm.merge import parse_r, token_counts, effective_r


@pytest.mark.parametrize(
    "spec",
    [
        0,
        16,
        150,
        (18, 0),
        (18, -1.0),
        (18, 1.0),
        (300, -0.5),
        (7, 0.25),
        [1, 2, 3],
        [5] * 12,
        [0] * 3 + [100] * 2,
    ],
)
@pytest.mark.parametrize("num_layers", [12, 24])
def test_parse_r_matches_reference(ref_utils, spec, num_layers):
    assert parse_r(num_layers, spec) == ref_utils.parse_r(num_layers, spec)


def test_token_counts_clamps_at_half():
    # 1568 tokens, r=784 max merging: 784 -> 392 -> ...
    counts = token_counts(1568, [784] * 12)
    assert counts[0] == 1568
    assert counts[1] == 784
    assert counts[2] == 392
    assert all(c >= 1 for c in counts)


def test_token_counts_protected():
    counts = token_counts(11, [100], protected=1)
    assert counts == [11, 6]
    assert effective_r(11, 100, protected=1) == 5
