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


@pytest.mark.parametrize(
    "n0,protected,r",
    [
        (3137, 1, 1568),  # ViViT max merging (reference experiments.sh:30)
        (1568, 0, 784),   # VideoMAE max merging (reference experiments.sh:33)
        (197, 1, 98),     # TimeSformer per-frame max merging (:31)
        (3137, 1, 300), (1568, 0, 150), (197, 1, 18),
    ],
)
def test_static_schedule_matches_reference_dynamic_clamp(ref_utils, n0, protected, r):
    """The static per-layer schedule must land on exactly the token counts
    the reference produces dynamically: parse_r expansion + the per-call
    r = min(r, (n - protected) // 2) clamp (reference tome/merge.py:43-44)."""
    rs = ref_utils.parse_r(12, r)
    n = n0
    expected = [n0]
    for r_layer in rs:
        r_eff = min(r_layer, (n - protected) // 2)
        n -= max(0, r_eff)
        expected.append(n)
    assert list(token_counts(n0, parse_r(12, r), protected=protected)) == expected


def test_experiments_grid_matches_reference():
    """experiments.sh reproduces the reference grid 1:1 (modulo the
    reference's stray double-space / missing-semicolon typos and its one
    commented-out shebang-free header)."""
    import importlib.util
    import pathlib
    import re

    repo = pathlib.Path(__file__).resolve().parents[1]
    ref_path = pathlib.Path("/root/reference/experiments.sh")
    if not ref_path.exists():
        pytest.skip("reference experiments.sh not available")
    spec = importlib.util.spec_from_file_location(
        "gen_experiments", repo / "tools" / "gen_experiments.py"
    )
    ge = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ge)

    def norm(lines):
        out = []
        for ln in lines:
            ln = re.sub(r"\s+", " ", ln.strip()).rstrip(";")
            if ln.startswith("# ") or ln.startswith("#python"):
                out.append(ln)
        return out

    ref = norm(open(ref_path))
    ours = norm(ge.emit())
    assert ours == ref

    # and the checked-in experiments.sh is the generator's output
    checked_in = norm(open(repo / "experiments.sh"))
    assert checked_in == ref
