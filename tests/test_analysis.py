"""Clip-splicing datasets + dataset tools (reference
slowfast/datasets/dataset_utils.py)."""

import numpy as np
import pytest

from vtm.analysis.dataset_tools import pairwise_kl
from vtm.analysis.splicing import SplicedDataset


class FakeDataset:
    """Items: frames [T,2,2,3] filled with the item index."""

    def __init__(self, n=10, t=8, labels=None):
        self.n, self.t = n, t
        self._labels = labels if labels is not None else [i % 3 for i in range(n)]

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        frames = np.full((self.t, 2, 2, 3), float(i), dtype=np.float32)
        return {"frames": frames, "label": self._labels[i], "index": i}


def test_random_splice_tubelet_aligned():
    ds = SplicedDataset(FakeDataset(), "random", patch_depth=2, num_to_replace=2, seed=0)
    item = ds[3]
    per_frame = item["frames"][:, 0, 0, 0]
    donor_frames = np.where(per_frame != 3.0)[0]
    assert len(donor_frames) == 4  # 2 tubelets x 2 frames
    # tubelet-aligned: pairs (2g, 2g+1)
    assert set(donor_frames % 2) == {0, 1}
    for g in donor_frames[::2] // 2:
        assert {2 * g, 2 * g + 1} <= set(donor_frames.tolist())
    # reference quirk: last tubelet never replaced
    t = ds.base.t
    assert t - 1 not in donor_frames and t - 2 not in donor_frames


def test_last_group_never_replaced_many_draws():
    ds = SplicedDataset(FakeDataset(t=8), "random", patch_depth=2, num_to_replace=3, seed=1)
    for i in range(10):
        frames = ds[i]["frames"][:, 0, 0, 0]
        assert frames[6] == float(i) and frames[7] == float(i)


def test_same_class_donor():
    labels = [0, 1, 0, 1, 0, 1, 0, 1, 0, 1]
    ds = SplicedDataset(
        FakeDataset(labels=labels), "same_class", patch_depth=2, num_to_replace=1, seed=0
    )
    for i in range(6):
        frames = ds[i]["frames"][:, 0, 0, 0]
        donors = {int(v) for v in frames if v != float(i)}
        for d in donors:
            assert labels[d] == labels[i]


def test_kl_similarity_donor_is_argmin():
    labels = [0, 0, 0, 1, 1, 1]
    n = len(labels)
    rng = np.random.default_rng(0)
    kl = rng.random((n, n)).astype(np.float32)
    np.fill_diagonal(kl, np.inf)
    ds = SplicedDataset(
        FakeDataset(n=n, labels=labels),
        "kl_similarity",
        patch_depth=2,
        num_to_replace=1,
        match_type="verb",
        kl_divergences=(kl, kl),
        seed=0,
    )
    i = 1
    frames = ds[i]["frames"][:, 0, 0, 0]
    donors = {int(v) for v in frames if v != float(i)}
    same = [j for j in range(n) if labels[j] == labels[i]]
    row = kl[i].copy()
    mask = np.ones(n, bool)
    mask[same] = False
    row[mask] = np.inf
    assert donors == {int(np.argmin(row))}


def test_pairwise_kl_matches_torch():
    torch = pytest.importorskip("torch")
    from torch.distributions import Categorical, kl_divergence

    rng = np.random.default_rng(0)
    p = rng.random((5, 7)).astype(np.float64)
    p /= p.sum(axis=1, keepdims=True)
    ours = pairwise_kl(p)
    for i in range(5):
        for j in range(5):
            if i == j:
                assert np.isinf(ours[i, j])
                continue
            ref = kl_divergence(
                Categorical(probs=torch.tensor(p[i])),
                Categorical(probs=torch.tensor(p[j])),
            ).item()
            np.testing.assert_allclose(ours[i, j], ref, rtol=1e-6)


def test_create_mini_datasets_kinetics(tmp_path):
    from vtm.analysis.dataset_tools import create_mini_datasets
    from vtm.config import get_cfg

    data_dir = tmp_path / "k400"
    data_dir.mkdir()
    lines = [f"video_{i}.mp4 {i % 3}" for i in range(9)]
    (data_dir / "test.csv").write_text("\n".join(lines) + "\n")
    cfg = get_cfg()
    cfg.TEST.DATASET = "kinetics"
    cfg.DATA.PATH_TO_DATA_DIR = str(data_dir)
    create_mini_datasets(cfg)
    mini = (tmp_path / "Mini-k400" / "test.csv").read_text().strip().splitlines()
    assert len(mini) == 3  # one clip per class
    assert sorted(int(l.split()[1]) for l in mini) == [0, 1, 2]


def test_epic_splicing_labels_from_records():
    """Regression: SplicedDataset same_class/kl_similarity over a REAL
    Epickitchens instance — labels come from the _verb_labels /
    _noun_labels properties derived from the video records (reference
    epickitchens.py:83-91 builds the same lists), not a nonexistent
    _labels attribute."""
    import pandas as pd

    from vtm.analysis.splicing import SplicedDataset
    from vtm.data.epickitchens import Epickitchens, EpicKitchensVideoRecord

    rows = []
    for i, (verb, noun) in enumerate([(3, 7), (3, 9), (5, 7), (3, 7)]):
        rows.append((f"P01_101_{i}", pd.Series({
            "participant_id": "P01",
            "video_id": "P01_101",
            "start_timestamp": "00:00:01.00",
            "stop_timestamp": "00:00:03.00",
            "verb_class": verb,
            "noun_class": noun,
        })))
    ds = Epickitchens.__new__(Epickitchens)
    ds._video_records = [EpicKitchensVideoRecord(t) for t in rows]

    assert ds._verb_labels == [3, 3, 5, 3]
    assert ds._noun_labels == [7, 9, 7, 7]

    spliced = SplicedDataset(
        ds, "same_class", patch_depth=2, num_to_replace=1,
        match_type="verb", seed=0,
    )
    label = ds._video_records[0].label
    for _ in range(8):
        donor = spliced._donor_index(0, label)
        assert ds._verb_labels[donor] == 3

    spliced_n = SplicedDataset(
        ds, "same_class", patch_depth=2, num_to_replace=1,
        match_type="noun", seed=0,
    )
    for _ in range(8):
        donor = spliced_n._donor_index(0, label)
        assert ds._noun_labels[donor] == 7
