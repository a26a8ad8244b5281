"""Config system: yacs-equivalent merge semantics with reference yamls."""

import pathlib

REPO = pathlib.Path(__file__).resolve().parents[1]

import pytest

from vtm.config import get_cfg, assert_and_infer_cfg

REF_CONFIGS = pathlib.Path("/root/reference/configs")


def test_defaults_validate():
    cfg = get_cfg()
    assert_and_infer_cfg(cfg)


def test_merge_from_list_coercion():
    cfg = get_cfg()
    cfg.merge_from_list(
        ["TOME.ENABLE", "True", "TOME.R_VALUE", "150", "TOME.MODE", "hybrid",
         "TOME.THRESHOLD", "0.4", "TEST.NUM_TEMPORAL_CLIPS", "[1,3,5]",
         "DATA.MEAN", "[0.5,0.5,0.5]"]
    )
    assert cfg.TOME.ENABLE is True
    assert cfg.TOME.R_VALUE == 150
    assert cfg.TOME.MODE == "hybrid"
    assert cfg.TOME.THRESHOLD == 0.4
    assert cfg.TEST.NUM_TEMPORAL_CLIPS == [1, 3, 5]
    assert cfg.DATA.MEAN == [0.5, 0.5, 0.5]


def test_unknown_key_rejected():
    cfg = get_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["TOME.NOT_A_KEY", "1"])


@pytest.mark.parametrize(
    "relpath",
    [
        "videomae/kinetics/tome_VideoMAE_B_16_224_K400.yaml",
        "vivit/kinetics/tome_vivit_8x32_224.yaml",
        "timesformer/kinetics/TimeSformer_divST_8x32_224.yaml",
        "motionformer/kinetics/tome_motionformer_224_16x4.yaml",
    ],
)
def test_reference_yamls_load(relpath):
    path = REF_CONFIGS / relpath
    if not path.exists():
        pytest.skip(f"{relpath} not in reference checkout")
    cfg = get_cfg()
    cfg.merge_from_file(str(path), allow_new=True)
    assert cfg.MODEL.MODEL_NAME in (
            "VideoMAE", "ViViT", "TimeSformer", "Motionformer",
            "SlowFast", "ResNet", "X3D", "MViT",
        )
    assert_and_infer_cfg(cfg)


def test_clone_is_independent():
    cfg = get_cfg()
    c2 = cfg.clone()
    c2.TOME.R_VALUE = 99
    assert cfg.TOME.R_VALUE == 0


SHIPPED = sorted(
    p.relative_to(REPO / "configs").as_posix()
    for p in (REPO / "configs").rglob("*.yaml")
)


@pytest.mark.parametrize("rel", SHIPPED)
def test_shipped_configs_valid(rel):
    """Every shipped config must merge cleanly (no unknown keys) and
    pass validation."""
    cfg = get_cfg()
    cfg.merge_from_file(str(REPO / "configs" / rel))
    assert_and_infer_cfg(cfg)
    assert cfg.MODEL.MODEL_NAME in (
            "VideoMAE", "ViViT", "TimeSformer", "Motionformer",
            "SlowFast", "ResNet", "X3D", "MViT",
        )
