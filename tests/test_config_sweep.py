"""Every config key the reference defines must exist in vtm's tree —
a reference yaml overriding ANY of its 441 defaults must merge
(SURVEY §5 "same key names"; VERDICT-r3 weak item 6).
"""

from __future__ import annotations

import re

REF_CONFIG_FILES = (
    "/root/reference/slowfast/config/defaults.py",
    "/root/reference/slowfast/config/custom_config.py",
)


def _reference_keys():
    keys = set()
    for path in REF_CONFIG_FILES:
        try:
            text = open(path).read()
        except OSError:
            return None
        for line in text.splitlines():
            m = re.match(r"\s*_C\.([A-Za-z0-9_.]+)\s*=", line)
            if m:
                keys.add(m.group(1))
    return sorted(keys)


def test_every_reference_key_exists():
    import pytest

    keys = _reference_keys()
    if keys is None:
        pytest.skip("reference repo not available")
    assert len(keys) > 400  # the sweep actually saw the reference tree

    from vtm.config import get_cfg

    cfg = get_cfg()
    missing = []
    for k in keys:
        node = cfg
        for part in k.split("."):
            if hasattr(node, "keys") and part in node:
                node = node[part]
            else:
                missing.append(k)
                break
    assert not missing, f"reference config keys missing from vtm: {missing}"


def test_reference_style_yaml_merges(tmp_path):
    """A yaml touching keys from the formerly-missing tail (DEMO
    detectron2/slowmo, TENSORBOARD histogram, MODEL pathway lists)
    merges cleanly."""
    yaml = tmp_path / "ref.yaml"
    yaml.write_text(
        """
DEMO:
  SLOWMO: 2
  UNCOMMON_CLASS_THRES: 0.25
  DETECTRON2_THRESH: 0.8
  DISPLAY_WIDTH: 640
TENSORBOARD:
  HISTOGRAM:
    ENABLE: True
    TOPK: 5
MODEL:
  FP16_ALLREDUCE: True
DATA:
  IN22K_TRAINVAL: True
  TIME_DIFF_PROB: 0.5
  SSL_COLOR_JITTER: True
SOLVER:
  LARS_ON: True
  ZERO_WD_1D_PARAM: True
TRAIN:
  CHECKPOINT_INFLATE: True
  CHECKPOINT_CLEAR_NAME_PATTERN: ["backbone."]
"""
    )
    from vtm.config import get_cfg

    cfg = get_cfg()
    cfg.merge_from_file(str(yaml))
    assert cfg.DEMO.SLOWMO == 2
    assert cfg.TENSORBOARD.HISTOGRAM.TOPK == 5
    assert tuple(cfg.TRAIN.CHECKPOINT_CLEAR_NAME_PATTERN) == ("backbone.",)


def test_dual_threshold_visualizer():
    """DEMO.COMMON_CLASS_NAMES / UNCOMMON_CLASS_THRES: common classes
    need the high threshold, others pass at the lower one."""
    import numpy as np

    from vtm.vis.video_visualizer import VideoVisualizer

    vis = VideoVisualizer(
        num_classes=3,
        class_names=["walk", "rare_a", "rare_b"],
        mode="thres",
        thres=0.7,
        lower_thres=0.3,
        common_class_names=["walk"],
    )
    labels = vis._labels_for(np.array([0.5, 0.5, 0.2]))
    text = " ".join(labels)
    assert "rare_a" in text  # 0.5 >= lower 0.3
    assert "walk" not in text  # 0.5 < common 0.7
    assert "rare_b" not in text  # 0.2 < lower
