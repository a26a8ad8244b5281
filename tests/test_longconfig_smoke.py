"""Long-config smoke tests (VERDICT-r4 missing item 3): the experiment
grid's largest sequence regimes must actually compile and run through
the layer stack. Shapes are taken from the REAL generated configs —
TimeSformer 96x4 Kinetics (t=96 temporal attention, 18,817-token
sequence, reference configs/timesformer/kinetics/
TimeSformer_divST_96x4_224.yaml) and the 64-frame SSv2 config
(12,545 tokens) — with tiny widths (embed 32 / depth 2) so the smokes
run on the CPU mesh; every static token-shape derivation (pos/time
embeds, per-frame fold/unfold, CLS bias, merge schedule) sees the
production counts.
"""

from __future__ import annotations

import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtm.config import get_cfg
from vtm.merge.policy import MergePolicy
from vtm.models.timesformer import TimeSformer, TimeSformerConfig

REPO = pathlib.Path(__file__).resolve().parents[1]


def _shapes_from_yaml(rel):
    cfg = get_cfg()
    cfg.merge_from_file(str(REPO / "configs" / rel), allow_new=True)
    assert cfg.MODEL.MODEL_NAME == "TimeSformer"
    return (
        cfg.DATA.NUM_FRAMES,
        cfg.DATA.TEST_CROP_SIZE,
        cfg.MODEL.NUM_CLASSES,
        cfg.TIMESFORMER.ATTENTION_TYPE,
    )


@pytest.mark.parametrize(
    "rel, r",
    [
        ("timesformer/kinetics/TimeSformer_divST_96x4_224.yaml", 0),
        ("timesformer/kinetics/TimeSformer_divST_96x4_224.yaml", 18),
        ("timesformer/ssv2/TimeSformer_divST_64_224.yaml", 0),
        ("timesformer/ssv2/TimeSformer_divST_64_224.yaml", 18),
    ],
)
def test_long_timesformer_forward(rel, r):
    frames, crop, ncls, attn_type = _shapes_from_yaml(rel)
    config = TimeSformerConfig(
        img_size=crop,
        num_classes=ncls,
        num_frames=frames,
        attention_type=attn_type,
        embed_dim=32,
        num_heads=2,
        depth=2,
    )
    tokens = config.spatial_tokens * frames + 1
    assert tokens in (18817, 12545)  # the grid's largest sequence regimes
    policy = (
        MergePolicy(rs=(r,) * config.depth, mode="merge", prop_attn=False)
        if r
        else MergePolicy(rs=(0,) * config.depth, mode="none")
    )
    model = TimeSformer(config=config, policy=policy)
    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.standard_normal((2, frames, crop, crop, 3)), jnp.float32
    )
    params = model.init(jax.random.key(0), video[:1])["params"]
    logits, _ = jax.jit(
        lambda p, v: model.apply({"params": p}, v)
    )(params, video)
    assert logits.shape == (2, ncls)
    assert bool(jnp.isfinite(logits).all())
