"""Drop-in migration surface for reference users: ``tome.patch.X`` →
``vtm.patch.X`` (reference tome/patch/__init__.py:1-11).

The reference monkey-patches module classes and then sets ``model.r``.
Here models are immutable flax modules, so "patching" rebuilds the
bundle's module with a new MergePolicy (same parameters — merging has
no weights), and ``bundle.r = ...`` re-resolves the static per-layer
schedule:

    bundle = build_model(cfg)
    vtm.patch.videomae(bundle, trace_source=True, prop_attn=False)
    bundle.r = 150                     # int | (r, schedule) | [r0, r1, ...]
    logits, state = bundle.apply(clip)
    source = state.source              # the reference's _tome_info['source']
"""

from __future__ import annotations

from typing import Optional

from vtm.merge.policy import MergePolicy



def _depth_of(bundle) -> int:
    return getattr(bundle.config, "depth", None) or getattr(
        bundle.config, "num_hidden_layers"
    )


def _apply(bundle, class_token: bool, prop_attn: bool, **kwargs) -> None:
    policy = MergePolicy(
        rs=(0,) * _depth_of(bundle),
        mode=kwargs.get("mode", "merge"),
        prop_attn=prop_attn,
        head_aggregation=kwargs.get("head_aggregation", "mean"),
        threshold=kwargs.get("threshold", 0.0),
        trace_source=kwargs.get("trace_source", False),
        class_token=class_token,
    )
    bundle.policy = policy
    bundle.module = bundle.module.clone(policy=policy)


def vivit(bundle, trace_source: bool = False, prop_attn: bool = True, **kw) -> None:
    """reference tome.patch.vivit (tome/patch/vivit.py:226-270)."""
    assert bundle.name == "ViViT", bundle.name
    _apply(bundle, class_token=True, prop_attn=prop_attn, trace_source=trace_source, **kw)


def videomae(bundle, trace_source: bool = False, prop_attn: bool = False, **kw) -> None:
    """reference tome.patch.videomae (prop_attn=False default,
    tome/patch/videomae.py:172-214)."""
    assert bundle.name == "VideoMAE", bundle.name
    _apply(bundle, class_token=False, prop_attn=prop_attn, trace_source=trace_source, **kw)


def timesformer(bundle, trace_source: bool = False, prop_attn: bool = True, **kw) -> None:
    """reference tome.patch.timesformer (tome/patch/timesformer.py:187-224)."""
    assert bundle.name == "TimeSformer", bundle.name
    _apply(bundle, class_token=False, prop_attn=prop_attn, trace_source=trace_source, **kw)


def motionformer(bundle, trace_source: bool = False, prop_attn: bool = True, **kw) -> None:
    """reference tome.patch.motionformer (tome/patch/motionformer.py:247-284)."""
    assert bundle.name == "Motionformer", bundle.name
    _apply(bundle, class_token=False, prop_attn=prop_attn, trace_source=trace_source, **kw)


def _duplicate(bundle, layer_to_duplicate: int, quantity: int) -> None:
    """reference tome.patch.duplicate_* (apply_duplicate_patch)."""
    depth = _depth_of(bundle)
    plan = [(i, False) for i in range(layer_to_duplicate)]
    plan += [(layer_to_duplicate, True)] * (quantity - 1) + [(layer_to_duplicate, False)]
    plan += [(i, False) for i in range(layer_to_duplicate + 1, depth)]
    if bundle.name in ("TimeSformer", "Motionformer"):
        schedule = tuple(i for i, _ in plan)  # full shared-weight repeats
    else:
        schedule = tuple(plan)
    bundle.module = bundle.module.clone(layer_schedule=schedule)


duplicate_vivit = _duplicate
duplicate_videomae = _duplicate
duplicate_timesformer = _duplicate
duplicate_motionformer = _duplicate
