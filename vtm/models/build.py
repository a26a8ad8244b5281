"""Model registry + builder (reference: slowfast/models/build.py:16-84).

``build_model(cfg, policy)`` returns a ``ModelBundle``: the flax module,
its initialised (or converted) params, and a jitted apply function.
There is no DDP wrap — data parallelism is a sharding of the batch over
the device mesh (vtm/parallel), applied by the drivers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from vtm.merge.policy import MergePolicy

MODEL_REGISTRY: Dict[str, Callable] = {}


def register_model(name: str):
    def deco(fn):
        MODEL_REGISTRY[name] = fn
        return fn

    return deco


@dataclasses.dataclass
class ModelBundle:
    """A built model: module + params + metadata."""

    module: Any
    params: Any
    config: Any
    policy: MergePolicy
    name: str
    # BN models (SlowFast/ResNet/X3D) carry running statistics alongside
    # the params (flax "batch_stats" collection); None for the
    # transformer families.
    batch_stats: Any = None

    @property
    def variables(self) -> Dict[str, Any]:
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v

    def apply(self, x, rng: Optional[jax.Array] = None, trace_source: bool = False):
        """Forward pass. x: [B, T, H, W, C] channels-last.
        ``trace_source=True`` enables source tracking for this call even
        if the policy was built without it (notebook flow)."""
        module = self.module
        if trace_source and not self.policy.trace_source:
            import dataclasses

            module = module.clone(
                policy=dataclasses.replace(self.policy, trace_source=True)
            )
        out, state = module.apply(self.variables, x, rng=rng)
        return out, state

    @property
    def r(self):
        """Reference `model.r` surface (see vtm.patch): the per-layer
        merge schedule; assign int | (r, schedule) | [r0, r1, ...]."""
        return self.policy.rs

    @r.setter
    def r(self, value):
        import dataclasses

        from vtm.merge.schedule import parse_r

        # duplicated layers extend the executed depth (reference parses
        # r against the grown block list, tome/patch/*.py parse_r call)
        schedule = getattr(self.module, "layer_schedule", None)
        depth = (
            len(schedule)
            if schedule
            else getattr(self.config, "depth", None)
            or getattr(self.config, "num_hidden_layers")
        )
        rs = tuple(parse_r(depth, value))
        policy = dataclasses.replace(self.policy, rs=rs)
        if policy.mode == "none":
            policy = dataclasses.replace(policy, mode="merge")
        self.policy = policy
        self.module = self.module.clone(policy=policy)

    def init_params(self, rng: jax.Array, sample: jax.Array, bboxes=None,
                    mask=None):
        # the merge rng is only consumed by random merge/drop modes
        if mask is not None:  # masked pretraining models
            variables = self.module.init(rng, sample, mask, rng=rng)
        elif bboxes is not None:  # detection models: init the ROI head too
            variables = self.module.init(rng, sample, rng=rng, bboxes=bboxes)
        else:
            variables = self.module.init(rng, sample, rng=rng)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats")
        return self.params


def compute_dtype(cfg) -> jnp.dtype:
    return {
        "bfloat16": jnp.bfloat16,
        "float32": jnp.float32,
        "float16": jnp.float16,
    }[cfg.TPU.COMPUTE_DTYPE]


def duplication_plan(cfg, depth: int):
    """Layer-duplication execution schedule, or None when disabled.

    Reference semantics (tools/test_net.py:273-281 +
    tome/patch/*.apply_duplicate_patch): layer L is executed
    LAYER_QUANTITY times. For ViViT/VideoMAE the first Q-1 executions
    are truncated metric+reduction-only passes (ToMeDuplicate* blocks,
    vivit.py:50-66 / videomae.py:33-44); TimeSformer/Motionformer
    re-run the full shared-weight block each time
    (timesformer.py:170-172). Returns [(layer_idx, metric_only), ...].
    """
    if not cfg.TOME.ENABLE or cfg.TOME.LAYER_QUANTITY <= 1:
        return None
    L, q = cfg.TOME.LAYER_TO_DUPLICATE, cfg.TOME.LAYER_QUANTITY
    plan = [(i, False) for i in range(L)]
    plan += [(L, True)] * (q - 1) + [(L, False)]
    plan += [(i, False) for i in range(L + 1, depth)]
    return tuple(plan)


def make_policy(cfg, depth: int, n_protected_class_token: bool) -> MergePolicy:
    """Build the MergePolicy from TOME.* config keys, replicating the
    driver-side patching logic (tools/test_net.py:259-283)."""
    from vtm.merge.schedule import parse_r

    if not cfg.TOME.ENABLE:
        return MergePolicy(rs=(0,) * depth, mode="none")
    if cfg.TOME.LAYER_QUANTITY > 1:
        # duplication r-schedule [0]*L + [R]*Q + [0]*(depth-1-L)
        # (reference test_net.py:274,280 — hardcoded depth 12 there)
        L, q = cfg.TOME.LAYER_TO_DUPLICATE, cfg.TOME.LAYER_QUANTITY
        rs = tuple([0] * L + [cfg.TOME.R_VALUE] * q + [0] * (depth - 1 - L))
    else:
        r = (
            (cfg.TOME.R_VALUE, cfg.TOME.SCHEDULE)
            if cfg.TOME.SCHEDULE
            else cfg.TOME.R_VALUE
        )
        rs = tuple(parse_r(depth, r))
    return MergePolicy(
        rs=rs,
        mode=cfg.TOME.MODE,
        prop_attn=cfg.TOME.PROP_ATTN,
        head_aggregation=cfg.TOME.HEAD_AGGREGATION,
        threshold=cfg.TOME.THRESHOLD,
        trace_source=cfg.TOME.TRACE_SOURCE,
        class_token=n_protected_class_token,
    )


def build_model(cfg, rng: Optional[jax.Array] = None, init: bool = True) -> ModelBundle:
    name = cfg.MODEL.MODEL_NAME
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"Unknown MODEL.MODEL_NAME {name!r}; registered: {sorted(MODEL_REGISTRY)}"
        )
    bundle = MODEL_REGISTRY[name](cfg)
    if init and bundle.params is None:
        rng = rng if rng is not None else jax.random.key(cfg.RNG_SEED)
        t, s = cfg.DATA.NUM_FRAMES, cfg.DATA.TEST_CROP_SIZE
        sample = jnp.zeros((1, t, s, s, 3), dtype=jnp.float32)
        bboxes = (
            jnp.asarray([[0.0, 0.0, 0.0, float(s) - 1, float(s) - 1]])
            if cfg.DETECTION.ENABLE
            else None
        )
        mask = (
            jnp.zeros((1,) + tuple(cfg.AUG.MASK_WINDOW_SIZE), jnp.float32)
            if cfg.MASK.ENABLE
            else None
        )
        bundle.init_params(rng, sample, bboxes=bboxes, mask=mask)
    return bundle
