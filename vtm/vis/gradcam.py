"""Grad-CAM for the vtm video transformers (reference:
slowfast/visualization/gradcam_utils.py GradCAM:12-188).

JAX-native: instead of forward/backward hooks, the target block's
output is perturbed with a zero tensor via
``flax.linen.intercept_methods``; ``jax.grad`` w.r.t. the perturbation
IS the gradient of the score w.r.t. that activation. When token
merging is active and ``trace_source`` is on, the per-merged-token CAM
is broadcast back to the original token grid through the source
adjacency before reshaping to (T', H', W').
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _apply_with_perturbation(module, variables, x, layer_path: str, eps):
    """Forward pass with ``eps`` added to the output of the submodule
    whose flax path joins to ``layer_path`` (e.g. 'blocks_5' or a conv
    stage 's5' whose output is a pathway list). Returns
    (logits, state, activation)."""
    captured = {}

    def interceptor(next_fun, args, kwargs, context):
        out = next_fun(*args, **kwargs)
        path = "/".join(context.module.path)
        if path == layer_path and context.method_name == "__call__":
            if isinstance(out, list):  # conv stage: perturb the slow path
                captured["act"] = out[0]
                return [out[0] + eps] + out[1:]
            if isinstance(out, tuple):
                captured["act"] = out[0]
                return (out[0] + eps, *out[1:])
            captured["act"] = out
            return out + eps
        return out

    with nn.intercept_methods(interceptor):
        logits, state = module.apply(variables, x)
    return logits, state, captured.get("act")


class GradCAM:
    """Localization maps for a ModelBundle.

    ``target_layer``: flax submodule path (default: the last block).
    """

    def __init__(self, bundle, target_layer: Optional[str] = None, colormap="viridis"):
        import dataclasses

        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        self.bundle = bundle
        self.module = bundle.module
        policy = getattr(bundle, "policy", None)
        if (
            policy is not None
            and policy.mode != "none"
            and any(policy.rs)
            and not policy.trace_source
        ):
            # merged maps must be unrolled through the source adjacency
            # to reshape to the original grid — force tracing for this
            # module regardless of TOME.TRACE_SOURCE (same clone
            # mechanism as ModelBundle.apply)
            self.module = bundle.module.clone(
                policy=dataclasses.replace(policy, trace_source=True)
            )
        depth = getattr(bundle.config, "depth", None) or getattr(
            bundle.config, "num_hidden_layers", 12
        )
        self.is_conv = bundle.name in ("SlowFast", "ResNet", "X3D")
        if self.is_conv:
            self.target_layer = target_layer or "s5"
        else:
            prefix = "layer" if bundle.name == "ViViT" else "blocks"
            self.target_layer = target_layer or f"{prefix}_{depth - 1}"
        self.colormap = plt.get_cmap(colormap)
        self.class_token = bundle.name in ("ViViT", "TimeSformer", "Motionformer")

    def localization_map(
        self, x: jnp.ndarray, labels: Optional[np.ndarray] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (maps [B, n_tokens_orig] in [0,1], preds [B, C])."""
        module = self.module
        variables = self.bundle.variables

        # activation shape without running the model (tracing only) —
        # the real forward happens ONCE, inside the grad below
        shapes = jax.eval_shape(
            lambda v, xx: _apply_with_perturbation(
                module, v, xx, self.target_layer, 0.0
            ),
            variables, x,
        )
        if shapes[2] is None:
            raise KeyError(
                f"target layer {self.target_layer!r} not found in "
                f"{self.bundle.name} (use the flax path, e.g. 'blocks_5')"
            )

        def score_fn(eps):
            logits, state, act = _apply_with_perturbation(
                module, variables, x, self.target_layer, eps
            )
            lg = logits[0] if isinstance(logits, tuple) else logits
            lab = (
                jnp.asarray(labels)
                if labels is not None
                else jnp.argmax(lg, axis=-1)  # int indices: no grad path
            )
            score = jnp.take_along_axis(lg, lab[:, None], axis=1).sum()
            return score, (lg, state, act)

        grads, (logits0, state0, act0) = jax.grad(score_fn, has_aux=True)(
            jnp.zeros(shapes[2].shape, shapes[2].dtype)
        )  # [B', N', D]
        preds = np.asarray(logits0)
        act = np.asarray(act0, np.float32)
        grads = np.asarray(grads, np.float32)

        if self.is_conv:
            # [B, T', H', W', C]: GAP weights over the spatio-temporal
            # grid (reference gradcam_utils.py for SlowFast)
            weights = grads.mean(axis=(1, 2, 3), keepdims=True)
            cam = np.maximum((weights * act).sum(axis=-1), 0.0)  # [B,T,H,W]
            flat = cam.reshape(cam.shape[0], -1)
            lo = flat.min(axis=1)[:, None, None, None]
            hi = flat.max(axis=1)[:, None, None, None]
            cam = (cam - lo) / np.maximum(hi - lo, 1e-8)
            return cam, preds

        weights = grads.mean(axis=1, keepdims=True)  # [B', 1, D]
        cam = np.maximum((weights * act).sum(axis=-1), 0.0)  # [B', N']

        if self.class_token:
            cam = cam[:, 1:]  # strip CLS from the flat sequence

        # broadcast merged-token maps back to the original grid
        if state0.source is not None:
            src = np.asarray(state0.source, np.float32)
            b = cam.shape[0]
            if src.shape[0] == b:
                # spatio-temporal merging (VideoMAE/ViViT):
                # src [B, n_t, n_0]; protected CLS stays at position 0
                # of BOTH axes for ViViT (eye init spans all tokens)
                if self.class_token:
                    src = src[:, :, 1:]
                if src.shape[1] == cam.shape[1] + 1:
                    src = src[:, 1:, :]
                cam = np.einsum("bn,bnm->bm", cam[:, : src.shape[1]], src)
            else:
                # per-frame merging (TimeSformer/Motionformer): merging
                # ran on the frame-folded CLS-less tokens, so src is
                # [(B*T), p_t, p_0] and the model's flat body order is
                # spatial-major ((p t) / (s f)) — fold, unroll, unfold
                t = src.shape[0] // b
                p_t, p0 = src.shape[1], src.shape[2]
                per = (
                    cam.reshape(b, p_t, t).transpose(0, 2, 1).reshape(b * t, p_t)
                )
                out = np.einsum("bn,bnm->bm", per, src)  # [(B*T), p_0]
                cam = (
                    out.reshape(b, t, p0).transpose(0, 2, 1).reshape(b, p0 * t)
                )

        lo = cam.min(axis=1, keepdims=True)
        hi = cam.max(axis=1, keepdims=True)
        cam = (cam - lo) / np.maximum(hi - lo, 1e-8)
        return cam, preds

    def overlay(
        self, frames: np.ndarray, cam_tokens: np.ndarray, alpha: float = 0.5
    ) -> np.ndarray:
        """frames [T, H, W, C] in [0,1] + per-token map -> heatmap
        overlay video [T, H, W, 3] uint8. Token grid inferred from the
        model's patch geometry."""
        t, h, w, _ = frames.shape
        c = self.bundle.config
        if self.is_conv:
            # cam_tokens is already a [T', H', W'] grid
            grid = np.asarray(cam_tokens)
            up = np.repeat(
                np.repeat(
                    np.repeat(grid, max(1, t // grid.shape[0]), axis=0)[:t],
                    max(1, h // grid.shape[1]), axis=1,
                )[:, :h],
                max(1, w // grid.shape[2]), axis=2,
            )[:, :, :w]
            # pad if the repeat under-shot (non-divisible grids)
            pt, ph, pw = t - up.shape[0], h - up.shape[1], w - up.shape[2]
            up = np.pad(up, [(0, pt), (0, ph), (0, pw)], mode="edge")
            heat = self.colormap(up)[..., :3]
            out = (1 - alpha) * frames + alpha * heat
            return np.uint8(np.clip(out, 0, 1) * 255)
        if self.bundle.name == "VideoMAE":
            gt, gs = t // c.tubelet_size, h // c.patch_size
        elif self.bundle.name == "ViViT":
            gt, gs = t // c.tubelet_size[0], h // c.tubelet_size[1]
        elif self.bundle.name == "Motionformer":
            gt, gs = c.temporal_resolution, h // c.patch_size
        else:  # TimeSformer: (p t) order handled below
            gt, gs = t, h // c.patch_size
        if self.bundle.name in ("TimeSformer", "Motionformer"):
            # spatial-major flat order ((p t) / (s f)) -> (t, h, w)
            grid = cam_tokens.reshape(gs * gs, gt).T.reshape(gt, gs, gs)
        else:
            grid = cam_tokens.reshape(gt, gs, gs)
        reps_t = t // gt
        up = np.repeat(
            np.repeat(np.repeat(grid, reps_t, axis=0), h // gs, axis=1),
            w // gs,
            axis=2,
        )
        heat = self.colormap(up)[..., :3]
        out = (1 - alpha) * frames + alpha * heat
        return np.uint8(np.clip(out, 0, 1) * 255)
