"""Contrastive SSL — the reference's ContrastiveModel, TPU-native.

Functional parity targets:
  slowfast/models/contrastive.py (ContrastiveModel:32-805 — the
    'moco', 'byol', 'simclr', 'swav' and 'mem' branches; Normalize:926,
    Memory:941-1041, Memory1D:1044-1073;
    contrastive_parameter_surgery:1076-1110;
    contrastive_forward:1113-1166)
  slowfast/models/losses.py (ContrastiveLoss:15-25)

Design: the reference mutates module buffers in place (queue, ptr,
momentum-encoder weights, memory banks, knn bank). Here ALL mutable
pieces live in an explicit ``ContrastiveState`` pytree threaded
through the jitted train step — pure updates, replicable on a mesh.
Batch-shuffle BN is intentionally absent: under a single-controller
pjit mesh the BN statistics are global-batch (sync-BN), which is
exactly the condition under which the reference disables shuffling
(contrastive.py:92-100).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _fold(rng, i: int):
    """Per-forward dropout-rng stream: fresh per view/encoder (the
    torch reference draws fresh randomness for every forward; reusing
    one key would give every view an identical dropout mask)."""
    return None if rng is None else jax.random.fold_in(rng, i)


def l2_normalize(x, axis=-1, eps=0.0):
    """Reference Normalize (contrastive.py:926-938): x / ||x||_2."""
    norm = jnp.sqrt((x ** 2).sum(axis=axis, keepdims=True))
    return x / (norm + eps)


@dataclasses.dataclass(frozen=True)
class ContrastiveConfig:
    """Static knobs (cfg.CONTRASTIVE.* + geometry)."""

    type: str
    t: float
    dim: int
    length: int
    queue_len: int
    mmt: float
    momentum_annealing: bool
    max_epoch: float
    knn_on: bool
    mem_type: str
    interp_memory: bool
    moco_multi_view_queue: bool
    swav_qeue_len: int
    sequential: bool
    simclr_dist_on: bool
    num_classes_downstream: int
    swav_prototypes: int = 1000  # hardcoded in the reference (:104)
    swav_eps_sinkhorn: float = 0.05
    knn_k: int = 200


def contrastive_config_from_cfg(cfg) -> ContrastiveConfig:
    return ContrastiveConfig(
        type=cfg.CONTRASTIVE.TYPE,
        t=cfg.CONTRASTIVE.T,
        dim=cfg.CONTRASTIVE.DIM,
        length=cfg.CONTRASTIVE.LENGTH,
        queue_len=cfg.CONTRASTIVE.QUEUE_LEN,
        mmt=cfg.CONTRASTIVE.MOMENTUM,
        momentum_annealing=cfg.CONTRASTIVE.MOMENTUM_ANNEALING,
        max_epoch=float(cfg.SOLVER.MAX_EPOCH),
        knn_on=cfg.CONTRASTIVE.KNN_ON,
        mem_type=cfg.CONTRASTIVE.MEM_TYPE,
        interp_memory=cfg.CONTRASTIVE.INTERP_MEMORY,
        moco_multi_view_queue=cfg.CONTRASTIVE.MOCO_MULTI_VIEW_QUEUE,
        swav_qeue_len=cfg.CONTRASTIVE.SWAV_QEUE_LEN,
        sequential=cfg.CONTRASTIVE.SEQUENTIAL,
        simclr_dist_on=cfg.CONTRASTIVE.SIMCLR_DIST_ON,
        num_classes_downstream=cfg.CONTRASTIVE.NUM_CLASSES_DOWNSTREAM,
    )


def contrastive_loss(logits):
    """CE against the positive at column 0 (losses.py:15-25)."""
    logp = jax.nn.log_softmax(logits, axis=1)
    return -logp[:, 0].mean()


def momentum_anneal_cosine(cc: ContrastiveConfig, epoch_exact):
    """contrastive.py:253-262."""
    return 1.0 - (1.0 - cc.mmt) * (
        jnp.cos(jnp.pi * epoch_exact / cc.max_epoch) + 1.0
    ) * 0.5


def sinkhorn(Q, iters: int):
    """Single-process Sinkhorn-Knopp (contrastive.py:877-892).
    Q: [B, K] positive scores -> balanced assignment, rows sum to 1
    after the final column normalisation, returned as [B, K]."""
    Q = Q.T  # [K, B]
    Q = Q / Q.sum()
    r = 1.0 / Q.shape[0]
    c = 1.0 / Q.shape[1]
    for _ in range(iters):
        Q = Q * (r / Q.sum(axis=1))[:, None]
        Q = Q * (c / Q.sum(axis=0))[None, :]
    Q = Q / Q.sum(axis=0, keepdims=True)
    return Q.T


# --------------------------------------------------------------- memory


def memory_get(memory, ind):
    """Memory1D.get (contrastive.py:1057-1067): row gather.
    ind: [B] or [B, K] -> [B, dim] / [B, K, dim]."""
    return memory[ind]


def memory_update(memory, mem, momentum, ind):
    """Memory1D.update (contrastive.py:1069-1073): momentum blend +
    re-normalise, scattered back at ``ind``."""
    memory = jnp.asarray(memory)
    mem_old = memory[ind]
    upd = l2_normalize(mem_old * (1.0 - momentum) + mem * momentum)
    return memory.at[ind].set(upd)


# ----------------------------------------------------------------- model


class ContrastiveModel:
    """Functional ContrastiveModel. ``module`` is the backbone flax
    module (built with the SSL head: MODEL.NUM_CLASSES = projection
    dim, CONTRASTIVE.NUM_MLP_LAYERS / PREDICTOR_DEPTHS); params may
    contain a ``swav_prototypes`` sibling tree for the SwAV branch."""

    def __init__(self, module, cc: ContrastiveConfig,
                 has_batch_stats: bool = False):
        assert cc.type in ("moco", "byol", "simclr", "swav", "mem"), (
            f"CONTRASTIVE.TYPE {cc.type} (the reference's 'self' type "
            "builds nothing and its forward raises — same here)"
        )
        self.module = module
        self.cc = cc
        self.has_batch_stats = has_batch_stats

    # -- state ---------------------------------------------------------
    def init_state(self, backbone_params, batch_stats, rng) -> dict:
        cc = self.cc
        state: dict = {"iter": jnp.zeros((), jnp.int32)}
        stdv = 1.0 / np.sqrt(cc.dim / 3)
        if cc.type in ("moco", "byol"):
            state["hist_params"] = jax.tree.map(
                jnp.asarray, backbone_params
            )
            state["hist_batch_stats"] = (
                jax.tree.map(jnp.asarray, batch_stats)
                if batch_stats is not None
                else {}
            )
            state["ptr"] = jnp.zeros((), jnp.int32)
            state["queue_x"] = jax.random.uniform(
                rng, (cc.queue_len, cc.dim), jnp.float32, -stdv, stdv
            )
        if cc.type == "swav" and cc.swav_qeue_len > 0:
            state["queue_swav"] = jnp.zeros(
                (2, cc.swav_qeue_len, cc.dim), jnp.float32
            )
            state["swav_use_the_queue"] = jnp.zeros((), jnp.bool_)
        if cc.type == "mem":
            state["memory"] = jax.random.uniform(
                jax.random.fold_in(rng, 1),
                (cc.length, cc.dim), jnp.float32, -stdv, stdv,
            )
        if cc.knn_on:
            state["knn_mem"] = jax.random.uniform(
                jax.random.fold_in(rng, 2),
                (cc.length, cc.dim), jnp.float32, -stdv, stdv,
            )
        return state

    def init_swav_prototypes(self, rng):
        """nn.Linear(dim, 1000, bias=False) (contrastive.py:103-106)."""
        k = 1.0 / np.sqrt(self.cc.dim)
        return {
            "kernel": jax.random.uniform(
                rng, (self.cc.dim, self.cc.swav_prototypes),
                jnp.float32, -k, k,
            )
        }

    # -- backbone ------------------------------------------------------
    def backbone_forward(self, params, bn, clip, rng=None):
        """Train-mode forward. Returns (out, new_batch_stats); ``out``
        is the projection [B, dim] or [proj, *predictors]."""
        variables = {"params": params}
        rngs = {"dropout": rng if rng is not None else jax.random.key(0)}
        if self.has_batch_stats:
            assert bn, "batch_stats missing for a BN backbone"
            variables["batch_stats"] = bn
            (out, _), mutated = self.module.apply(
                variables, clip, train=True, mutable=["batch_stats"],
                rngs=rngs,
            )
            return out, mutated["batch_stats"]
        out, _ = self.module.apply(variables, clip, train=True, rngs=rngs)
        return out, bn

    def backbone_eval(self, params, bn, clip):
        """Eval-mode forward (no dropout; BN uses RUNNING stats) — the
        reference evaluates kNN under model.eval() (contrastive.py:
        'if not self.training: return self.eval_knn(q)'); extracting
        validation features in train mode would normalise with the val
        mini-batch and fire dropout."""
        variables = {"params": params}
        if self.has_batch_stats:
            assert bn, "batch_stats missing for a BN backbone"
            variables["batch_stats"] = bn
        out, _ = self.module.apply(variables, clip, train=False)
        return out

    def _update_history(self, params, state, mmt):
        """Momentum update of the key encoder (contrastive.py:161-176):
        copies on the first iteration, EMA afterwards."""
        first = state["iter"] == 0

        def ema(p, h):
            return jnp.where(first, p, p * (1.0 - mmt) + h * mmt)

        return jax.tree.map(ema, params, state["hist_params"])

    def compute_key_feat(self, params, state, clips_k, mmt, rng=None):
        """contrastive.py:310-372 (batch shuffling skipped — sync-BN
        condition; see module docstring). Same-shaped key clips are
        batched into ONE forward (reference batched_inference /
        batch_clips:295-308 — this also matters numerically: train-mode
        BN normalises with the combined batch). Returns (keys,
        new_hist, new_hist_bn)."""
        hist = self._update_history(params, state, mmt)
        hist_bn = state.get("hist_batch_stats") or {}
        hist_sg = jax.lax.stop_gradient(hist)
        n_clips = len(clips_k)
        same_shapes = all(
            p.shape == p0.shape
            for clip in clips_k
            for p, p0 in zip(clip, clips_k[0])
        )
        if n_clips > 1 and same_shapes:
            bsz = clips_k[0][0].shape[0]
            batched = [
                jnp.concatenate([c[j] for c in clips_k], axis=0)
                for j in range(len(clips_k[0]))
            ]
            feat, hist_bn = self.backbone_forward(
                hist_sg, hist_bn, batched, _fold(rng, 100)
            )
            if isinstance(feat, (list, tuple)):
                feat = feat[0]
            key = jax.lax.stop_gradient(l2_normalize(feat))
            keys = [key[i * bsz : (i + 1) * bsz] for i in range(n_clips)]
            return keys, hist, hist_bn
        keys = []
        for i, clip_k in enumerate(clips_k):
            feat, hist_bn = self.backbone_forward(
                hist_sg, hist_bn, clip_k, _fold(rng, 100 + i)
            )
            if isinstance(feat, (list, tuple)):
                feat = feat[0]
            keys.append(jax.lax.stop_gradient(l2_normalize(feat)))
        return keys, hist, hist_bn

    def knn_mem_update(self, state, q_knn, index):
        if self.cc.knn_on and "knn_mem" in state:
            state = dict(state)
            state["knn_mem"] = memory_update(
                state["knn_mem"], jax.lax.stop_gradient(q_knn), 1.0, index
            )
        return state

    def eval_knn(self, state, q_knn, knn_k: Optional[int] = None):
        """contrastive.py:233-241: cosine scores against the bank."""
        k = knn_k if knn_k is not None else min(self.cc.knn_k, self.cc.length)
        dist = jnp.einsum("nc,mc->nm", q_knn, state["knn_mem"])
        return jax.lax.top_k(dist, k)

    def sim_loss(self, q, k):
        """contrastive.py:243-250."""
        return -(jnp.einsum("nc,nc->n", q, k) / self.cc.t).mean()

    def dequeue_and_enqueue(self, state, keys):
        """contrastive.py:264-293. Requires queue_len % batch == 0 (the
        reference asserts the same)."""
        cc = self.cc
        keys = keys if cc.moco_multi_view_queue else keys[:1]
        queue, ptr = state["queue_x"], state["ptr"]
        for key in keys:
            bsz = key.shape[0]
            assert cc.queue_len % bsz == 0, (cc.queue_len, bsz)
            queue = jax.lax.dynamic_update_slice(
                queue, jax.lax.stop_gradient(key),
                (ptr, jnp.zeros((), jnp.int32)),
            )
            ptr = (ptr + bsz) % cc.queue_len
        state = dict(state)
        state["queue_x"], state["ptr"] = queue, ptr
        return state

    # -- branches ------------------------------------------------------
    def forward_train(self, params, bn, state, clips, index,
                      epoch_exact=0.0, rng=None, keys=None,
                      proto_params=None):
        """One training forward. ``clips``: list of clips, each a LIST
        of pathway arrays ([slow, fast] for two-pathway backbones). A
        bare array is treated as one single-pathway clip, and a flat
        list of arrays as ONE clip's pathways (not several clips —
        the two readings are inherently ambiguous for SlowFast, so the
        pathway reading wins; pass [[a], [b]] for two clips). Returns
        (logits, loss, aux) with aux = dict(new_bn=..., new_state=...).
        Gradients flow through ``loss`` into params/proto_params only.
        """
        cc = self.cc
        mmt = (
            momentum_anneal_cosine(cc, epoch_exact)
            if cc.momentum_annealing
            else cc.mmt
        )
        if not isinstance(clips, (list, tuple)):
            clips = [[clips]]  # bare array: one single-pathway clip
        elif not isinstance(clips[0], (list, tuple)):
            clips = [clips]  # flat list: one clip's pathways

        if cc.type == "moco":
            return self._moco(params, bn, state, clips, index, mmt, rng,
                              keys)
        if cc.type == "byol":
            return self._byol(params, bn, state, clips, index, mmt, rng,
                              keys)
        if cc.type == "simclr":
            return self._simclr(params, bn, state, clips, index, rng)
        if cc.type == "swav":
            return self._swav(params, bn, state, clips, index,
                              epoch_exact, rng, proto_params)
        if cc.type == "mem":
            return self._mem(params, bn, state, clips, index, mmt, rng)
        raise NotImplementedError(cc.type)

    def _moco(self, params, bn, state, clips, index, mmt, rng, keys):
        """contrastive.py:442-506."""
        cc = self.cc
        clip_q, clips_k = clips[0], clips[1:]
        auto_enqueue = keys is None
        if keys is None:
            keys, hist, hist_bn = self.compute_key_feat(
                params, state, clips_k, mmt, rng
            )
        else:
            hist, hist_bn = state["hist_params"], state.get(
                "hist_batch_stats"
            )
        feat_q, new_bn = self.backbone_forward(params, bn, clip_q, _fold(rng, 0))
        if isinstance(feat_q, (list, tuple)):
            feat_q = feat_q[0]
        q = l2_normalize(feat_q)

        queue_neg = jnp.einsum(
            "nc,kc->nk", q, jax.lax.stop_gradient(state["queue_x"])
        )
        lgts = []
        for key in keys:
            pos = jnp.einsum("nc,nc->n", q, key)[:, None]
            lgts.append(jnp.concatenate([pos, queue_neg], axis=1))
        logits = jnp.concatenate(lgts, axis=0) / cc.t
        loss = contrastive_loss(logits)

        new_state = dict(state)
        new_state["hist_params"] = hist
        if hist_bn is not None:
            new_state["hist_batch_stats"] = hist_bn
        if auto_enqueue:
            # iter counts MOMENTUM updates (reference increments it only
            # inside compute_key_feat:316-317, paired with
            # _update_history) — the external-keys path skips both, so
            # the next internally-keyed step still copies-on-first
            new_state["iter"] = state["iter"] + 1
            new_state = self.dequeue_and_enqueue(new_state, keys)
        new_state = self.knn_mem_update(new_state, q, index)
        return logits, loss, dict(new_bn=new_bn, new_state=new_state)

    def _byol(self, params, bn, state, clips, index, mmt, rng, keys):
        """contrastive.py:508-598 (symmetric, non-sequential path)."""
        cc = self.cc
        auto_keys = keys is None
        if keys is None:
            keys, hist, hist_bn = self.compute_key_feat(
                params, state, clips, mmt, rng
            )
        else:
            hist, hist_bn = state["hist_params"], state.get(
                "hist_batch_stats"
            )
        out_q, new_bn = self.backbone_forward(params, bn, clips[0], _fold(rng, 0))
        assert isinstance(out_q, (list, tuple)) and len(out_q) == 2, (
            "BYOL needs a predictor head (CONTRASTIVE.PREDICTOR_DEPTHS)"
        )
        feat_q, pred_q = out_q
        q = l2_normalize(feat_q)
        predictor1 = l2_normalize(pred_q)

        if len(clips) == 1:
            loss = self.sim_loss(predictor1, keys[0])
        else:
            assert len(clips) == 2
            loss_q1 = self.sim_loss(predictor1, keys[1])
            out_q2, new_bn = self.backbone_forward(
                params, new_bn, clips[1], _fold(rng, 1)
            )
            predictor2 = l2_normalize(out_q2[1])
            loss = loss_q1 + self.sim_loss(predictor2, keys[0])

        dummy = jnp.concatenate(
            [
                9999.0 * jnp.ones((q.shape[0], 1), jnp.float32),
                jnp.zeros((q.shape[0], cc.queue_len), jnp.float32),
            ],
            axis=1,
        )
        new_state = dict(state)
        new_state["hist_params"] = hist
        if hist_bn is not None:
            new_state["hist_batch_stats"] = hist_bn
        if auto_keys:  # iter counts momentum updates (see _moco)
            new_state["iter"] = state["iter"] + 1
        new_state = self.knn_mem_update(new_state, q, index)
        return dummy, loss, dict(new_bn=new_bn, new_state=new_state)

    def _simclr(self, params, bn, state, clips, index, rng):
        """contrastive.py:737-803 (single-process sim-matrix path; the
        diagonal is removed by subtracting it from the row sum instead
        of masked_select — identical denominator)."""
        cc = self.cc
        feat1, new_bn = self.backbone_forward(params, bn, clips[0], _fold(rng, 0))
        if isinstance(feat1, (list, tuple)):
            feat1 = feat1[0]
        q = l2_normalize(feat1)
        feat2, new_bn = self.backbone_forward(params, new_bn, clips[1], _fold(rng, 1))
        if isinstance(feat2, (list, tuple)):
            feat2 = feat2[0]
        q2 = l2_normalize(feat2)

        out = jnp.concatenate([q, q2], axis=0)
        sim = jnp.exp(out @ out.T / cc.t)
        denom = sim.sum(axis=1) - jnp.diagonal(sim)
        pos = jnp.exp(jnp.sum(q * q2, axis=-1) / cc.t)
        pos = jnp.concatenate([pos, pos], axis=0)
        loss = (-jnp.log(pos / denom)).mean()

        dummy = jnp.concatenate(
            [
                9999.0 * jnp.ones((q.shape[0], 1), jnp.float32),
                jnp.zeros((q.shape[0], cc.queue_len), jnp.float32),
            ],
            axis=1,
        )
        new_state = dict(state)
        new_state["iter"] = state["iter"] + 1
        new_state = self.knn_mem_update(new_state, q, index)
        return dummy, loss, dict(new_bn=new_bn, new_state=new_state)

    def _swav(self, params, bn, state, clips, index, epoch_exact, rng,
              proto_params):
        """contrastive.py:600-680 (the swav_use_public_code branch).
        ``proto_params`` must already be row-normalised by
        ``normalize_swav_prototypes`` (the reference normalises the
        stored weight in place under no_grad before the forward)."""
        cc = self.cc
        assert proto_params is not None
        n_clips = len(clips)
        bs = clips[0][0].shape[0]

        embedding, output = [], []
        new_bn = bn
        for ci, clip in enumerate(clips):
            feat, new_bn = self.backbone_forward(
                params, new_bn, clip, _fold(rng, ci)
            )
            if isinstance(feat, (list, tuple)):
                feat = feat[0]
            proj = l2_normalize(feat)
            embedding.append(proj)
            output.append(proj @ proto_params["kernel"])
        q_knn = embedding[0]
        embedding = jnp.concatenate(embedding, axis=0)
        output = jnp.concatenate(output, axis=0)

        queue = state.get("queue_swav")
        use_flag = state.get("swav_use_the_queue")
        new_queue = queue
        loss_swav = 0.0
        crops_for_assign = range(2)  # n_clips - (n_clips - 2)
        for i in crops_for_assign:
            out = jax.lax.stop_gradient(
                output[bs * i : bs * (i + 1)]
            )
            if queue is not None:
                # queue participates once warmed up (epoch >= 15) —
                # both branches produce the last-bs assignment slice
                nonzero = jnp.any(new_queue[i, -1, :] != 0)
                active = jnp.logical_and(
                    epoch_exact >= 15.0, jnp.logical_or(use_flag, nonzero)
                )
                use_flag = jnp.logical_or(use_flag, active)

                def with_queue(out=out, i=i):
                    qs = new_queue[i] @ proto_params["kernel"]
                    full = jnp.concatenate([qs, out], axis=0)
                    Q = jnp.exp(full / cc.swav_eps_sinkhorn)
                    return sinkhorn(Q, 3)[-bs:]

                def without_queue(out=out):
                    Q = jnp.exp(out / cc.swav_eps_sinkhorn)
                    return sinkhorn(Q, 3)[-bs:]

                q_assign = jax.lax.cond(
                    active, with_queue, without_queue
                )
                # roll + refill happens whenever epoch >= 15 (:645-651)
                rolled = jnp.concatenate(
                    [embedding[i * bs : (i + 1) * bs], new_queue[i, :-bs]],
                    axis=0,
                )
                new_queue = new_queue.at[i].set(
                    jnp.where(epoch_exact >= 15.0, rolled, new_queue[i])
                )
            else:
                Q = jnp.exp(out / cc.swav_eps_sinkhorn)
                q_assign = sinkhorn(Q, 3)[-bs:]
            q_assign = jax.lax.stop_gradient(q_assign)
            subloss = 0.0
            for v in range(n_clips):
                if v == i:
                    continue
                p = jax.nn.softmax(output[bs * v : bs * (v + 1)] / cc.t,
                                   axis=1)
                subloss -= jnp.mean(jnp.sum(q_assign * jnp.log(p), axis=1))
            loss_swav += subloss / (n_clips - 1)
        loss_swav = loss_swav / len(list(crops_for_assign))

        dummy = jnp.concatenate(
            [
                9999.0 * jnp.ones((bs, 1), jnp.float32),
                jnp.zeros((bs, cc.queue_len), jnp.float32),
            ],
            axis=1,
        )
        new_state = dict(state)
        new_state["iter"] = state["iter"] + 1
        if queue is not None:
            new_state["queue_swav"] = new_queue
            new_state["swav_use_the_queue"] = use_flag
        new_state = self.knn_mem_update(new_state, q_knn, index)
        return dummy, loss_swav, dict(new_bn=new_bn, new_state=new_state)

    def _mem(self, params, bn, state, clips, index, mmt, rng):
        """contrastive.py:379-441 (video memory bank; duration is
        hardcoded 1 in the reference, so the 1d/2d banks coincide and
        the interpolated-time path never fires — one [length, dim]
        bank serves both MEM_TYPE values)."""
        cc = self.cc
        clip = clips[0]
        feat, new_bn = self.backbone_forward(params, bn, clip, _fold(rng, 0))
        if isinstance(feat, (list, tuple)):
            feat = feat[0]
        q = l2_normalize(feat)
        bsz = q.shape[0]

        neg_key = rng if rng is not None else jax.random.key(0)
        clip_ind = jax.random.randint(
            jax.random.fold_in(neg_key, 17), (bsz, cc.queue_len + 1), 0,
            cc.length,
        )
        clip_ind = clip_ind.at[:, 0].set(index)
        k = memory_get(state["memory"], clip_ind)  # [B, K+1, dim]
        prod = jnp.einsum("nc,nkc->nk", q, jax.lax.stop_gradient(k))
        prod = prod / cc.t
        loss = contrastive_loss(prod)

        new_state = dict(state)
        new_state["memory"] = memory_update(
            state["memory"], jax.lax.stop_gradient(q), mmt, index
        )
        new_state["iter"] = state["iter"] + 1
        new_state = self.knn_mem_update(new_state, q, index)
        return prod, loss, dict(new_bn=new_bn, new_state=new_state)


def knn_predict(model: "ContrastiveModel", state, q_knn, train_labels,
                num_classes: int):
    """kNN-vote class scores from the feature bank (the reference's SSL
    eval path, tools/train_net.py:437-460): neighbours weighted by
    exp(score / T), one-hot votes summed."""
    yd, yi = model.eval_knn(state, q_knn)
    weights = jnp.exp(yd / model.cc.t)  # [B, K]
    retrieval = jnp.asarray(train_labels)[yi]  # [B, K]
    onehot = jax.nn.one_hot(retrieval, num_classes)
    return (onehot * weights[..., None]).sum(axis=1)


def normalize_swav_prototypes(proto_params):
    """Row-normalise the prototype vectors in place of the reference's
    no-grad weight copy (contrastive.py:617-621). kernel: [dim, K],
    each prototype (column) L2-normalised over dim."""
    return {"kernel": l2_normalize(proto_params["kernel"], axis=0)}


def swav_protos_grad_gate(proto_grads, epoch_exact):
    """Freeze prototypes during the first epoch
    (contrastive_parameter_surgery, contrastive.py:1076-1090)."""
    return jax.tree.map(
        lambda g: jnp.where(epoch_exact <= 1.0, jnp.zeros_like(g), g),
        proto_grads,
    )


def moco_iters_noupdate(cc: ContrastiveConfig, global_batch: int) -> int:
    """contrastive.py:1092-1102: number of initial iterations that only
    fill the queue without optimizer updates."""
    assert cc.queue_len % global_batch == 0
    return cc.queue_len // global_batch


# ---------------------------------------------------------------- build

_ARCH_TO_MODEL = {
    # reference contrastive.py:20-28 _MODEL_TYPES
    "slowfast": "SlowFast",
    "slow": "ResNet",
    "c2d": "ResNet",
    "i3d": "ResNet",
    "slow_c2d": "ResNet",
    "x3d": "X3D",
    "mvit": "MViT",
}


def build_contrastive_model(cfg, rng=None, init: bool = True):
    """-> (ContrastiveModel, backbone ModelBundle). The backbone is the
    ARCH-selected family with the SSL head (projection dim =
    MODEL.NUM_CLASSES, MLP depth/predictors from CONTRASTIVE.*)."""
    from vtm.models.build import build_model

    backbone_cfg = cfg.clone()
    backbone_cfg.MODEL.MODEL_NAME = _ARCH_TO_MODEL[cfg.MODEL.ARCH]
    bundle = build_model(backbone_cfg, rng=rng, init=init)
    cc = contrastive_config_from_cfg(cfg)
    # with init=False (bundle.batch_stats is None until apply time) the
    # BN-ness is predicted from the model family — one table, not a
    # second hand-maintained arch list
    bn_families = {"SlowFast", "ResNet", "X3D"}
    model = ContrastiveModel(
        bundle.module, cc,
        has_batch_stats=bundle.batch_stats is not None
        or _ARCH_TO_MODEL[cfg.MODEL.ARCH] in bn_families,
    )
    return model, bundle


from vtm.models.build import ModelBundle, register_model  # noqa: E402


@register_model("ContrastiveModel")
def _build_contrastive_bundle(cfg) -> ModelBundle:
    _, bundle = build_contrastive_model(cfg, init=False)
    return bundle
