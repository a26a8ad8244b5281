"""Weight/activation extraction + plotting utilities.

Functional parity targets:
  slowfast/visualization/utils.py (GetWeightAndActivation:198-293,
    get_indexing:295-316, process_layer_index_data:318-342,
    plot_topk_histogram:132-196, get_layer:365-381)

TPU-native: the reference registers torch forward hooks; flax modules
are pure, so activations are collected with
``module.apply(..., capture_intermediates=...)`` — every submodule's
output is recorded under its scope path ('/'-separated, exactly the
reference's hierarchical layer-name convention).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def get_indexing(string: str) -> tuple:
    """Parse numpy-like fancy indexing from a string
    (reference utils.py:295-316): dims separated by ';', indices by ','.
    "1,2;1,2" -> (array([1,2]), array([1,2]))."""
    final_indexing = []
    for index in string.strip().split(";"):
        index_single_dim = index.split(",")
        index_single_dim = [int(i) for i in index_single_dim]
        final_indexing.append(np.array(index_single_dim))
    return tuple(final_indexing)


def process_layer_index_data(layer_ls, layer_name_prefix: str = ""):
    """Split "layer idx" strings into (names, {name: indexing})
    (reference utils.py:318-342)."""
    layer_name, indexing_dict = [], {}
    for layer in layer_ls:
        ls = layer.split()
        name = layer_name_prefix + ls[0]
        layer_name.append(name)
        indexing_dict[name] = get_indexing(ls[1]) if len(ls) == 2 else ()
    return layer_name, indexing_dict


def get_weights(params, layers: Sequence[str]) -> dict:
    """{layer_name: kernel/scale array} for '/'-separated param paths
    (reference GetWeightAndActivation.get_weights:276-293)."""
    out = {}
    for layer in layers:
        node = params
        ok = True
        for part in layer.split("/"):
            if not isinstance(node, dict) or part not in node:
                ok = False
                break
            node = node[part]
        if not ok:
            continue
        if isinstance(node, dict):
            leaf = node.get("kernel", node.get("scale"))
            if leaf is None:
                continue
            out[layer] = np.asarray(leaf)
        else:
            out[layer] = np.asarray(node)
    return out


def get_activations(bundle, frames, layers: Sequence[str], bboxes=None,
                    indexing: Optional[dict] = None) -> tuple:
    """Run a forward pass capturing the named submodules' outputs
    (reference GetWeightAndActivation.get_activations:251-274).

    ``layers``: '/'-separated module scope paths (e.g.
    "s1/pathway0_stem/conv" or "blocks_3/attn"); an empty list captures
    everything. Returns (activation_dict, preds).
    """
    import jax.numpy as jnp

    wanted = set(layers)

    def keep(mdl, method_name):
        if method_name != "__call__":
            return False
        path = "/".join(mdl.path)
        return not wanted or path in wanted

    variables = dict(bundle.variables)
    kwargs = {}
    if bboxes is not None:
        kwargs["bboxes"] = jnp.asarray(bboxes)
    out, mutated = bundle.module.apply(
        variables, jnp.asarray(frames),
        capture_intermediates=keep, mutable=["intermediates"], **kwargs,
    )
    preds = out[0] if isinstance(out, tuple) else out
    if isinstance(preds, tuple):
        # EPIC twin-head logits: report the verb head, like the
        # tools/visualization.py caller (logits[0])
        preds = preds[0]

    acts = {}

    def walk(node, path):
        if isinstance(node, dict):
            if "__call__" in node:
                value = node["__call__"][0]
                if isinstance(value, tuple):
                    value = value[0]
                name = "/".join(path)
                arr = np.asarray(value)
                idx = (indexing or {}).get(name, ())
                acts[name] = arr[idx] if idx else arr
            for k, v in node.items():
                if k != "__call__":
                    walk(v, path + [k])

    walk(mutated.get("intermediates", {}), [])
    if wanted:
        acts = {k: v for k, v in acts.items() if k in wanted}
    return acts, np.asarray(preds)


def plot_topk_histogram(tag: str, array: np.ndarray, k: int = 10,
                        class_names=None, figsize=None):
    """Top-k bar plot as a matplotlib figure
    (reference utils.py:132-196)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    array = np.asarray(array).reshape(-1)
    ind = np.argsort(-array)[:k]
    val = array[ind]
    fig = plt.Figure(figsize=figsize, facecolor="w", edgecolor="k")
    ax = fig.add_subplot(1, 1, 1)
    names = (
        [str(i) for i in ind]
        if class_names is None
        else [class_names[i] for i in ind]
    )
    tick_marks = np.arange(k)
    ax.bar(tick_marks, val, 0.75, color="orange", tick_label=names,
           edgecolor="w", linewidth=1)
    ax.set_xlabel("Candidates")
    ax.set_xticks(tick_marks)
    ax.set_xticklabels(names, rotation=-45, ha="center")
    ax.xaxis.set_label_position("bottom")
    ax.xaxis.tick_bottom()
    ax.set_yticks(np.linspace(0, 1, num=10))
    ax.set_ylabel(tag)
    fig.set_tight_layout(True)
    return fig
