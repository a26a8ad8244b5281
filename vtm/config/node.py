"""A minimal yacs-style config node.

Provides the same three-level override semantics as the reference
(slowfast/utils/parser.py:67-94): compiled defaults -> yaml file
(``merge_from_file``) -> CLI ``--opts KEY VALUE ...``
(``merge_from_list``), with dotted-key addressing and type coercion.
Implemented from scratch (no yacs/fvcore dependency).
"""

from __future__ import annotations

import ast
import copy
from typing import Any, List

import yaml


class CfgNode(dict):
    """dict with attribute access and yacs-style merging."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    # -- merging ---------------------------------------------------------

    def merge_from_other(self, other: dict, allow_new: bool = False, _path: str = "") -> None:
        for k, v in other.items():
            full = f"{_path}.{k}" if _path else k
            if k not in self:
                if allow_new:
                    self[k] = CfgNode(v) if isinstance(v, dict) else v
                    continue
                raise KeyError(f"Non-existent config key: {full}")
            cur = self[k]
            if isinstance(cur, CfgNode) and isinstance(v, dict):
                cur.merge_from_other(v, allow_new=allow_new, _path=full)
            else:
                self[k] = _coerce(v, cur, full)

    def merge_from_file(self, path: str, allow_new: bool = False) -> None:
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        self.merge_from_other(data, allow_new=allow_new)

    def merge_from_list(self, opts: List[str]) -> None:
        if len(opts) % 2 != 0:
            raise ValueError(f"--opts must be KEY VALUE pairs, got {opts}")
        for key, raw in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                if p not in node or not isinstance(node[p], CfgNode):
                    raise KeyError(f"Non-existent config key: {key}")
                node = node[p]
            leaf = parts[-1]
            if leaf not in node:
                raise KeyError(f"Non-existent config key: {key}")
            value = raw
            if isinstance(raw, str):
                try:
                    value = ast.literal_eval(raw)
                except (ValueError, SyntaxError):
                    value = raw
            node[leaf] = _coerce(value, node[leaf], key)

    # -- IO ---------------------------------------------------------------

    def to_dict(self) -> dict:
        return {
            k: (v.to_dict() if isinstance(v, CfgNode) else v) for k, v in self.items()
        }

    def dump(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=True)

    def __init__(self, init: dict | None = None):
        super().__init__()
        if init:
            for k, v in init.items():
                self[k] = CfgNode(v) if isinstance(v, dict) and not isinstance(v, CfgNode) else v


def _coerce(value: Any, current: Any, key: str) -> Any:
    """Coerce ``value`` toward the type of the existing default, with
    yacs-like leniency (int->float, list<->tuple, anything->None slot)."""
    if current is None or value is None:
        return value
    if isinstance(current, bool):
        if isinstance(value, bool):
            return value
        if isinstance(value, str):
            if value.lower() in ("true", "1", "yes"):
                return True
            if value.lower() in ("false", "0", "no"):
                return False
        raise ValueError(f"Cannot coerce {value!r} to bool for key {key}")
    if isinstance(current, float) and isinstance(value, int):
        return float(value)
    if isinstance(current, (list, tuple)) and isinstance(value, (list, tuple)):
        return type(current)(value)
    if type(value) is type(current) or isinstance(value, type(current)):
        return value
    # allow changing scalar types when defaults are placeholders
    if isinstance(current, (int, float, str)) and isinstance(value, (int, float, str, list, tuple)):
        return value
    raise ValueError(
        f"Type mismatch for key {key}: cannot replace {type(current).__name__} with {type(value).__name__}"
    )
