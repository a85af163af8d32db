"""Config system: YAML -> attribute tree with CLI overrides.

Mirrors the reference's config plumbing (reference `utils.py:9-27`
``dict2namespace``/``namespace2dict`` and `main.py:37-53` CLI overrides):
a nested YAML file becomes a tree of attribute-accessible nodes which are
threaded through every layer, with ``in`` membership tests for optional keys
(the reference relies on ``argparse.Namespace.__contains__``).

The YAML templates use ``!!python/tuple`` tags (reference
`configs/Template-LBBDM-f4.yaml:66`); we load with ``yaml.FullLoader`` for the
same semantics.
"""

from __future__ import annotations

import copy
from types import SimpleNamespace
from typing import Any

import yaml


class ConfigNode(SimpleNamespace):
    """Nested attribute namespace with dict-like conveniences.

    Behaviorally equivalent to the reference's ``argparse.Namespace`` trees:
    attribute access, ``key in node`` membership (reference
    `runners/BaseRunner.py:64`), plus ``get``/``to_dict`` helpers.
    """

    def __contains__(self, key: str) -> bool:
        return hasattr(self, key)

    def get(self, key: str, default: Any = None) -> Any:
        return getattr(self, key, default)

    def __getitem__(self, key: str) -> Any:
        return getattr(self, key)

    def __setitem__(self, key: str, value: Any) -> None:
        setattr(self, key, value)

    def keys(self):
        return vars(self).keys()

    def items(self):
        return vars(self).items()

    def to_dict(self) -> dict:
        return namespace2dict(self)

    def clone(self) -> "ConfigNode":
        return copy.deepcopy(self)


def dict2namespace(d: dict) -> ConfigNode:
    """Recursively convert a dict into a ConfigNode tree (reference `utils.py:9-17`)."""
    node = ConfigNode()
    for key, value in d.items():
        if isinstance(value, dict):
            value = dict2namespace(value)
        setattr(node, key, value)
    return node


def namespace2dict(ns) -> dict:
    """Inverse of dict2namespace (reference `utils.py:20-27`)."""
    out = {}
    for key, value in vars(ns).items():
        if isinstance(value, SimpleNamespace):
            out[key] = namespace2dict(value)
        else:
            out[key] = value
    return out


def load_config(path: str) -> ConfigNode:
    """Load a YAML config file into a ConfigNode tree.

    Uses ``yaml.FullLoader`` so the templates' ``!!python/tuple`` tags parse,
    matching reference `main.py:38`.
    """
    with open(path, "r") as f:
        raw = yaml.load(f, Loader=yaml.FullLoader)
    return dict2namespace(raw)


def save_config(config: ConfigNode, path: str) -> None:
    """Snapshot a config tree back to YAML (reference `runners/BaseRunner.py:87-92`)."""
    with open(path, "w") as f:
        yaml.dump(_plain(namespace2dict(config)), f, default_flow_style=False)


def _plain(obj):
    """Coerce values to YAML-safe plain types (tuples -> lists, etc.)."""
    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)


def get_obj_from_str(string: str, reload: bool = False):
    """Dotted-path import (reference `utils.py:30-35`)."""
    import importlib

    module, cls = string.rsplit(".", 1)
    if reload:
        importlib.reload(importlib.import_module(module))
    return getattr(importlib.import_module(module, package=None), cls)


def instantiate_from_config(config):
    """Instantiate ``target:`` + ``params:`` config nodes
    (reference `utils.py:38-41`)."""
    if "target" not in config:
        raise KeyError("Expected key `target` to instantiate.")
    params = config.get("params", None)
    kwargs = namespace2dict(params) if isinstance(params, SimpleNamespace) else (params or {})
    return get_obj_from_str(config["target"])(**kwargs)


def apply_cli_overrides(config: ConfigNode, args) -> ConfigNode:
    """Fold CLI args into the config tree (reference `main.py:41-50`).

    CLI resume paths and epoch/step caps override the YAML values; the raw
    args namespace is attached at ``config.args`` as in the reference.
    """
    config.args = args
    if getattr(args, "resume_model", None) is not None:
        config.model.model_load_path = args.resume_model
    if getattr(args, "resume_optim", None) is not None:
        config.model.optim_sche_load_path = args.resume_optim
    if getattr(args, "max_epoch", None) is not None:
        config.training.n_epochs = args.max_epoch
    if getattr(args, "max_steps", None) is not None:
        config.training.n_steps = args.max_steps
    # --gpu_ids "0,2" selects a local-device subset for the mesh (the
    # reference spawns one DDP process per listed GPU, `main.py:100-104`);
    # "-1" (CPU) and the default "0" keep all discovered devices
    gpu_ids = getattr(args, "gpu_ids", None)
    if gpu_ids and gpu_ids not in ("-1", "0"):
        config.training.mesh_device_ids = [int(i) for i in gpu_ids.split(",")]
    return config
