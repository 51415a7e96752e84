"""Minimal hierarchical config system: YAML + ``${...}`` interpolation.

Replaces the reference's Hydra/OmegaConf stack (mr_gen/model/*/config.yaml,
e.g. /root/reference/mr_gen/model/lstmformer/config.yaml:36-235) with a
dependency-free implementation preserving the public contract:

  * one YAML file per model, nested groups, attribute access (``cfg.model.lr``)
  * ``${a.b.c}`` interpolation against the config root (full-string matches
    keep the referenced value's type; embedded matches become strings)
  * ``???`` marks mandatory fields; touching one unresolved raises
  * dotted CLI overrides ``a.b=value`` with YAML-typed values, so the
    reference's run/*/train.sh contracts (``name=... no_cache_build=false``)
    keep working.
"""

from __future__ import annotations

import copy
import re
from typing import Any, Dict, Iterator, List, Optional

import yaml

_INTERP_RE = re.compile(r"\$\{([^}]+)\}")
MANDATORY = "???"


class _YamlLoader(yaml.SafeLoader):
    """SafeLoader + exponent floats without a dot (``5e-6``, ``1E3``).

    PyYAML follows YAML 1.1 and reads those as strings; OmegaConf (which
    the reference configs were written for, e.g. ``lr: 5e-6``) reads them
    as floats — match OmegaConf.
    """


_YamlLoader.add_implicit_resolver(
    "tag:yaml.org,2002:float",
    re.compile(r"^[-+]?(\d+(\.\d*)?|\.\d+)[eE][-+]?\d+$"),
    list("-+0123456789."),
)


def _yaml_load(text: str) -> Any:
    return yaml.load(text, Loader=_YamlLoader)


class MandatoryValueError(KeyError):
    """A ``???`` field was accessed before being provided."""


class Config:
    """A nested dict with attribute access and interpolation resolution."""

    def __init__(self, data: Optional[Dict[str, Any]] = None):
        object.__setattr__(self, "_data", dict(data) if data else {})

    # -- mapping protocol -------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        value = self._data[key]
        if value == MANDATORY:
            raise MandatoryValueError(f"mandatory config key '{key}' not set")
        return value

    def __setitem__(self, key: str, value: Any) -> None:
        self._data[key] = _wrap(value)

    def __contains__(self, key: str) -> bool:
        return key in self._data

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    def keys(self):
        return self._data.keys()

    def items(self):
        return [(k, self[k]) for k in self._data]

    def values(self):
        return [self[k] for k in self._data]

    def get(self, key: str, default: Any = None) -> Any:
        """Default only for ABSENT keys. A stored ``???`` raises like
        OmegaConf's MissingMandatoryValue — silently substituting a
        default would defeat the mandatory contract (e.g. a run without
        ckpt_path checkpointing into ./ckpts unnoticed)."""
        if key in self._data:
            return self[key]
        return default

    # -- attribute protocol ------------------------------------------------
    def __getattr__(self, key: str) -> Any:
        if key.startswith("_"):
            raise AttributeError(key)
        try:
            return self[key]
        except KeyError as exc:
            if isinstance(exc, MandatoryValueError):
                raise
            raise AttributeError(f"no config key '{key}'") from exc

    def __setattr__(self, key: str, value: Any) -> None:
        if key.startswith("_"):
            object.__setattr__(self, key, value)
        else:
            self[key] = value

    def __eq__(self, other: Any) -> bool:
        if isinstance(other, Config):
            return self.to_dict() == other.to_dict()
        if isinstance(other, dict):
            return self.to_dict() == other
        return NotImplemented

    def __repr__(self) -> str:
        return f"Config({self._data!r})"

    def to_dict(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for key, value in self._data.items():
            out[key] = value.to_dict() if isinstance(value, Config) else value
        return out

    def copy(self) -> "Config":
        return Config(copy.deepcopy(self.to_dict()))


def _wrap(value: Any) -> Any:
    if isinstance(value, dict):
        cfg = Config()
        for k, v in value.items():
            cfg[k] = v
        return cfg
    if isinstance(value, list):
        return [_wrap(v) for v in value]
    return value


def _lookup(root: Config, dotted: str) -> Any:
    node: Any = root
    for part in dotted.split("."):
        if isinstance(node, Config):
            node = node._data[part]  # raw access: interpolation handled by caller
        elif isinstance(node, list):
            node = node[int(part)]
        else:
            raise KeyError(dotted)
    return node


def _resolve_value(root: Config, value: Any, stack: tuple) -> Any:
    if isinstance(value, str):
        full = _INTERP_RE.fullmatch(value)
        if full:
            ref = full.group(1)
            if ref in stack:
                raise ValueError(f"interpolation cycle via ${{{ref}}}")
            target = _lookup(root, ref)
            return _resolve_value(root, target, stack + (ref,))
        if _INTERP_RE.search(value):
            def sub(match: "re.Match[str]") -> str:
                ref = match.group(1)
                if ref in stack:
                    raise ValueError(f"interpolation cycle via ${{{ref}}}")
                target = _resolve_value(root, _lookup(root, ref), stack + (ref,))
                return str(target)

            return _INTERP_RE.sub(sub, value)
    return value


def _resolve_tree(root: Config, node: Any) -> Any:
    if isinstance(node, Config):
        for key in list(node._data):
            node._data[key] = _resolve_tree(root, node._data[key])
        return node
    if isinstance(node, list):
        return [_resolve_tree(root, v) for v in node]
    return _resolve_value(root, node, ())


def resolve(cfg: Config) -> Config:
    """Eagerly resolve every ``${...}`` interpolation in place."""
    _resolve_tree(cfg, cfg)
    return cfg


def _parse_override_value(text: str) -> Any:
    return _yaml_load(text) if text != "" else ""


def apply_overrides(cfg: Config, overrides: List[str]) -> Config:
    """Apply ``a.b.c=value`` CLI overrides (before interpolation)."""
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"override must look like key=value, got {item!r}")
        dotted, _, raw = item.partition("=")
        node = cfg
        parts = dotted.strip().split(".")
        for part in parts[:-1]:
            if part not in node._data or not isinstance(node._data[part], Config):
                node._data[part] = Config()
            node = node._data[part]
        node[parts[-1]] = _parse_override_value(raw)
    return cfg


def load_config(path: str, overrides: Optional[List[str]] = None) -> Config:
    """Load a YAML config, apply CLI overrides, resolve interpolations."""
    with open(path, "r", encoding="utf-8") as f:
        data = _yaml_load(f.read()) or {}
    cfg = _wrap(data)
    if overrides:
        apply_overrides(cfg, overrides)
    return resolve(cfg)


def from_dict(data: Dict[str, Any], overrides: Optional[List[str]] = None) -> Config:
    cfg = _wrap(copy.deepcopy(data))
    if overrides:
        apply_overrides(cfg, overrides)
    return resolve(cfg)
