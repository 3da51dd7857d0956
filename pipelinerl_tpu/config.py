"""Minimal hierarchical config system (hydra/OmegaConf are not available).

Provides what the framework needs from the reference's hydra stack
(/root/reference/pipelinerl/launch.py:608-613, conf/base.yaml):

- YAML config trees with a ``defaults`` list composing group files
  (``conf/finetune/base.yaml`` style),
- attribute-style access (``cfg.finetune.learning_rate``),
- dotted CLI overrides (``finetune.learning_rate=1e-5``; ``+new.key=v`` adds),
- ``${a.b.c}`` interpolation resolved against the merged root,
- round-trip save/load so child processes can re-read the resolved config
  (the reference saves ``conf/exp_config.yaml``; we do the same).
"""

from __future__ import annotations

import copy
import json
import os
import re
from pathlib import Path
from typing import Any, Iterator

import yaml

_INTERP_RE = re.compile(r"\$\{([^}]+)\}")
_MISSING = "???"


class _YamlLoader(yaml.SafeLoader):
    """SafeLoader with a YAML-1.2-style float resolver so ``1e-6`` parses as a
    float (plain YAML 1.1 requires ``1.0e-6``)."""


_YamlLoader.add_implicit_resolver(
    "tag:yaml.org,2002:float",
    re.compile(
        r"""^(?:
            [-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
           |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
           |\.[0-9][0-9_]*(?:[eE][-+]?[0-9]+)?
           |[-+]?\.(?:inf|Inf|INF)
           |\.(?:nan|NaN|NAN)
        )$""",
        re.X,
    ),
    list("-+0123456789."),
)


def _yaml_load(text: str) -> Any:
    return yaml.load(text, Loader=_YamlLoader)


class MissingValueError(KeyError):
    pass


class Config:
    """A nested attrdict over plain dicts/lists with interpolation."""

    def __init__(self, data: dict[str, Any] | None = None):
        # Hold the dict by reference (not a copy) so nested Config views share
        # mutations with the root — required for attribute writes to stick.
        object.__setattr__(self, "_data", data if data is not None else {})

    # -- mapping interface -------------------------------------------------
    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except MissingValueError:
            raise
        except KeyError as e:
            raise AttributeError(str(e)) from None

    def __setattr__(self, key: str, value: Any) -> None:
        self._data[key] = _unwrap(value)

    def __getitem__(self, key: str) -> Any:
        if key not in self._data:
            raise KeyError(f"Missing config key: {key!r}")
        value = self._data[key]
        if value == _MISSING:
            raise MissingValueError(f"Config key {key!r} is required (???)")
        return _wrap(value)

    def __setitem__(self, key: str, value: Any) -> None:
        self._data[key] = _unwrap(value)

    def __contains__(self, key: str) -> bool:
        return key in self._data

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    def __eq__(self, other: object) -> bool:
        if isinstance(other, Config):
            return self._data == other._data
        if isinstance(other, dict):
            return self._data == other
        return NotImplemented

    def __repr__(self) -> str:
        return f"Config({self._data!r})"

    def get(self, key: str, default: Any = None) -> Any:
        if key not in self._data or self._data[key] == _MISSING:
            return default
        return _wrap(self._data[key])

    def keys(self):
        return self._data.keys()

    def items(self):
        return ((k, _wrap(v)) for k, v in self._data.items())

    def values(self):
        return (_wrap(v) for v in self._data.values())

    def setdefault(self, key: str, default: Any) -> Any:
        if key not in self._data:
            self._data[key] = _unwrap(default)
        return _wrap(self._data[key])

    # -- dotted access -----------------------------------------------------
    def select(self, dotted: str, default: Any = None) -> Any:
        node: Any = self
        for part in dotted.split("."):
            if isinstance(node, Config) and part in node:
                node = node.get(part)
            else:
                return default
        return node

    def set_dotted(self, dotted: str, value: Any, *, allow_new: bool = True) -> None:
        parts = dotted.split(".")
        node = self._data
        for part in parts[:-1]:
            nxt = node.get(part)
            if not isinstance(nxt, dict):
                if nxt is not None and not allow_new:
                    raise KeyError(f"Cannot descend into non-dict at {part!r} in {dotted!r}")
                nxt = {}
                node[part] = nxt
            node = nxt
        if not allow_new and parts[-1] not in node:
            raise KeyError(
                f"Override of unknown key {dotted!r} (prefix with + to add new keys)"
            )
        node[parts[-1]] = _unwrap(value)

    # -- merge / resolve ---------------------------------------------------
    def merge(self, other: "Config | dict") -> None:
        """Deep-merge ``other`` into self (other wins)."""
        _deep_merge(self._data, _unwrap(other))

    def resolve(self) -> "Config":
        """Return a copy with all ``${...}`` interpolations substituted."""
        root = copy.deepcopy(self._data)
        _resolve_node(root, root, trail=())
        return Config(root)

    def to_dict(self) -> dict[str, Any]:
        return copy.deepcopy(self._data)

    def copy(self) -> "Config":
        return Config(copy.deepcopy(self._data))

    def to_yaml(self) -> str:
        return yaml.safe_dump(self._data, sort_keys=False)

    def save(self, path: str | Path) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        tmp = str(path) + ".tmp"
        with open(tmp, "w") as f:
            f.write(self.to_yaml())
        os.replace(tmp, str(path))


def _wrap(value: Any) -> Any:
    if isinstance(value, dict):
        return Config(value)
    return value


def _unwrap(value: Any) -> Any:
    if isinstance(value, Config):
        return value._data
    if isinstance(value, dict):
        return {k: _unwrap(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_unwrap(v) for v in value]
    return value


def _deep_merge(dst: dict, src: dict) -> None:
    for key, value in src.items():
        if isinstance(value, dict) and isinstance(dst.get(key), dict):
            _deep_merge(dst[key], value)
        else:
            dst[key] = copy.deepcopy(value)


def _lookup(root: dict, dotted: str) -> Any:
    node: Any = root
    for part in dotted.split("."):
        if not isinstance(node, dict) or part not in node:
            raise KeyError(f"Interpolation target not found: {dotted!r}")
        node = node[part]
    return node


def _resolve_value(root: dict, value: Any, trail: tuple) -> Any:
    if not isinstance(value, str):
        return value
    match = _INTERP_RE.fullmatch(value)
    if match:  # whole-string interpolation keeps the target's type
        target = match.group(1)
        if target in trail:
            raise ValueError(f"Interpolation cycle at {target!r}")
        resolved = _lookup(root, _normalize_ref(target, trail))
        return _resolve_value(root, resolved, trail + (target,))

    def sub(m: re.Match) -> str:
        resolved = _lookup(root, _normalize_ref(m.group(1), trail))
        resolved = _resolve_value(root, resolved, trail + (m.group(1),))
        return str(resolved)

    return _INTERP_RE.sub(sub, value)


def _normalize_ref(target: str, trail: tuple) -> str:
    # OmegaConf-style relative refs (e.g. ${..seed}) are not supported; the
    # conf tree here uses absolute refs only.
    if target.startswith("."):
        raise ValueError(
            f"Relative interpolation {target!r} not supported; use absolute paths"
        )
    return target


def _resolve_node(root: dict, node: Any, trail: tuple) -> None:
    if isinstance(node, dict):
        for key, value in node.items():
            if isinstance(value, (dict, list)):
                _resolve_node(root, value, trail)
            else:
                node[key] = _resolve_value(root, value, trail)
    elif isinstance(node, list):
        for i, value in enumerate(node):
            if isinstance(value, (dict, list)):
                _resolve_node(root, value, trail)
            else:
                node[i] = _resolve_value(root, value, trail)


def _parse_scalar(text: str) -> Any:
    """Parse a CLI override value with YAML scalar semantics."""
    try:
        return _yaml_load(text)
    except yaml.YAMLError:
        return text


def load_yaml_file(path: str | Path) -> Config:
    with open(path) as f:
        data = _yaml_load(f.read()) or {}
    if not isinstance(data, dict):
        raise ValueError(f"Top-level YAML in {path} must be a mapping")
    return Config(data)


def compose(
    config_dir: str | Path,
    config_name: str,
    overrides: list[str] | None = None,
    resolve: bool = True,
) -> Config:
    """Compose a config like hydra would: defaults list first, then the file
    itself, then CLI overrides, then interpolation resolution."""
    config_dir = Path(config_dir)
    cfg = _compose_file(config_dir, config_name)
    for ov in overrides or []:
        allow_new = ov.startswith("+")
        body = ov[1:] if allow_new else ov
        if "=" not in body:
            raise ValueError(f"Override {ov!r} must be key=value")
        key, _, raw = body.partition("=")
        cfg.set_dotted(key.strip(), _parse_scalar(raw.strip()), allow_new=True)
    return cfg.resolve() if resolve else cfg


def _compose_file(config_dir: Path, name: str, _group: str = "") -> Config:
    rel = Path(_group) / f"{name}.yaml" if _group else Path(f"{name}.yaml")
    path = config_dir / rel
    if not path.exists():
        raise FileNotFoundError(f"Config file not found: {path}")
    raw = load_yaml_file(path)
    defaults = raw.to_dict().pop("defaults", [])
    base = Config()
    self_done = False
    for entry in defaults:
        if entry == "_self_":
            body = raw.to_dict()
            body.pop("defaults", None)
            base.merge(body)
            self_done = True
            continue
        if isinstance(entry, str):
            base.merge(_compose_file(config_dir, entry, _group))
            continue
        if isinstance(entry, dict) and len(entry) == 1:
            (group, gname), = entry.items()
            if gname is None:
                continue
            sub = _compose_file(config_dir, str(gname), _group=group)
            base.merge({group: sub.to_dict()})
            continue
        raise ValueError(f"Unsupported defaults entry {entry!r} in {path}")
    if not self_done:
        body = raw.to_dict()
        body.pop("defaults", None)
        base.merge(body)
    return base


def to_json(cfg: Config) -> str:
    return json.dumps(cfg.to_dict(), sort_keys=True)
