"""Hierarchical YAML config cascade.

Reproduces the user-facing semantics of the reference config system
(`train_bisinger/utils/hparams.py:16-123`): YAML files form a DAG via a
`base_config` key (string or list, relative `./` paths allowed), loaded
depth-first with child-overrides-parent recursive dict merge, plus
`k=v,k2=v2` string overrides type-coerced from the existing value.

Differences from the reference (deliberate, TPU-first):
  - No global mutable dict. `load_hparams` returns an immutable `HParams`
    tree that is passed explicitly to model constructors; hashable so it
    can ride through `jax.jit` static args.
  - Checkpoint-dir config persistence is handled by the trainer
    (`bisinger_tpu.training.trainer`), not here.
"""

from __future__ import annotations

import argparse
import json
import os
import re
from typing import Any, Dict, Iterator, List, Mapping, Optional, Union

import yaml


class HParams(Mapping):
    """Immutable, hashable, dot-and-item-accessible config tree."""

    __slots__ = ("_data", "_hash")

    def __init__(self, data: Optional[Dict[str, Any]] = None, **kwargs):
        merged = dict(data or {})
        merged.update(kwargs)
        object.__setattr__(
            self,
            "_data",
            {
                k: HParams(v) if isinstance(v, dict) and not isinstance(v, HParams) else v
                for k, v in merged.items()
            },
        )
        object.__setattr__(self, "_hash", None)

    # -- Mapping protocol ---------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        return self._data[key]

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    def __contains__(self, key: object) -> bool:
        return key in self._data

    def get(self, key: str, default: Any = None) -> Any:
        return self._data.get(key, default)

    # -- attribute access ---------------------------------------------------
    def __getattr__(self, key: str) -> Any:
        if key.startswith("_"):
            # deepcopy/pickle probe attributes on a bare __new__ instance
            # before the _data slot exists; recursing into self._data
            # here would loop forever (RecursionError)
            raise AttributeError(key)
        try:
            return self._data[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key: str, value: Any):
        raise TypeError("HParams is immutable; use .replace(**updates)")

    def __reduce__(self):
        # __setattr__ blocks slot restoration, so pickle/deepcopy rebuild
        # through the constructor
        return (type(self), (dict(self._data),))

    # -- functional update --------------------------------------------------
    def replace(self, **updates) -> "HParams":
        new = dict(self._data)
        new.update(updates)
        # a programmatic replace() is as deliberate as a config-file set:
        # record provenance so default-vs-intent checks downstream (the
        # lr=2.0 step-decay substitution in training/optim.py) honor it
        if "_explicit_keys" in new and updates:
            explicit = set(new.get("_explicit_keys", ()))
            explicit.update(k for k in updates if k != "_explicit_keys")
            new["_explicit_keys"] = tuple(sorted(explicit))
        return HParams(new)

    def merged(self, other: Union["HParams", Dict[str, Any]]) -> "HParams":
        return HParams(_deep_merge(self.to_dict(), _as_dict(other)))

    def to_dict(self) -> Dict[str, Any]:
        return {
            k: v.to_dict() if isinstance(v, HParams) else v for k, v in self._data.items()
        }

    # -- hashing (so HParams can be a static jit arg) -----------------------
    def __hash__(self) -> int:
        h = object.__getattribute__(self, "_hash")
        if h is None:
            h = hash(_freeze(self._data))
            object.__setattr__(self, "_hash", h)
        return h

    def __eq__(self, other: object) -> bool:
        if isinstance(other, HParams):
            return self.to_dict() == other.to_dict()
        if isinstance(other, dict):
            return self.to_dict() == other
        return NotImplemented

    def __repr__(self) -> str:
        return f"HParams({json.dumps(self.to_dict(), indent=2, default=str)})"


def _as_dict(x: Union[HParams, Dict[str, Any]]) -> Dict[str, Any]:
    return x.to_dict() if isinstance(x, HParams) else dict(x)


def _freeze(obj: Any) -> Any:
    if isinstance(obj, (HParams, dict)):
        items = obj._data.items() if isinstance(obj, HParams) else obj.items()
        return tuple(sorted((k, _freeze(v)) for k, v in items))
    if isinstance(obj, (list, tuple)):
        return tuple(_freeze(v) for v in obj)
    return obj


def _deep_merge(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    """Child-overrides-parent recursive merge (reference `hparams.py:16-21`)."""
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _resolve_path(path: str, relative_to: Optional[str], search_roots: List[str]) -> str:
    if not os.path.isabs(path) and relative_to is not None:
        # resolve against the including file first (reference supports `./`;
        # we accept any relative path, e.g. `../tts/base.yaml`)
        cand = os.path.normpath(os.path.join(os.path.dirname(relative_to), path))
        if os.path.exists(cand):
            return cand
    if os.path.isabs(path) and os.path.exists(path):
        return path
    for root in search_roots:
        cand = os.path.join(root, path)
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(f"config {path!r} not found under {search_roots}")


def _load_config_file(
    path: str,
    search_roots: List[str],
    seen: Optional[set] = None,
    own_keys_sink: Optional[list] = None,
) -> Dict[str, Any]:
    """Depth-first base_config cascade (reference `hparams.py:48-66`).

    own_keys_sink: when given, receives the top-level keys written in
    THIS file (not its bases) — the provenance input for
    `_explicit_keys` — so load_hparams doesn't have to re-parse the
    YAML."""
    # `seen` holds only the ancestors of this file (path-local), so diamond
    # DAGs (two bases sharing a grand-base) are allowed while true cycles
    # still raise.
    seen = set() if seen is None else seen
    path = os.path.abspath(path)
    if path in seen:
        raise ValueError(f"config cycle detected at {path}")
    seen = seen | {path}
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    if not isinstance(cfg, dict):
        raise ValueError(
            f"config {path!r}: top level must be a mapping, got "
            f"{type(cfg).__name__}"
        )
    if own_keys_sink is not None:
        own_keys_sink.extend(k for k in cfg.keys() if k != "base_config")
    bases = cfg.pop("base_config", [])
    if isinstance(bases, str):
        bases = [bases]
    merged: Dict[str, Any] = {}
    for base in bases:
        base_path = _resolve_path(base, path, search_roots)
        merged = _deep_merge(merged, _load_config_file(base_path, search_roots, seen))
    return _deep_merge(merged, cfg)


_BOOL_STRINGS = {"true": True, "false": False, "True": True, "False": False}


def _coerce(value: str, old: Any) -> Any:
    """Type-coerce a CLI override from the existing value's type
    (reference `hparams.py:90-96`)."""
    if value in _BOOL_STRINGS:
        return _BOOL_STRINGS[value]
    if old is None:
        return _parse_literal(value)
    if isinstance(old, bool):
        return value in ("1", "true", "True")
    if isinstance(old, int):
        try:
            return int(value)
        except ValueError:
            return float(value)
    if isinstance(old, float):
        return float(value)
    if isinstance(old, (list, tuple)):
        return _parse_literal(value)
    return value


def _parse_literal(value: str) -> Any:
    try:
        return json.loads(value)
    except (json.JSONDecodeError, ValueError):
        return value


def parse_overrides(spec: str) -> Dict[str, str]:
    """Parse 'a=1,b=2' (commas inside [] are protected)."""
    out: Dict[str, str] = {}
    if not spec:
        return out
    # split on commas not inside brackets
    parts = re.split(r",(?![^\[]*\])", spec)
    for part in parts:
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            raise ValueError(f"override {part!r} must be k=v")
        k, v = part.split("=", 1)
        out[k.strip()] = v.strip()
    return out


def load_hparams(
    config_path: Optional[str] = None,
    overrides: Union[str, Dict[str, Any], None] = None,
    search_roots: Optional[List[str]] = None,
    base: Optional[Union[HParams, Dict[str, Any]]] = None,
) -> HParams:
    """Load the full config cascade for one experiment.

    Precedence (lowest→highest): built-in defaults < base config DAG <
    experiment config < `overrides` — matching the reference ordering
    (`hparams.py:69-96`) minus the work-dir persistence step.
    """
    import copy

    from bisinger_tpu.config.defaults import DEFAULT_HPARAMS

    roots = list(search_roots or [])
    roots.append(os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "configs"))
    roots.append(os.getcwd())

    # deep copy: dotted overrides write into nested dicts and must never
    # mutate the module-global defaults (or a caller's base tree)
    cfg = copy.deepcopy(_as_dict(base)) if base is not None else copy.deepcopy(DEFAULT_HPARAMS)
    # provenance: which top-level keys were EXPLICITLY set by the named
    # config file ITSELF or an override — NOT inherited through the
    # base_config cascade and NOT from the built-in defaults. Keys a
    # user's config pulls in via base_config (e.g. the shipped
    # `configs/tts/base.yaml` rsqrt-scale `lr: 2.0`) are that user's
    # *defaults*; counting them as explicit would defeat every
    # default-vs-intent check downstream (the lr=2.0 step-decay
    # substitution in training/optim.py diverged exactly this way).
    explicit = set(cfg.get("_explicit_keys", ()))
    if config_path is not None:
        path = _resolve_path(config_path, None, roots)
        own_keys: list = []
        file_cfg = _load_config_file(path, roots, own_keys_sink=own_keys)
        explicit.update(own_keys)
        cfg = _deep_merge(cfg, file_cfg)

    if overrides:
        if isinstance(overrides, str):
            overrides = parse_overrides(overrides)
        for k, v in overrides.items():
            node = cfg
            keys = k.split(".")
            explicit.add(keys[0])
            for kk in keys[:-1]:
                node = node.setdefault(kk, {})
            old = node.get(keys[-1])
            node[keys[-1]] = _coerce(v, old) if isinstance(v, str) else v

    explicit.discard("_explicit_keys")
    cfg["_explicit_keys"] = tuple(sorted(explicit))
    return HParams(cfg)


def set_hparams(argv: Optional[List[str]] = None) -> HParams:
    """CLI-compatible entry mirroring the reference flags
    (`hparams.py:26-36`): --config --exp_name --hparams --infer --validate
    --reset --debug."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="")
    parser.add_argument("--exp_name", type=str, default="")
    parser.add_argument("--hparams", type=str, default="")
    parser.add_argument("--infer", action="store_true")
    parser.add_argument("--validate", action="store_true")
    parser.add_argument("--reset", action="store_true")
    parser.add_argument("--debug", action="store_true")
    args, _ = parser.parse_known_args(argv)

    hp = load_hparams(args.config or None, args.hparams or None)
    work_dir = os.path.join("checkpoints", args.exp_name) if args.exp_name else ""
    return hp.replace(
        exp_name=args.exp_name,
        work_dir=work_dir,
        infer=args.infer,
        validate=args.validate,
        reset=args.reset,
        debug=args.debug,
    )
