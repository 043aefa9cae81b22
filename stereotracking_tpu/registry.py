"""Name registry + config-driven builders.

The reference is organised around OpenMMLab registries and python-file
configs with ``_base_`` inheritance (/root/reference/mmtrack/registry.py:34-78,
configs/...).  This re-creates that workflow without mmengine: a flat name
registry, recursive ``build`` on dicts with a ``type`` key, and python-file
configs merged over their ``_base_`` chain (see ``config.py``).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._items: Dict[str, Callable] = {}

    def register(self, name: Optional[str] = None, obj: Callable = None):
        def deco(o):
            key = name or o.__name__
            if key in self._items:
                raise KeyError(f'{key} already registered in {self.name}')
            self._items[key] = o
            return o
        if obj is not None:
            return deco(obj)
        return deco

    def get(self, key: str) -> Callable:
        if key not in self._items:
            raise KeyError(
                f"'{key}' is not registered in {self.name}; "
                f'known: {sorted(self._items)}')
        return self._items[key]

    def build(self, cfg: Any, **extra):
        """Recursively build from a config dict with a 'type' key."""
        if cfg is None:
            return None
        if not isinstance(cfg, dict) or 'type' not in cfg:
            return cfg
        cfg = dict(cfg)
        kind = cfg.pop('type')
        # strip reference-style scope prefixes ('mmtrack.', 'mmdet.', ...)
        kind = kind.split('.')[-1]
        ctor = self.get(kind)
        kwargs = {k: v for k, v in cfg.items()}
        kwargs.update(extra)
        return ctor(**kwargs)

    def __contains__(self, key):
        return key in self._items


MODELS = Registry('models')
DATASETS = Registry('datasets')
TRANSFORMS = Registry('transforms')
METRICS = Registry('metrics')
TASK_UTILS = Registry('task_utils')
