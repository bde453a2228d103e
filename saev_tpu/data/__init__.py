"""Data subsystem: shard protocol (L0), host dataloaders (L1), model zoo + extraction (L2)."""

import dataclasses

from .indexed import Config as IndexedConfig
from .indexed import Dataset as IndexedDataset
from .ordered import Config as OrderedConfig
from .ordered import DataLoader as OrderedDataLoader
from .shards import Metadata, PixelAgg
from .shuffled import Config as ShuffledConfig
from .shuffled import DataLoader as ShuffledDataLoader

__all__ = [
    "IndexedConfig",
    "IndexedDataset",
    "OrderedDataLoader",
    "OrderedConfig",
    "ShuffledDataLoader",
    "ShuffledConfig",
    "Metadata",
    "PixelAgg",
    "make_ordered_config",
]


def _register_families():
    """Register all transformer families at import (reference data/__init__.py:26-33)."""
    from . import models

    # Import lazily-registered families; heavyweight deps inside each module are
    # themselves imported lazily at model construction time.
    from . import fake_vit  # noqa: F401  (registers "fake-clip")

    pkg = __name__.rsplit(".", 1)[0]
    # clip/siglip/dinov2/pe-core/pe-spatial live in models.families; dinov3 and
    # bird-mae have their own modules.
    for mod_name in ("models.families", "models.dinov3", "models.bird_mae"):
        try:
            __import__(f"{pkg}.{mod_name}")
        except ImportError:
            # Optional model families degrade gracefully when deps are missing.
            pass
    return models


_register_families()


def make_ordered_config(shuffled_cfg: ShuffledConfig, **overrides: object) -> OrderedConfig:
    """Create an `OrderedConfig` from a `ShuffledConfig`, with optional overrides.

    Defaults come from `shuffled_cfg` for fields present in `OrderedConfig`; `overrides`
    take precedence. Mirrors reference data/__init__.py:37-50.
    """
    params: dict[str, object] = {}
    for f in dataclasses.fields(OrderedConfig):
        if hasattr(shuffled_cfg, f.name):
            params[f.name] = getattr(shuffled_cfg, f.name)
    params.update(overrides)
    return OrderedConfig(**params)
