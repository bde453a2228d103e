"""Map-style random-access dataset over activation shards.

One activation vector per `__getitem__` (copy-on-write memmap). Slow relative to the
streaming loaders; used for visuals/debugging. Mirrors reference
`src/saev/data/indexed.py:20-127`.
"""

import dataclasses
import logging
import os
import pathlib
import typing as tp

import numpy as np

from . import shards

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class Config:
    """Configuration for loading indexed activation data from disk.

    Attributes:
        shards: Directory with .bin shards and a metadata.json file.
        tokens: Which kinds of tokens to use ('special' | 'content' | 'all').
        layer: Which ViT layer(s) to read. "all" enumerates every recorded layer.
        debug: Whether to log debug messages.
    """

    shards: pathlib.Path = pathlib.Path("$SAEV_SCRATCH/saev/shards/abcdefg")
    tokens: str = "content"
    layer: int | str = -2
    debug: bool = False


class Dataset:
    """Dataset of activations from disk.

    Attributes:
        cfg: Configuration.
        md: Activations metadata, loaded from disk.
        index_map: Global-index → shard-coordinate mapping.
    """

    class Example(tp.TypedDict, total=False):
        act: np.ndarray
        example_idx: int
        token_idx: int
        token_label: int

    def __init__(self, cfg: Config):
        self.cfg = cfg
        if not os.path.isdir(self.cfg.shards):
            raise RuntimeError(f"Activations are not saved at '{self.cfg.shards}'.")

        self.md = shards.Metadata.load(pathlib.Path(self.cfg.shards))

        shard_info = shards.ShardInfo.load(pathlib.Path(self.cfg.shards))
        shard_info.validate(pathlib.Path(self.cfg.shards))

        labels_path = os.path.join(self.cfg.shards, "labels.bin")
        self.labels_mmap = None
        if os.path.exists(labels_path):
            self.labels_mmap = np.memmap(
                labels_path,
                mode="r",
                dtype=np.uint8,
                shape=(self.md.n_examples, self.md.content_tokens_per_example),
            )

        self.index_map = shards.IndexMap(self.md, self.cfg.tokens, self.cfg.layer)

    @property
    def d_model(self) -> int:
        """Dimension of the underlying transformer's embedding space."""
        return self.md.d_model

    def __getitem__(self, i: int) -> Example:
        idx = self.index_map.from_global(i)

        acts_fpath = pathlib.Path(self.cfg.shards) / f"acts{idx.shard_idx:06}.bin"
        acts = np.memmap(
            acts_fpath, mode="c", dtype=np.float32, shape=self.md.shard_shape
        )
        act = acts[
            idx.example_idx_in_shard, idx.layer_idx_in_shard, idx.token_idx_in_shard
        ]

        result = self.Example(
            act=np.array(act, dtype=np.float32),
            example_idx=idx.example_idx,
            token_idx=idx.content_token_idx,
        )

        if self.labels_mmap is not None and idx.content_token_idx >= 0:
            result["token_label"] = int(
                self.labels_mmap[idx.example_idx, idx.content_token_idx]
            )

        return result

    def __len__(self) -> int:
        return len(self.index_map)
