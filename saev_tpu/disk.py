"""Disk-layout helpers: runs root / shards root / run directories.

Layout (same as the reference protocol, `src/saev/disk.py:13-161` and
docs/src/developers/disk-layout.md):

    $SAEV_SCRATCH/saev/shards/<hash>/{metadata.json, shards.json, acts*.bin[, labels.bin]}
    $SAEV_NFS/saev/runs/<run_id>/{checkpoint/{sae.pt,config.json}, links/{train,val}-shards, inference/<hash>/}
"""

import json
import pathlib


def is_runs_root(path: pathlib.Path) -> bool:
    """True if `path` is a directory ending in saev/runs."""
    return path.is_dir() and path.parts[-2:] == ("saev", "runs")


def is_shards_root(path: pathlib.Path) -> bool:
    """True if `path` is a directory ending in saev/shards."""
    return path.is_dir() and path.parts[-2:] == ("saev", "shards")


def is_shards_dir(path: pathlib.Path) -> bool:
    """True if `path` is a directory ending in saev/shards/<hash>."""
    if not path.is_dir():
        return False
    if len(path.parts) < 3 or path.parts[-3:-1] != ("saev", "shards"):
        return False
    return True


class Run:
    """An SAE training run directory and its associated data.

    Args:
        run_dir: Run directory, $SAEV_NFS/saev/runs/<run_id>. Assumes the run already
            exists and validates the structure. Use `Run.new()` to create a new run.
    """

    def __init__(self, run_dir: pathlib.Path):
        self.run_dir = pathlib.Path(run_dir)

        if len(self.run_dir.parts) < 3 or self.run_dir.parts[-3:-1] != ("saev", "runs"):
            raise ValueError("Run directory is invalid.")

        if not self.run_dir.exists():
            raise FileNotFoundError(
                f"Run directory does not exist: {self.run_dir}. "
                "Use Run.new() to create a new run."
            )
        for sub in ("checkpoint", "links", "inference"):
            if not (self.run_dir / sub).exists():
                raise FileNotFoundError(
                    f"{sub.capitalize()} directory does not exist: "
                    f"{self.run_dir / sub}. Use Run.new() to create a new run."
                )

    @classmethod
    def new(
        cls,
        run_id: str,
        *,
        train_shards_dir: pathlib.Path,
        val_shards_dir: pathlib.Path,
        runs_root: pathlib.Path,
    ) -> "Run":
        """Create a new run with directory structure and symlinks."""
        run_dir = pathlib.Path(runs_root) / run_id
        run_dir.mkdir(parents=True)
        (run_dir / "checkpoint").mkdir()
        (run_dir / "links").mkdir()
        (run_dir / "inference").mkdir()

        (run_dir / "links" / "train-shards").symlink_to(train_shards_dir)
        (run_dir / "links" / "val-shards").symlink_to(val_shards_dir)

        return cls(run_dir)

    @property
    def run_id(self) -> str:
        """The run ID (directory name, typically from the metric tracker)."""
        return self.run_dir.name

    @property
    def config(self) -> dict[str, object]:
        """The training run config as a plain dict."""
        config_fpath = self.run_dir / "checkpoint" / "config.json"
        with open(config_fpath) as fd:
            return json.load(fd)

    @property
    def ckpt(self) -> pathlib.Path:
        """Path to the sae.pt checkpoint."""
        return self.run_dir / "checkpoint" / "sae.pt"

    @property
    def val_shards(self) -> pathlib.Path:
        """Resolved path to the validation shards directory."""
        return (self.run_dir / "links" / "val-shards").resolve()

    @property
    def train_shards(self) -> pathlib.Path:
        """Resolved path to the training shards directory."""
        return (self.run_dir / "links" / "train-shards").resolve()

    @property
    def inference(self) -> pathlib.Path:
        """Path to the inference/ directory."""
        return self.run_dir / "inference"
