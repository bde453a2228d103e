"""SAE core (L3): pure-JAX sparse autoencoders, objectives, and reference-compatible
checkpoints. Mirror of reference `src/saev/nn/__init__.py` surface."""

from . import modeling, objectives, serialize
from .modeling import (
    AuxK,
    BatchTopK,
    EncodeOut,
    L1Sparsity,
    NoAux,
    NoSparsity,
    Output,
    Relu,
    SparseAutoencoderConfig,
    TopK,
    decode,
    encode,
    forward,
    init,
    normalize_w_dec,
    remove_parallel_grads,
)
from .objectives import Matryoshka, MatryoshkaLoss, ObjectiveConfig, matryoshka_loss, sample_prefixes
from .serialize import dump, load

__all__ = [
    "AuxK",
    "BatchTopK",
    "EncodeOut",
    "L1Sparsity",
    "Matryoshka",
    "MatryoshkaLoss",
    "NoAux",
    "NoSparsity",
    "ObjectiveConfig",
    "Output",
    "Relu",
    "SparseAutoencoderConfig",
    "TopK",
    "decode",
    "dump",
    "encode",
    "forward",
    "init",
    "load",
    "matryoshka_loss",
    "modeling",
    "normalize_w_dec",
    "objectives",
    "remove_parallel_grads",
    "sample_prefixes",
    "serialize",
]
