"""Scorer wrapper for pre-trained sparse autoencoders.

Capability mirror of reference contrib/trait_discovery/src/tdiscovery/saes.py
(SparseAutoencoderScorer :14-48): presents a trained SAE through the same
score interface as the dictionary baselines so the unified trait-discovery
evaluation (fishvista/evaluation.py) treats SAE latents, k-means centroids,
PCA components, and random directions identically.
"""

import numpy as np

from saev_tpu import nn
from saev_tpu.nn import modeling


class SparseAutoencoderScorer:
    """Score activations with a pre-trained SAE's latent activations."""

    method = "sae"

    def __init__(self, ckpt_fpath: str):
        self.ckpt_fpath = str(ckpt_fpath)
        self.cfg, self.params, self.state = nn.load(ckpt_fpath)
        self._encode = None

    @property
    def n_prototypes(self) -> int:
        return self.cfg.d_sae

    @property
    def kwargs(self) -> dict[str, object]:
        return {"ckpt_fpath": self.ckpt_fpath}

    def partial_fit(self, batch: np.ndarray) -> "SparseAutoencoderScorer":
        """Pre-trained SAEs don't need fitting."""
        return self

    def transform(self, batch: np.ndarray) -> np.ndarray:
        """Latent activations f_x (batch, d_sae); eval-mode forward (JumpReLU
        for BatchTopK), HIGHEST precision like all inference paths."""
        import jax
        import jax.numpy as jnp

        if self._encode is None:
            self._encode = jax.jit(
                lambda p, s, x: modeling.encode(
                    self.cfg, p, s, x, training=False,
                    precision=jax.lax.Precision.HIGHEST,
                )[0].f_x
            )
        return np.asarray(
            self._encode(self.params, self.state, jnp.asarray(batch, jnp.float32))
        )
