"""Mimicry discrimination: per-latent AUROC scoring between visually similar
classes (capability mirror of reference contrib/mimics)."""
