"""Semantic-segmentation linear probes over ViT activations (capability mirror
of reference contrib/interactive_interp/semseg)."""
