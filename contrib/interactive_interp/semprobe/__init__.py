"""Semantic probing: score SAE latents as binary concept detectors over curated
image sets (capability mirror of reference contrib/interactive_interp/semprobe)."""
