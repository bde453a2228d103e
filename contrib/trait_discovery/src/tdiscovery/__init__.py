"""Trait discovery: per-latent probes, visuals, and dictionary baselines over
SAE activations (capability mirror of reference contrib/trait_discovery)."""
