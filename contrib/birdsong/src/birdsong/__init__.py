"""Birdsong: audio latent visuals for Bird-MAE SAEs (capability mirror of
reference contrib/birdsong)."""
