"""Framework entry points (L4): extraction, training, inference."""
