"""Linear probes on [CLS] activations for image classification.

Capability mirror of reference contrib/interactive_interp/classification/
(config.py Train + grid, training.py main/make_models/evaluate).
"""

from .training import Train, grid, train, evaluate, load_cls_features  # noqa: F401
