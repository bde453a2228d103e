"""Test-only stand-in for torchvision (not installed in this image).

Only what the reference's saev.data modules touch at import time: the
transforms.v2 namespace with subclassable Transform and the handful of
callable transform classes. Numerics never flow through these — the parity
tests drive the reference Encoder directly on pre-patchified tensors.
"""

from . import datasets, transforms  # noqa: F401
