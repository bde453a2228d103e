"""FishVista trait-discovery benchmark: unified evaluation of prototype
methods (random / PCA / k-means / semi-NMF / SAE) on segmentation-labeled
activation shards, plus a supervised linear-probe skyline.

Capability mirror of reference contrib/trait_discovery/src/tdiscovery/fishvista/.
"""

from . import evaluation, supervised, utils  # noqa: F401
