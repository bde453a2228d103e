"""Import-time stand-ins for torchvision.datasets (see package docstring)."""

from . import folder  # noqa: F401


class ImageFolder:
    """Subclassable placeholder; instantiating requires real torchvision."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "torchvision is an import-time stub in these parity tests."
        )
