"""Minimal torchvision.transforms.v2 stand-in (see package docstring)."""

import torch


class Transform(torch.nn.Module):
    """Subclassable base (reference FlexResize derives from it)."""

    def forward(self, *inputs):
        if hasattr(self, "transform"):
            flat = inputs[0] if len(inputs) == 1 else inputs
            return self.transform(flat, {})
        raise NotImplementedError


class InterpolationMode:
    NEAREST = "nearest"
    BILINEAR = "bilinear"
    BICUBIC = "bicubic"


class _Callable:
    def __init__(self, *args, **kwargs):
        self.args, self.kwargs = args, kwargs

    def __call__(self, x):
        raise NotImplementedError(
            f"{type(self).__name__} is an import-time stub; parity tests do "
            "not execute torchvision transforms."
        )


class Compose(_Callable):
    pass


class Resize(_Callable):
    pass


class CenterCrop(_Callable):
    pass


class Normalize(_Callable):
    pass


class ToImage(_Callable):
    pass


class ToDtype(_Callable):
    pass
