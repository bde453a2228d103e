"""Property-based tests for image->token transforms (mirror of reference
tests/test_unfold.py, 674 LoC of hypothesis tests over the patchify/conv
equivalence incl. special float values, and reference transforms.py:15-102
FlexResize/Patchify semantics)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from PIL import Image

from saev_tpu.data import transforms


# ---------------------------------------------------------------------------
# unfolded_conv2d == torch.nn.functional.conv2d (stride = kernel, pad 0)
# ---------------------------------------------------------------------------


@st.composite
def conv_cases(draw):
    b = draw(st.integers(1, 3))
    c = draw(st.integers(1, 4))
    k = draw(st.sampled_from([1, 2, 3, 4, 7]))
    hp = draw(st.integers(1, 5))
    wp = draw(st.integers(1, 5))
    d_out = draw(st.integers(1, 8))
    return b, c, k, hp, wp, d_out


@given(conv_cases(), st.booleans(), st.randoms(use_true_random=False))
@settings(max_examples=30, deadline=None)
def test_unfolded_conv2d_matches_torch(case, with_bias, rnd):
    import torch
    import torch.nn.functional as F

    b, c, k, hp, wp, d_out = case
    rng = np.random.default_rng(rnd.randint(0, 2**31))
    x = rng.normal(size=(b, c, hp * k, wp * k)).astype(np.float32)
    w = rng.normal(size=(d_out, c, k, k)).astype(np.float32)
    bias = rng.normal(size=(d_out,)).astype(np.float32) if with_bias else None

    ours = transforms.unfolded_conv2d(x, w, bias)  # (B, L, D)

    ref = F.conv2d(
        torch.from_numpy(x), torch.from_numpy(w),
        torch.from_numpy(bias) if bias is not None else None,
        stride=k,
    )  # (B, D, hp, wp)
    ref = ref.permute(0, 2, 3, 1).reshape(b, hp * wp, d_out).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "special", [np.inf, -np.inf, np.nan, 0.0, -0.0, np.finfo(np.float32).tiny]
)
def test_unfolded_conv2d_special_values(special):
    """Special float values propagate identically to the dense conv
    (reference test_unfold.py covers inf/nan propagation)."""
    import torch
    import torch.nn.functional as F

    x = np.ones((1, 2, 4, 4), np.float32)
    x[0, 0, 0, 0] = special
    w = np.ones((3, 2, 2, 2), np.float32)
    ours = transforms.unfolded_conv2d(x, w)
    ref = (
        F.conv2d(torch.from_numpy(x), torch.from_numpy(w), stride=2)
        .permute(0, 2, 3, 1).reshape(1, 4, 3).numpy()
    )
    np.testing.assert_array_equal(np.isnan(ours), np.isnan(ref))
    mask = ~np.isnan(ref)
    np.testing.assert_allclose(ours[mask], ref[mask], rtol=1e-6)


# ---------------------------------------------------------------------------
# patchify: layout and inverse
# ---------------------------------------------------------------------------


@given(
    st.integers(1, 3), st.sampled_from([1, 2, 4]),
    st.integers(1, 4), st.integers(1, 4),
)
@settings(max_examples=30, deadline=None)
def test_patchify_token_order_and_inverse(c, p, hp, wp):
    """Token t = (row-major patch index), feature axis = (c, p1, p2) — the
    reference's einops `c (hp p1) (wp p2) -> (hp wp) (c p1 p2)`."""
    img = np.arange(c * hp * p * wp * p, dtype=np.float32).reshape(c, hp * p, wp * p)
    tokens, grid = transforms.patchify(img, p)
    assert tokens.shape == (hp * wp, c * p * p)
    assert tuple(grid) == (hp, wp)

    # Reconstruct the image from tokens; must round-trip exactly.
    rec = (
        tokens.reshape(hp, wp, c, p, p)
        .transpose(2, 0, 3, 1, 4)
        .reshape(c, hp * p, wp * p)
    )
    np.testing.assert_array_equal(rec, img)

    # Single spot check of the exact order: token (i,j), feature (ch, y, x).
    i, j = hp - 1, wp - 1
    np.testing.assert_array_equal(
        tokens[i * wp + j].reshape(c, p, p),
        img[:, i * p : (i + 1) * p, j * p : (j + 1) * p],
    )


def test_patchify_rejects_nondivisible():
    with pytest.raises(AssertionError):
        transforms.patchify(np.zeros((3, 10, 8), np.float32), 4)


# ---------------------------------------------------------------------------
# FlexResize / resize_to_patch_grid
# ---------------------------------------------------------------------------


@given(
    st.integers(8, 400), st.integers(8, 400),
    st.sampled_from([2, 4, 14, 16]),
    st.sampled_from([16, 64, 196, 256, 12]),
)
@settings(max_examples=40, deadline=None)
def test_resize_to_patch_grid_properties(w0, h0, p, n):
    img = Image.new("RGB", (w0, h0))
    out = transforms.resize_to_patch_grid(img, p=p, n=n)
    w, h = out.size
    assert w % p == 0 and h % p == 0
    assert (w // p) * (h // p) == n


def test_resize_to_patch_grid_minimizes_distortion():
    # 2:1 aspect with n=8 patches: best grid is 4x2 (aspect 2.0), not 8x1 or 2x4.
    img = Image.new("RGB", (200, 100))
    out = transforms.resize_to_patch_grid(img, p=10, n=8)
    assert out.size == (40, 20)


def test_flex_resize_rejects_non_image():
    with pytest.raises(TypeError):
        transforms.FlexResize(4, 16)(np.zeros((3, 8, 8)))


# ---------------------------------------------------------------------------
# to_chw_float normalization
# ---------------------------------------------------------------------------


def test_to_chw_float_grayscale_and_norm():
    img = Image.new("L", (4, 4), color=128)
    arr = transforms.to_chw_float(img, mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25))
    assert arr.shape == (3, 4, 4)
    expected = np.full((3, 4, 4), (128 / 255 - 0.5) / 0.25, np.float32)
    np.testing.assert_allclose(arr, expected, atol=1e-5)


# ---------------------------------------------------------------------------
# families._resize_center_crop: torchvision Resize(int)+CenterCrop semantics
# (torchvision itself is not in the image; assert the documented behavior)
# ---------------------------------------------------------------------------


def test_resize_center_crop_shortest_edge():
    from saev_tpu.models.families import _resize_center_crop

    # 640x480 (w x h): the short edge (h) scales to 256, so the resized image
    # is 341x256 (aspect preserved), then a 224 center crop.
    img = Image.new("RGB", (640, 480))
    out = _resize_center_crop(img, 256, 224)
    assert out.size == (224, 224)

    # Aspect must be preserved before the crop: a tall image keeps its width
    # at `resize` and scales height up.
    tall = Image.effect_noise((100, 400), 64).convert("RGB")
    resized = _resize_center_crop(tall, 256, 256)
    assert resized.size == (256, 256)

    # Content check: a horizontally-split image (left black, right white)
    # center-cropped from a wide source must contain both halves, not a
    # squashed full image. With squash mode the crop has the same structure,
    # so check the scale instead: a 400x100 image (wide) resized shortest-edge
    # to 100 keeps width 400 -> crop picks the CENTER 100 columns.
    import numpy as np

    wide = np.zeros((100, 400, 3), np.uint8)
    wide[:, :200] = 0
    wide[:, 200:] = 255
    out = _resize_center_crop(Image.fromarray(wide), 100, 100)
    arr = np.asarray(out)
    # Center crop straddles the black/white boundary: half dark, half light.
    assert (arr[:, :49] < 128).all()
    assert (arr[:, 51:] >= 128).all()


def test_resize_center_crop_squash():
    from saev_tpu.models.families import _resize_center_crop

    img = Image.new("RGB", (640, 480))
    out = _resize_center_crop(img, 256, 256, mode="squash")
    assert out.size == (256, 256)
