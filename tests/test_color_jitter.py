"""Color-jitter fidelity tests for the contrastive second view.

The reference augments the second crop with torchvision
RandomApply([ColorJitter(0.4, 0.4, 0.4, 0.1)], p=0.8) (reference
dataloader.py:45-49).  torchvision is not installed here, so the HSV hue
rotation is checked per-pixel against colorsys (the same math torchvision's
tensor path implements) and the blend ops against their closed forms.
"""

import colorsys

import numpy as np

from scene_graph_commonsense_tpu.data.dataset import (
    _hsv_to_rgb, _rgb_to_hsv, adjust_hue, color_jitter)


def test_rgb_hsv_roundtrip_matches_colorsys():
    rng = np.random.default_rng(0)
    rgb = rng.random((64, 3)).astype(np.float64)
    h, s, v = _rgb_to_hsv(rgb)
    for i in range(len(rgb)):
        eh, es, ev = colorsys.rgb_to_hsv(*rgb[i])
        assert abs(h[i] - eh) < 1e-6
        assert abs(s[i] - es) < 1e-6
        assert abs(v[i] - ev) < 1e-6
    back = _hsv_to_rgb(h, s, v)
    np.testing.assert_allclose(back, rgb, atol=1e-6)


def test_adjust_hue_matches_colorsys_rotation():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (5, 7, 3))
    for factor in (-0.1, 0.04, 0.37, -0.5):
        got = adjust_hue(img, factor)
        flat = img.reshape(-1, 3) / 255.0
        want = np.empty_like(flat)
        for i, (r, g, b) in enumerate(flat):
            h, s, v = colorsys.rgb_to_hsv(r, g, b)
            want[i] = colorsys.hsv_to_rgb((h + factor) % 1.0, s, v)
        np.testing.assert_allclose(got.reshape(-1, 3), want * 255.0,
                                   atol=1e-4)


def test_adjust_hue_zero_is_identity_and_preserves_gray():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, (4, 4, 3))
    np.testing.assert_allclose(adjust_hue(img, 0.0), img, atol=1e-4)
    gray = np.full((3, 3, 3), 87.0)
    # gray pixels have no chroma: any hue rotation leaves them unchanged
    np.testing.assert_allclose(adjust_hue(gray, 0.23), gray, atol=1e-4)


def test_color_jitter_randapply_skip_probability():
    img = np.full((2, 2, 3), 100.0, np.float32)
    rng = np.random.default_rng(3)
    skipped = sum(
        np.array_equal(color_jitter(rng, img), img) for _ in range(400))
    # RandomApply p=0.8 -> ~20% identity (jitter of a flat gray image can
    # still change it via brightness/contrast, so identity => skipped)
    assert 40 <= skipped <= 140


def test_color_jitter_stays_in_range_and_varies():
    rng = np.random.default_rng(4)
    img = rng.uniform(0, 255, (8, 8, 3)).astype(np.float32)
    outs = [color_jitter(rng, img, p=1.0) for _ in range(10)]
    for out in outs:
        assert out.min() >= 0 and out.max() <= 255
        assert out.shape == img.shape
    # different draws give different images
    assert any(not np.array_equal(outs[0], o) for o in outs[1:])
