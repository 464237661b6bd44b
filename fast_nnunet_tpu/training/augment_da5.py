"""DA5 strong augmentation for small datasets.

Capability parity with nnUNetTrainerDA5 (ref distillation/nnunetv2/training/
nnUNetTrainer/variants/data_augmentation/nnUNetTrainerDA5.py:39-911): on top of
the default pipeline it raises the geometric aggressiveness (scale (0.7, 1.43),
higher transform probabilities) and adds rot90, axis transposition, median
filtering, sharpening, blank rectangles and local (inhomogeneous) gamma.
Adds +10-15% training time for +2-5% robustness on <100-case datasets
(docs/Distillation.md:294-299).
"""
from typing import Optional, Tuple

import numpy as np
from scipy.ndimage import gaussian_filter, median_filter

from .augment import (TrainingAugmenter, contrast_augment, downsample_seg_for_ds,
                      convert_labels_to_regions, gamma_augment, gaussian_blur,
                      gaussian_noise, mask_image, mirror_augment,
                      multiplicative_brightness, simulate_low_resolution,
                      spatial_augment)


def rot90_augment(data, seg, rng, p: float = 0.2):
    """Random 90-degree rotation in a random isotropic plane (only applied to
    axis pairs of equal extent so shapes are preserved)."""
    if rng.uniform() >= p:
        return data, seg
    spatial = data.shape[1:]
    pairs = [(a, b) for a in range(len(spatial)) for b in range(a + 1, len(spatial))
             if spatial[a] == spatial[b]]
    if not pairs:
        return data, seg
    a, b = pairs[rng.randint(len(pairs))]
    k = rng.randint(1, 4)
    data = np.rot90(data, k, axes=(a + 1, b + 1))
    seg = np.rot90(seg, k, axes=(a + 1, b + 1))
    return np.ascontiguousarray(data), np.ascontiguousarray(seg)


def transpose_axes_augment(data, seg, rng, p: float = 0.2):
    """Random permutation of equal-extent spatial axes."""
    if rng.uniform() >= p:
        return data, seg
    spatial = data.shape[1:]
    groups = {}
    for i, s in enumerate(spatial):
        groups.setdefault(s, []).append(i)
    perm = list(range(len(spatial)))
    for axes in groups.values():
        if len(axes) > 1:
            shuffled = list(axes)
            rng.shuffle(shuffled)
            for src, dst in zip(axes, shuffled):
                perm[src] = dst
    order = [0] + [p_ + 1 for p_ in perm]
    return (np.ascontiguousarray(data.transpose(order)),
            np.ascontiguousarray(seg.transpose(order)))


def median_filter_augment(data, rng, p: float = 0.2, p_per_channel: float = 0.5):
    if rng.uniform() < p:
        for c in range(data.shape[0]):
            if rng.uniform() < p_per_channel:
                data[c] = median_filter(data[c], size=rng.randint(2, 4))
    return data


def sharpening_augment(data, rng, p: float = 0.2, strength=(0.1, 1.0)):
    """Unsharp masking: img + s * (img - blur(img))."""
    if rng.uniform() < p:
        s = rng.uniform(*strength)
        for c in range(data.shape[0]):
            blurred = gaussian_filter(data[c], 1.0)
            data[c] = data[c] + s * (data[c] - blurred)
    return data


def blank_rectangles_augment(data, rng, p: float = 0.2, n_rect=(1, 4),
                             rect_frac=(0.05, 0.25)):
    """Zero (well: set to mean) random rectangles — occlusion robustness."""
    if rng.uniform() >= p:
        return data
    spatial = data.shape[1:]
    for _ in range(rng.randint(n_rect[0], n_rect[1] + 1)):
        lows, highs = [], []
        for s in spatial:
            ext = max(1, int(s * rng.uniform(*rect_frac)))
            lo = rng.randint(0, max(1, s - ext))
            lows.append(lo)
            highs.append(lo + ext)
        sl = tuple(slice(l, h) for l, h in zip(lows, highs))
        for c in range(data.shape[0]):
            data[(c,) + sl] = data[c].mean()
    return data


def local_gamma_augment(data, rng, p: float = 0.2, gamma_range=(0.5, 2.0)):
    """Spatially varying gamma via a smooth random field."""
    if rng.uniform() >= p:
        return data
    spatial = data.shape[1:]
    field = rng.rand(*[max(2, s // 8) for s in spatial]).astype(np.float32)
    from .augment import _nearest_resize
    from ..ops.resampling import skimage_resize
    field = skimage_resize(field, spatial, order=1, clip=False)
    g_lo, g_hi = gamma_range
    gamma_map = g_lo + (g_hi - g_lo) * (field - field.min()) / \
        max(field.max() - field.min(), 1e-7)
    for c in range(data.shape[0]):
        img = data[c]
        mn, rng_ = img.min(), img.max() - img.min()
        norm = (img - mn) / max(rng_, 1e-7)
        data[c] = np.power(norm, gamma_map) * max(rng_, 1e-7) + mn
    return data


class DA5TrainingAugmenter(TrainingAugmenter):
    SCALE_RANGE = (0.7, 1.43)

    def __call__(self, data: np.ndarray, seg: np.ndarray, rng: np.random.RandomState):
        data = np.ascontiguousarray(data, dtype=np.float32)
        seg = np.ascontiguousarray(seg)
        data, seg = spatial_augment(data, seg, self.patch_size, self.rotation_range,
                                    rng, p_rotation=0.4, p_scaling=0.4,
                                    scale_range=self.SCALE_RANGE,
                                    dummy_2d=self.dummy_2d)
        data, seg = rot90_augment(data, seg, rng)
        data, seg = transpose_axes_augment(data, seg, rng)
        data = gaussian_noise(data, rng, p=0.15)
        data = gaussian_blur(data, rng, p=0.25)
        data = median_filter_augment(data, rng)
        data = sharpening_augment(data, rng)
        data = multiplicative_brightness(data, rng, p=0.2)
        data = contrast_augment(data, rng, p=0.2)
        data = simulate_low_resolution(data, rng, p=0.3)
        data = gamma_augment(data, rng, p=0.15, invert_image=True)
        data = gamma_augment(data, rng, p=0.35, invert_image=False)
        data = local_gamma_augment(data, rng)
        data = blank_rectangles_augment(data, rng)
        if self.mirror_axes:
            data, seg = mirror_augment(data, seg, rng, self.mirror_axes)
        if self.use_mask_for_norm is not None and any(self.use_mask_for_norm):
            data = mask_image(data, seg, self.use_mask_for_norm)
        seg = seg.copy()
        seg[seg == -1] = 0
        if self.regions is not None:
            seg = convert_labels_to_regions(seg, self.regions, self.ignore_label)
        targets = downsample_seg_for_ds(seg, self.ds_scales) \
            if self.ds_scales is not None else [seg]
        return data, targets
