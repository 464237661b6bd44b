"""Crop-to-nonzero (ref: distillation/nnunetv2/preprocessing/cropping/cropping.py:6-41)."""
from typing import List, Tuple

import numpy as np
from scipy.ndimage import binary_fill_holes


def create_nonzero_mask(data: np.ndarray) -> np.ndarray:
    """(c, x, y, z) or (c, x, y) -> bool mask, OR over channels, holes filled."""
    assert data.ndim in (3, 4), "data must have shape (C, X, Y, Z) or (C, X, Y)"
    nonzero_mask = (data != 0).any(axis=0)
    return binary_fill_holes(nonzero_mask)


def get_bbox_from_mask(mask: np.ndarray) -> List[List[int]]:
    """Per-axis [min, max) bounding box of True voxels (acvl_utils equivalent)."""
    axes = list(range(mask.ndim))
    bbox = []
    for ax in axes:
        other = tuple(a for a in axes if a != ax)
        any_along = mask.any(axis=other)
        nz = np.where(any_along)[0]
        if len(nz) == 0:
            bbox.append([0, mask.shape[ax]])
        else:
            bbox.append([int(nz[0]), int(nz[-1]) + 1])
    return bbox


def bounding_box_to_slice(bbox: List[List[int]]) -> Tuple[slice, ...]:
    return tuple(slice(b[0], b[1]) for b in bbox)


def crop_to_bbox(array: np.ndarray, bbox: List[List[int]]) -> np.ndarray:
    return array[bounding_box_to_slice(bbox)]


def insert_crop_into_image(image: np.ndarray, crop: np.ndarray,
                           bbox: List[List[int]]) -> np.ndarray:
    """Inverse of crop_to_bbox over the trailing len(bbox) axes (acvl_utils
    equivalent used by export; supports bbox partially outside the image)."""
    n_lead = image.ndim - len(bbox)
    img_slices, crop_slices = [], []
    for ax, (lo, hi) in enumerate(bbox):
        size = image.shape[n_lead + ax]
        img_lo, img_hi = max(lo, 0), min(hi, size)
        img_slices.append(slice(img_lo, img_hi))
        crop_slices.append(slice(img_lo - lo, (img_hi - lo)))
    full_img = (slice(None),) * n_lead + tuple(img_slices)
    full_crop = (slice(None),) * n_lead + tuple(crop_slices)
    image[full_img] = crop[full_crop]
    return image


def crop_to_nonzero(data: np.ndarray, seg: np.ndarray = None, nonzero_label: int = -1):
    """Crop data (c,x,y,z) to its nonzero bbox; voxels outside the nonzero mask are
    labeled ``nonzero_label`` in seg (used later for masked normalization and the
    ignore-aware loss). Returns (data, seg, bbox)."""
    nonzero_mask = create_nonzero_mask(data)
    bbox = get_bbox_from_mask(nonzero_mask)
    sl = bounding_box_to_slice(bbox)
    nonzero_mask = nonzero_mask[sl][None]

    slicer = (slice(None),) + sl
    data = data[slicer]
    if seg is not None:
        seg = seg[slicer]
        seg[(seg == 0) & (~nonzero_mask)] = nonzero_label
    else:
        seg = np.where(nonzero_mask, np.int8(0), np.int8(nonzero_label))
    return data, seg, bbox
