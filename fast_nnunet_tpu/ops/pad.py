"""Padding / patch extraction helpers (acvl_utils pad_nd_image / crop_and_pad_nd
equivalents used throughout training and inference)."""
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np


def pad_nd_image(image: np.ndarray, new_shape: Optional[Sequence[int]] = None,
                 mode: str = "constant", kwargs: dict = None,
                 return_slicer: bool = False,
                 shape_must_be_divisible_by: Union[int, Sequence[int], None] = None):
    """Pad the trailing len(new_shape) axes of `image` up to new_shape (and/or to a
    multiple of shape_must_be_divisible_by), centered padding with the extra voxel
    going to the back — identical convention to the reference's pad_nd_image so
    sliding-window grids and revert slicers match."""
    kwargs = kwargs or {}
    old_shape = np.array(image.shape)

    if shape_must_be_divisible_by is not None:
        if np.isscalar(shape_must_be_divisible_by):
            shape_must_be_divisible_by = [shape_must_be_divisible_by] * image.ndim
        else:
            if len(shape_must_be_divisible_by) < image.ndim:
                shape_must_be_divisible_by = \
                    [1] * (image.ndim - len(shape_must_be_divisible_by)) + \
                    list(shape_must_be_divisible_by)

    if new_shape is None:
        assert shape_must_be_divisible_by is not None
        new_shape = image.shape

    if len(new_shape) < image.ndim:
        new_shape = list(image.shape[:image.ndim - len(new_shape)]) + list(new_shape)

    new_shape = [max(new_shape[i], old_shape[i]) for i in range(image.ndim)]

    if shape_must_be_divisible_by is not None:
        new_shape = [
            new_shape[i] + shape_must_be_divisible_by[i] - new_shape[i] % shape_must_be_divisible_by[i]
            if new_shape[i] % shape_must_be_divisible_by[i] != 0 else new_shape[i]
            for i in range(image.ndim)]

    difference = np.array(new_shape) - old_shape
    pad_below = difference // 2
    pad_above = difference // 2 + difference % 2
    pad_list = [list(i) for i in zip(pad_below, pad_above)]

    if not all(b == 0 and a == 0 for b, a in pad_list):
        res = np.pad(image, pad_list, mode, **kwargs)
    else:
        res = image

    if not return_slicer:
        return res
    pad_arr = np.array(pad_list)
    pad_arr[:, 1] = np.array(res.shape) - pad_arr[:, 1]
    slicer = tuple(slice(*i) for i in pad_arr)
    return res, slicer


def crop_and_pad_nd(image: np.ndarray, bbox: List[List[int]], pad_value=0) -> np.ndarray:
    """Extract bbox (may exceed image bounds) from the trailing axes of image,
    zero-padding out-of-bounds regions (acvl_utils crop_and_pad_nd equivalent;
    the patch sampler relies on this for border patches)."""
    n_lead = image.ndim - len(bbox)
    out_shape = list(image.shape[:n_lead]) + [b[1] - b[0] for b in bbox]
    out = np.full(out_shape, pad_value, dtype=image.dtype)

    img_slices, out_slices = [], []
    for ax, (lo, hi) in enumerate(bbox):
        size = image.shape[n_lead + ax]
        img_lo, img_hi = max(lo, 0), min(hi, size)
        if img_lo >= img_hi:
            return out  # bbox entirely outside
        img_slices.append(slice(img_lo, img_hi))
        out_slices.append(slice(img_lo - lo, img_hi - lo))
    full_img = (slice(None),) * n_lead + tuple(img_slices)
    full_out = (slice(None),) * n_lead + tuple(out_slices)
    out[full_out] = image[full_img]
    return out
