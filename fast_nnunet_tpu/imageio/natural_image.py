"""2D natural-image I/O (png/bmp/jpg) via PIL (ref distillation/nnunetv2/imageio/
natural_image_reader_writer.py). Convention: each channel file is 2D (or RGB ->
3 channels); arrays are returned (C, 1, X, Y) with spacing (999, 1, 1) like the
reference so the planner treats the data as 2D."""
from typing import Sequence, Tuple

import numpy as np

from .base import BaseReaderWriter


class NaturalImage2DIO(BaseReaderWriter):
    supported_file_endings = [".png", ".bmp", ".tif", ".jpg", ".jpeg"]

    def read_images(self, image_fnames: Sequence[str]) -> Tuple[np.ndarray, dict]:
        from PIL import Image
        images = []
        for f in image_fnames:
            arr = np.asarray(Image.open(f))
            if arr.ndim == 3:  # RGB(A): channels first
                images.extend(arr[..., c] for c in range(arr.shape[-1]))
            else:
                images.append(arr)
        if not self._check_all_same([i.shape for i in images]):
            raise RuntimeError(f"Inconsistent shapes: {[i.shape for i in images]}")
        data = np.stack(images)[:, None].astype(np.float32)  # (C, 1, X, Y)
        return data, {"spacing": (999.0, 1.0, 1.0)}

    def read_seg(self, seg_fname: str) -> Tuple[np.ndarray, dict]:
        return self.read_images([seg_fname])

    def write_seg(self, seg: np.ndarray, output_fname: str, properties: dict) -> None:
        from PIL import Image
        seg = np.asarray(seg)
        if seg.ndim == 3:
            assert seg.shape[0] == 1
            seg = seg[0]
        Image.fromarray(seg.astype(np.uint8)).save(output_fname)
