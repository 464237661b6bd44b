"""Reader/writer interface (ref distillation/nnunetv2/imageio/base_reader_writer.py:21-106).

Contract: read_images(list_of_files) -> (data (C, X, Y, Z) float32, properties);
read_seg(file) -> (seg (1, X, Y, Z), properties); write_seg(seg (X, Y, Z), fname,
properties) restores the original geometry. The spatial axis order matches the
reference's SimpleITK convention (array axes are the reverse of the on-disk
i,j,k order, spacing likewise reversed) so fingerprints/plans are interchangeable.
"""
from abc import ABC, abstractmethod
from typing import List, Sequence, Tuple, Union

import numpy as np


class BaseReaderWriter(ABC):
    supported_file_endings: List[str] = []

    @staticmethod
    def _check_all_same(input_list) -> bool:
        first = input_list[0]
        return all(len(i) == len(first) and np.allclose(i, first) for i in input_list)

    @abstractmethod
    def read_images(self, image_fnames: Sequence[str]) -> Tuple[np.ndarray, dict]:
        ...

    @abstractmethod
    def read_seg(self, seg_fname: str) -> Tuple[np.ndarray, dict]:
        ...

    @abstractmethod
    def write_seg(self, seg: np.ndarray, output_fname: str, properties: dict) -> None:
        ...
