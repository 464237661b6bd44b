"""Reader/writer registry (ref distillation/nnunetv2/imageio/reader_writer_registry.py:23-76):
resolution order is dataset.json 'overwrite_image_reader_writer', then file ending."""
from typing import Optional, Type

from .base import BaseReaderWriter
from .natural_image import NaturalImage2DIO
from .nifti import (NibabelIO, NibabelIOWithReorient, NiftiIO,
                    NiftiIOWithReorient, SimpleITKIO, SimpleITKIOWithReorient)
from .nrrd import NrrdIO
from .mha import MhaIO
from .tiff import Tiff3DIO
from .dicom import DicomIO

_ALL_RW = [NiftiIO, SimpleITKIO, NibabelIO, NiftiIOWithReorient,
           SimpleITKIOWithReorient, NibabelIOWithReorient, NaturalImage2DIO,
           NrrdIO, MhaIO, Tiff3DIO, DicomIO]
_BY_NAME = {cls.__name__: cls for cls in _ALL_RW}


def find_reader_writer_by_name(name: str) -> Type[BaseReaderWriter]:
    if name not in _BY_NAME:
        raise KeyError(f"Unknown reader/writer '{name}'. Known: {sorted(_BY_NAME)}")
    return _BY_NAME[name]


def determine_reader_writer_from_file_ending(file_ending: str,
                                             allow_nonmatching: bool = False
                                             ) -> Type[BaseReaderWriter]:
    fe = file_ending.lower()
    if not fe.startswith("."):
        fe = "." + fe
    for cls in (NiftiIO, NrrdIO, MhaIO, Tiff3DIO, NaturalImage2DIO, DicomIO):
        if fe in cls.supported_file_endings or (
                fe == ".gz" and ".nii.gz" in cls.supported_file_endings):
            return cls
    if allow_nonmatching:
        return NiftiIO
    raise RuntimeError(f"No reader/writer for file ending {file_ending}")


def determine_reader_writer_from_dataset_json(dataset_json: dict,
                                              example_file: Optional[str] = None
                                              ) -> Type[BaseReaderWriter]:
    name = dataset_json.get("overwrite_image_reader_writer")
    if name is not None and name != "None":
        if name in _BY_NAME:
            return _BY_NAME[name]
    fe = dataset_json.get("file_ending")
    if fe is None and example_file is not None:
        fe = "." + ".".join(example_file.split(".")[1:])
    return determine_reader_writer_from_file_ending(fe)
