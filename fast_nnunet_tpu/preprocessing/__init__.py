from .preprocessor import DefaultPreprocessor

__all__ = ["DefaultPreprocessor"]
