from .topology import get_pool_and_conv_props
from .planner import ExperimentPlanner
from .fingerprint import DatasetFingerprintExtractor

__all__ = ["get_pool_and_conv_props", "ExperimentPlanner", "DatasetFingerprintExtractor"]
