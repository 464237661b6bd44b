from .labels import LabelManager
from .plans import PlansManager, ConfigurationManager

__all__ = ["LabelManager", "PlansManager", "ConfigurationManager"]
