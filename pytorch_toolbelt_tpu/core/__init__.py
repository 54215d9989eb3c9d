from .interfaces import FeatureMapsSpec, FeatureMapsSpecification
from .support import toolbelt_deprecated, DeprecationError

__all__ = [
    "FeatureMapsSpec",
    "FeatureMapsSpecification",
    "toolbelt_deprecated",
    "DeprecationError",
]
