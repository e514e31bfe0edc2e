"""BabyBear base field + quartic extension, vectorized for TPU, plus the
host NumPy oracle used for differential testing."""

from . import babybear, ext, oracle  # noqa: F401
from .babybear import P, get_root_of_unity  # noqa: F401
