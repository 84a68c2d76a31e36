from . import banded, ekf, lm  # noqa: F401
