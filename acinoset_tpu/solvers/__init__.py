from . import banded, ekf, lm, trajopt  # noqa: F401
