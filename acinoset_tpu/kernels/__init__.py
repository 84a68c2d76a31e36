from . import banded_pallas  # noqa: F401
