from . import cheetah, skeleton  # noqa: F401
