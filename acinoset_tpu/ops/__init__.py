from . import rotations, camera, losses  # noqa: F401
