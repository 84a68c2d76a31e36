from . import app, corners, extrinsics, intrinsics, pnp  # noqa: F401
