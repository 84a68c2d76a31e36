from . import corners, extrinsics, intrinsics, pnp  # noqa: F401
