"""Synthetic data helpers (re-exported from the package for tests)."""
from acinoset_tpu.utils.synthetic import (  # noqa: F401
    cheetah_gallop,
    render_measurements,
    ring_cameras,
)
