from . import label_session, skeleton_builder  # noqa: F401
