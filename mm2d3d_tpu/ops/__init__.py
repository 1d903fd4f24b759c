from . import keys, voxelize, hierarchy, spconv  # noqa: F401
