from . import cellmath  # noqa: F401
