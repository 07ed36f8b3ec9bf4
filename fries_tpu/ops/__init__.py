from . import molecule  # noqa: F401
