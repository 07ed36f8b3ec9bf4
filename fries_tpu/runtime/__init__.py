from . import arena  # noqa: F401
