from .server import GARServer  # noqa: F401
