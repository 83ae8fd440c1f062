from . import geo, scalar  # noqa: F401
