from . import kkt, linalg  # noqa: F401
