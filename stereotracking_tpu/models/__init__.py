from . import kalman  # noqa: F401
