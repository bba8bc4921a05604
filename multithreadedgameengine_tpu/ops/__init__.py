from . import physics, spatial  # noqa: F401
