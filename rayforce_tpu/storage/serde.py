"""Wire/disk serde stubs (filled in storage stage)."""
from ..core.errors import RayError


def ser_obj(o):
    raise RayError("nyi", "ser not yet implemented")


def de_obj(o):
    raise RayError("nyi", "de not yet implemented")
