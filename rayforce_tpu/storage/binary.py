"""Blob/vector file persistence stubs (filled in storage stage)."""
from ..core.errors import RayError


def set_path(path, obj):
    raise RayError("nyi", "set to path not yet implemented")


def get_path(path):
    raise RayError("nyi", "get from path not yet implemented")
