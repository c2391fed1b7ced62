"""Multi-chip scaling: meshes, sharded batch encode, collectives."""

from .mesh import make_mesh
from .batch import device_encode_uniform, sharded_encode_step

__all__ = ["make_mesh", "device_encode_uniform", "sharded_encode_step"]
