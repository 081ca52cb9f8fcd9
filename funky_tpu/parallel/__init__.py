from .mesh import make_mesh  # noqa: F401
from .sharded_frame import sharded_gltf_frame  # noqa: F401
