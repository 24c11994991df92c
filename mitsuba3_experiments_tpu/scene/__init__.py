from .types import (  # noqa: F401
    BSDFKind,
    BVH,
    Camera,
    EmitterTable,
    Geometry,
    MaterialTable,
    Scene,
    TextureAtlas,
)
from .build import load_dict  # noqa: F401
from .cornell import cornell_box  # noqa: F401
from .bvh import build_bvh  # noqa: F401
from .params import traverse, update  # noqa: F401
