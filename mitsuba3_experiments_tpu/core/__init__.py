from . import (  # noqa: F401
    distributions,
    math,
    records,
    rng,
    sh,
    spectrum,
    struct,
    warp,
)
