from . import math, warp, rng, struct, records, distributions, sh  # noqa: F401
