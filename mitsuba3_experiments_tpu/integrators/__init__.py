from .common import (  # noqa: F401
    make_integrator,
    mis_weight,
    register_integrator,
    render,
    render_pass,
)
from .path import PathIntegrator  # noqa: F401
from .simple import SimpleIntegrator  # noqa: F401
from .restir import RestirGI  # noqa: F401
from .pssmlt import Pssmlt  # noqa: F401
from .bdpt import BDPTIntegrator  # noqa: F401
from .sppm import SPPM  # noqa: F401
from .ptracer import ParticleTracer  # noqa: F401
from . import metropolis  # noqa: F401
from .spectral import SpectralIntegrator, render_spectral  # noqa: F401
