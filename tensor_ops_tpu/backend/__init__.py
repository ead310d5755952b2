from .base import (Backend, CustomDistribution, Distribution, beta,
                   custom, exponential, gamma, normal, uniform)
from .jax_backend import JaxBackend
from .numpy_backend import NumpyBackend
