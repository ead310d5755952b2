from .base import Backend, Distribution, normal, uniform
from .jax_backend import JaxBackend
from .numpy_backend import NumpyBackend
