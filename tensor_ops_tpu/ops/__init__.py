from . import inspect, ir, prim, shapes, vfunc
from .inspect import describe, graph_stats
from .ir import TOp
from .shapes import Shape, ShapeError, Stack
