from .meshdata import MeshArrays, round_up_bucket
from . import curvature, normals
