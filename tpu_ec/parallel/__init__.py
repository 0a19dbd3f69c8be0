from .mesh import AXIS, make_mesh, replicated, shard_leading
from .ntt_dist import DistFftKernel
from .msm_dist import DistMultiexpKernel

__all__ = [
    "AXIS",
    "make_mesh",
    "replicated",
    "shard_leading",
    "DistFftKernel",
    "DistMultiexpKernel",
]
