from .mesh import AXIS, make_mesh, replicated, shard_leading
from .ntt_dist import DistFftKernel
from .msm_dist import DistMultiexpKernel
from .ec_fft_dist import DistEcFftKernel

__all__ = [
    "AXIS",
    "make_mesh",
    "replicated",
    "shard_leading",
    "DistFftKernel",
    "DistMultiexpKernel",
    "DistEcFftKernel",
]
