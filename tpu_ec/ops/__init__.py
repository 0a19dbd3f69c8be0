from . import ntt, ec_fft, msm, density

__all__ = ["ntt", "ec_fft", "msm", "density"]
