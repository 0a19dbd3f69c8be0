from . import mont, ntt

__all__ = ["mont", "ntt"]
