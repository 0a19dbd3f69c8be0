"""KZG/AMT-style commit pipeline: NTT + MSM composed on device.

This is the workload the reference fork exists for (`ag-cuda-ec/benches/
amt.rs`: AMT = amortized KZG openings driven by EC-FFTs and batch MSMs over
an SRS).  The pipeline here is the polynomial-commit step:

    evals  = NTT(coeffs)                  (ec-gpu-proxy/src/fft.rs path)
    commit = MSM(basis_points, evals)     (ec-gpu-proxy/src/multiexp.rs path)

``coeffs`` are Fr elements in Montgomery form (the library's working
representation); MSM digit extraction needs plain-integer scalars
(multiexp.rs:152-153's to_repr), so the pipeline converts with one
``from_mont`` pass between the stages — all on device, no host round trip.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..curves.params import CurveSpec
from ..curves.point import point_ops
from ..fields.fp import field_ops
from .msm import MultiexpKernel
from .ntt import FftKernel


class CommitPipeline:
    """NTT -> from_mont -> MSM against a fixed point table (SRS analog)."""

    def __init__(self, spec: CurveSpec, maybe_abort=None):
        self.spec = spec
        self.ops = point_ops(spec)
        self.fr = field_ops(spec.scalar)
        self.fft = FftKernel(spec.scalar, maybe_abort=maybe_abort)
        self.msm = MultiexpKernel(spec, maybe_abort=maybe_abort)

    def commit(self, coeffs: jnp.ndarray, basis):
        """coeffs: (n, Ls) Fr Montgomery limbs; basis: affine pytree batch of
        n G1/G2 points.  Returns (evals (n, Ls) Montgomery, commitment
        Jacobian batch (1,))."""
        evals = self.fft.radix_fft(coeffs)
        scalars = self.fr.from_mont(evals)  # plain ints for digit extraction
        commitment = self.msm.multiexp(basis, scalars)
        return evals, commitment

    def commit_coefficient_basis(self, coeffs: jnp.ndarray, srs):
        """Commit in the coefficient basis (plain KZG: C = sum c_i [tau^i]G)
        — no NTT, one conversion + MSM."""
        scalars = self.fr.from_mont(coeffs)
        return self.msm.multiexp(srs, scalars)

    def commit_sparse(self, coeffs: jnp.ndarray, basis, density, skip: int = 0):
        """R1CS-style sparse commit: drop bases whose scalars are
        structurally zero before dispatch (the reference prover's
        DensityTracker path, ec-gpu-proxy/src/multiexp_cpu.rs:85-207 +
        the (bases, skip) Source convention :16-83).  ``density`` is a
        DensityTracker/FullDensity over the coefficient slots; the mask
        compacts (bases, scalars) once and the dense remainder runs
        through the normal engine — sparsity as a pre-pass, not a
        per-element branch."""
        from .density import compact_by_density

        scalars = self.fr.from_mont(coeffs)
        b, s = compact_by_density(density, basis, scalars, skip=skip)
        return self.msm.multiexp(b, s)
