"""Native C++ runtime bindings (ctypes) — the framework's CPU-native layer.

The reference's CPU stack is native Rust (`ec-gpu-proxy/src/{fft_cpu,
ec_fft_cpu,multiexp_cpu,threadpool}.rs`); here it is C++
(`native/src/ec_native.cpp`) loaded via ctypes.  Compilation is lazy and
**content-addressed**: the .so filename embeds sha256(source + flags), the
same cache discipline as the reference's nvcc driver
(`ag-build/src/compile.rs:79-114`), so rebuilds happen only when the source
or flags change.  ``TPU_EC_NATIVE_BUILD_DIR`` overrides the cache directory
(the ``ARK_GPU_BUILD_DIR`` analog, compile.rs:20-33).

Roles: CPU fallback ops (`NativeField`/`NativeCurve` mirror FftKernel /
MultiexpKernel surfaces), fast differential-test oracle, and host-side batch
conversion helpers.  Thread count: explicit ``nthreads`` arg, else the
``TPU_EC_NUM_THREADS`` env (`EC_GPU_NUM_THREADS` parity, threadpool.rs:25-30).
"""

from __future__ import annotations

import ctypes
import functools
import hashlib
import os
import subprocess
import threading

import numpy as np

from ..errors import EcError
from ..fields.params import FieldSpec
from ..curves.params import CurveSpec

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "src", "ec_native.cpp")
_FLAGS = ["-O3", "-std=c++17", "-shared", "-fPIC", "-pthread"]

_lock = threading.Lock()
_lib = None
_lib_err: str | None = None


def _logger():
    from ..utils.log import get_logger

    return get_logger("tpu_ec.native")


def load_error() -> str | None:
    """Diagnostics from the last failed load attempt (None if loaded/untried)
    — the loader-error surface of ec-gpu-program's EcError (C17)."""
    return _lib_err


def _build_dir() -> str:
    from ..config import get_config

    d = get_config().native_build_dir
    if not d:
        d = os.path.join(os.path.dirname(os.path.abspath(_SRC)), "..", "build")
    d = os.path.abspath(d)
    os.makedirs(d, exist_ok=True)
    return d


def _compile() -> str:
    with open(os.path.abspath(_SRC), "rb") as f:
        src = f.read()
    digest = hashlib.sha256(src + " ".join(_FLAGS).encode()).hexdigest()[:16]
    out = os.path.join(_build_dir(), f"libec_native_{digest}.so")
    if not os.path.exists(out):
        tmp = out + f".tmp{os.getpid()}"
        subprocess.run(
            ["g++", *_FLAGS, os.path.abspath(_SRC), "-o", tmp],
            check=True, capture_output=True,
        )
        os.replace(tmp, out)  # atomic publish (concurrent builders race safely)
    return out


def _load():
    global _lib, _lib_err
    with _lock:
        if _lib is not None or _lib_err is not None:
            return _lib
        try:
            lib = ctypes.CDLL(_compile())
        except subprocess.CalledProcessError as e:
            # load diagnostics (C17 parity: the reference surfaces nvcc
            # stderr on kernel build failure, compile.rs:100-114)
            stderr = (e.stderr or b"").decode(errors="replace")[-2000:]
            _lib_err = (
                f"native library build failed (g++ exit {e.returncode}); "
                f"source={os.path.abspath(_SRC)}; stderr tail:\n{stderr}"
            )
            _logger().error(_lib_err)
            return None
        except (OSError, FileNotFoundError) as e:
            _lib_err = (
                f"native library unavailable: {e} "
                f"(build dir {_build_dir()}, source {os.path.abspath(_SRC)})"
            )
            _logger().error(_lib_err)
            return None
        u64p = ctypes.POINTER(ctypes.c_uint64)
        vp, i32, i64 = ctypes.c_void_p, ctypes.c_int, ctypes.c_long
        lib.ecn_version.restype = i32
        lib.ecn_field_new.restype = vp
        lib.ecn_field_new.argtypes = [u64p, i32]
        lib.ecn_field_free.argtypes = [vp]
        for name in ("ecn_field_mul", "ecn_field_add", "ecn_field_sub"):
            getattr(lib, name).argtypes = [vp, u64p, u64p, u64p, i64, i32]
        for name in ("ecn_field_neg", "ecn_field_sqr", "ecn_field_inv",
                     "ecn_field_to_mont", "ecn_field_from_mont"):
            getattr(lib, name).argtypes = [vp, u64p, u64p, i64, i32]
        lib.ecn_ntt.argtypes = [vp, u64p, i32, u64p, i32]
        lib.ecn_curve_new.restype = vp
        lib.ecn_curve_new.argtypes = [vp, vp, i32]
        lib.ecn_curve_free.argtypes = [vp]
        lib.ecn_ec_add.argtypes = [vp, u64p, u64p, u64p, i64, i32]
        for name in ("ecn_ec_double", "ecn_ec_to_affine", "ecn_ec_from_affine"):
            getattr(lib, name).argtypes = [vp, u64p, u64p, i64, i32]
        lib.ecn_ec_scalar_mul.argtypes = [vp, u64p, u64p, u64p, i64, i32]
        lib.ecn_msm.argtypes = [vp, u64p, u64p, i64, i32, i32, u64p]
        lib.ecn_ec_fft.argtypes = [vp, u64p, i32, u64p, i32]
        _lib = lib
        return _lib


def available() -> bool:
    """True if the native library can be built/loaded on this host."""
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def _as_u64(a: np.ndarray, words: int) -> np.ndarray:
    a = np.ascontiguousarray(a, dtype=np.uint64)
    assert a.shape[-1] == words, (a.shape, words)
    return a


def int_to_u64(value: int, words: int) -> np.ndarray:
    out = np.zeros(words, dtype=np.uint64)
    for i in range(words):
        out[i] = (value >> (64 * i)) & 0xFFFFFFFFFFFFFFFF
    if value >> (64 * words):
        raise ValueError("value does not fit")
    return out


def u64_to_int(limbs: np.ndarray) -> int:
    return sum(int(v) << (64 * i) for i, v in enumerate(limbs))


class NativeField:
    """Batched native field ops over (n, W64) u64 arrays, Montgomery form.

    W64 = 4 for 256-bit fields (Fr, BN254 Fq), 6 for BLS12-381 Fq — the
    native analog of the reference's Limb64 model (ag-build/src/source/limb.rs).
    """

    def __init__(self, spec: FieldSpec):
        lib = _load()
        if lib is None:
            raise EcError(_lib_err or "native library unavailable")
        self.lib = lib
        self.spec = spec
        self.w64 = -(-spec.modulus.bit_length() // 64)
        p = int_to_u64(spec.modulus, self.w64)
        self.handle = lib.ecn_field_new(_ptr(p), self.w64)
        if not self.handle:
            raise EcError(f"unsupported limb count {self.w64}")

    # -- conversions -------------------------------------------------------

    def from_ints(self, values, mont: bool = True) -> np.ndarray:
        out = np.zeros((len(values), self.w64), dtype=np.uint64)
        for i, v in enumerate(values):
            v = v % self.spec.modulus
            out[i] = int_to_u64(self.spec.to_mont(v) if mont else v, self.w64)
        return out

    def to_ints(self, a: np.ndarray, mont: bool = True) -> list:
        a = _as_u64(a, self.w64).reshape(-1, self.w64)
        return [
            self.spec.from_mont(u64_to_int(r)) if mont else u64_to_int(r)
            for r in a
        ]

    def from_halflimbs(self, a) -> np.ndarray:
        """(n, L) uint32 16-bit half-limbs (device layout) -> (n, w64) u64."""
        a = np.asarray(a, dtype=np.uint64).reshape(-1, self.spec.n_limbs)
        g = a.reshape(a.shape[0], self.w64, 4)
        shifts = np.uint64(16) * np.arange(4, dtype=np.uint64)
        return (g << shifts).sum(axis=-1, dtype=np.uint64)

    def to_halflimbs(self, a: np.ndarray) -> np.ndarray:
        a = _as_u64(a, self.w64).reshape(-1, self.w64)
        shifts = np.uint64(16) * np.arange(4, dtype=np.uint64)
        parts = (a[..., None] >> shifts) & np.uint64(0xFFFF)
        return parts.reshape(a.shape[0], self.spec.n_limbs).astype(np.uint32)

    # -- ops ----------------------------------------------------------------

    def _bin(self, fn, a, b, nthreads):
        a = _as_u64(a, self.w64)
        b = np.broadcast_to(_as_u64(b, self.w64), a.shape)
        b = np.ascontiguousarray(b)
        out = np.empty_like(a)
        n = a.size // self.w64
        fn(self.handle, _ptr(a), _ptr(b), _ptr(out), n, nthreads)
        return out

    def _un(self, fn, a, nthreads):
        a = _as_u64(a, self.w64)
        out = np.empty_like(a)
        fn(self.handle, _ptr(a), _ptr(out), a.size // self.w64, nthreads)
        return out

    def mul(self, a, b, nthreads: int = 0):
        return self._bin(self.lib.ecn_field_mul, a, b, nthreads)

    def add(self, a, b, nthreads: int = 0):
        return self._bin(self.lib.ecn_field_add, a, b, nthreads)

    def sub(self, a, b, nthreads: int = 0):
        return self._bin(self.lib.ecn_field_sub, a, b, nthreads)

    def neg(self, a, nthreads: int = 0):
        return self._un(self.lib.ecn_field_neg, a, nthreads)

    def sqr(self, a, nthreads: int = 0):
        return self._un(self.lib.ecn_field_sqr, a, nthreads)

    def inv_(self, a, nthreads: int = 0):
        return self._un(self.lib.ecn_field_inv, a, nthreads)

    def to_mont(self, a, nthreads: int = 0):
        return self._un(self.lib.ecn_field_to_mont, a, nthreads)

    def from_mont(self, a, nthreads: int = 0):
        return self._un(self.lib.ecn_field_from_mont, a, nthreads)

    def ntt(self, a: np.ndarray, inverse: bool = False, nthreads: int = 0) -> np.ndarray:
        """In-place-style NTT over (n, w64) Montgomery values; returns a new
        array.  Convention matches ops/ntt.py (ark Radix2EvaluationDomain)."""
        a = np.array(_as_u64(a, self.w64), copy=True)
        n = a.shape[0]
        log_n = n.bit_length() - 1
        assert 1 << log_n == n
        p = self.spec.modulus
        omega = pow(self.spec.root_of_unity, 1 << (self.spec.two_adicity - log_n), p)
        if inverse:
            omega = pow(omega, p - 2, p)
        om = int_to_u64(omega, self.w64)
        self.lib.ecn_ntt(self.handle, _ptr(a), log_n, _ptr(om), nthreads)
        if inverse:
            ninv = self.from_ints([pow(n, -1, p)])
            a = self.mul(a, ninv, nthreads)
        return a

    def __del__(self):
        lib, h = getattr(self, "lib", None), getattr(self, "handle", None)
        if lib is not None and h:
            lib.ecn_field_free(h)
            self.handle = None


class NativeCurve:
    """Native Jacobian EC ops / MSM / EC-FFT for one curve.

    Point layout: Jacobian (n, 3*W64*ext), affine (n, 2*W64*ext), u64
    Montgomery coordinates, (0,0)/z=0 identity (GpuRepr parity,
    ag-types/src/impls.rs:48-58).  Scalars (n, 4) plain u64.
    """

    def __init__(self, spec: CurveSpec):
        lib = _load()
        if lib is None:
            raise EcError(_lib_err or "native library unavailable")
        self.lib = lib
        self.spec = spec
        self.fq = NativeField(spec.base)
        self.fr = NativeField(spec.scalar)
        self.ext = spec.ext
        self.w = self.fq.w64 * spec.ext  # u64 words per coordinate
        self.handle = lib.ecn_curve_new(self.fq.handle, self.fr.handle, spec.ext)

    # -- conversions ---------------------------------------------------------

    def _coord_from_int(self, v) -> np.ndarray:
        """Plain coordinate (int | (c0, c1)) -> (w,) u64 Montgomery."""
        if self.ext == 1:
            return self.fq.from_ints([v])[0]
        return np.concatenate([self.fq.from_ints([v[0]])[0], self.fq.from_ints([v[1]])[0]])

    def _coord_to_int(self, limbs: np.ndarray):
        if self.ext == 1:
            return self.fq.to_ints(limbs[None, :])[0]
        h = self.fq.w64
        return (
            self.fq.to_ints(limbs[None, :h])[0],
            self.fq.to_ints(limbs[None, h:])[0],
        )

    def affine_from_points(self, points) -> np.ndarray:
        """List of oracle affine points (None = identity) -> (n, 2w) u64."""
        out = np.zeros((len(points), 2 * self.w), dtype=np.uint64)
        for i, pt in enumerate(points):
            if pt is None:
                continue
            out[i, : self.w] = self._coord_from_int(pt[0])
            out[i, self.w :] = self._coord_from_int(pt[1])
        return out

    def affine_to_points(self, aff: np.ndarray) -> list:
        aff = _as_u64(aff, 2 * self.w).reshape(-1, 2 * self.w)
        out = []
        for row in aff:
            if not row.any():
                out.append(None)
            else:
                out.append((self._coord_to_int(row[: self.w]), self._coord_to_int(row[self.w :])))
        return out

    def scalars_from_ints(self, scalars) -> np.ndarray:
        out = np.zeros((len(scalars), 4), dtype=np.uint64)
        for i, s in enumerate(scalars):
            out[i] = int_to_u64(s % self.spec.scalar.modulus, 4)
        return out

    # -- ops -------------------------------------------------------------

    def from_affine(self, aff: np.ndarray, nthreads: int = 0) -> np.ndarray:
        aff = _as_u64(aff, 2 * self.w)
        n = aff.size // (2 * self.w)
        out = np.empty(aff.shape[:-1] + (3 * self.w,), dtype=np.uint64)
        self.lib.ecn_ec_from_affine(self.handle, _ptr(aff), _ptr(out), n, nthreads)
        return out

    def to_affine(self, jac: np.ndarray, nthreads: int = 0) -> np.ndarray:
        jac = _as_u64(jac, 3 * self.w)
        n = jac.size // (3 * self.w)
        out = np.empty(jac.shape[:-1] + (2 * self.w,), dtype=np.uint64)
        self.lib.ecn_ec_to_affine(self.handle, _ptr(jac), _ptr(out), n, nthreads)
        return out

    def add(self, p: np.ndarray, q: np.ndarray, nthreads: int = 0) -> np.ndarray:
        p = _as_u64(p, 3 * self.w)
        q = np.ascontiguousarray(np.broadcast_to(_as_u64(q, 3 * self.w), p.shape))
        out = np.empty_like(p)
        self.lib.ecn_ec_add(self.handle, _ptr(p), _ptr(q), _ptr(out), p.size // (3 * self.w), nthreads)
        return out

    def double(self, p: np.ndarray, nthreads: int = 0) -> np.ndarray:
        p = _as_u64(p, 3 * self.w)
        out = np.empty_like(p)
        self.lib.ecn_ec_double(self.handle, _ptr(p), _ptr(out), p.size // (3 * self.w), nthreads)
        return out

    def scalar_mul(self, aff: np.ndarray, scalars: np.ndarray, nthreads: int = 0) -> np.ndarray:
        aff = _as_u64(aff, 2 * self.w)
        scalars = _as_u64(scalars, 4)
        n = aff.size // (2 * self.w)
        out = np.empty(aff.shape[:-1] + (3 * self.w,), dtype=np.uint64)
        self.lib.ecn_ec_scalar_mul(self.handle, _ptr(aff), _ptr(scalars), _ptr(out), n, nthreads)
        return out

    def msm(self, aff: np.ndarray, scalars: np.ndarray, window: int = 0,
            nthreads: int = 0) -> np.ndarray:
        """Pippenger MSM (multiexp_cpu.rs:244-339 parity): (n, 2w) affine x
        (n, 4) plain scalars -> one (3w,) Jacobian point."""
        aff = _as_u64(aff, 2 * self.w).reshape(-1, 2 * self.w)
        scalars = _as_u64(scalars, 4).reshape(-1, 4)
        assert aff.shape[0] == scalars.shape[0]
        out = np.empty(3 * self.w, dtype=np.uint64)
        self.lib.ecn_msm(
            self.handle, _ptr(aff), _ptr(scalars), aff.shape[0], window, nthreads, _ptr(out)
        )
        return out

    def msm_points(self, points: list, scalars: list, window: int = 0,
                   nthreads: int = 0):
        """Oracle-typed MSM: affine int points + int scalars -> affine point."""
        j = self.msm(self.affine_from_points(points), self.scalars_from_ints(scalars),
                     window, nthreads)
        return self.affine_to_points(self.to_affine(j[None, :]))[0]

    def ec_fft(self, jac: np.ndarray, inverse: bool = False, nthreads: int = 0) -> np.ndarray:
        """EC-group FFT over (n, 3w) Jacobian points (ec_fft_cpu.rs parity)."""
        jac = np.array(_as_u64(jac, 3 * self.w).reshape(-1, 3 * self.w), copy=True)
        n = jac.shape[0]
        log_n = n.bit_length() - 1
        assert 1 << log_n == n
        r = self.spec.scalar.modulus
        omega = pow(self.spec.scalar.root_of_unity,
                    1 << (self.spec.scalar.two_adicity - log_n), r)
        if inverse:
            omega = pow(omega, r - 2, r)
        om = int_to_u64(omega, 4)
        self.lib.ecn_ec_fft(self.handle, _ptr(jac), log_n, _ptr(om), nthreads)
        if inverse:
            ninv = self.scalars_from_ints([pow(n, -1, r)])
            aff = self.to_affine(jac, nthreads)
            jac = self.scalar_mul(aff, np.broadcast_to(ninv, (n, 4)), nthreads)
        return jac

    def __del__(self):
        lib, h = getattr(self, "lib", None), getattr(self, "handle", None)
        if lib is not None and h:
            lib.ecn_curve_free(h)
            self.handle = None


@functools.lru_cache(maxsize=None)
def native_field(spec: FieldSpec) -> NativeField:
    return NativeField(spec)


@functools.lru_cache(maxsize=None)
def native_curve(spec: CurveSpec) -> NativeCurve:
    return NativeCurve(spec)
