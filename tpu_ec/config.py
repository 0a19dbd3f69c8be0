"""Typed configuration — the framework's single knob registry.

The reference's configuration surface is scattered env vars + cargo features
(`EC_GPU_FRAMEWORK` ec-gpu-program/src/program.rs:64-95, `EC_GPU_NUM_THREADS`
threadpool.rs:25-30, `EC_GPU_CUDA_NVCC_ARGS` / `ARK_GPU_BUILD_DIR`
compile.rs:20-75, features `timer`/`bn254`/`bls12-381`).  Here every knob is
a field of one typed dataclass, initialized from ``TPU_EC_*`` env vars (so
the reference's env-var ergonomics survive) but overridable in-process via
:func:`set_config` / :func:`configure` — the SURVEY §5 "one typed config for
mesh shape, limb width, window size, radix" deliverable.

Knobs and their env names:

==========================  =========================  =======================
field                        env var                    consumed by
==========================  =========================  =======================
num_threads                  TPU_EC_NUM_THREADS         utils/threadpool, native
timer                        TPU_EC_TIMER               utils/timer
cache                        TPU_EC_CACHE               utils/cache
cache_dir                    TPU_EC_CACHE_DIR           utils/cache
native_build_dir             TPU_EC_NATIVE_BUILD_DIR    native/__init__
ntt_leaf_log                 TPU_EC_NTT_LEAF_LOG        ops/pallas/ntt_fused
pallas_ec_min                TPU_EC_PALLAS_EC_MIN       curves/point
msm_window                   TPU_EC_MSM_WINDOW          ops/msm (None = auto)
msm_hbm_budget_bytes         TPU_EC_HBM_BUDGET          ops/msm.calc_chunk_size
mesh_axis                    TPU_EC_MESH_AXIS           parallel/mesh
min_devices                  TPU_EC_MIN_DEVICES         parallel/mesh policy
log_level                    TPU_EC_LOG                 utils/log
==========================  =========================  =======================

Limb width note: the device limb model (16-bit half-limbs, L = bits/16) is a
structural property of the Pallas kernels, not a runtime knob — the
reference's Limb32/Limb64 *choice* (ag-build/src/source/limb.rs:11-39) maps
to the fixed device model plus the native layer's u64 words.
"""

from __future__ import annotations

import dataclasses
import os


def _env_int(name: str, default: int | None) -> int | None:
    v = os.environ.get(name)
    return int(v) if v not in (None, "") else default


def _env_bool(name: str, default: bool) -> bool:
    v = os.environ.get(name)
    if v in (None, ""):
        return default
    return v not in ("0", "false", "False", "no")


@dataclasses.dataclass
class Config:
    """All runtime knobs.  ``Config.from_env()`` is the default instance."""

    # host parallelism (EC_GPU_NUM_THREADS parity); 0 = all cores
    num_threads: int = 0
    # phase timing (the `timer` cargo feature parity)
    timer: bool = False
    # persistent XLA compilation cache (nvcc fatbin cache parity)
    cache: bool = True
    cache_dir: str | None = None
    # native .so build dir (ARK_GPU_BUILD_DIR parity)
    native_build_dir: str | None = None
    # fused-NTT leaf radix log2 (the reference's max_deg=8, fft.rs:15-16)
    ntt_leaf_log: int = 5
    # digit-matmul NTT (ops/ntt_digit.py) max leaf radix log2; bounded by
    # the int32 accumulator (m * 37 * 127^2 < 2^31 -> leaf <= 11) and by
    # matrix size/MXU utilization (measured best: 8)
    ntt_digit_leaf_log: int = 8
    # large-NTT kernel: "digit" (MXU digit-matmul, ops/ntt_digit.py — the
    # r4 default, ~2.4x the fused path at 2^20) or "fused" (VPU multi-stage
    # Pallas, ops/pallas/ntt_fused.py)
    ntt_impl: str = "digit"
    # min batch lanes before EC point ops route to the fused Pallas kernels.
    # Measured r5 (BENCH_ECFFT_r05.json): the EC-FFT jumps 22x the moment
    # its stage batches cross this gate (2^10 -> 2^11 sweep cliff), so the
    # old 1024 default left 2^7-2^10 transforms ~10x slow; 256 keeps the
    # fused kernels engaged down to where dispatch overhead actually wins
    pallas_ec_min: int = 256
    # MSM window bits; None = autotuned table / analytic model
    msm_window: int | None = None
    # HBM budget for MSM chunk sizing (multiexp.rs:71-93 parity)
    msm_hbm_budget_bytes: int = 12 * (1 << 30)
    # mesh axis name for the distributed drivers
    mesh_axis: str = "shards"
    # degraded-startup policy: minimum usable devices before make_mesh errors
    # ("No working GPUs found!" parity, fft.rs:169-186)
    min_devices: int = 1
    # library log level name for utils/log (fil_logger/RUST_LOG parity)
    log_level: str = "WARNING"
    # in-kernel Montgomery formulation for the NTT/mont kernels: "pad"
    # (plane layout — measured faster for the Fr leaf's small limb tiles)
    # or "list" (limb-list direct accumulation)
    mont_impl: str = "pad"
    # formulation for the fused EC point kernels: "list" measured ~20%
    # faster than "pad" for Fq (381-bit) adds at blk=128; bit-identical
    ec_impl: str = "list"
    # allow the digit-matmul NTT on the CPU backend (Pallas interpret mode
    # — minutes per compile, test-only escape hatch so the digit-routed
    # distributed NTT can be differential-tested on the virtual mesh)
    ntt_digit_on_cpu: bool = False
    # distributed-MSM bucket accumulation: "scan" (compile-light masked
    # segmented scan, ~10 point-op instances — what the virtual-mesh dryrun
    # and CI need) or "pair" (compute-optimal pair-halving, heavy compile)
    dist_msm_accum: str = "scan"
    # batch-MSM (multiple_multiexp) chunks per device dispatch: the whole
    # batch shares ONE compiled program, issued over ceil(num_chunks/slab)
    # dispatches.  Bounds single-program device runtime — a program that
    # executes for many minutes dies with UNAVAILABLE at readback through
    # the axon tunnel (both r4 AMT "readback faults", 2^10-chunk batches).
    # 0 = the whole batch in one dispatch.
    batch_msm_slab: int = 64

    @classmethod
    def from_env(cls) -> "Config":
        return cls(
            num_threads=_env_int("TPU_EC_NUM_THREADS", 0) or 0,
            timer=_env_bool("TPU_EC_TIMER", False),
            cache=_env_bool("TPU_EC_CACHE", True),
            cache_dir=os.environ.get("TPU_EC_CACHE_DIR") or None,
            native_build_dir=os.environ.get("TPU_EC_NATIVE_BUILD_DIR") or None,
            ntt_leaf_log=_env_int("TPU_EC_NTT_LEAF_LOG", 5) or 5,
            ntt_digit_leaf_log=_env_int("TPU_EC_NTT_DIGIT_LEAF_LOG", 8) or 8,
            ntt_impl=os.environ.get("TPU_EC_NTT_IMPL", "digit"),
            # NOTE: no `or default` here — an explicit 0 means "disable"
            pallas_ec_min=_env_int("TPU_EC_PALLAS_EC_MIN", 256),
            msm_window=_env_int("TPU_EC_MSM_WINDOW", None),
            msm_hbm_budget_bytes=_env_int("TPU_EC_HBM_BUDGET", 12 * (1 << 30))
            or 12 * (1 << 30),
            mesh_axis=os.environ.get("TPU_EC_MESH_AXIS", "shards"),
            min_devices=_env_int("TPU_EC_MIN_DEVICES", 1) or 1,
            log_level=os.environ.get("TPU_EC_LOG", "WARNING"),
            ntt_digit_on_cpu=_env_bool("TPU_EC_NTT_DIGIT_ON_CPU", False),
            mont_impl=os.environ.get("TPU_EC_MONT_IMPL", "pad"),
            ec_impl=os.environ.get("TPU_EC_EC_IMPL", "list"),
            dist_msm_accum=os.environ.get("TPU_EC_DIST_MSM_ACCUM", "scan"),
            # NOTE: no `or default` — an explicit 0 means "one dispatch"
            batch_msm_slab=_env_int("TPU_EC_BATCH_MSM_SLAB", 64),
        )


_config: Config | None = None


def get_config() -> Config:
    """The process-wide config (lazily initialized from the environment)."""
    global _config
    if _config is None:
        _config = Config.from_env()
    return _config


def set_config(cfg: Config) -> None:
    global _config
    _config = cfg


def configure(**kw) -> Config:
    """Update fields of the active config in place; returns it."""
    cfg = get_config()
    for k, v in kw.items():
        if not hasattr(cfg, k):
            raise AttributeError(f"unknown config field {k!r}")
        setattr(cfg, k, v)
    return cfg
