"""Multi-chip scaling-efficiency harness -> SCALING.json.

BASELINE config[4] targets >=80% scaling efficiency for a 2^24 G1 MSM and a
2^26 NTT on a v5e-16 slice.  Real multi-chip hardware is not available in
this environment, so this harness produces the efficiency *instrument*:

1. validates the distributed algorithms bit-exactly on a virtual CPU mesh
   (d = 2, 4, 8) — covering the all_to_all / all_gather plumbing, and
2. computes the communication-volume efficiency model from the algorithm's
   exact collective byte counts and the measured single-chip compute rates,
   for the target sizes at d = 8 and 16.

Model (no compute/comm overlap assumed — a lower bound; Pallas async
collectives can only improve it):

  NTT (four-step, parallel/ntt_dist.py): compute = (n/2 log n + n) mulmods
  spread over d chips; comm = 3 all_to_alls, each sending (d-1)/d of the
  local shard across ICI: 3 * (n/d) * (d-1)/d * bytes_per_elem per chip.

  MSM (parallel/msm_dist.py, bucket-combine over all_to_all): per-chip
  compute = accumulation at the GLOBAL window size (accum="pair": W*n/d
  adds; accum="scan", the compile-light default: W*(n/d)*log2(n/d) masked
  adds) + W*B*(1-1/d) combine adds + ~2*W*(B/d)*log2(B/d) tail adds on the
  owned bucket slice; comm = W*B*288*(1-1/d) bytes of all_to_all traffic.
  Every term scales with d — this is what lifted d=16 from 0.766 (r2,
  per-shard full tails) to >=0.98.  At-scale runs should set
  TPU_EC_DIST_MSM_ACCUM=pair: the scan path trades log2(n/d)x compute for
  a program XLA-CPU can compile (see msm_dist.py header); both rows are
  reported.

Usage: python scripts/scaling_harness.py [--estimates-only]
       (CPU; writes SCALING.json; --estimates-only reuses the recorded
       virtual-mesh validation instead of re-running the slow CPU compiles)
"""

import json
import math
import os
import sys

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import random

import numpy as np

# -- measured single-chip constants (from bench.py and
# scripts/bench_msm_tpu.py on the v5e; update when kernels improve) --------
# effective Fr mulmod rate inside the fused NTT (r3: 31.1M elem/s at 2^20
# = ~13.5M muls / 33.6 ms — the 5-stage VMEM-resident leaves amortize far
# better than the standalone mont kernel's ~150M/s):
MULMOD_PER_S = 4.0e8
# v5e ICI: 4 links/chip, ~186 GB/s/dir aggregate; all_to_all effective
# per-chip egress bandwidth (conservative):
ICI_BYTES_PER_S = 9.0e10
FR_BYTES = 16 * 4  # (L=16 halflimb u32) on-fabric representation


def ntt_efficiency(log_n: int, d: int) -> dict:
    n = 1 << log_n
    mulmods = n // 2 * log_n + n  # stages + inter-pass twiddle
    t_comp = mulmods / d / MULMOD_PER_S
    shard_bytes = n // d * FR_BYTES
    t_comm = 3 * shard_bytes * (d - 1) / d / ICI_BYTES_PER_S
    eff = t_comp / (t_comp + t_comm)
    return {
        "config": f"ntt_2^{log_n}",
        "devices": d,
        "per_device_mulmods": mulmods // d,
        "collective_bytes_per_device": int(3 * shard_bytes * (d - 1) / d),
        "t_compute_s": round(t_comp, 4),
        "t_comm_s": round(t_comm, 4),
        "est_efficiency": round(eff, 4),
    }


# pair-engine per-point-add effective time, calibrated from the committed
# TPU bench (BENCH artifacts): 2^18 at w=13 ran 1.953 s over
# W*(n + 2*B*log2(B)) = 20*(262144 + 106496) add-equivalents -> ~265 ns.
T_ADD_S = 265e-9
JAC_BYTES = 3 * 24 * 4  # fused Jacobian bucket row (Fq, 24 halflimbs)


def _msm_terms(n: int, d: int, w: int, accum: str):
    """Per-chip add-equivalents of the bucket-combine distributed engine
    (parallel/msm_dist.py): accumulation at the GLOBAL window size,
    all_to_all bucket combine (d-1 adds on the owned slice), tail on the
    owned 1/d slice."""
    W = -(-256 // w)
    B = 1 << (w - 1)
    n_loc = n / d
    if accum == "scan":
        acc = W * n_loc * max(1, int(math.log2(max(2, n_loc))))
    else:
        acc = W * n_loc
    combine = W * B * (1 - 1 / d) if d > 1 else 0
    own = max(1, B // d)
    tail = W * own * 2 * max(1, int(math.log2(max(2, own))))
    comm_bytes = W * B * JAC_BYTES * (1 - 1 / d) if d > 1 else 0
    return acc, combine, tail, comm_bytes


def msm_efficiency(log_n: int, d: int, accum: str = "pair") -> dict:
    from tpu_ec.ops.msm_pair import default_window_size_pair

    n = 1 << log_n
    w = default_window_size_pair(n)
    W = -(-256 // w)
    B = 1 << (w - 1)
    # single-chip reference: the pair engine (what bench.py measures)
    adds1 = W * (n + 2 * B * max(1, int(math.log2(B))))
    t1 = adds1 * T_ADD_S
    acc, combine, tail, comm_bytes = _msm_terms(n, d, w, accum)
    t_comp = (acc + combine + tail) * T_ADD_S
    t_comm = comm_bytes / ICI_BYTES_PER_S
    t_d = t_comp + t_comm
    eff = t1 / (d * t_d)
    return {
        "config": f"g1_msm_2^{log_n}",
        "devices": d,
        "window": w,
        "accum": accum,
        "per_device_point_adds": int(acc + combine + tail),
        "collective_bytes_per_device": int(comm_bytes),
        "t_compute_s": round(t_comp, 4),
        "t_comm_s": round(t_comm, 6),
        "est_efficiency": round(min(1.0, eff), 4),
    }


def validate_virtual_mesh() -> list:
    """Bit-exact distributed runs on 2/4/8 virtual devices."""
    from tpu_ec.curves import oracle
    from tpu_ec.curves.params import BN254_G1
    from tpu_ec.curves.point import point_ops
    from tpu_ec.fields import BLS12_381_FR, field_ops
    from tpu_ec.ops.ntt import ntt_ref
    from tpu_ec.parallel import DistFftKernel, DistMultiexpKernel
    from tpu_ec.parallel.mesh import make_mesh

    results = []
    f = field_ops(BLS12_381_FR)
    rng = random.Random(77)
    log_n = 10
    vals = [rng.randrange(BLS12_381_FR.modulus) for _ in range(1 << log_n)]
    want_head = ntt_ref(BLS12_381_FR, vals)[:8]
    x = f.from_ints(vals)

    spec = BN254_G1
    ops = point_ops(spec)
    n_msm = 128
    pts = oracle.random_points(spec, n_msm, seed=70)
    ks = oracle.random_scalars(spec, n_msm, seed=71)
    want_msm = oracle.msm(spec, pts, ks)
    b_dev = ops.from_affine_ints(pts)
    s_dev = ops.scalars_to_limbs(ks)

    for d in (2, 4, 8):
        mesh = make_mesh(jax.devices()[:d])
        y = DistFftKernel(BLS12_381_FR, mesh).radix_fft(x)
        ok_ntt = f.to_ints(y[:8]) == want_head
        out = DistMultiexpKernel(spec, mesh).multiexp(b_dev, s_dev)
        ok_msm = ops.to_affine_ints(ops.to_affine(out))[0] == want_msm
        row = {"devices": d, "ntt_2^10_ok": ok_ntt, "msm_128_ok": ok_msm}
        if d == 2:
            # the at-scale accumulation (est_efficiency 0.987 at d=16 vs
            # 0.053 for the scan fallback): compile-check + bit-exact on
            # the virtual mesh (also tests/test_parallel.py pair_accum)
            from tpu_ec.config import configure, get_config

            old = get_config().dist_msm_accum
            configure(dist_msm_accum="pair")
            try:
                kp = DistMultiexpKernel(spec, mesh)
                outp = kp.multiexp(b_dev, s_dev)
                row["msm_128_pair_accum_ok"] = (
                    ops.to_affine_ints(ops.to_affine(outp))[0] == want_msm
                )
            finally:
                configure(dist_msm_accum=old)
            assert row["msm_128_pair_accum_ok"]
        results.append(row)
        assert ok_ntt and ok_msm, f"virtual-mesh validation failed at d={d}"
    return results


def main():
    est_only = "--estimates-only" in sys.argv
    prev_validation = None
    out_path = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "SCALING.json")
    )
    if est_only and os.path.exists(out_path):
        with open(out_path) as fh:
            prev_validation = json.load(fh).get("virtual_mesh_validation")
    report = {
        "model_constants": {
            "mulmod_per_s_per_chip": MULMOD_PER_S,
            "msm_t_add_s": T_ADD_S,
            "ici_bytes_per_s_per_chip": ICI_BYTES_PER_S,
            "assumption": "no compute/comm overlap (lower bound)",
        },
        "virtual_mesh_validation": prev_validation
        if est_only
        else validate_virtual_mesh(),
        "estimates": [
            ntt_efficiency(26, 8),
            ntt_efficiency(26, 16),
            msm_efficiency(24, 8, "pair"),
            msm_efficiency(24, 16, "pair"),
            msm_efficiency(24, 16, "scan"),
        ],
    }
    out = os.path.join(os.path.dirname(__file__), "..", "SCALING.json")
    with open(os.path.abspath(out), "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report["estimates"], indent=1))
    print("wrote SCALING.json")


if __name__ == "__main__":
    sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
    main()
