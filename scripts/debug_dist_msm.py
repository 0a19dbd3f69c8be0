"""Diagnose the distributed-MSM hang: time trace vs compile vs run
separately at the test shape (n=32, w=8) on the virtual 8-device mesh."""

import os, sys, time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from tpu_ec.curves import oracle
from tpu_ec.curves.params import BN254_G1
from tpu_ec.curves.point import point_ops
from tpu_ec.parallel import DistMultiexpKernel, make_mesh

tmap = jax.tree_util.tree_map


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    mesh = make_mesh()
    spec = BN254_G1
    ops = point_ops(spec)
    pts = oracle.random_points(spec, n, seed=62)
    ks = oracle.random_scalars(spec, n, seed=63)
    bases = ops.from_affine_ints(pts)
    scalars = ops.scalars_to_limbs(ks)

    kern = DistMultiexpKernel(spec, mesh)
    d = mesh.devices.size
    # replicate the padding logic so we can reach the inner jitted fn
    pad = (-n) % d
    if pad:
        bases = tmap(
            lambda l: jnp.concatenate(
                [l, jnp.zeros((pad,) + l.shape[1:], l.dtype)], axis=0
            ),
            bases,
        )
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((pad,) + scalars.shape[1:], scalars.dtype)],
            axis=0,
        )
    scalars = jnp.concatenate(
        [scalars, jnp.zeros(scalars.shape[:-1] + (1,), scalars.dtype)], axis=-1
    )
    ntot = n + pad
    fn = kern._fn(ntot, w)

    t0 = time.time()
    lowered = fn.lower(bases, scalars)
    t1 = time.time()
    print(f"trace+lower: {t1-t0:.2f}s", flush=True)
    hlo = lowered.as_text()
    print(f"stablehlo size: {len(hlo)/1e6:.2f} MB, {hlo.count(chr(10))} lines", flush=True)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    print(f"compile: {t2-t1:.2f}s", flush=True)
    out = jax.block_until_ready(compiled(bases, scalars))
    t3 = time.time()
    print(f"run: {t3-t2:.2f}s", flush=True)
    got = ops.to_affine_ints(ops.to_affine(out))[0]
    want = oracle.msm(spec, pts, ks)
    print("MATCH" if got == want else f"MISMATCH {got} vs {want}", flush=True)


if __name__ == "__main__":
    main()
