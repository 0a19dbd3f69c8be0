"""Serialized test vectors (tests/vectors.json) — the arkworks/blstrs
cross-check tier of the reference (`ag-build/src/tests/test_fields.rs:11-107`,
`test_ec.rs:8-37` compare every device op against arkworks).

Three layers of independence:

1. **Published constants**: moduli, two-adicity and generator coordinates
   from the BLS12-381 spec (draft-irtf-cfrg-pairing-friendly-curves) and
   the BN254/alt_bn128 spec (EIP-196) — external to this repo.  FieldSpec /
   CurveSpec values must match them, and the Montgomery constants (R, R²,
   root of unity) must satisfy their *defining equations* against the
   published moduli, so a wrong baked-in constant cannot self-certify.
2. **Frozen regression vectors**: k*G, field products and one small MSM,
   generated once from the plain-Python bigint oracle and pinned in the
   JSON — any later drift in oracle or device paths fails loudly.
3. **Device-path checks**: the JAX/Pallas path must reproduce the pinned
   values bit-exactly (run on CPU interpret here; the TPU drive scripts
   repeat them on hardware).
"""

import json
import os

import pytest

from tpu_ec.curves import oracle
from tpu_ec.curves.params import BLS12_381_G1, BLS12_381_G2, BN254_G1
from tpu_ec.curves.point import point_ops
from tpu_ec.fields import field_ops
from tpu_ec.fields.params import BLS12_381_FQ, BLS12_381_FR, BN254_FQ, BN254_FR

VEC = json.load(open(os.path.join(os.path.dirname(__file__), "vectors.json")))


def _i(s):
    return int(s, 16) if isinstance(s, str) and s.startswith("0x") else int(s)


def _pt(v):
    if v is None:
        return None
    return tuple(
        _i(c) if isinstance(c, str) else (_i(c[0]), _i(c[1])) for c in v
    )


# -- published constants ------------------------------------------------------


def test_published_moduli():
    pub = VEC["published"]
    assert BLS12_381_FQ.modulus == _i(pub["bls12_381"]["fq_modulus"])
    assert BLS12_381_FR.modulus == _i(pub["bls12_381"]["fr_modulus"])
    assert BN254_FQ.modulus == _i(pub["bn254"]["fq_modulus"])
    assert BN254_FR.modulus == _i(pub["bn254"]["fr_modulus"])


def test_published_generators():
    pub = VEC["published"]["bls12_381"]
    assert BLS12_381_G1.gen_x == _i(pub["g1_x"])
    assert BLS12_381_G1.gen_y == _i(pub["g1_y"])
    assert BLS12_381_G2.gen_x == tuple(_i(c) for c in pub["g2_x"])
    assert BLS12_381_G2.gen_y == tuple(_i(c) for c in pub["g2_y"])
    bn = VEC["published"]["bn254"]
    assert BN254_G1.gen_x == _i(bn["g1_x"])
    assert BN254_G1.gen_y == _i(bn["g1_y"])


@pytest.mark.parametrize(
    "spec", [BLS12_381_FQ, BLS12_381_FR, BN254_FQ, BN254_FR], ids=lambda s: s.name
)
def test_montgomery_constants_defining_equations(spec):
    """R = 2^(16L) mod p, R2 = R^2 mod p, one = R, nprime*p = -1 mod R —
    verified against the published modulus, not against themselves."""
    p = spec.modulus
    R = 1 << (16 * spec.n_limbs)
    assert spec.r % p == spec.one % p
    assert spec.one == R % p
    assert spec.r2 == (R * R) % p
    assert (spec.nprime * p) % R == R - 1


def test_two_adic_root_defining_property():
    """Fr root of unity has order exactly 2^two_adicity (arkworks
    TWO_ADIC_ROOT_OF_UNITY semantics)."""
    spec = BLS12_381_FR
    s = VEC["published"]["bls12_381"]["fr_two_adicity"]
    assert (spec.modulus - 1) % (1 << s) == 0
    w = spec.root_of_unity
    assert pow(w, 1 << s, spec.modulus) == 1
    assert pow(w, 1 << (s - 1), spec.modulus) != 1


def test_generator_on_curve_and_in_subgroup():
    for spec in (BLS12_381_G1, BN254_G1):
        gx, gy = spec.gen_x, spec.gen_y
        p = spec.base.modulus
        assert (gy * gy - gx**3 - spec.b) % p == 0
        assert oracle.scalar_mul(spec, (gx, gy), spec.scalar.modulus) is None


# -- frozen regression vectors ------------------------------------------------


@pytest.mark.parametrize(
    "name,spec",
    [
        ("scalar_mul_g1_bls12_381", BLS12_381_G1),
        ("scalar_mul_g2_bls12_381", BLS12_381_G2),
        ("scalar_mul_g1_bn254", BN254_G1),
    ],
)
def test_scalar_mul_vectors_oracle(name, spec):
    G = oracle.generator(spec)
    for k_str, want in VEC[name].items():
        assert oracle.scalar_mul(spec, G, int(k_str)) == _pt(want)


def test_scalar_mul_vectors_device_path():
    """The JAX double-and-add must reproduce the pinned k*G values."""
    spec = BLS12_381_G1
    ops = point_ops(spec)
    items = list(VEC["scalar_mul_g1_bls12_381"].items())[:4]
    import jax.numpy as jnp

    gx, gy = ops.generator_affine
    m = len(items)
    G = ops.to_jacobian(
        (jnp.broadcast_to(jnp.asarray(gx), (m, ops.L)),
         jnp.broadcast_to(jnp.asarray(gy), (m, ops.L)))
    )
    ks = ops.scalars_to_limbs([int(k) for k, _ in items])
    out = ops.scalar_mul(G, ks)
    got = ops.to_affine_ints(ops.to_affine(out))
    assert got == [_pt(w) for _, w in items]


def test_field_mul_vectors_device_path():
    f = field_ops(BLS12_381_FR)
    triples = [tuple(map(_i, t)) for t in VEC["field_mul_fr_bls12_381"]]
    a = f.from_ints([t[0] for t in triples])
    b = f.from_ints([t[1] for t in triples])
    assert f.to_ints(f.mul(a, b)) == [t[2] for t in triples]


def test_msm_vector_device_path():
    v = VEC["msm_g1_bls12_381"]
    spec = BLS12_381_G1
    ops = point_ops(spec)
    pts = oracle.random_points(spec, v["n"], seed=v["seed_points"])
    ks = oracle.random_scalars(spec, v["n"], seed=v["seed_scalars"])
    want = _pt(v["result"])
    assert oracle.msm(spec, pts, ks) == want
    from tpu_ec.ops.msm import MultiexpKernel

    out = MultiexpKernel(spec).multiexp(
        ops.from_affine_ints(pts), ops.scalars_to_limbs(ks), window_size=4
    )
    assert ops.to_affine_ints(ops.to_affine(out))[0] == want
