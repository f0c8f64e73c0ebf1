"""arkworks-interop MarlinKZG10: the reference's exact randomness chain,
sponge, and serialization, producing committed golden vectors.

The VERDICT-track correctness north star: one full setup -> commit -> open
-> check transcript whose every byte is determined by emulated arkworks
primitives, committed as tests/vectors/marlin_ark_golden.json so a future
arkworks run can confirm or refute the whole chain in one diff.

Exact reproduction recipe in Rust (arkworks v0.5 workspace, BLS12-381), cf.
/root/reference/poly-commit/src/lib.rs:643-900 for the idioms:

    use ark_bls12_381::{Bls12_381, Fr};
    use ark_poly::{DenseUVPolynomial, univariate::DensePolynomial};
    use ark_poly_commit::marlin_pc::MarlinKZG10;
    use ark_std::{test_rng, UniformRand};
    use rand_chacha::ChaCha20Rng;
    use rand_core::SeedableRng;
    type PC = MarlinKZG10<Bls12_381, DensePolynomial<Fr>>;

    let rng = &mut ChaCha20Rng::from_rng(test_rng()).unwrap(); // lib.rs:681
    let pp = PC::setup(DEGREE, None, rng)?;                    // samples beta, g, gamma_g, h
    let (ck, vk) = PC::trim(&pp, DEGREE, 0, None)?;
    let p = DensePolynomial::<Fr>::rand(DEGREE, rng);          // DEGREE+1 Fr::rand coeffs
    let lp = LabeledPolynomial::new("f".into(), p.clone(), None, None);
    let (comms, states) = PC::commit(&ck, [&lp], None)?;
    let point = Fr::rand(rng);
    let value = p.evaluate(&point);
    let mut sponge = test_sponge::<Fr>();                      // lib.rs:1385-1416 params
    let proof = PC::open(&ck, [&lp], &comms, &point, &mut sponge, &states, None)?;
    let mut sponge2 = test_sponge::<Fr>();
    assert!(PC::check(&vk, &comms, &point, [value], &proof, &mut sponge2)?);
    // golden bytes: CanonicalSerialize (compressed) of pp.powers_of_g[..],
    // comms[0].commitment().comm.0, proof.w — see VECTOR_FIELDS below.

Every primitive in that chain is emulated in core/ark_compat.py (ChaCha12
test_rng, ChaCha20Rng::from_rng, Fp::rand, G1/G2 Projective::rand with
cofactor clearing, the ark Poseidon test sponge) and core/serialize.py
(ark CanonicalSerialize point format, validated against the zcash generator
vectors). DEGREE = 10 below.
"""

from __future__ import annotations

import json

from ..core import curve as C
from ..core import field as F
from ..core import field_params as FP
from ..core import hostec
from ..core.ark_compat import (
    ArkPoseidonSponge,
    ChaCha20Rng,
    ark_fp_rand,
    ark_g1_rand,
    ark_g2_rand,
    ark_test_rng,
)
from ..core.serialize import ark_point_to_bytes
from . import kzg10
from .data_structures import LabeledPolynomial
from .marlin_pc import MarlinKZG10

FR = FP.FR_BLS12_381
FQ = FP.FQ_BLS12_381
DEGREE = 10


class ArkRng:
    """HostRng-shaped adapter over the emulated ChaCha20Rng: scheme code
    calling ``rng.field_ints`` draws through Fp::rand exactly as arkworks'
    ``Randomness::rand(...)`` hiding chain does (kzg10/mod.rs:181-206)."""

    def __init__(self, rng: ChaCha20Rng):
        self._rng = rng

    def field_int(self, spec) -> int:
        return ark_fp_rand(self._rng, spec)

    def field_ints(self, spec, n: int) -> list:
        return [ark_fp_rand(self._rng, spec) for _ in range(n)]


def ark_kzg_universal_params(max_degree: int, produce_g2_powers: bool = False):
    """KZG10::setup with arkworks' randomness chain (kzg10/mod.rs:53-124:
    beta = Fr::rand, g = G1::rand, gamma_g = G1::rand, h = G2::rand, then
    deterministic power tables; with produce_g2_powers also
    neg_powers_of_h[i] = beta^-i h, mod.rs:90-104 — the SonicKZG10 setup,
    sonic_pc/mod.rs:151-157). Returns (UniversalParams, rng, secrets)."""
    rng = ChaCha20Rng.from_rng(ark_test_rng())
    beta = ark_fp_rand(rng, FR)
    g = ark_g1_rand(rng, C.BLS12_381_G1)
    gamma_g = ark_g1_rand(rng, C.BLS12_381_G1)
    h = ark_g2_rand(rng, C.BLS12_381_G2)

    hg1 = hostec.host_group(C.BLS12_381_G1)
    hg2 = hostec.host_group(C.BLS12_381_G2)
    pows = [1]
    for _ in range(max_degree + 1):
        pows.append(pows[-1] * beta % FR.modulus)
    powers_of_g = [hg1.mul_fast(g, pows[i]) for i in range(max_degree + 1)]
    powers_of_gamma_g = [
        hg1.mul_fast(gamma_g, pows[i]) for i in range(max_degree + 2)
    ]
    beta_h = hg2.mul_fast(h, beta)
    neg_powers_of_h = None
    neg_h_pts = None
    if produce_g2_powers:
        binv = pow(beta, -1, FR.modulus)
        npows = [1]
        for _ in range(max_degree):
            npows.append(npows[-1] * binv % FR.modulus)
        neg_h_pts = [hg2.mul_fast(h, e) for e in npows]
        neg_powers_of_h = hostec.host_points_to_device_affine(
            C.BLS12_381_G2, neg_h_pts
        )

    def dev_fq2_affine(pt):
        x, y = pt
        import jax.numpy as jnp

        return (
            F.from_ints(FQ, list(x)),
            F.from_ints(FQ, list(y)),
            jnp.asarray(False),
        )

    pp = kzg10.UniversalParams(
        powers_of_g=hostec.host_points_to_device_affine(
            C.BLS12_381_G1, powers_of_g
        ),
        powers_of_gamma_g=hostec.host_points_to_device_affine(
            C.BLS12_381_G1, powers_of_gamma_g
        ),
        h=dev_fq2_affine(h),
        beta_h=dev_fq2_affine(beta_h),
        neg_powers_of_h=neg_powers_of_h,
        max_degree=max_degree,
    )
    secrets = dict(beta=beta, g=g, gamma_g=gamma_g, h=h, beta_h=beta_h,
                   powers_of_g=powers_of_g, neg_powers_of_h=neg_h_pts)
    return pp, rng, secrets


def _pt_hex(group, host_pt) -> str:
    triple = hostec.host_to_triple(host_pt, group.fops.elem_ndim == 2)
    return ark_point_to_bytes(group, triple, compressed=True).hex()


def marlin_ark_golden(degree: int = DEGREE) -> dict:
    """Run the full transcript; return the golden-vector dict."""
    PC = MarlinKZG10
    pp, rng, secrets = ark_kzg_universal_params(degree)
    ck, vk = PC.trim(pp, degree)

    coeff_ints = [ark_fp_rand(rng, FR) for _ in range(degree + 1)]
    poly = LabeledPolynomial("f", F.from_ints(FR, coeff_ints))
    comms, states = PC.commit(ck, [poly])

    point = ark_fp_rand(rng, FR)
    value = 0
    for c in reversed(coeff_ints):
        value = (value * point + c) % FR.modulus

    sponge = ArkPoseidonSponge(FR)
    proof = PC.open(ck, [poly], comms, point, sponge, states)
    sponge2 = ArkPoseidonSponge(FR)
    ok = PC.check(vk, comms, point, [value], proof, sponge2)

    g1 = C.BLS12_381_G1
    g2 = C.BLS12_381_G2
    comm_pt = hostec.triple_to_host(comms[0].commitment.comm)
    w_pt = hostec.triple_to_host(proof.w)

    # component KATs (localize a mismatch to one sub-chain)
    kat_rng = ChaCha20Rng.from_rng(ark_test_rng())
    kat_sponge = ArkPoseidonSponge(FR)
    return {
        "curve": "bls12_381",
        "scheme": "marlin_pc::MarlinKZG10",
        "degree": degree,
        "kat": {
            "chacha20_seed_from_test_rng": ark_test_rng().fill_bytes(32).hex(),
            "chacha20_first_u64": f"{kat_rng.next_u64():016x}",
            "fr_rand_first_from_test_rng": hex(ark_fp_rand(ark_test_rng(), FR)),
            "sponge_first_squeeze": hex(
                kat_sponge.squeeze_native_field_elements(1)[0]
            ),
            "sponge_first_challenge_128": hex(
                ArkPoseidonSponge(FR).squeeze_challenge_128()
            ),
        },
        "beta": hex(secrets["beta"]),
        "g": _pt_hex(g1, secrets["g"]),
        "gamma_g": _pt_hex(g1, secrets["gamma_g"]),
        "h": _pt_hex(g2, secrets["h"]),
        "beta_h": _pt_hex(g2, secrets["beta_h"]),
        "powers_of_g_1": _pt_hex(g1, secrets["powers_of_g"][1]),
        "powers_of_g_last": _pt_hex(g1, secrets["powers_of_g"][-1]),
        "poly_coeffs": [hex(c) for c in coeff_ints],
        "point": hex(point),
        "value": hex(value),
        "commitment": _pt_hex(g1, comm_pt),
        "proof_w": _pt_hex(g1, w_pt),
        "proof_random_v": None,
        "check": bool(ok),
    }


def marlin_ark_golden_bounded(degree: int = DEGREE, bound: int = 5,
                              hiding: int = 2) -> dict:
    """MarlinKZG10 with a degree bound AND hiding: exercises the shifted
    powers (marlin_pc/mod.rs:219-228) and the gamma_g hiding-randomness
    chain (kzg10/mod.rs:181-206) that the unbounded golden transcript
    (marlin_ark_golden) never touches.

    Rust reproduction (arkworks v0.5, BLS12-381; cf. lib.rs:1083-1160's
    degree-bound matrix):

        let rng = &mut ChaCha20Rng::from_rng(test_rng()).unwrap();
        let pp = PC::setup(DEGREE, None, rng)?;
        let (ck, vk) = PC::trim(&pp, DEGREE, HIDING, Some(&[BOUND]))?;
        let p = DensePolynomial::<Fr>::rand(BOUND, rng);
        let lp = LabeledPolynomial::new("f".into(), p, Some(BOUND), Some(HIDING));
        let (comms, states) = PC::commit(&ck, [&lp], Some(rng))?;
        let point = Fr::rand(rng);
        // open/check with test_sponge, as in marlin_ark_golden

    Divergence note: if the blinding polynomial's leading Fr::rand draw is
    0 (probability ~2^-255), arkworks re-draws while this emulation pins
    the coefficient to 1 — unreachable in any committed vector."""
    PC = MarlinKZG10
    pp, rng, secrets = ark_kzg_universal_params(degree)
    ck, vk = PC.trim(pp, degree, supported_hiding_bound=hiding,
                     enforced_degree_bounds=[bound])

    coeff_ints = [ark_fp_rand(rng, FR) for _ in range(bound + 1)]
    poly = LabeledPolynomial("f", F.from_ints(FR, coeff_ints),
                             degree_bound=bound, hiding_bound=hiding)
    comms, states = PC.commit(ck, [poly], rng=ArkRng(rng))

    point = ark_fp_rand(rng, FR)
    value = 0
    for c in reversed(coeff_ints):
        value = (value * point + c) % FR.modulus

    sponge = ArkPoseidonSponge(FR)
    proof = PC.open(ck, [poly], comms, point, sponge, states)
    sponge2 = ArkPoseidonSponge(FR)
    ok = PC.check(vk, comms, point, [value], proof, sponge2)

    g1 = C.BLS12_381_G1
    comm_pt = hostec.triple_to_host(comms[0].commitment.comm)
    shifted_pt = hostec.triple_to_host(comms[0].commitment.shifted_comm)
    w_pt = hostec.triple_to_host(proof.w)
    return {
        "curve": "bls12_381",
        "scheme": "marlin_pc::MarlinKZG10",
        "degree": degree,
        "degree_bound": bound,
        "hiding_bound": hiding,
        "beta": hex(secrets["beta"]),
        "poly_coeffs": [hex(c) for c in coeff_ints],
        "blinding_poly": [
            hex(c)
            for c in F.to_ints(FR, states[0].rand.blinding_polynomial)
        ],
        "shifted_blinding_poly": [
            hex(c)
            for c in F.to_ints(FR, states[0].shifted_rand.blinding_polynomial)
        ],
        "point": hex(point),
        "value": hex(value),
        "commitment": _pt_hex(g1, comm_pt),
        "shifted_commitment": _pt_hex(g1, shifted_pt),
        "proof_w": _pt_hex(g1, w_pt),
        "proof_random_v": _rv_hex(proof.random_v),
        "check": bool(ok),
    }


def _rv_hex(rv):
    if rv is None:
        return None
    if isinstance(rv, (list, tuple)):
        rv = rv[0]
    return hex(int(rv))


def sonic_ark_golden(degree: int = DEGREE, bound: int = 5,
                     hiding: int = 2) -> dict:
    """SonicKZG10 with degree bound + hiding: exercises the neg-G2 power
    chain (kzg10/mod.rs:90-104 via sonic_pc/mod.rs:151-157) and Sonic's
    combined-opening accumulation (sonic_pc/mod.rs:341-384).

    Rust reproduction (type PC = SonicKZG10<Bls12_381, DensePolynomial<Fr>>):

        let rng = &mut ChaCha20Rng::from_rng(test_rng()).unwrap();
        let pp = PC::setup(DEGREE, None, rng)?;            // produce_g2_powers
        let (ck, vk) = PC::trim(&pp, DEGREE, HIDING, Some(&[BOUND]))?;
        let p = DensePolynomial::<Fr>::rand(BOUND, rng);
        let lp = LabeledPolynomial::new("f".into(), p, Some(BOUND), Some(HIDING));
        let (comms, states) = PC::commit(&ck, [&lp], Some(rng))?;
        let point = Fr::rand(rng);
        // open/check with test_sponge, as above
    """
    from .sonic_pc import SonicKZG10 as PC

    pp, rng, secrets = ark_kzg_universal_params(degree, produce_g2_powers=True)
    ck, vk = PC.trim(pp, degree, supported_hiding_bound=hiding,
                     enforced_degree_bounds=[bound])

    coeff_ints = [ark_fp_rand(rng, FR) for _ in range(bound + 1)]
    poly = LabeledPolynomial("f", F.from_ints(FR, coeff_ints),
                             degree_bound=bound, hiding_bound=hiding)
    comms, states = PC.commit(ck, [poly], rng=ArkRng(rng))

    point = ark_fp_rand(rng, FR)
    value = 0
    for c in reversed(coeff_ints):
        value = (value * point + c) % FR.modulus

    sponge = ArkPoseidonSponge(FR)
    proof = PC.open(ck, [poly], comms, point, sponge, states)
    sponge2 = ArkPoseidonSponge(FR)
    ok = PC.check(vk, comms, point, [value], proof, sponge2)

    g1 = C.BLS12_381_G1
    g2 = C.BLS12_381_G2
    comm_pt = hostec.triple_to_host(comms[0].commitment.point)
    w_pt = hostec.triple_to_host(proof.w)
    return {
        "curve": "bls12_381",
        "scheme": "sonic_pc::SonicKZG10",
        "degree": degree,
        "degree_bound": bound,
        "hiding_bound": hiding,
        "beta": hex(secrets["beta"]),
        "neg_powers_of_h_1": _pt_hex(g2, secrets["neg_powers_of_h"][1]),
        "neg_powers_of_h_last": _pt_hex(g2, secrets["neg_powers_of_h"][-1]),
        "poly_coeffs": [hex(c) for c in coeff_ints],
        "blinding_poly": [
            hex(c) for c in F.to_ints(FR, states[0].blinding_polynomial)
        ],
        "point": hex(point),
        "value": hex(value),
        "commitment": _pt_hex(g1, comm_pt),
        "proof_w": _pt_hex(g1, w_pt),
        "proof_random_v": _rv_hex(proof.random_v),
        "check": bool(ok),
    }


if __name__ == "__main__":
    # force the CPU backend (the golden transcript is a correctness
    # artifact; tiny sizes run compile-free on host-EC fallbacks — and the
    # env var alone is overridden by the axon plugin registration)
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    from ..utils.cache import enable_compile_cache

    enable_compile_cache(cpu=True)
    print(json.dumps(marlin_ark_golden(), indent=1))
