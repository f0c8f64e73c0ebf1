"""Field and curve parameters for the TPU-native poly-commit build.

All constants are public curve-standard values (BLS12-381, BLS12-377, BN254,
JubJub). Derived Montgomery constants are computed at import time with Python
ints so the JAX layer only ever sees precomputed numpy limb arrays.

Field elements are represented as little-endian arrays of 16-bit limbs stored
in uint32 (``n_limbs`` limbs, base ``2**16``). Montgomery form uses
``R = 2**(16 * n_limbs)`` which matches arkworks' choice of R for the 64-bit
limb counts it uses (4x64 = 256 for 255-bit Fr, 6x64 = 384 for 381-bit Fq).

Reference parity: these fields/curves are the instantiations used throughout
/root/reference (e.g. poly-commit/src/marlin/marlin_pc/mod.rs tests use
BLS12-377/381; benches use BN254 and JubJub = ark-ed-on-bls12-381).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(x: int, n_limbs: int) -> np.ndarray:
    """Little-endian 16-bit limb decomposition as uint32 numpy array."""
    assert 0 <= x < (1 << (LIMB_BITS * n_limbs)), (x, n_limbs)
    out = np.zeros((n_limbs,), dtype=np.uint32)
    for i in range(n_limbs):
        out[i] = (x >> (LIMB_BITS * i)) & LIMB_MASK
    return out


def limbs_to_int(a) -> int:
    """Inverse of int_to_limbs (accepts any 1-D integer array-like)."""
    x = 0
    for i, limb in enumerate(np.asarray(a).tolist()):
        x |= int(limb) << (LIMB_BITS * i)
    return x


@dataclasses.dataclass(frozen=True)
class FieldSpec:
    """Precomputed constants for one prime field (16-bit-limb Montgomery)."""

    name: str
    modulus: int
    n_limbs: int
    # 2-adicity data (0 / None if we never NTT over this field)
    two_adicity: int = 0
    # generator of the full multiplicative group (arkworks' GENERATOR)
    multiplicative_generator: int = 0

    def __post_init__(self):
        assert self.modulus % 2 == 1
        assert self.modulus < (1 << (LIMB_BITS * self.n_limbs))

    # ---- derived ints ----
    @functools.cached_property
    def R(self) -> int:
        return 1 << (LIMB_BITS * self.n_limbs)

    @functools.cached_property
    def R_mod_p(self) -> int:
        return self.R % self.modulus

    @functools.cached_property
    def R2_mod_p(self) -> int:
        return (self.R * self.R) % self.modulus

    @functools.cached_property
    def n0_inv(self) -> int:
        """-p^{-1} mod 2^LIMB_BITS (Montgomery constant)."""
        return (-pow(self.modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)

    @functools.cached_property
    def num_bits(self) -> int:
        return self.modulus.bit_length()

    @functools.cached_property
    def two_adic_root(self) -> int:
        """Root of unity of order 2^two_adicity: g^((p-1)/2^s)."""
        if self.two_adicity == 0:
            return 0
        q = (self.modulus - 1) >> self.two_adicity
        return pow(self.multiplicative_generator, q, self.modulus)

    # ---- derived numpy limb arrays (jit constants) ----
    @functools.cached_property
    def p_limbs(self) -> np.ndarray:
        return int_to_limbs(self.modulus, self.n_limbs)

    @functools.cached_property
    def r_limbs(self) -> np.ndarray:
        """R mod p, i.e. Montgomery form of 1."""
        return int_to_limbs(self.R_mod_p, self.n_limbs)

    @functools.cached_property
    def r2_limbs(self) -> np.ndarray:
        return int_to_limbs(self.R2_mod_p, self.n_limbs)

    @functools.cached_property
    def zero_limbs(self) -> np.ndarray:
        return np.zeros((self.n_limbs,), dtype=np.uint32)

    @functools.cached_property
    def inv_exp_bits(self) -> np.ndarray:
        """Bits of p-2 (MSB first) for Fermat inversion."""
        e = self.modulus - 2
        return np.array(
            [(e >> i) & 1 for i in reversed(range(e.bit_length()))], dtype=np.int32
        )

    def serialized_size(self) -> int:
        """arkworks CanonicalSerialize size: ceil(num_bits/8) LE bytes."""
        return (self.num_bits + 7) // 8


# ---------------------------------------------------------------------------
# BLS12-381 (the primary pairing curve; cf. reference tests over ark-bls12-381)
# ---------------------------------------------------------------------------

BLS12_381_R = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
BLS12_381_Q = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB

FR_BLS12_381 = FieldSpec(
    name="fr_bls12_381",
    modulus=BLS12_381_R,
    n_limbs=16,
    two_adicity=32,
    multiplicative_generator=7,
)

FQ_BLS12_381 = FieldSpec(
    name="fq_bls12_381",
    modulus=BLS12_381_Q,
    n_limbs=24,
    two_adicity=1,
    multiplicative_generator=2,
)

# BLS12-381 G1 generator (affine, standard)
BLS12_381_G1_X = 3685416753713387016781088315183077757961620795782546409894578378688607592378376318836054947676345821548104185464507
BLS12_381_G1_Y = 1339506544944476473020471379941921221584933875938349620426543736416511423956333506472724655353366534992391756441569

# BLS12-381 G2 generator (affine over Fq2 = Fq[u]/(u^2+1); (c0, c1) pairs)
BLS12_381_G2_X = (
    352701069587466618187139116011060144890029952792775240219908644239793785735715026873347600343865175952761926303160,
    3059144344244213709971259814753781636986470325476647558659373206291635324768958432433509563104347017837885763365758,
)
BLS12_381_G2_Y = (
    1985150602287291935568054521177171638300868978215655730859378665066344726373823718423869104263333984641494340347905,
    927553665492332455747201965776037880757740193453592970025027978793976877002675564980949289727957565575433344219582,
)

# BLS12-381 curve: y^2 = x^3 + 4 ; G2 twist: y^2 = x^3 + 4(u+1)
BLS12_381_B = 4
BLS12_381_X_PARAM = -0xD201000000010000  # BLS parameter t (negative)
BLS12_381_COFACTOR_G1 = 0x396C8C005555E1568C00AAAB0000AAAB
# (x^8 - 4x^7 + 5x^6 - 4x^4 + 6x^3 - 4x^2 - 4x + 13)/9 for the BLS parameter
# x = -0xd201000000010000; verified r*(h2*Q) = infinity for random twist Q
BLS12_381_COFACTOR_G2 = 0x5D543A95414E7F1091D50792876A202CD91DE4547085ABAA68A205B2E5A7DDFA628F1CB4D9E82EF21537E293A6691AE1616EC6E786F0C70CF1C38E31C7238E5

# ---------------------------------------------------------------------------
# BLS12-377 (used by reference tests alongside 381)
# ---------------------------------------------------------------------------

BLS12_377_R = 0x12AB655E9A2CA55660B44D1E5C37B00159AA76FED00000010A11800000000001
BLS12_377_Q = 0x01AE3A4617C510EAC63B05C06CA1493B1A22D9F300F5138F1EF3622FBA094800170B5D44300000008508C00000000001

FR_BLS12_377 = FieldSpec(
    name="fr_bls12_377",
    modulus=BLS12_377_R,
    n_limbs=16,
    two_adicity=47,
    multiplicative_generator=22,
)

FQ_BLS12_377 = FieldSpec(
    name="fq_bls12_377",
    modulus=BLS12_377_Q,
    n_limbs=24,
    two_adicity=46,
    multiplicative_generator=15,
)

BLS12_377_G1_X = 81937999373150964239938255573465948239988671502647976594219695644855304257327692006745978603320413799295628339695
BLS12_377_G1_Y = 241266749859715473739788878240585681733927191168601896383759122102112907357779751001206799952863815012735208165030
BLS12_377_B = 1
BLS12_377_X_PARAM = 0x8508C00000000001  # positive

# G2 (D-twist over Fq2 = Fq[u]/(u^2+5); curve y^2 = x^3 - u/5). Constants
# validated structurally: generator on-curve, order r, and b' == b/xi for
# xi = u (tests/test_pairing_377.py).
BLS12_377_G2_X = (
    233578398248691099356572568220835526895379068987715365179118596935057653620464273615301663571204657964920925606294,
    140913150380207355837477652521042157274541796891053068589147167627541651775299824604154852141315666357241556069118,
)
BLS12_377_G2_Y = (
    63160294768292073209381361943935198908131692476676907196754037919244929611450776219210369229519898517858833747423,
    149157405641012693445398062341192467754805999074082136895788947234480009303640899064710353187729182149407503257491,
)
# b' = -u/5: c1 = -(5^-1) mod q
BLS12_377_G2_B = (
    0,
    155198655607781456406391640216936120121836107652948796323930557600032281009004493664981332883744016074664192874906,
)

# ---------------------------------------------------------------------------
# BN254 (bench curve: Hyrax over BN254 G1; Ligero/Brakedown over BN254 Fr)
# ---------------------------------------------------------------------------

BN254_R = 21888242871839275222246405745257275088548364400416034343698204186575808495617
BN254_Q = 21888242871839275222246405745257275088696311157297823662689037894645226208583

FR_BN254 = FieldSpec(
    name="fr_bn254",
    modulus=BN254_R,
    n_limbs=16,
    two_adicity=28,
    multiplicative_generator=5,
)

FQ_BN254 = FieldSpec(
    name="fq_bn254",
    modulus=BN254_Q,
    n_limbs=16,
    two_adicity=1,
    multiplicative_generator=3,
)

BN254_G1_X = 1
BN254_G1_Y = 2
BN254_B = 3

# ---------------------------------------------------------------------------
# JubJub (ark-ed-on-bls12-381): twisted Edwards a*x^2+y^2 = 1+d*x^2*y^2 over
# Fr of BLS12-381; the IPA bench group (benches/ipa_times.rs).
# ---------------------------------------------------------------------------

JUBJUB_FQ = FR_BLS12_381  # base field of JubJub == scalar field of BLS12-381
JUBJUB_R = 6554484396890773809930967563523245729705921265872317281365359162392183254199
JUBJUB_COFACTOR = 8
JUBJUB_A = BLS12_381_R - 1  # a = -1
# d = -(10240/10241) mod r
JUBJUB_D = (-10240 * pow(10241, -1, BLS12_381_R)) % BLS12_381_R
JUBJUB_G_X = 8076246640662884909881801758704306714034609987455869804520522091855516602923
JUBJUB_G_Y = 13262374693698910701929044844600465831413122818447359594527400194675274060458

FR_JUBJUB = FieldSpec(
    name="fr_jubjub",
    modulus=JUBJUB_R,
    n_limbs=16,
    two_adicity=1,
    multiplicative_generator=6,
)
