"""Cross-validation against EXTERNAL public test vectors + arkworks
serialization-format checks (the correctness north star, SURVEY §2.3 /
BASELINE.md).

External ground truth used (independent of this repo's own constants):
  - RFC 8439 §2.3.2 ChaCha20 block function vector (validates the HostRng
    CSPRNG core).
  - zcash/IETF BLS12-381 serialization of the G1/G2 generators (the
    canonical public encodings, validating our curve constants, compression
    and sign logic end-to-end).
  - splitmix64(0) known outputs (validates the rand-core seed expansion
    used by the arkworks StdRng emulation in core/ark_compat.py).

arkworks-format (ark-serialize SWFlags) checks are structural + roundtrip:
LE layout, flag bit positions (0x80 y-is-negative, 0x40 infinity on the
last byte), compressed y-recovery (kzg10/data_structures.rs:57-112).
"""

import numpy as np

from poly_commit_tpu.core import curve as C
from poly_commit_tpu.core import field_params as FP
from poly_commit_tpu.core import serialize as S
from poly_commit_tpu.pcs.data_structures import HostRng, _chacha_blocks

Q = FP.BLS12_381_Q


def test_chacha20_rfc8439_block_vector():
    """RFC 8439 §2.3.2: key 00..1f, nonce 00:00:00:09:00:00:00:4a:00:00:00:00,
    counter 1."""
    key = bytes(range(32))
    kw = np.frombuffer(key, "<u4")
    nonce = bytes.fromhex("000000090000004a00000000")
    nw = np.frombuffer(nonce, "<u4")
    out = _chacha_blocks(kw, 1, 1, nonce_words=nw)
    expect = bytes.fromhex(
        "10f1e7e4d13b5915500fdd1fa32071c4"
        "c7d1f4c733c068030422aa9ac3d46c4e"
        "d2826446079faa0914c2d705d98b02a2"
        "b5129cd1de164eb9cbd083e8a2503c4e"
    )
    assert out == expect


def test_hostrng_deterministic_and_streams_differ():
    a, b = HostRng(1), HostRng(1)
    assert a.bytes(100) == b.bytes(100)
    assert HostRng(1).bytes(64) != HostRng(2).bytes(64)
    # getrandbits boundaries
    r = HostRng(3)
    assert 0 <= r.getrandbits(1) <= 1
    v = HostRng(4).getrandbits(255)
    assert v < (1 << 255)


def test_zcash_g1_generator_encoding():
    """Public zcash-format compressed encoding of the BLS12-381 G1
    generator (48 bytes, flag bits in the first byte)."""
    pt = (FP.BLS12_381_G1_X, FP.BLS12_381_G1_Y, False)
    got = S.zcash_g1_to_bytes(pt, Q)
    expect = bytes.fromhex(
        "97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905"
        "a14e3a3f171bac586c55e83ff97a1aeffb3af00adb22c6bb"
    )
    assert got == expect


def test_zcash_g2_generator_encoding():
    """Public zcash-format compressed encoding of the BLS12-381 G2
    generator (96 bytes, x_c1 || x_c0 big-endian)."""
    pt = (FP.BLS12_381_G2_X, FP.BLS12_381_G2_Y, False)
    got = S.zcash_g2_to_bytes(pt, Q)
    expect = bytes.fromhex(
        "93e02b6052719f607dacd3a088274f65596bd0d09920b61a"
        "b5da61bbdc7f5049334cf11213945d57e5ac7d055d042b7e"
        "024aa2b2f08f0a91260805272dc51051c6e47ad4fa403b02"
        "b4510b647ae3d1770bac0326a805bbefd48056c8c121bdb8"
    )
    assert got == expect


def test_ark_g1_roundtrip_and_flags():
    G1 = C.BLS12_381_G1
    gen = (FP.BLS12_381_G1_X, FP.BLS12_381_G1_Y, False)
    comp = S.ark_point_to_bytes(G1, gen, compressed=True)
    assert len(comp) == 48
    # LE: low bytes of x first
    assert comp[:47] == FP.BLS12_381_G1_X.to_bytes(48, "little")[:47]
    back = S.ark_point_from_bytes(G1, comp, compressed=True)
    assert back == gen
    # the negated point flips only the y-is-negative flag
    neg = (FP.BLS12_381_G1_X, Q - FP.BLS12_381_G1_Y, False)
    comp_n = S.ark_point_to_bytes(G1, neg, compressed=True)
    assert comp_n[:47] == comp[:47]
    assert (comp_n[-1] ^ comp[-1]) == S.ARK_SW_Y_IS_NEGATIVE
    assert S.ark_point_from_bytes(G1, comp_n, compressed=True) == neg
    # infinity
    inf = S.ark_point_to_bytes(G1, (0, 0, True), compressed=True)
    assert inf[-1] == S.ARK_SW_INFINITY and not any(inf[:-1])
    assert S.ark_point_from_bytes(G1, inf, compressed=True)[2] is True
    # uncompressed
    unc = S.ark_point_to_bytes(G1, gen, compressed=False)
    assert len(unc) == 96
    assert S.ark_point_from_bytes(G1, unc, compressed=False) == gen


def test_ark_g2_roundtrip():
    G2 = C.BLS12_381_G2
    gen = (FP.BLS12_381_G2_X, FP.BLS12_381_G2_Y, False)
    comp = S.ark_point_to_bytes(G2, gen, compressed=True)
    assert len(comp) == 96
    assert S.ark_point_from_bytes(G2, comp, compressed=True) == gen
    neg = (gen[0], tuple((Q - c) % Q for c in gen[1]), False)
    comp_n = S.ark_point_to_bytes(G2, neg, compressed=True)
    assert S.ark_point_from_bytes(G2, comp_n, compressed=True) == neg
    assert comp_n[:-1] == comp[:-1]


def test_splitmix64_known_outputs():
    """Public splitmix64 outputs for seed 0 (the rand-core seed_from_u64
    expansion used by StdRng emulation)."""
    from poly_commit_tpu.core import ark_compat as AC

    g = AC.splitmix64_stream(0)
    assert next(g) == 0xE220A8397B1DCDAF
    assert next(g) == 0x6E789E6AA1B965F4


def test_chacha_core_rfc8439_via_ark_compat():
    """The shared quarter-round core at 20 rounds reproduces the RFC 8439
    block vector (counter/nonce words mapped into the DJB 64/64 layout)."""
    from poly_commit_tpu.core import ark_compat as AC

    key = np.frombuffer(bytes(range(32)), "<u4").astype(np.uint64)
    counter = 1 | (0x09000000 << 32)
    stream = 0x4A000000
    out = AC._chacha_block(key, counter, stream, rounds=20)
    expect = bytes.fromhex(
        "10f1e7e4d13b5915500fdd1fa32071c4"
        "c7d1f4c733c068030422aa9ac3d46c4e"
        "d2826446079faa0914c2d705d98b02a2"
        "b5129cd1de164eb9cbd083e8a2503c4e"
    )
    assert out == expect


def test_ark_poseidon_sponge_structure():
    """arkworks-test-config sponge: deterministic, consumes duplex state
    correctly, and the 39x3 ark table is stable across calls."""
    from poly_commit_tpu.core import ark_compat as AC
    from poly_commit_tpu.core.field_params import FR_BLS12_381 as spec

    ark1 = AC.poseidon_test_ark(spec)
    assert len(ark1) == 39 and all(len(r) == 3 for r in ark1)
    assert all(0 < v < spec.modulus for row in ark1 for v in row)
    assert ark1 == AC.poseidon_test_ark(spec)

    s1 = AC.ArkPoseidonSponge(spec)
    s2 = AC.ArkPoseidonSponge(spec)
    s1.absorb([1, 2, 3])
    s2.absorb([1, 2])
    s2.absorb([3])
    # arkworks absorb is position-based: splitting an absorb into two calls
    # fills the same rate slots => identical state
    assert s1.state == s2.state
    a = s1.squeeze_native_field_elements(3)
    b = s2.squeeze_native_field_elements(3)
    assert a == b and len(set(a)) == 3
    # 128-bit truncated challenge
    c = s1.squeeze_challenge_128()
    assert 0 <= c < (1 << 128)
    # different absorbed data -> different squeeze
    s3 = AC.ArkPoseidonSponge(spec)
    s3.absorb([1, 2, 4])
    assert s3.squeeze_native_field_elements(3) != a


def test_ark_roundtrip_random_points():
    """Random multiples of the generator roundtrip through the codec."""
    from tests.ref_ec import Fp, RefWeierstrass

    G1 = C.BLS12_381_G1
    ref = RefWeierstrass(Fp(Q), FP.BLS12_381_B)
    gen = (FP.BLS12_381_G1_X, FP.BLS12_381_G1_Y)
    for k in (2, 3, 12345, (1 << 200) + 7):
        x, y = ref.mul(gen, k)
        for compressed in (True, False):
            data = S.ark_point_to_bytes(G1, (x, y, False), compressed=compressed)
            assert S.ark_point_from_bytes(G1, data, compressed=compressed) == (
                x, y, False,
            )
