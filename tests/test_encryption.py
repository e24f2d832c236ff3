"""Crypto primitives pinned by published vectors, plus the encrypted
fixtures end-to-end (empty user password)."""

from pdf_ray.pdfcore.encryption import (
    aes128_cbc_decrypt,
    aes128_cbc_encrypt,
    rc4,
    _aes_decrypt_block,
    _aes_encrypt_block,
    _expand_key,
)


def test_rc4_classic_vectors():
    # well-known RC4 test vectors (e.g. Wikipedia / original posting)
    assert rc4(b"Key", b"Plaintext") == bytes.fromhex("bbf316e8d940af0ad3")
    assert rc4(b"Wiki", b"pedia") == bytes.fromhex("1021bf0420")
    assert rc4(b"Secret", b"Attack at dawn") == bytes.fromhex(
        "45a01f645fc35b383552544b9bf5"
    )


def test_rc4_is_involutive():
    key = b"\x01\x02\x03\x04\x05"
    data = bytes(range(256))
    assert rc4(key, rc4(key, data)) == data


def test_aes128_fips197_vector():
    # FIPS-197 Appendix B
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    plain = bytes.fromhex("3243f6a8885a308d313198a2e0370734")
    cipher = bytes.fromhex("3925841d02dc09fbdc118597196a0b32")
    rk = _expand_key(key)
    assert _aes_encrypt_block(plain, rk) == cipher
    assert _aes_decrypt_block(cipher, rk) == plain


def test_aes_cbc_roundtrip():
    key = bytes(range(16))
    iv = bytes(range(16, 32))
    for payload in (b"", b"x", b"exactly 16 bytes", b"a longer payload spanning blocks!"):
        enc = aes128_cbc_encrypt(key, iv, payload)
        assert aes128_cbc_decrypt(key, enc) == payload


def test_encrypted_fixtures_extract():
    from pdf_ray.fixtures.corpus import FIXTURES
    from pdf_ray.pdfcore.interp import extract_spans

    for name in ("f22", "f23"):
        pdf, golden = FIXTURES[name]()
        spans, _ = extract_spans(pdf)
        assert spans == golden, name


def test_encrypted_string_decryption():
    """A literal string OUTSIDE any stream must be decrypted with the
    string filter (here same as stream filter)."""
    from pdf_ray.fixtures.corpus import _encrypted_fixture
    from pdf_ray.pdfcore.document import Document

    pdf, _ = _encrypted_fixture(aes=False)
    doc = Document(pdf)
    assert doc.security is not None
    # page content already proves stream decryption; check the key length
    assert len(doc.security.file_key) == 5


def test_v4_identity_stmf_passthrough():
    """StmF=Identity must pass stream bytes through untouched while
    StrF=StdCF still decrypts strings (separate crypt filters)."""
    from pdf_ray.pdfcore.encryption import StandardSecurityHandler

    enc = {
        "Filter": "Standard",
        "V": 4,
        "R": 4,
        "Length": 128,
        "CF": {"StdCF": {"CFM": "V2", "Length": 16}},
        "StmF": "Identity",
        "StrF": "StdCF",
        "O": "x" * 32,
        "U": "y" * 32,
        "P": -4,
    }
    h = StandardSecurityHandler(enc, b"fileid")
    assert h.stm_cfm == "Identity"
    assert h.str_cfm == "V2"

    class Ref:
        num, gen = 7, 0

    plain = b"stream bytes stay as-is"
    assert h.decrypt_bytes(plain, Ref, h.stm_cfm) == plain
    assert h.decrypt_bytes(plain, Ref, h.str_cfm) != plain


def test_aes256_fips_c3_vector():
    from pdf_ray.pdfcore.encryption import (
        _aes_decrypt_block,
        _aes_encrypt_block,
        _expand_key,
    )

    key = bytes(range(32))
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    rk = _expand_key(key)
    ct = _aes_encrypt_block(pt, rk)
    assert ct.hex() == "8ea2b7ca516745bfeafc49904b496089"  # FIPS-197 C.3
    assert _aes_decrypt_block(ct, rk) == pt


def test_v5_r6_fixture_roundtrip():
    from pdf_ray.fixtures.corpus import f30_encrypted_aes256
    from pdf_ray.pdfcore.document import Document
    from pdf_ray.pdfcore.interp import Interpreter

    pdf, golden = f30_encrypted_aes256()
    doc = Document(pdf)
    interp = Interpreter(doc)
    interp.run()
    assert interp.spans == [("text", "AES-256 text", None)]


def test_v5_wrong_password_raises():
    import pytest

    from pdf_ray.fixtures.corpus import f30_encrypted_aes256
    from pdf_ray.pdfcore.document import Document
    from pdf_ray.pdfcore.objects import PdfParseError

    pdf, _ = f30_encrypted_aes256()
    # corrupt the validation hash inside /U (first hex digit pair of <U>)
    import re

    m = re.search(rb"/U <([0-9a-f]{96})>", pdf)
    assert m
    u = bytearray(m.group(1))
    u[0:2] = b"00" if u[0:2] != b"00" else b"ff"
    broken = pdf[: m.start(1)] + bytes(u) + pdf[m.end(1) :]
    with pytest.raises(PdfParseError):
        Document(broken)


def test_hash_2b_deterministic_and_sensitive():
    from pdf_ray.pdfcore.encryption import hash_2b

    a = hash_2b(b"", b"saltsalt")
    assert len(a) == 32
    assert a == hash_2b(b"", b"saltsalt")
    assert a != hash_2b(b"", b"SALTSALT")
    assert a != hash_2b(b"x", b"saltsalt")


def test_aes_fast_path_fips197_vectors():
    """Pin the T-table fast path (the only cipher used by the R6 hash_2b)
    to the FIPS-197 C.1/C.3 vectors and to the slow pinned path — a
    regression here would otherwise only surface on real AES-256 R6 PDFs
    (the fixture roundtrip uses the same code both ways)."""
    from pdf_ray.pdfcore.encryption import (
        _aes_encrypt_block_fast,
        _expand_key_words,
        aes_cbc_encrypt_nopad,
    )

    plain = bytes.fromhex("00112233445566778899aabbccddeeff")
    # C.1 AES-128
    k128 = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    assert (
        _aes_encrypt_block_fast(plain, _expand_key_words(k128)).hex()
        == "69c4e0d86a7b0430d8cdb78070b4c55a"
    )
    # C.3 AES-256
    k256 = bytes.fromhex(
        "000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f"
    )
    assert (
        _aes_encrypt_block_fast(plain, _expand_key_words(k256)).hex()
        == "8ea2b7ca516745bfeafc49904b496089"
    )
    # fast path == slow pinned path on random-ish keys/blocks
    import hashlib

    for i in range(4):
        key = hashlib.sha256(bytes([i])).digest()[: 16 if i % 2 else 32]
        blk = hashlib.md5(bytes([i])).digest()
        assert _aes_encrypt_block_fast(blk, _expand_key_words(key)) == (
            _aes_encrypt_block(blk, _expand_key(key))
        )
    # CBC-nopad over two blocks: chain check against the block cipher
    iv = bytes(range(16))
    data = bytes(range(32))
    ct = aes_cbc_encrypt_nopad(k128, iv, data)
    rk = _expand_key_words(k128)
    b0 = _aes_encrypt_block_fast(bytes(a ^ b for a, b in zip(data[:16], iv)), rk)
    b1 = _aes_encrypt_block_fast(bytes(a ^ b for a, b in zip(data[16:], b0)), rk)
    assert ct == b0 + b1
