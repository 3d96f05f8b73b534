"""Encrypted-PDF support (standard security handler, empty user
password): AES/RC4 primitives against published known-answer vectors,
and end-to-end extract_pages over RC4-40, RC4-128 and AES-128 documents
built by the module's own encryption direction (Algorithms 2-5 both
ways — a self-consistency bug would break the round trip)."""

from __future__ import annotations

import zlib

import pytest

from pixeltable_spark.functions import pdf_codec, pdf_crypto as pc


class TestPrimitives:
    def test_aes_fips197_kat(self):
        # FIPS-197 Appendix C.1
        key = bytes(range(16))
        pt = bytes.fromhex("00112233445566778899aabbccddeeff")
        rk = pc._expand_key(key)
        ct = pc._aes128_encrypt_block(rk, pt)
        assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
        assert pc._aes128_decrypt_block(rk, ct) == pt

    def test_sbox_derivation(self):
        # spot values of the computed (not embedded) S-box
        assert pc._SBOX[0x00] == 0x63
        assert pc._SBOX[0x01] == 0x7C
        assert pc._SBOX[0x53] == 0xED
        assert pc._INV_SBOX[0x63] == 0x00
        assert sorted(pc._SBOX) == list(range(256))  # a permutation

    def test_rc4_kat(self):
        assert pc.rc4(b"Key", b"Plaintext").hex().upper() \
            == "BBF316E8D940AF0AD3"
        assert pc.rc4(b"Wiki", b"pedia").hex().upper() == "1021BF0420"

    def test_cbc_round_trip(self):
        key = b"0123456789abcdef"
        for n in (0, 1, 15, 16, 17, 100):
            data = bytes(range(256))[:n]
            enc = pc.aes128_cbc_encrypt(key, b"\x07" * 16, data)
            assert pc.aes128_cbc_decrypt(key, enc) == data


_ID0 = bytes(range(16))


def _encrypted_pdf(pages, v, r, bits, aes=False, user_pw=b""):
    """The _make_pdf layout with every stream encrypted per object key."""
    enc_body = pc.build_encrypt_dict(r, v, bits, -44, _ID0, aes=aes,
                                     user_pw=user_pw)
    dec = pc.PdfDecryptor(enc_body, _ID0) if user_pw == b"" else None
    if dec is None:
        # password-protected fixture: derive the real key directly
        class _K:
            pass
        dec = object.__new__(pc.PdfDecryptor)
        dec.r, dec.v, dec.n = r, v, bits // 8
        dec.aes = aes
        o = pc.PdfDecryptor._string_value(enc_body, rb"/O")
        dec.key = pc._derive_file_key(r, bits // 8, o, -44, _ID0, user_pw)
    objs = []
    page_refs = []
    for i, lines in enumerate(pages):
        content_id = 3 + 2 * i
        page_id = content_id + 1
        ops = "BT /F1 12 Tf 72 720 Td " + " T* ".join(
            f"({ln}) Tj" for ln in lines) + " ET"
        stream = dec.encrypt(content_id, 0,
                             zlib.compress(ops.encode("latin-1")),
                             iv=bytes([i]) * 16)
        objs.append((content_id,
                     b"<< /Filter /FlateDecode /Length "
                     + str(len(stream)).encode() + b" >>\nstream\n"
                     + stream + b"\nendstream\n"))
        objs.append((page_id,
                     f"<< /Type /Page /Parent 2 0 R "
                     f"/Contents {content_id} 0 R >>\n".encode()))
        page_refs.append(page_id)
    kids = " ".join(f"{x} 0 R" for x in page_refs)
    objs.insert(0, (2, f"<< /Type /Pages /Kids [{kids}] "
                       f"/Count {len(pages)} >>\n".encode()))
    objs.insert(0, (1, b"<< /Type /Catalog /Pages 2 0 R >>\n"))
    enc_id = 3 + 2 * len(pages)
    objs.append((enc_id, enc_body + b"\n"))
    out = bytearray(b"%PDF-1.6\n")
    for num, body in objs:
        out += f"{num} 0 obj\n".encode() + body + b"endobj\n"
    out += (b"trailer << /Root 1 0 R /Encrypt "
            + str(enc_id).encode() + b" 0 R /ID [<"
            + _ID0.hex().encode() + b"> <" + _ID0.hex().encode()
            + b">] >>\n%%EOF")
    return bytes(out)


PAGES = [["first page line one", "second line"], ["page two text"]]


class TestEncryptedPdf:
    @pytest.mark.parametrize("v,r,bits,aes", [
        (1, 2, 40, False),     # classic RC4-40
        (2, 3, 128, False),    # RC4-128
        (4, 4, 128, True),     # AES-128 /AESV2
    ])
    def test_extracts_empty_user_password(self, v, r, bits, aes):
        pdf = _encrypted_pdf(PAGES, v, r, bits, aes=aes)
        pages = pdf_codec.extract_pages(pdf)
        assert len(pages) == 2
        assert "first page line one" in pages[0]
        assert "second line" in pages[0]
        assert "page two text" in pages[1]

    def test_password_protected_raises(self):
        pdf = _encrypted_pdf(PAGES, 2, 3, 128, user_pw=b"secret")
        with pytest.raises(ValueError, match="password-protected"):
            pdf_codec.extract_pages(pdf)

    def test_v5_raises(self):
        enc = (b"<< /Filter /Standard /V 5 /R 6 /Length 256 /P -44 "
               b"/O <" + b"00" * 48 + b"> /U <" + b"00" * 48 + b"> >>")
        with pytest.raises(ValueError, match="V=5"):
            pc.PdfDecryptor(enc, _ID0)

    def test_non_standard_handler_raises(self):
        with pytest.raises(ValueError, match="security handler"):
            pc.PdfDecryptor(b"<< /Filter /MyCustom /V 1 /R 2 >>", _ID0)

    def test_object_keys_differ_per_object(self):
        enc_body = pc.build_encrypt_dict(3, 2, 128, -44, _ID0)
        d = pc.PdfDecryptor(enc_body, _ID0)
        assert d.object_key(3, 0) != d.object_key(4, 0)
        assert d.decrypt(3, 0, d.encrypt(3, 0, b"payload")) == b"payload"
