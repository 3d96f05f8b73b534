"""Standard-security-handler PDF decryption (ISO 32000 §7.6): RC4
(/V 1-2, 40-128 bit) and AES-128-CBC (/V 4 with /AESV2), for documents
with an EMPTY user password — the common "permissions-only" encryption
every office suite emits (an owner password restricts editing, but
readers decrypt with the empty user password). Non-empty user passwords
raise — there is nothing honest to do without the password.

Everything is derived from first principles with stdlib only:

* RC4 is the classic 8-line KSA/PRGA.
* AES-128 builds its S-box from the GF(2^8) multiplicative inverse plus
  the affine transform (no embedded tables), expands the key per FIPS-197,
  and runs the inverse cipher (InvShiftRows/InvSubBytes/InvMixColumns).
* Key derivation is ISO 32000 Algorithm 2 (MD5 over the padded password,
  /O, /P and the file /ID, with the R>=3 50-fold MD5 squeeze), user
  password verification is Algorithm 4/5, per-object keys Algorithm 1
  (objnum/gennum little-endian + the AESV2 "sAlT").

The encryption direction (Algorithms 3/4/5 producing /O and /U) is also
implemented so tests can round-trip real encrypted files without any
external tool.

Reference parity: pixeltable delegates PDF handling to pdfminer/fitz
(reference pixeltable/iterators/document.py), which decrypt via their own
crypt filters; this module covers the same empty-user-password class.
"""

from __future__ import annotations

import hashlib
import re
import struct
from typing import Optional

_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def _md5(b: bytes) -> bytes:
    return hashlib.md5(b).digest()


def _pad_password(pw: bytes) -> bytes:
    return (pw + _PAD)[:32]


# ---------------------------------------------------------------------------
# RC4
# ---------------------------------------------------------------------------

def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------------------
# AES-128 (FIPS-197), tables computed not embedded
# ---------------------------------------------------------------------------

def _gf_mul(a: int, b: int) -> int:
    p = 0
    while b:
        if b & 1:
            p ^= a
        a <<= 1
        if a & 0x100:
            a ^= 0x11B
        b >>= 1
    return p


def _build_sbox() -> tuple:
    inv = [0] * 256
    for x in range(1, 256):
        for y in range(1, 256):
            if _gf_mul(x, y) == 1:
                inv[x] = y
                break
    sbox = [_affine(inv[x]) for x in range(256)]
    inv_sbox = [0] * 256
    for x, v in enumerate(sbox):
        inv_sbox[v] = x
    return bytes(sbox), bytes(inv_sbox)


def _affine(b: int) -> int:
    r = 0
    c = 0x63
    for i in range(8):
        bit = ((b >> i) ^ (b >> ((i + 4) % 8)) ^ (b >> ((i + 5) % 8))
               ^ (b >> ((i + 6) % 8)) ^ (b >> ((i + 7) % 8)) ^ (c >> i)) & 1
        r |= bit << i
    return r


_SBOX, _INV_SBOX = _build_sbox()


def _expand_key(key: bytes) -> list:
    """Round keys as 11 lists of 16 bytes (AES-128)."""
    w = [list(key[i:i + 4]) for i in range(0, 16, 4)]
    rcon = 1
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[x] for x in t]
            t[0] ^= rcon
            rcon = _gf_mul(rcon, 2)
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    return [sum((w[4 * r + c] for c in range(4)), []) for r in range(11)]


def _inv_mix_columns(st: list) -> list:
    out = [0] * 16
    for c in range(4):
        col = st[4 * c:4 * c + 4]
        out[4 * c + 0] = (_gf_mul(col[0], 14) ^ _gf_mul(col[1], 11)
                          ^ _gf_mul(col[2], 13) ^ _gf_mul(col[3], 9))
        out[4 * c + 1] = (_gf_mul(col[0], 9) ^ _gf_mul(col[1], 14)
                          ^ _gf_mul(col[2], 11) ^ _gf_mul(col[3], 13))
        out[4 * c + 2] = (_gf_mul(col[0], 13) ^ _gf_mul(col[1], 9)
                          ^ _gf_mul(col[2], 14) ^ _gf_mul(col[3], 11))
        out[4 * c + 3] = (_gf_mul(col[0], 11) ^ _gf_mul(col[1], 13)
                          ^ _gf_mul(col[2], 9) ^ _gf_mul(col[3], 14))
    return out


def _mix_columns(st: list) -> list:
    out = [0] * 16
    for c in range(4):
        col = st[4 * c:4 * c + 4]
        out[4 * c + 0] = (_gf_mul(col[0], 2) ^ _gf_mul(col[1], 3)
                          ^ col[2] ^ col[3])
        out[4 * c + 1] = (col[0] ^ _gf_mul(col[1], 2)
                          ^ _gf_mul(col[2], 3) ^ col[3])
        out[4 * c + 2] = (col[0] ^ col[1]
                          ^ _gf_mul(col[2], 2) ^ _gf_mul(col[3], 3))
        out[4 * c + 3] = (_gf_mul(col[0], 3) ^ col[1]
                          ^ col[2] ^ _gf_mul(col[3], 2))
    return out


# state layout: st[4*c + r] = byte at row r, column c (FIPS-197 order)

def _shift_rows(st: list, inv: bool = False) -> list:
    out = [0] * 16
    for r in range(4):
        for c in range(4):
            src_c = (c + (-r if inv else r)) % 4
            out[4 * c + r] = st[4 * src_c + r]
    return out


def _aes128_decrypt_block(rk: list, block: bytes) -> bytes:
    st = [b for b in block]
    st = [b ^ k for b, k in zip(st, rk[10])]
    for rnd in range(9, 0, -1):
        st = _shift_rows(st, inv=True)
        st = [_INV_SBOX[b] for b in st]
        st = [b ^ k for b, k in zip(st, rk[rnd])]
        st = _inv_mix_columns(st)
    st = _shift_rows(st, inv=True)
    st = [_INV_SBOX[b] for b in st]
    st = [b ^ k for b, k in zip(st, rk[0])]
    return bytes(st)


def _aes128_encrypt_block(rk: list, block: bytes) -> bytes:
    st = [b for b in block]
    st = [b ^ k for b, k in zip(st, rk[0])]
    for rnd in range(1, 10):
        st = [_SBOX[b] for b in st]
        st = _shift_rows(st)
        st = _mix_columns(st)
        st = [b ^ k for b, k in zip(st, rk[rnd])]
    st = [_SBOX[b] for b in st]
    st = _shift_rows(st)
    st = [b ^ k for b, k in zip(st, rk[10])]
    return bytes(st)


def aes128_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF AESV2 layout: 16-byte IV prefix, PKCS#5-padded CBC body."""
    if len(data) < 32 or len(data) % 16:
        raise ValueError("bad AES-CBC payload length")
    rk = _expand_key(key)
    iv = data[:16]
    out = bytearray()
    prev = iv
    for off in range(16, len(data), 16):
        blk = data[off:off + 16]
        dec = _aes128_decrypt_block(rk, blk)
        out += bytes(a ^ b for a, b in zip(dec, prev))
        prev = blk
    pad = out[-1]
    if not 1 <= pad <= 16:
        raise ValueError("bad AES padding")
    return bytes(out[:-pad])


def aes128_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    rk = _expand_key(key)
    pad = 16 - (len(data) % 16)
    data = data + bytes([pad]) * pad
    out = bytearray(iv)
    prev = iv
    for off in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[off:off + 16], prev))
        prev = _aes128_encrypt_block(rk, blk)
        out += prev
    return bytes(out)


# ---------------------------------------------------------------------------
# Standard security handler
# ---------------------------------------------------------------------------

def _derive_file_key(r: int, n: int, o: bytes, p: int, id0: bytes,
                     user_pw: bytes = b"",
                     encrypt_metadata: bool = True) -> bytes:
    """ISO 32000 Algorithm 2."""
    h = _pad_password(user_pw) + o[:32] + struct.pack("<i", p) + id0
    if r >= 4 and not encrypt_metadata:
        h += b"\xff\xff\xff\xff"
    key = _md5(h)
    if r >= 3:
        for _ in range(50):
            key = _md5(key[:n])
    return key[:n]


def _compute_o(owner_pw: bytes, user_pw: bytes, r: int, n: int) -> bytes:
    """Algorithm 3: the /O entry."""
    h = _md5(_pad_password(owner_pw or user_pw))
    if r >= 3:
        for _ in range(50):
            h = _md5(h)
    rc4_key = h[:n]
    o = rc4(rc4_key, _pad_password(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in rc4_key), o)
    return o


def _compute_u(file_key: bytes, r: int, id0: bytes) -> bytes:
    """Algorithm 4 (R2) / 5 (R>=3): the /U entry."""
    if r == 2:
        return rc4(file_key, _PAD)
    x = _md5(_PAD + id0)
    x = rc4(file_key, x)
    for i in range(1, 20):
        x = rc4(bytes(b ^ i for b in file_key), x)
    return x + b"\x00" * 16


class PdfDecryptor:
    """Parsed /Encrypt dictionary + the file key for the empty user
    password. Raises ValueError for unsupported handlers/versions or when
    the document actually requires a (non-empty) user password."""

    def __init__(self, enc_body: bytes, id0: bytes):
        def _int(key: bytes, default: Optional[int] = None) -> int:
            m = re.search(key + rb"\s+(-?\d+)", enc_body)
            if m:
                return int(m.group(1))
            if default is None:
                raise ValueError(f"missing {key.decode()} in /Encrypt")
            return default

        if not re.search(rb"/Filter\s*/Standard\b", enc_body):
            raise ValueError("unsupported PDF security handler "
                             "(only /Standard)")
        self.v = _int(rb"/V", 0)
        self.r = _int(rb"/R")
        self.p = _int(rb"/P")
        if self.v not in (1, 2, 4) or self.r not in (2, 3, 4):
            raise ValueError(
                f"unsupported PDF encryption V={self.v} R={self.r} "
                "(V5/R6 AES-256 needs the 2.0 handler)")
        length_bits = _int(rb"/Length", 40)
        self.aes = False
        if self.v == 4:
            # crypt filters: only the stock /StdCF with /V2 (RC4) or /AESV2
            if re.search(rb"/CFM\s*/AESV2\b", enc_body):
                self.aes = True
                length_bits = 128
            elif re.search(rb"/CFM\s*/V2\b", enc_body):
                self.aes = False
            elif re.search(rb"/CFM\s*/Identity\b", enc_body) \
                    or b"/CFM" not in enc_body:
                self.aes = False
        self.n = length_bits // 8
        o = self._string_value(enc_body, rb"/O")
        u = self._string_value(enc_body, rb"/U")
        if o is None or u is None or len(o) < 32:
            raise ValueError("malformed /Encrypt (missing /O or /U)")
        self.encrypt_metadata = not re.search(
            rb"/EncryptMetadata\s+false", enc_body)
        self.key = _derive_file_key(self.r, self.n, o, self.p, id0,
                                    b"", self.encrypt_metadata)
        expect = _compute_u(self.key, self.r, id0)
        got, want = (u[:16], expect[:16]) if self.r >= 3 else (u[:32],
                                                               expect[:32])
        if got != want:
            raise ValueError(
                "password-protected PDF (non-empty user password)")

    @staticmethod
    def _string_value(body: bytes, key: bytes) -> Optional[bytes]:
        m = re.search(key + rb"\s*\(", body)
        if m:
            # literal string with PDF escapes
            out = bytearray()
            i = m.end()
            depth = 1
            while i < len(body) and depth:
                c = body[i]
                if c == 0x5C and i + 1 < len(body):  # backslash
                    nxt = body[i + 1]
                    esc = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12,
                           0x28: 40, 0x29: 41, 0x5C: 92}
                    if nxt in esc:
                        out.append(esc[nxt])
                        i += 2
                        continue
                    mo = re.match(rb"[0-7]{1,3}", body[i + 1:i + 4])
                    if mo:
                        out.append(int(mo.group(0), 8) & 0xFF)
                        i += 1 + len(mo.group(0))
                        continue
                    i += 1
                    continue
                if c == 0x28:
                    depth += 1
                elif c == 0x29:
                    depth -= 1
                    if not depth:
                        break
                out.append(c)
                i += 1
            return bytes(out)
        m = re.search(key + rb"\s*<([0-9A-Fa-f\s]*)>", body)
        if m:
            hx = re.sub(rb"\s", b"", m.group(1))
            if len(hx) % 2:
                hx += b"0"
            return bytes.fromhex(hx.decode())
        return None

    def object_key(self, num: int, gen: int) -> bytes:
        """Algorithm 1 per-object key."""
        h = (self.key + struct.pack("<I", num)[:3]
             + struct.pack("<H", gen & 0xFFFF))
        if self.aes:
            h += b"\x73\x41\x6c\x54"  # "sAlT"
        return _md5(h)[:min(self.n + 5, 16)]

    def decrypt(self, num: int, gen: int, data: bytes) -> bytes:
        k = self.object_key(num, gen)
        if self.aes:
            return aes128_cbc_decrypt(k, data)
        return rc4(k, data)

    def encrypt(self, num: int, gen: int, data: bytes,
                iv: bytes = b"\x00" * 16) -> bytes:
        """Inverse of decrypt — used by the test-side encryptor."""
        k = self.object_key(num, gen)
        if self.aes:
            return aes128_cbc_encrypt(k, iv, data)
        return rc4(k, data)


def build_encrypt_dict(r: int, v: int, length_bits: int, p: int,
                       id0: bytes, owner_pw: bytes = b"owner",
                       aes: bool = False, user_pw: bytes = b"") -> bytes:
    """An /Encrypt dictionary body (by default for an empty-user-password
    document) — the test-side counterpart of PdfDecryptor
    (Algorithms 2/3/4/5)."""
    n = length_bits // 8
    o = _compute_o(owner_pw, user_pw, r, n)
    key = _derive_file_key(r, n, o, p, id0, user_pw)
    u = _compute_u(key, r, id0)
    if r == 2:
        u = u[:32]
    parts = [b"<< /Filter /Standard",
             b"/V %d /R %d /Length %d /P %d" % (v, r, length_bits, p)]
    if v == 4:
        cfm = b"/AESV2" if aes else b"/V2"
        parts.append(b"/CF << /StdCF << /CFM " + cfm
                     + b" /AuthEvent /DocOpen >> >>"
                       b" /StmF /StdCF /StrF /StdCF")
    parts.append(b"/O <" + o.hex().encode() + b">")
    parts.append(b"/U <" + u.hex().encode() + b">")
    parts.append(b">>")
    return b" ".join(parts)
