"""AES-128/192/256 in CBC mode, from the public FIPS-197 spec — the
cipher behind the PDF standard security handler's /AESV2 (V4/R4,
AES-128) and /AESV3 (V5/R6, AES-256) crypt filters (PDF 32000-1
§7.6.2-7.6.3; strings and streams carry a 16-byte IV prefix and
PKCS#7-style padding).

Pure Python on purpose: the sandbox has no crypto library, the data
volumes are tiny (per-object PDF payloads inside an Arrow-batched
kernel), and a table-driven byte implementation is deterministic and
dependency-free. The reference repo never decrypts PDFs itself (it
delegates to pypdf); this module exists so the rebuilt from-scratch
parser covers the encrypted shapes real crawled corpora contain.
"""

from __future__ import annotations

# -- tables (FIPS-197 §5.1.1) -------------------------------------------

_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16")
_INV_SBOX = bytes(256)
_INV_SBOX = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_INV_SBOX = bytes(_INV_SBOX)

_RCON = (0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36,
         0x6C, 0xD8, 0xAB, 0x4D)


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


# GF(2^8) multiply tables for the mix-columns constants
def _mul_table(c: int) -> bytes:
    out = bytearray(256)
    for x in range(256):
        r, a, b = 0, x, c
        while b:
            if b & 1:
                r ^= a
            a = _xtime(a)
            b >>= 1
        out[x] = r
    return bytes(out)


_M2, _M3 = _mul_table(2), _mul_table(3)
_M9, _M11, _M13, _M14 = (_mul_table(c) for c in (9, 11, 13, 14))


def _expand_key(key: bytes) -> list[bytes]:
    """Key schedule (§5.2) → list of 16-byte round keys."""
    nk = len(key) // 4
    assert nk in (4, 6, 8), "AES key must be 128/192/256 bits"
    nr = nk + 6
    w = [key[4 * i:4 * i + 4] for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = bytes((_SBOX[t[1]] ^ _RCON[i // nk - 1], _SBOX[t[2]],
                       _SBOX[t[3]], _SBOX[t[0]]))
        elif nk > 6 and i % nk == 4:
            t = bytes(_SBOX[b] for b in t)
        w.append(bytes(a ^ b for a, b in zip(w[i - nk], t)))
    return [b"".join(w[4 * r:4 * r + 4]) for r in range(nr + 1)]


def _encrypt_block(rk: list[bytes], b: bytes) -> bytes:
    s = bytearray(x ^ k for x, k in zip(b, rk[0]))
    nr = len(rk) - 1
    for rnd in range(1, nr):
        # SubBytes + ShiftRows fused (column-major state, §3.4)
        t = bytes(_SBOX[s[(i + 4 * (i % 4)) % 16]] for i in range(16))
        s = bytearray(16)
        for c in range(4):                        # MixColumns (§5.1.3)
            a0, a1, a2, a3 = t[4 * c:4 * c + 4]
            s[4 * c + 0] = _M2[a0] ^ _M3[a1] ^ a2 ^ a3
            s[4 * c + 1] = a0 ^ _M2[a1] ^ _M3[a2] ^ a3
            s[4 * c + 2] = a0 ^ a1 ^ _M2[a2] ^ _M3[a3]
            s[4 * c + 3] = _M3[a0] ^ a1 ^ a2 ^ _M2[a3]
        k = rk[rnd]
        for i in range(16):
            s[i] ^= k[i]
    t = bytes(_SBOX[s[(i + 4 * (i % 4)) % 16]] for i in range(16))
    return bytes(x ^ k for x, k in zip(t, rk[nr]))


def _decrypt_block(rk: list[bytes], b: bytes) -> bytes:
    nr = len(rk) - 1
    s = bytearray(x ^ k for x, k in zip(b, rk[nr]))
    for rnd in range(nr - 1, 0, -1):
        # InvShiftRows + InvSubBytes fused
        t = bytes(_INV_SBOX[s[(i - 4 * (i % 4)) % 16]] for i in range(16))
        k = rk[rnd]
        t = bytes(x ^ y for x, y in zip(t, k))
        s = bytearray(16)
        for c in range(4):                     # InvMixColumns (§5.3.3)
            a0, a1, a2, a3 = t[4 * c:4 * c + 4]
            s[4 * c + 0] = _M14[a0] ^ _M11[a1] ^ _M13[a2] ^ _M9[a3]
            s[4 * c + 1] = _M9[a0] ^ _M14[a1] ^ _M11[a2] ^ _M13[a3]
            s[4 * c + 2] = _M13[a0] ^ _M9[a1] ^ _M14[a2] ^ _M11[a3]
            s[4 * c + 3] = _M11[a0] ^ _M13[a1] ^ _M9[a2] ^ _M14[a3]
    t = bytes(_INV_SBOX[s[(i - 4 * (i % 4)) % 16]] for i in range(16))
    return bytes(x ^ k for x, k in zip(t, rk[0]))


# -- CBC (the only mode PDF uses) ---------------------------------------

def cbc_encrypt(key: bytes, iv: bytes, data: bytes,
                pad: bool = True) -> bytes:
    """AES-CBC; PKCS#7 padding by default (PDF §7.6.2 requires it for
    AESV2/AESV3 payloads — always 1..16 bytes of padding)."""
    if pad:
        n = 16 - len(data) % 16
        data = data + bytes([n]) * n
    assert len(data) % 16 == 0
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        prev = _encrypt_block(rk, blk)
        out += prev
    return bytes(out)


def cbc_decrypt(key: bytes, iv: bytes, data: bytes,
                unpad: bool = True) -> bytes:
    if len(data) % 16:
        data = data[:len(data) - len(data) % 16]  # tolerate truncation
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i:i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(rk, blk), prev))
        prev = blk
    if unpad and out:
        n = out[-1]
        if 1 <= n <= 16 and len(out) >= n:
            del out[len(out) - n:]
    return bytes(out)


def pdf_aes_decrypt(key: bytes, payload: bytes) -> bytes:
    """PDF AESV2/AESV3 payload: first 16 bytes are the IV (§7.6.2)."""
    if len(payload) < 16:
        return b""
    return cbc_decrypt(key, payload[:16], payload[16:])


def pdf_aes_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    return iv + cbc_encrypt(key, iv, data)
