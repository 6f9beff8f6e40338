"""Pure-Python AES (FIPS-197) + CBC, for PDF standard-security crypt
filters (AESV2 = AES-128-CBC, AESV3 = AES-256-CBC; ISO 32000 §7.6).

From scratch against the public spec: S-box generated from the GF(2^8)
inverse + affine transform, textbook key expansion, and the four round
transforms.  Both directions are implemented — the test suite builds
genuinely encrypted fixtures with the encryptor and round-trips them
through the document pipeline's decryptor.

Throughput is pure-Python grade (~1 MB/s); PDF streams are small (tens of
KB) so decryption is a rounding error next to content-stream
interpretation.  Swap in a C AES here if a corpus ever shows otherwise.
"""

from __future__ import annotations


def _build_sbox() -> tuple[bytes, bytes]:
    # multiplicative inverse table in GF(2^8) via exp/log over generator 3
    exp = [0] * 512
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        # multiply by the generator 0x03 = x * 2 ^ x
        x ^= (x << 1) ^ (0x11B if x & 0x80 else 0)
    for i in range(255, 512):
        exp[i] = exp[i - 255]
    sbox = bytearray(256)
    for c in range(256):
        inv = 0 if c == 0 else exp[255 - log[c]]
        # affine transform: b ^ rot1 ^ rot2 ^ rot3 ^ rot4 ^ 0x63
        s = inv
        for sh in (1, 2, 3, 4):
            s ^= ((inv << sh) | (inv >> (8 - sh))) & 0xFF
        sbox[c] = s ^ 0x63
    inv_sbox = bytearray(256)
    for i, v in enumerate(sbox):
        inv_sbox[v] = i
    return bytes(sbox), bytes(inv_sbox)


_SBOX, _INV_SBOX = _build_sbox()


def _xtime(a: int) -> int:
    return ((a << 1) ^ 0x1B) & 0xFF if a & 0x80 else a << 1


def _mul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = _xtime(a)
        b >>= 1
    return out


def _expand_key(key: bytes) -> list[bytes]:
    nk = len(key) // 4
    nr = nk + 6
    words = [key[4 * i : 4 * i + 4] for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = words[i - 1]
        if i % nk == 0:
            t = bytes(
                (_SBOX[t[1]] ^ rcon, _SBOX[t[2]], _SBOX[t[3]], _SBOX[t[0]])
            )
            rcon = _xtime(rcon)
        elif nk > 6 and i % nk == 4:
            t = bytes(_SBOX[b] for b in t)
        words.append(bytes(a ^ b for a, b in zip(words[i - nk], t)))
    return [b"".join(words[4 * r : 4 * r + 4]) for r in range(nr + 1)]


def _encrypt_block(rk: list[bytes], block: bytes) -> bytes:
    s = bytearray(a ^ b for a, b in zip(block, rk[0]))
    nr = len(rk) - 1
    for rnd in range(1, nr + 1):
        # SubBytes + ShiftRows
        t = bytearray(16)
        for c in range(4):
            for r in range(4):
                t[4 * c + r] = _SBOX[s[4 * ((c + r) % 4) + r]]
        if rnd < nr:  # MixColumns
            m = bytearray(16)
            for c in range(4):
                a0, a1, a2, a3 = t[4 * c : 4 * c + 4]
                m[4 * c + 0] = _xtime(a0) ^ _mul(a1, 3) ^ a2 ^ a3
                m[4 * c + 1] = a0 ^ _xtime(a1) ^ _mul(a2, 3) ^ a3
                m[4 * c + 2] = a0 ^ a1 ^ _xtime(a2) ^ _mul(a3, 3)
                m[4 * c + 3] = _mul(a0, 3) ^ a1 ^ a2 ^ _xtime(a3)
            t = m
        s = bytearray(a ^ b for a, b in zip(t, rk[rnd]))
    return bytes(s)


def _decrypt_block(rk: list[bytes], block: bytes) -> bytes:
    nr = len(rk) - 1
    s = bytearray(a ^ b for a, b in zip(block, rk[nr]))
    for rnd in range(nr - 1, -1, -1):
        # InvShiftRows + InvSubBytes
        t = bytearray(16)
        for c in range(4):
            for r in range(4):
                t[4 * ((c + r) % 4) + r] = _INV_SBOX[s[4 * c + r]]
        s = bytearray(a ^ b for a, b in zip(t, rk[rnd]))
        if rnd > 0:  # InvMixColumns
            m = bytearray(16)
            for c in range(4):
                a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
                m[4 * c + 0] = (
                    _mul(a0, 14) ^ _mul(a1, 11) ^ _mul(a2, 13) ^ _mul(a3, 9)
                )
                m[4 * c + 1] = (
                    _mul(a0, 9) ^ _mul(a1, 14) ^ _mul(a2, 11) ^ _mul(a3, 13)
                )
                m[4 * c + 2] = (
                    _mul(a0, 13) ^ _mul(a1, 9) ^ _mul(a2, 14) ^ _mul(a3, 11)
                )
                m[4 * c + 3] = (
                    _mul(a0, 11) ^ _mul(a1, 13) ^ _mul(a2, 9) ^ _mul(a3, 14)
                )
            s = m
    return bytes(s)


def cbc_encrypt(key: bytes, iv: bytes, data: bytes, pad: bool = True) -> bytes:
    """AES-CBC encrypt.  ``pad=True`` applies PKCS#7 (the PDF stream
    form); ``pad=False`` requires a block-multiple input (key-wrapping
    steps of the AESV3 handler)."""
    if pad:
        k = 16 - len(data) % 16
        data = data + bytes([k]) * k
    elif len(data) % 16:
        raise ValueError("unpadded CBC needs block-aligned input")
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        prev = _encrypt_block(rk, bytes(a ^ b for a, b in zip(data[i : i + 16], prev)))
        out += prev
    return bytes(out)


def cbc_decrypt(key: bytes, iv: bytes, data: bytes, unpad: bool = True) -> bytes:
    """AES-CBC decrypt; ``unpad=True`` strips PKCS#7 (tolerantly — a
    malformed final block yields the raw plaintext rather than raising,
    matching how PDF viewers treat sloppy producers)."""
    if len(data) % 16:
        data = data[: len(data) - len(data) % 16]
    if not data:
        return b""
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(rk, block), prev))
        prev = block
    if unpad and out:
        k = out[-1]
        if 1 <= k <= 16 and all(b == k for b in out[-k:]):
            del out[-k:]
    return bytes(out)


def pdf_aes_decrypt_stream(key: bytes, raw: bytes) -> bytes:
    """PDF AES stream layout: 16-byte IV prefix, then CBC ciphertext with
    PKCS#7 padding (ISO 32000-1 §7.6.2)."""
    if len(raw) < 16:
        return b""
    return cbc_decrypt(key, raw[:16], raw[16:], unpad=True)


def pdf_aes_encrypt_stream(key: bytes, iv: bytes, plain: bytes) -> bytes:
    return iv + cbc_encrypt(key, iv, plain, pad=True)


def hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 algorithm 2.B (the R6 iterated hash): SHA-256 seed,
    then rounds of AES-128-CBC over 64 repetitions keyed from the running
    hash, digest width chosen by the first block's byte sum mod 3."""
    import hashlib

    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = cbc_encrypt(k[:16], k[16:32], k1, pad=False)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]
