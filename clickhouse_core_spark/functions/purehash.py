"""Pure-Python hash algorithms absent from both Spark and this build's
OpenSSL: keccak256 and MD4.

Reference: src/Functions/FunctionsStringHashFixedString.cpp —
Keccak256Impl (sha3_HashBuffer with SHA3_FLAGS_KECCAK: the ORIGINAL
Keccak 0x01 padding, i.e. the Ethereum variant, not NIST SHA-3's 0x06)
and MD4Impl (RFC 1320 via OpenSSL there).  Both algorithms are public
textbook constructions; output is lowercase hex like the registry's
other hash mappings.

Execution shape: Arrow-batched pandas UDFs via unicode_ext._lazy_str_udf
— pure map-side, no shuffle.  Pure-Python keccak-f[1600] runs ~100 KB/s
per core: fine for the ID-hashing use cases these names serve, not for
bulk-hashing gigabyte blobs (use xxhash64/sha2 for that — JVM-side).
"""

from __future__ import annotations

# ------------------------------------------------------------- keccak-f[1600]

_KECCAK_RC = (
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
)

# rotation offsets r[x][y]
_KECCAK_ROT = (
    (0, 36, 3, 41, 18),
    (1, 44, 10, 45, 2),
    (62, 6, 43, 15, 61),
    (28, 55, 25, 21, 56),
    (27, 20, 39, 8, 14),
)

_MASK = (1 << 64) - 1


def _rol(v: int, n: int) -> int:
    return ((v << n) | (v >> (64 - n))) & _MASK


def _keccak_f(a: list) -> None:
    """In-place keccak-f[1600] on a 5x5 lane state (a[x][y])."""
    for rnd in range(24):
        # theta
        c = [a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4]
             for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rol(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                a[x][y] ^= d[x]
        # rho + pi
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rol(a[x][y], _KECCAK_ROT[x][y])
        # chi
        for x in range(5):
            for y in range(5):
                a[x][y] = b[x][y] ^ ((~b[(x + 1) % 5][y] & _MASK)
                                     & b[(x + 2) % 5][y])
        # iota
        a[0][0] ^= _KECCAK_RC[rnd]


def keccak256(data: bytes) -> bytes:
    """Keccak-256 with the ORIGINAL 0x01 padding (SHA3_FLAGS_KECCAK)."""
    rate = 136  # (1600 - 2*256) / 8
    state = [[0] * 5 for _ in range(5)]
    # pad10*1 with 0x01 domain byte
    padded = bytearray(data)
    pad_len = rate - (len(padded) % rate)
    padded.extend(b"\x00" * pad_len)
    padded[len(data)] ^= 0x01
    padded[-1] ^= 0x80
    # absorb
    for off in range(0, len(padded), rate):
        block = padded[off:off + rate]
        for i in range(rate // 8):
            lane = int.from_bytes(block[i * 8:(i + 1) * 8], "little")
            x, y = i % 5, i // 5
            state[x][y] ^= lane
        _keccak_f(state)
    # squeeze (256 bits < rate: single squeeze)
    out = bytearray()
    for i in range(4):
        x, y = i % 5, i // 5
        out.extend(state[x][y].to_bytes(8, "little"))
    return bytes(out)


# --------------------------------------------------------------------- MD4

def _md4_f(x, y, z):
    return (x & y) | (~x & z)


def _md4_g(x, y, z):
    return (x & y) | (x & z) | (y & z)


def _md4_h(x, y, z):
    return x ^ y ^ z


def _rol32(v, n):
    v &= 0xFFFFFFFF
    return ((v << n) | (v >> (32 - n))) & 0xFFFFFFFF


def md4(data: bytes) -> bytes:
    """RFC 1320 MD4."""
    msg = bytearray(data)
    bitlen = (8 * len(msg)) & (2 ** 64 - 1)
    msg.append(0x80)
    while len(msg) % 64 != 56:
        msg.append(0)
    msg += bitlen.to_bytes(8, "little")

    h = [0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476]
    for off in range(0, len(msg), 64):
        x = [int.from_bytes(msg[off + 4 * i:off + 4 * i + 4], "little")
             for i in range(16)]
        a, b, c, d = h
        # round 1
        for i in range(16):
            k = i
            s = (3, 7, 11, 19)[i % 4]
            idx = i % 4
            if idx == 0:
                a = _rol32(a + _md4_f(b, c, d) + x[k], s)
            elif idx == 1:
                d = _rol32(d + _md4_f(a, b, c) + x[k], s)
            elif idx == 2:
                c = _rol32(c + _md4_f(d, a, b) + x[k], s)
            else:
                b = _rol32(b + _md4_f(c, d, a) + x[k], s)
        # round 2
        order2 = (0, 4, 8, 12, 1, 5, 9, 13, 2, 6, 10, 14, 3, 7, 11, 15)
        for i in range(16):
            k = order2[i]
            s = (3, 5, 9, 13)[i % 4]
            idx = i % 4
            if idx == 0:
                a = _rol32(a + _md4_g(b, c, d) + x[k] + 0x5A827999, s)
            elif idx == 1:
                d = _rol32(d + _md4_g(a, b, c) + x[k] + 0x5A827999, s)
            elif idx == 2:
                c = _rol32(c + _md4_g(d, a, b) + x[k] + 0x5A827999, s)
            else:
                b = _rol32(b + _md4_g(c, d, a) + x[k] + 0x5A827999, s)
        # round 3
        order3 = (0, 8, 4, 12, 2, 10, 6, 14, 1, 9, 5, 13, 3, 11, 7, 15)
        for i in range(16):
            k = order3[i]
            s = (3, 9, 11, 15)[i % 4]
            idx = i % 4
            if idx == 0:
                a = _rol32(a + _md4_h(b, c, d) + x[k] + 0x6ED9EBA1, s)
            elif idx == 1:
                d = _rol32(d + _md4_h(a, b, c) + x[k] + 0x6ED9EBA1, s)
            elif idx == 2:
                c = _rol32(c + _md4_h(d, a, b) + x[k] + 0x6ED9EBA1, s)
            else:
                b = _rol32(b + _md4_h(c, d, a) + x[k] + 0x6ED9EBA1, s)
        h = [(v + w) & 0xFFFFFFFF for v, w in zip(h, (a, b, c, d))]
    return b"".join(v.to_bytes(4, "little") for v in h)


def build() -> tuple[dict, dict]:
    from .unicode_ext import _lazy_str_udf
    fns = {
        "keccak256": _lazy_str_udf(
            "keccak256", lambda v: keccak256(v.encode()).hex()),
        "MD4": _lazy_str_udf("md4", lambda v: md4(v.encode()).hex()),
    }
    return fns, {}
