"""MurmurHash3 parity tests against published reference vectors."""

import numpy as np

from ann_solo_tpu.ops.murmur import (
    hash_bin_table,
    murmur3_32,
    murmur3_32_bulk,
)

# Published MurmurHash3_x86_32 test vectors.
KNOWN = [
    (b"", 0, 0x00000000),
    (b"", 1, 0x514E28B7),
    (b"", 0xFFFFFFFF, 0x81F16F39),
    (b"\x00\x00\x00\x00", 0, 0x2362F9DE),
    (b"hello", 0, 0x248BFA47),
    (b"hello, world", 0, 0x149BBB7F),
    (b"The quick brown fox jumps over the lazy dog", 0, 0x2E4FF723),
    (b"aaaa", 0x9747B28C, 0x5A97808A),
    (b"aaa", 0x9747B28C, 0x283E0130),
    (b"aa", 0x9747B28C, 0x5D211726),
    (b"a", 0x9747B28C, 0x7FA09EA6),
]


def test_known_vectors():
    for data, seed, expected in KNOWN:
        assert murmur3_32(data, seed) == expected, (data, seed)


def test_bulk_matches_scalar():
    keys = [str(i).encode() for i in range(0, 70000, 7)] + [
        b"", b"x", b"xy", b"xyz", b"wxyz", b"vwxyz"
    ]
    bulk = murmur3_32_bulk(np.asarray(keys, object), seed=42)
    for key, h in zip(keys, bulk):
        assert murmur3_32(key, 42) == int(h)


def test_hash_bin_table():
    # Mirrors mmh3.hash(str(bin), 42, signed=False) % hash_len.
    table = hash_bin_table(1000, 800, seed=42)
    assert table.shape == (1000,)
    assert table.min() >= 0 and table.max() < 800
    for bin_idx in (0, 1, 42, 999):
        assert table[bin_idx] == murmur3_32(str(bin_idx).encode(), 42) % 800
