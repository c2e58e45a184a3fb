"""Hash parity certification against the live DuckDB oracle.

Mirrors the reference's test/generate/generate_hash_values.py strategy:
hash a spread of values with the real DuckDB and require bit-exact equality.
"""

import duckdb
import numpy as np
import pytest

from bitfilters_spark.core import hashing as H


def duck_hash(expr: str) -> int:
    return duckdb.sql(f"select hash({expr})").fetchall()[0][0]


INTS = [0, 1, 42, -1, -42, 2**31 - 1, -(2**31), 12345678901234, -(2**63), 2**63 - 1]


def test_int64_parity():
    ours = H.hash_int64(np.array(INTS, dtype=np.int64))
    theirs = [duck_hash(f"({v + 1} - 1)::BIGINT" if v == -(2**63) else f"{v}::BIGINT") for v in INTS]
    assert ours.tolist() == theirs


def test_int32_parity():
    vals = [0, 1, 42, -1, -42, 2**31 - 1, -(2**31)]
    ours = H.hash_int_narrow(np.array(vals, dtype=np.int64))
    theirs = [duck_hash(f"({v + 1} - 1)::INTEGER" if v == -(2**31) else f"{v}::INTEGER") for v in vals]
    assert ours.tolist() == theirs


def test_double_parity():
    vals = [0.0, -0.0, 1.5, -1.5, 3.14159, 1e300, -1e-300]
    ours = H.hash_float64(np.array(vals, dtype=np.float64))
    theirs = [duck_hash(f"{v!r}::DOUBLE") for v in vals]
    assert ours.tolist() == theirs


def test_string_parity_v10():
    strs = ["", "a", "ab", "abcdefg", "abcdefgh", "abcdefghi", "hello world", "x" * 100]
    ours = H.hash_bytes([s.encode() for s in strs], version="v1.0.0")
    theirs = [duck_hash(f"'{s}'") for s in strs]
    assert ours.tolist() == theirs


def test_string_v14_known_vector():
    # reference algorithm self-check (cannot certify against duckdb 1.0):
    # HashBytes_v1_5('hello') computed independently = 8628213525773890682
    ours = H.hash_bytes([b"hello"], version="v1.5.1")
    assert ours.tolist() == [8628213525773890682]


def test_null_hashes_to_zero():
    assert H.hash_bytes([None], version="v1.0.0").tolist() == [0]
    assert H.hash_bytes([None], version="v1.5.1").tolist() == [0]


def test_combine_hash_matches_reference_algorithm():
    a = np.array([123456789], dtype=np.uint64)
    b = np.array([987654321], dtype=np.uint64)
    got = H.combine_hash(a, b)[0]
    # manual: a ^= a>>32; a *= C; a ^ b
    x = 123456789
    x ^= x >> 32
    x = (x * 0xD6E8FEB86659FD93) % (1 << 64)
    assert got == x ^ 987654321


def test_unsupported_version_raises():
    with pytest.raises(ValueError):
        H.hash_bytes([b"x"], version="v9.9.9")
