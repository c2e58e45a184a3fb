from . import bloom, fuse, hashing, quotient, xor  # noqa: F401
