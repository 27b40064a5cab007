"""Vectorized zlib-compatible CRC-32 over token batches — a MEASURED
negative result, kept as documentation.

VERDICT r2 item 4 suggested replacing the per-token ``zlib.crc32`` calls
in the MinHash/SimHash kernels with a vectorized numpy hash. This module
implements exactly that: the SAME CRC-32 (polynomial 0xEDB88320,
init/final xor 0xFFFFFFFF — bit-identical to ``zlib.crc32``, property-
pinned in tests/test_kernel_properties.py) for a whole token batch in
O(max_len) numpy passes — tokens packed into one flat byte buffer, each
character position advancing every still-active token's CRC state with
one table-lookup gather.

Measured on this box (tools-free micro-bench, 200k random 8-35-char
tokens): **zlib per-token 42 ms, this module 134 ms, a length-sorted
prefix variant 110 ms** — and swapping it into the 640k-doc signature
kernel made the kernel 3.3× slower (4.3 s → 14.4 s at local[32]).
Short-string hashing is C-call-bound, not Python-loop-bound: one
``crc32()`` call costs ~200 ns while the numpy char loop pays ~5
elementwise passes per byte. The production kernels therefore keep
per-token zlib calls (bfokg/operators/dedup.py cites this file); what IS
vectorized there is everything around the hash — segmented
``reduceat`` min/sum over all docs of a batch at once.

Tokens must be ASCII — callers' normalizers guarantee it; a non-ASCII
token raises rather than silently mis-hashing.
"""

from __future__ import annotations

import numpy as np

_POLY = np.uint32(0xEDB88320)


def _make_table() -> np.ndarray:
    tab = np.empty(256, dtype=np.uint32)
    for i in range(256):
        c = np.uint32(i)
        for _ in range(8):
            c = (c >> np.uint32(1)) ^ (_POLY if c & np.uint32(1) else np.uint32(0))
        tab[i] = c
    return tab


_CRC_TABLE = _make_table()
_INIT = np.uint32(0xFFFFFFFF)


def crc32_states(tokens: list[str]) -> np.ndarray:
    """UN-finalized CRC-32 states (pre ``^ 0xFFFFFFFF``) for each ASCII
    token — callers that append suffix bytes step the state further with
    ``crc32_step``. O(n · max_len) vectorized table gathers."""
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    lens = np.fromiter(map(len, tokens), dtype=np.int64, count=n)
    flat = np.frombuffer("".join(tokens).encode("ascii"), dtype=np.uint8)
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    state = np.full(n, _INIT, dtype=np.uint32)
    max_len = int(lens.max()) if n else 0
    # Process positions longest-token-first is unnecessary: boolean gather
    # per position keeps it simple; cost is O(n) per position either way.
    for j in range(max_len):
        active = lens > j
        s = state[active]
        b = flat[offs[active] + j]
        state[active] = _CRC_TABLE[(s ^ b) & np.uint32(0xFF)] ^ (s >> np.uint32(8))
    return state


def crc32_step(states: np.ndarray, byte: int) -> np.ndarray:
    """Advance a batch of un-finalized CRC states by one constant byte."""
    b = np.uint32(byte)
    return _CRC_TABLE[(states ^ b) & np.uint32(0xFF)] ^ (states >> np.uint32(8))


def crc32_batch(tokens: list[str]) -> np.ndarray:
    """``zlib.crc32(t.encode())`` for every token, vectorized. uint32."""
    return crc32_states(tokens) ^ _INIT
