"""Manifest-resident HyperLogLog NDV sketches — approximate
COUNT(DISTINCT col) answered from table METADATA in O(live files),
with zero data scan (the Snowflake/BigQuery table-stats design;
Flajolet et al. 2007's estimator with linear-counting small-range
correction).

Why per-file: sketches ride the same footer-stats pass that already
builds min/max and Bloom entries at commit time, so they are
file-granular — a copy-on-write mutation rewrites exactly the
affected files and their sketches with them, which keeps the merged
estimate true after updates/deletes without any global rebuild (dead
MVCC row-versions are filtered at build time; a row can only die by
its file being rewritten, which refreshes that file's sketch).
HLL register-max merge is exact set-union semantics, so the
table-level estimate is one metadata fold however many commits
produced the files.

Determinism contract (this is what lets the q-gate replay the
estimate in ANSI SQL): the hash is md5 over the same canonical value
encoding the Bloom filters use (catalog._bloom_key), the register
fold Σ 2^(64-p-M_j) is computed in EXACT integer arithmetic (Python
int / SQL HUGEINT) and converted to double once at the end, so the
estimate is bit-identical across engines and partitionings.
"""

from __future__ import annotations

import base64
import hashlib
import math
from typing import Optional, Sequence

DEFAULT_P = 11  # 2048 registers ≈ 2.3% standard error, ~2.7KB b64/file


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    if m == 64:
        return 0.709
    if m == 32:
        return 0.697
    return 0.673


def ndv_build(values, p: int = DEFAULT_P) -> Optional[dict]:
    """Sketch the non-null values: ``{"p", "r"(base64 registers)}``.
    Returns an all-zero sketch for an empty input (a valid sketch of
    the empty set — merging it is a no-op, estimating it yields 0)."""
    from .catalog import _bloom_key

    m = 1 << p
    regs = bytearray(m)
    for v in values:
        kb = _bloom_key(v)
        if kb is None:
            continue
        h = int(hashlib.md5(kb).hexdigest()[:16], 16)  # top 8 bytes, BE
        j = h & (m - 1)
        w = h >> p
        rho = (64 - p) - w.bit_length() + 1
        if rho > regs[j]:
            regs[j] = rho
    return {"p": p, "r": base64.b64encode(bytes(regs)).decode()}


def ndv_merge(sketches: Sequence[dict]) -> dict:
    """Register-max union — exact set-union semantics. All sketches
    must share the same precision (enforced at registration time)."""
    if not sketches:
        raise ValueError("ndv_merge: no sketches")
    p = sketches[0]["p"]
    m = 1 << p
    acc = bytearray(m)
    for sk in sketches:
        if sk["p"] != p:
            raise ValueError(
                f"ndv_merge: mixed precisions {sk['p']} != {p}")
        regs = base64.b64decode(sk["r"])
        for j in range(m):
            if regs[j] > acc[j]:
                acc[j] = regs[j]
    return {"p": p, "r": base64.b64encode(bytes(acc)).decode()}


def ndv_estimate(sketch: dict) -> float:
    """The HLL estimate with linear-counting small-range correction.
    The indicator fold runs in exact integer arithmetic — S =
    Σ 2^(rmax - M_j) with rmax = 64-p, so 2^-M_j = S / 2^rmax without
    a single order-dependent float add; one int→double conversion and
    one division at the end (both IEEE-deterministic)."""
    p = sketch["p"]
    m = 1 << p
    regs = base64.b64decode(sketch["r"])
    rmax = 64 - p
    s_int = 0
    zeros = 0
    for j in range(m):
        s_int += 1 << (rmax - regs[j])
        if regs[j] == 0:
            zeros += 1
    est = _alpha(m) * m * m * float(2 ** rmax) / float(s_int)
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est
