"""Independent pure-Python re-derivation of the seeded dedup queries.

Dual-implementation oracle support for ``x_dedup_minhash_lsh`` and
``x_dedup_simhash`` — the same independence standard as
``plans/osm_oracle.py``: everything here is re-implemented from the
PUBLISHED XXH64 algorithm (Yann Collet's xxHash spec, as adopted by
Apache Spark's ``xxhash64`` SQL function: 64-bit seed streaming variant)
and from the operators' documented semantics, sharing NO code with
``operators/dedup.py``. ``scripts/capture_seeded_goldens.py`` asserts
the engine output equals this derivation before pinning a golden, and
``tests/test_dedup.py`` runs the comparison at sf0.001 as a standing
dual-implementation pin.

Implementation notes (all from the public spec):
- XXH64 primes; 4-lane stripe processing for inputs >= 32 bytes; then
  8-byte rounds, one optional 4-byte round, then byte rounds; avalanche
  finish. Spark's ``xxhash64(c1, c2, ..)`` chains column hashes: the
  running hash seeds the next column's hash, starting from seed 42;
  INT columns hash via the 4-byte primitive path, LONG via the 8-byte
  path, STRING via the byte-stream path over UTF-8 bytes.
- Python ints are unbounded: every multiply/add is masked to 64 bits;
  signed results convert via two's complement to match Spark's LongType.
"""

from __future__ import annotations

import re

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
M64 = (1 << 64) - 1

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & M64
    return (_rotl(acc, 31) * P1) & M64


def xxh64_int(value: int, seed: int) -> int:
    """4-byte primitive path (Spark IntegerType)."""
    h = (seed + P5 + 4) & M64
    h ^= ((value & 0xFFFFFFFF) * P1) & M64
    h = (_rotl(h, 23) * P2 + P3) & M64
    return _fmix(h)


def xxh64_long(value: int, seed: int) -> int:
    """8-byte primitive path (Spark LongType)."""
    h = (seed + P5 + 8) & M64
    h ^= (_rotl((value & M64) * P2 & M64, 31) * P1) & M64
    h = (_rotl(h, 27) * P1 + P4) & M64
    return _fmix(h)


def xxh64_bytes(data: bytes, seed: int) -> int:
    """Byte-stream path (Spark StringType over UTF-8 bytes)."""
    length = len(data)
    off = 0
    if length >= 32:
        v1 = (seed + P1 + P2) & M64
        v2 = (seed + P2) & M64
        v3 = seed & M64
        v4 = (seed - P1) & M64
        while off + 32 <= length:
            v1 = _round(v1, int.from_bytes(data[off:off + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[off + 8:off + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[off + 16:off + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[off + 24:off + 32], "little"))
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * P1 + P4) & M64
    else:
        h = (seed + P5) & M64
    h = (h + length) & M64
    while off + 8 <= length:
        h ^= _round(0, int.from_bytes(data[off:off + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & M64
        off += 8
    if off + 4 <= length:
        h ^= (int.from_bytes(data[off:off + 4], "little") * P1) & M64
        h = (_rotl(h, 23) * P2 + P3) & M64
        off += 4
    while off < length:
        h ^= (data[off] * P5) & M64
        h = (_rotl(h, 11) * P1) & M64
        off += 1
    return _fmix(h)


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_cols(*values, seed: int = SPARK_SEED) -> int:
    """Spark ``xxhash64(v1, v2, ...)``: chain each non-null value's hash,
    the running hash seeding the next. Values: int -> tagged ("int", v)
    or ("long", v), str hashes as UTF-8. Returns SIGNED 64-bit."""
    h = seed
    for v in values:
        if v is None:
            continue
        if isinstance(v, tuple):
            kind, val = v
            if kind == "int":
                h = xxh64_int(val, h)
            elif kind == "long":
                h = xxh64_long(val, h)
            else:
                raise ValueError(kind)
        elif isinstance(v, str):
            h = xxh64_bytes(v.encode("utf-8"), h)
        else:
            raise TypeError(type(v))
    return _signed(h)


# ---------------------------------------------------------------- corpus --

def _tokens(text: str) -> list[str]:
    """Mirror functions/text.tokens: split(trim(text), r"\\s+") with
    SPARK's semantics, not Python's — Spark ``trim`` strips only ASCII
    space (' '), and Java regex ``\\s`` is ASCII-only
    ([ \\t\\n\\x0B\\f\\r]) while Python's ``\\s`` is Unicode-aware: a
    text with leading tabs or U+00A0 would tokenize differently under
    str.strip() + Unicode \\s and fail the dual-implementation gate on a
    correct engine (the round-6 review find). Spark split on '' yields
    [''] (size 1), same as Java split."""
    return re.split(r"[ \t\n\x0b\f\r]+", text.strip(" "))


def _shingles(text: str, n: int = 3) -> list[str]:
    toks = _tokens(text)
    if len(toks) < n:
        return []
    seen: dict[str, None] = {}
    for i in range(len(toks) - n + 1):
        seen.setdefault(" ".join(toks[i:i + n]), None)
    return list(seen)


def derive_minhash_pairs(
    docs: list[tuple[int, str | None]],
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.35,
) -> list[tuple[int, int, float]]:
    """Independent ``minhash_near_duplicates``: sig[i] = min over distinct
    shingles of xxhash64(shingle, i); 16 band buckets of
    xxhash64(sig[4b..4b+3]); candidates share any (band, bucket); est
    Jaccard = matching signature fraction, thresholded. Docs with no
    shingles produce no signature (no explode rows)."""
    rows_per_band = num_hashes // bands
    # hash each DISTINCT shingle once (template corpora have tiny
    # vocabularies; this is a pure-speed cache, not a semantic change)
    hcache: dict[str, list[int]] = {}

    def _hashes(s: str) -> list[int]:
        hs = hcache.get(s)
        if hs is None:
            hs = [xxhash64_cols(s, ("int", i)) for i in range(num_hashes)]
            hcache[s] = hs
        return hs

    sigs: dict[int, list[int]] = {}
    for doc_id, text in docs:
        if text is None:
            continue
        sh = _shingles(text, shingle_n)
        if not sh:
            continue
        vecs = [_hashes(s) for s in sh]
        sigs[doc_id] = [min(v[i] for v in vecs) for i in range(num_hashes)]
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, sig in sigs.items():
        for b in range(bands):
            bucket = xxhash64_cols(
                *[("long", sig[b * rows_per_band + r] & M64)
                  for r in range(rows_per_band)]
            )
            buckets.setdefault((b, bucket), []).append(doc_id)
    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                cand.add((ms[i], ms[j]))
    out = []
    for a, b in sorted(cand):
        sa, sb = sigs[a], sigs[b]
        est = sum(1 for x, y in zip(sa, sb) if x == y) / float(num_hashes)
        if est >= threshold:
            out.append((a, b, est))
    return out


def derive_simhash_pairs(
    docs: list[tuple[int, str | None]],
    max_hamming: int = 3,
    chunks: int = 4,
) -> list[tuple[int, int, int]]:
    """Independent ``simhash_near_duplicates``: per-token xxhash64 votes
    each bit +1/-1 (NON-distinct tokens — every occurrence votes);
    pigeonhole chunk buckets; exact hamming <= max_hamming."""
    chunks = max(chunks, max_hamming + 1)
    chunk_bits = 64 // chunks
    mask = (1 << chunk_bits) - 1
    # per-distinct-token ±1 bit votes, cached (pure-speed cache)
    vcache: dict[str, list[int]] = {}

    def _votes(t: str) -> list[int]:
        v = vcache.get(t)
        if v is None:
            h = xxhash64_cols(t) & M64
            v = [1 if (h >> i) & 1 else -1 for i in range(64)]
            vcache[t] = v
        return v

    sketches: dict[int, int] = {}
    for doc_id, text in docs:
        if text is None:
            continue
        toks = _tokens(text)
        if not toks:
            continue
        sums = [0] * 64
        for t in toks:
            v = _votes(t)
            for i in range(64):
                sums[i] += v[i]
        sk = 0
        for i in range(64):
            if sums[i] > 0:
                sk |= 1 << i
        sketches[doc_id] = sk
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, sk in sketches.items():
        for c in range(chunks):
            buckets.setdefault((c, (sk >> (c * chunk_bits)) & mask), []).append(doc_id)
    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                cand.add((ms[i], ms[j]))
    out = []
    for a, b in sorted(cand):
        ham = bin(sketches[a] ^ sketches[b]).count("1")
        if ham <= max_hamming:
            out.append((a, b, ham))
    return out
