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


# ------------------------------------------------- embedding cosine LSH --

def _hash_unit(p: int, d: int) -> float:
    """Restatement of the documented hyperplane-weight spec
    (operators/dedup.py _hash_unit): murmur-style finalizer of (p, d)
    mapped to [-0.5, 0.5). Shared deterministic SPEC, not shared code —
    the independence this module buys is over the ENGINE side (Spark
    expression semantics, fold order, banding joins)."""
    x = (p * 1_000_003 + d * 8191 + 0x9E3779B9) & 0xFFFFFFFF
    x ^= x >> 16
    x = (x * 0x85EBCA6B) & 0xFFFFFFFF
    x ^= x >> 13
    x = (x * 0xC2B2AE35) & 0xFFFFFFFF
    x ^= x >> 16
    return x / 2**32 - 0.5


def _fold_dot(xs, ws) -> float:
    """Sequential left fold acc + x*w — bit-identical to the engine's
    F.aggregate(zip_with(...), 0.0, acc + x) (IEEE double, same order)."""
    acc = 0.0
    for x, w in zip(xs, ws):
        acc = acc + x * w
    return acc


def _round_half_up(x: float, digits: int) -> float:
    """Spark F.round(double, d): Double.toString -> BigDecimal ->
    setScale(d, HALF_UP). Python repr == Double.toString (shortest
    round-trip), so Decimal(repr(x)) reproduces it exactly."""
    import decimal

    q = decimal.Decimal(1).scaleb(-digits)
    return float(
        decimal.Decimal(repr(x)).quantize(q, rounding=decimal.ROUND_HALF_UP)
    )


def derive_embedding_cosine_pairs(
    vecs: list[tuple[int, list[float] | None]],
    threshold: float = 0.95,
    planes: int = 16,
    bands: int = 4,
    round_digits: int = 4,
) -> list[tuple[int, int, float]]:
    """Independent ``x_dedup_embedding_cosine`` (hyperplane-LSH banded
    candidates + exact in-bucket cosine >= threshold), including the
    query's planted duplicates (ids < 5 rescaled by 1.1 through a
    float32 round-trip under id+1000000) and 4dp HALF_UP rounding.

    A NULL vector signs every plane 0 (the engine's when(NULL>=0,1)
    .otherwise(0)) and is eliminated by its NULL cosine at the
    verification step, never earlier — same path as the engine."""
    import struct as _struct

    def f32(x: float) -> float:
        return _struct.unpack("f", _struct.pack("f", x))[0]

    allv: dict[int, list[float] | None] = {i: v for i, v in vecs}
    for i, v in vecs:
        if i < 5 and v is not None:
            allv[1000000 + i] = [f32(float(x) * 1.1) for x in v]

    per_band = planes // bands
    weights = None
    sigs: dict[int, list[int]] = {}
    for i, v in allv.items():
        if v is None:
            sigs[i] = [0] * planes
            continue
        if weights is None:
            weights = [
                [_hash_unit(p, d) for d in range(len(v))]
                for p in range(planes)
            ]
        sigs[i] = [
            1 if _fold_dot(v, weights[p]) >= 0 else 0 for p in range(planes)
        ]
    buckets: dict[tuple[int, str], list[int]] = {}
    for i, sig in sigs.items():
        for c in range(bands):
            key = "".join(
                str(b) for b in sig[c * per_band:(c + 1) * per_band]
            )
            buckets.setdefault((c, key), []).append(i)
    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                cand.add((ms[i], ms[j]))
    out = []
    for a, b in sorted(cand):
        va, vb = allv[a], allv[b]
        if va is None or vb is None:
            continue
        na = _fold_dot(va, va) ** 0.5
        nb = _fold_dot(vb, vb) ** 0.5
        denom = na * nb
        if denom == 0.0:
            continue  # engine: try_divide -> NULL -> fails >= threshold
        cos = _fold_dot(va, vb) / denom
        if cos >= threshold:
            out.append((a, b, _round_half_up(cos, round_digits)))
    return out


def derive_topk_lsh(
    vecs: list[tuple[int, list[float] | None]],
    k: int = 5,
    planes: int = 12,
    bands: int = 4,
    query_max_id: int = 5,
) -> list[tuple[int, int, float, int]]:
    """Independent ``x_sim_topk_lsh`` (queries = vec_id < query_max_id):
    hyperplane band join prunes candidates, exact fold-order cosine
    ranks them (score desc, neighbor_id tiebreak), and any query whose
    bucket candidates rank fewer than k rows falls back to exact
    brute-force top-k over the whole corpus — the same
    built-into-the-plan fallback as the engine. Raw float scores (no
    rounding): fold-exact arithmetic makes them bit-identical."""
    allv = {i: v for i, v in vecs}
    per_band = planes // bands
    weights = None
    sigs: dict[int, list[int]] = {}
    for i, v in allv.items():
        if v is None:
            sigs[i] = [0] * planes
            continue
        if weights is None:
            weights = [
                [_hash_unit(p, d) for d in range(len(v))]
                for p in range(planes)
            ]
        sigs[i] = [
            1 if _fold_dot(v, weights[p]) >= 0 else 0 for p in range(planes)
        ]

    def cos(a: int, b: int) -> float | None:
        va, vb = allv[a], allv[b]
        if va is None or vb is None:
            return None
        denom = _fold_dot(va, va) ** 0.5 * _fold_dot(vb, vb) ** 0.5
        if denom == 0.0:
            return None
        return _fold_dot(va, vb) / denom

    def topk(q: int, neighbors) -> list[tuple[int, int, float, int]]:
        scored = [(n, cos(q, n)) for n in neighbors]
        # NULL scores sort last under desc and can still occupy ranks —
        # mirror Spark row_number over (score desc_nulls_last, id asc)
        scored.sort(key=lambda t: (t[1] is None, -(t[1] or 0.0), t[0]))
        return [
            (q, n, s, r + 1) for r, (n, s) in enumerate(scored[:k])
        ]

    qids = sorted(i for i in allv if i < query_max_id)
    buckets: dict[tuple[int, str], list[int]] = {}
    for i, sig in sigs.items():
        for c in range(bands):
            key = "".join(
                str(b) for b in sig[c * per_band:(c + 1) * per_band]
            )
            buckets.setdefault((c, key), []).append(i)
    cand: dict[int, set[int]] = {q: set() for q in qids}
    for (c, key), members in buckets.items():
        qs = [m for m in members if m in cand]
        if not qs:
            continue
        for q in qs:
            cand[q].update(m for m in members if m != q)
    out: list[tuple[int, int, float, int]] = []
    for q in qids:
        lsh_rows = topk(q, sorted(cand[q]))
        if len(lsh_rows) >= k:
            out.extend(lsh_rows)
        else:
            out.extend(topk(q, sorted(i for i in allv if i != q)))
    out.sort(key=lambda t: (t[0], t[3]))
    return out
