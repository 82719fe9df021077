"""DuckDB-SQL emulation of Spark's ``xxhash64`` for oracle twins.

Spark's sketch operators (minhash, simhash — ``extensions/dedup.py``)
are built on the JVM ``xxhash64`` expression, which DuckDB lacks.  To
give those queries literal hash-matched oracles (VERDICT r3 "next" #2)
this module GENERATES pure-SQL XXH64 — the standard xxHash64 algorithm
(Collet; the same one Spark's ``XXH64.java`` implements) over the
UTF-8 bytes of a VARCHAR, with 64-bit wrapping arithmetic emulated in
HUGEINT (``(a*b) mod 2^64`` via 32-bit limb split, rotations via
mul/div — DuckDB integer ops error on overflow, so every step is
reduced mod 2^64 explicitly).

Loops run as ``list_reduce``; single-evaluation "let" bindings are the
``list_transform([expr], v -> body)[1]`` idiom, so generated SQL stays
linear in algorithm size instead of exploding with repeated
subexpressions.  Validated byte-for-byte against Spark's output in
``tests/test_xxh64_sql.py`` (random strings of every length class:
empty / <4 / <8 / <32 / >=32 / multi-byte UTF-8).

Spark semantics reproduced:
- ``xxhash64(s)``          = XXH64(utf8_bytes(s), seed=42)
- ``xxhash64(s, 42)``      = hashInt(42, seed=XXH64(utf8_bytes(s), 42))
  (the SQL function has no seed parameter — extra args are hashed in
  a chain, each step seeding the next; an int literal takes the
  4-byte ``hashInt`` path)
- signed view: Spark returns the two's-complement BIGINT of the
  unsigned 64-bit state; ``signed64`` converts at the end.
"""

from __future__ import annotations

MOD = 1 << 64
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def let(expr: str, var: str, body: str) -> str:
    """Bind ``expr`` once as ``var`` inside ``body`` (scalar or list)."""
    return f"list_transform([{expr}], {var} -> {body})[1]"


def _mul(a: str | int, b: str | int) -> str:
    """(a*b) mod 2^64 for a,b in [0, 2^64) — 32-bit limb split keeps
    every intermediate < 2^65, inside HUGEINT range.  ``a`` is forced
    to HUGEINT so integer-literal operands can't run limb arithmetic
    in INT64 (where ``mid * 2^32`` overflows)."""
    ah = f"CAST({a} AS HUGEINT)"
    if isinstance(b, int):
        b %= MOD
        bl, bh = b % (1 << 32), b >> 32
        return (
            f"(({ah} % 4294967296 * {bl} + "
            f"(({ah} // 4294967296 * {bl} + {ah} % 4294967296 * {bh})"
            f" % 4294967296) * 4294967296) % {MOD})"
        )
    return (
        f"(({ah} % 4294967296 * (({b}) % 4294967296) + "
        f"(({ah} // 4294967296 * (({b}) % 4294967296) + "
        f"{ah} % 4294967296 * (({b}) // 4294967296))"
        f" % 4294967296) * 4294967296) % {MOD})"
    )


def _add(*xs: str | int) -> str:
    return "((" + " + ".join(str(x) for x in xs) + f") % {MOD})"


def _rotl(x: str, r: int) -> str:
    # disjoint bit ranges → OR is addition; sum < 2^64 by construction
    return f"((({x}) * {1 << r}) % {MOD} + ({x}) // {1 << (64 - r)})"


def _xor(a: str, b: str) -> str:
    return f"xor(CAST({a} AS HUGEINT), CAST({b} AS HUGEINT))"


def _fmix(h: str) -> str:
    """xxHash64 avalanche; ``h`` must be a cheap reference (bind first)."""
    s1 = let(_xor(h, f"({h}) // {1 << 33}"), "f1", _mul("f1", P2))
    s2 = let(s1, "f2", let(_xor("f2", f"f2 // {1 << 29}"), "f3", _mul("f3", P3)))
    return let(s2, "f4", _xor("f4", f"f4 // {1 << 32}"))


def _round(acc: str, k: str) -> str:
    """acc = rotl31(acc + k*P2) * P1 — ``acc``/``k`` must be cheap refs."""
    return _mul(_rotl(_add(acc, _mul(k, P2)), 31), P1)


def _step8(h: str, k: str) -> str:
    """h = rotl27(h ^ round(0, k)) * P1 + P4."""
    merged = let(_round("0", k), "k8", _xor(h, "k8"))
    return let(merged, "m8", _add(_mul(_rotl("m8", 27), P1), P4))


BYTES_OF = (
    "list_transform(range(0, octet_length(encode({s}))), __j -> CAST("
    "(strpos('0123456789ABCDEF', substr(hex(encode({s})), 2*__j+1, 1)) - 1) * 16"
    " + strpos('0123456789ABCDEF', substr(hex(encode({s})), 2*__j+2, 1)) - 1"
    " AS HUGEINT))"
)


def utf8_bytes(s: str) -> str:
    """LIST<HUGEINT> of the UTF-8 bytes of VARCHAR expression ``s``
    (hex round-trip: DuckDB has no direct blob-byte accessor)."""
    return BYTES_OF.format(s=f"({s})")


def xxh64_bytes(bytes_list: str, seed: int = 42) -> str:
    """Unsigned XXH64 of a LIST<HUGEINT> byte-list expression with a
    constant seed.  Mirrors Spark XXH64.hashUnsafeBytes: 32-byte
    4-lane blocks, 8-byte words, one 4-byte chunk, byte tail."""
    seed %= MOD
    v_init = [
        (seed + P1 + P2) % MOD,
        (seed + P2) % MOD,
        seed,
        (seed - P1) % MOD,
    ]

    # 8-byte little-endian words from the byte list
    words = (
        "list_transform(range(0, __n // 8), __i -> "
        + _add(*[f"__b[8*__i+{k + 1}] * {1 << (8 * k)}" for k in range(8)])
        + ")"
    )

    # 4-lane block loop over 32-byte blocks (element type = LIST<HUGEINT>,
    # init prepended — list_reduce has no init parameter)
    blocks = (
        "list_transform(range(0, __n // 32), __i -> "
        "[__w[4*__i+1], __w[4*__i+2], __w[4*__i+3], __w[4*__i+4]])"
    )
    lane_step = (
        "["
        + ", ".join(
            let(f"__v[{j + 1}]", "va", let(f"__blk[{j + 1}]", "ka", _round("va", "ka")))
            for j in range(4)
        )
        + "]"
    )
    vstate = (
        f"list_reduce([{v_init}::HUGEINT[]] || {blocks}, "
        f"(__v, __blk) -> {lane_step})"
    )

    # merge lanes (n >= 32) or seed+P5, then += n
    merge_h = _add(
        _rotl("__v[1]", 1), _rotl("__v[2]", 7), _rotl("__v[3]", 12), _rotl("__v[4]", 18)
    )
    merge_one = lambda h, lane: let(  # noqa: E731
        let(lane, "lv", _round("0", "lv")), "mr", _add(_mul(_xor(h, "mr"), P1), P4)
    )
    merged = let(merge_h, "h1", merge_one("h1", "__v[1]"))
    merged = let(merged, "h2", merge_one("h2", "__v[2]"))
    merged = let(merged, "h3", merge_one("h3", "__v[3]"))
    merged = let(merged, "h4", merge_one("h4", "__v[4]"))
    h_blocks = let(
        vstate,
        "__v",
        f"CASE WHEN __n >= 32 THEN {merged} ELSE {(seed + P5) % MOD} END",
    )
    h0 = _add(h_blocks, "__n")

    # word tail: full 8-byte words past the 32-byte blocks
    word_tail = (
        f"list_reduce([{h0}] || __w[4*(__n // 32)+1 : __n // 8], "
        f"(__h, __k) -> {_step8('__h', '__k')})"
    )

    # one 4-byte chunk if (n mod 8) >= 4, read at offset 8*(n//8)
    k4 = _add(*[f"__b[8*(__n // 8)+{k + 1}] * {1 << (8 * k)}" for k in range(4)])
    h4b = let(
        word_tail,
        "__h",
        "CASE WHEN __n % 8 >= 4 THEN "
        + let(k4, "k4", let(_xor("__h", _mul("k4", P1)), "x4",
                            _add(_mul(_rotl("x4", 23), P2), P3)))
        + " ELSE __h END",
    )

    # byte tail: bytes past 8*(n//8) (+4 if the 4-byte chunk ran)
    byte_tail = (
        f"list_reduce([{h4b}] || "
        "__b[8*(__n // 8) + CASE WHEN __n % 8 >= 4 THEN 4 ELSE 0 END + 1 : __n], "
        "(__h, __c) -> "
        + let(_xor("__h", _mul("__c", P5)), "xb", _mul(_rotl("xb", 11), P1))
        + ")"
    )

    final = let(byte_tail, "hf", _fmix("hf"))
    return let(bytes_list, "__b", let("len(__b)", "__n", let(words, "__w", final)))


def hash_int(value: int, seed_expr: str) -> str:
    """Spark hashInt: chains a 4-byte int into a running unsigned hash
    expression (``xxhash64(s, 42)``'s second step)."""
    v = value & 0xFFFFFFFF
    h = _add(seed_expr, P5 + 4)
    h = let(h, "hi", _xor("hi", _mul(str(v), P1)))
    h = let(h, "hx", _add(_mul(_rotl("hx", 23), P2), P3))
    return let(h, "hz", _fmix("hz"))


def signed64(u: str) -> str:
    """Two's-complement BIGINT view of an unsigned [0, 2^64) HUGEINT."""
    return (
        f"CAST(CASE WHEN ({u}) >= {1 << 63} THEN ({u}) - {MOD} "
        f"ELSE ({u}) END AS BIGINT)"
    )


def xxhash64_str(s: str, extra_int: int | None = None) -> str:
    """Signed Spark ``xxhash64(s)`` / ``xxhash64(s, <int literal>)``
    of a VARCHAR expression — the complete oracle-side twin."""
    u = xxh64_bytes(utf8_bytes(s), 42)
    if extra_int is not None:
        u = hash_int(extra_int, u)
    return signed64(u)
