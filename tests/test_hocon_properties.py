"""Property-based tests for the from-scratch HOCON parser
(sources/config.py): any tree we can serialize must round-trip, and
substitution resolution must be order-independent.  A hand-rolled
parser earns its keep through exactly this kind of fuzzing."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from fastmlframework_spark.sources.config import parse_hocon
import pytest

# Default-deselected (VERDICT r13 #5: the suite outgrew the driver's
# pytest budget): hypothesis property sweep - run with `-m slow`.
pytestmark = pytest.mark.slow

_KEY = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)
_SCALAR = st.one_of(
    st.integers(min_value=-(10**12), max_value=10**12),
    st.floats(
        allow_nan=False,
        allow_infinity=False,
        min_value=-1e9,
        max_value=1e9,
    ),
    st.booleans(),
    st.none(),
    st.from_regex(r"[A-Za-z][A-Za-z0-9_\-]{0,15}", fullmatch=True),
)
_VALUE = st.recursive(
    _SCALAR,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(_KEY, children, max_size=4),
    ),
    max_leaves=25,
)
_TREE = st.dictionaries(_KEY, _VALUE, min_size=1, max_size=6)


def _emit(value, indent: int = 0) -> str:
    """Serialize a plain tree to HOCON text (quoted strings so unquoted
    keywords like 'on'/'off' can't change type on re-parse)."""
    pad = "  " * indent
    if isinstance(value, dict):
        inner = "\n".join(
            f"{pad}  {k} = {_emit(v, indent + 1).lstrip()}"
            if not isinstance(v, dict)
            else f"{pad}  {k} {_emit(v, indent + 1).lstrip()}"
            for k, v in value.items()
        )
        return f"{pad}{{\n{inner}\n{pad}}}"
    if isinstance(value, list):
        return "[" + ", ".join(_emit(v).strip() for v in value) + "]"
    if isinstance(value, bool):
        return "true" if value else "false"
    if value is None:
        return "null"
    if isinstance(value, str):
        return json.dumps(value)
    if isinstance(value, float):
        return repr(value)
    return str(value)


def _norm(v):
    """ints that arrive as floats (1.0) compare equal; everything else
    must match exactly."""
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_norm(x) for x in v]
    if isinstance(v, float) and v.is_integer() and abs(v) < 10**15:
        return int(v)
    return v


@settings(max_examples=150, deadline=None)
@given(_TREE)
def test_roundtrip_random_trees(tree):
    text = "\n".join(
        f"{k} = {_emit(v).lstrip()}" if not isinstance(v, dict) else f"{k} {_emit(v)}"
        for k, v in tree.items()
    )
    parsed = parse_hocon(text)
    assert _norm(parsed) == _norm(tree), text


@settings(max_examples=60, deadline=None)
@given(_TREE)
def test_substitution_resolves_to_tree_value(tree):
    """A ${path} reference to any top-level key must resolve to exactly
    that key's (normalized) value, regardless of where the target sits
    relative to the reference."""
    target = next(iter(tree))
    text = "\n".join(
        f"{k} = {_emit(v).lstrip()}" if not isinstance(v, dict) else f"{k} {_emit(v)}"
        for k, v in tree.items()
    )
    before = f"__ref = ${{{target}}}\n" + text
    after = text + f"\n__ref = ${{{target}}}"
    for variant in (before, after):
        parsed = parse_hocon(variant)
        assert _norm(parsed["__ref"]) == _norm(tree[target]), variant
