"""S6: solution-config scan (generic_tools/config_parser.py:29-43).

The reference parses pyhocon HOCON files, LRU-cached.  ``pyhocon`` is
not installed in this environment, so this module ships a small parser
for the HOCON subset the reference's ``solution.conf`` actually uses —
nested objects, ``=``/``:`` separators, lists, comments, dotted keys,
bools/null/numbers/strings — and transparently prefers real pyhocon
when importable.  JSON files parse as-is (JSON is valid HOCON).

Driver-side only (config is the "query text" of the system — tiny).
"""

from __future__ import annotations

import json
import re
from functools import lru_cache

try:  # pragma: no cover - exercised only where pyhocon exists
    from pyhocon import ConfigFactory  # type: ignore

    _HAVE_PYHOCON = True
except ModuleNotFoundError:
    _HAVE_PYHOCON = False

_COMMENT = re.compile(r"^\s*(#|//)")
_NUM = re.compile(r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$")


class ConfigError(ValueError):
    pass


def _strip_comment(line: str) -> str:
    # Strip trailing # / // comments outside quotes.
    out = []
    in_q: str | None = None
    i = 0
    while i < len(line):
        ch = line[i]
        if in_q:
            if ch == in_q:
                in_q = None
            out.append(ch)
        elif ch in "\"'":
            in_q = ch
            out.append(ch)
        elif ch == "#" or line[i : i + 2] == "//":
            break
        else:
            out.append(ch)
        i += 1
    return "".join(out).rstrip()


def _scalar(tok: str):
    tok = tok.strip()
    if tok and tok[0] in "\"'" and tok[-1] == tok[0] and len(tok) >= 2:
        return tok[1:-1]
    low = tok.lower()
    if low in ("true", "yes", "on"):
        return True
    if low in ("false", "no", "off"):
        return False
    if low in ("null", "none"):
        return None
    if _NUM.match(tok):
        return float(tok) if ("." in tok or "e" in low) else int(tok)
    return tok  # unquoted string


def _parse_value(text: str):
    text = text.strip()
    if text.startswith("["):
        return _parse_list(text)
    if text.startswith("{"):
        return _parse_object_body(text[1:-1] if text.endswith("}") else text[1:])
    return _scalar(text)


def _split_top(text: str, seps: str = ",") -> list[str]:
    """Split on any of ``seps`` at nesting depth 0."""
    parts, depth, cur, in_q = [], 0, [], None
    for ch in text:
        if in_q:
            cur.append(ch)
            if ch == in_q:
                in_q = None
            continue
        if ch in "\"'":
            in_q = ch
            cur.append(ch)
        elif ch in "[{":
            depth += 1
            cur.append(ch)
        elif ch in "]}":
            depth -= 1
            cur.append(ch)
        elif ch in seps and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p for p in (p.strip() for p in parts) if p]


def _parse_list(text: str) -> list:
    inner = text.strip()
    if not (inner.startswith("[") and inner.endswith("]")):
        raise ConfigError(f"malformed list: {text[:60]!r}")
    return [_parse_value(item) for item in _split_top(inner[1:-1], ",\n")]


def _set_dotted(tree: dict, key: str, value) -> None:
    parts = key.split(".")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
        if not isinstance(node, dict):
            raise ConfigError(f"key {key!r} crosses a non-object value")
    leaf = parts[-1]
    if (
        isinstance(value, dict)
        and isinstance(node.get(leaf), dict)
    ):
        node[leaf].update(value)  # HOCON object merge semantics
    else:
        node[leaf] = value


def _parse_object_body(text: str) -> dict:
    """Parse newline/comma separated ``key = value`` entries, where
    value may span lines via balanced {} or [] (depth-aware split)."""
    clean = "\n".join(
        "" if _COMMENT.match(line) else _strip_comment(line)
        for line in text.split("\n")
    )
    entries = _split_top(clean, ",\n")
    # Re-join entries whose value continues on the next physical line
    # (``key =`` at end of line).
    merged: list[str] = []
    for e in entries:
        if merged and merged[-1].rstrip().endswith(("=", ":")):
            merged[-1] = merged[-1] + " " + e
        else:
            merged.append(e)
    tree: dict = {}
    for entry in merged:
        m = re.match(r"^([\w.\-\"']+)\s*(?:[=:]\s*)?(.*)$", entry, re.S)
        if not m:
            raise ConfigError(f"cannot parse entry {entry[:60]!r}")
        key, val = m.group(1).strip("\"'"), m.group(2).strip()
        if not val:
            raise ConfigError(f"missing value for key {key!r}")
        _set_dotted(tree, key, _parse_value(val))
    return tree


def parse_hocon(text: str) -> dict:
    text = text.strip()
    if text.startswith("{") and text.endswith("}"):
        text = text[1:-1]
    return _parse_object_body(text)


@lru_cache(maxsize=64)
def load_config(path: str) -> dict:
    """Reference: config_parser.py:29-43 (pyhocon parse, LRU-cached).
    JSON parses directly; otherwise pyhocon when available, else the
    subset parser above."""
    with open(path) as fh:
        text = fh.read()
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        pass
    if _HAVE_PYHOCON:  # pragma: no cover
        return ConfigFactory.parse_string(text).as_plain_ordered_dict()
    return parse_hocon(text)


def get_path(tree: dict, dotted: str, default=None):
    """``get_path(cfg, 'modeling_settings.cv_params.n_folds')``."""
    node = tree
    for part in dotted.split("."):
        if not isinstance(node, dict) or part not in node:
            return default
        node = node[part]
    return node
