"""S6: solution-config scan (generic_tools/config_parser.py:29-43).

The reference parses pyhocon HOCON files, LRU-cached.  ``pyhocon`` is
not installed in this environment, so this module ships a from-scratch
recursive-descent HOCON parser covering the semantics the reference's
real configs exercise (verified against
examples/classification/multiclass/iris/configs/solution.conf, which
uses ``${path}`` substitutions throughout):

* nested objects (``key { ... }`` with or without ``=``/``:``),
  lists, ``#`` and ``//`` comments, dotted path keys, quoted keys;
* duplicate-key semantics: objects deep-merge, scalars later-wins;
* ``${path}`` substitutions (required) and ``${?path}`` (optional —
  the field vanishes if the target is undefined), resolved against
  the FINAL merged tree like pyhocon, fixpoint iteration with cycle
  detection;
* value concatenation: adjacent strings join (whitespace preserved),
  adjacent arrays concatenate, adjacent objects merge — including
  through substitutions (``base = ${dirs.root}/sub``);
* ``include "file.conf"`` / ``include file("...")`` resolved relative
  to the including file, merged with the including object.

JSON files parse as-is (JSON is valid HOCON).  Real pyhocon is used
transparently when importable.

Driver-side only (config is the "query text" of the system — tiny).
"""

from __future__ import annotations

import json
import os
import re
from functools import lru_cache

try:  # pragma: no cover - exercised only where pyhocon exists
    from pyhocon import ConfigFactory  # type: ignore

    _HAVE_PYHOCON = True
except ModuleNotFoundError:
    _HAVE_PYHOCON = False

_NUM = re.compile(r"^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$")


class ConfigError(ValueError):
    pass


class _Subst:
    """Unresolved ``${path}`` / ``${?path}`` marker."""

    __slots__ = ("path", "optional")

    def __init__(self, path: str, optional: bool):
        self.path = path
        self.optional = optional

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"${{{'?' if self.optional else ''}{self.path}}}"


class _Concat(list):
    """Adjacent value chunks awaiting concatenation."""


def _scalar(tok: str):
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


def _deep_merge(base: dict, over: dict) -> dict:
    """HOCON object merge: objects merge recursively, anything else
    later-wins."""
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


class _Parser:
    def __init__(self, s: str, base_dir: str | None = None):
        self.s = s.replace("\r\n", "\n")
        self.i = 0
        self.n = len(self.s)
        self.base_dir = base_dir

    # -------------------------------------------------- low-level scan
    def err(self, msg: str):
        line = self.s.count("\n", 0, self.i) + 1
        raise ConfigError(f"{msg} (line {line})")

    def peek(self) -> str:
        return self.s[self.i] if self.i < self.n else ""

    def at_comment(self) -> bool:
        return self.peek() == "#" or self.s.startswith("//", self.i)

    def skip_comment(self) -> None:
        while self.i < self.n and self.s[self.i] != "\n":
            self.i += 1

    def skip_inline(self) -> None:
        while self.i < self.n and self.s[self.i] in " \t":
            self.i += 1

    def skip_blank(self, commas: bool = False) -> None:
        """Whitespace, newlines, comments (and separators if asked)."""
        while self.i < self.n:
            ch = self.s[self.i]
            if ch in " \t\n" or (commas and ch == ","):
                self.i += 1
            elif self.at_comment():
                self.skip_comment()
            else:
                return

    # -------------------------------------------------------- entries
    def parse_root(self) -> dict:
        self.skip_blank()
        if self.peek() == "{":
            obj = self.parse_object()
            self.skip_blank(commas=True)
            if self.i < self.n:
                self.err("trailing content after root object")
            return obj
        return self.parse_object_body(term=None)

    def parse_object(self) -> dict:
        assert self.peek() == "{"
        self.i += 1
        obj = self.parse_object_body(term="}")
        if self.peek() != "}":
            self.err("unterminated object")
        self.i += 1
        return obj

    def parse_object_body(self, term: str | None) -> dict:
        obj: dict = {}
        while True:
            self.skip_blank(commas=True)
            if self.i >= self.n:
                if term:
                    self.err("unterminated object")
                return obj
            if term and self.peek() == term:
                return obj
            if self._match_include():
                inc = self._parse_include()
                obj = _deep_merge(obj, inc)
                continue
            keypath = self.parse_key()
            self.skip_inline()
            ch = self.peek()
            if ch in "=:":
                self.i += 1
                val = self.parse_value()
            elif ch == "{":
                val = self.parse_object()
            elif ch == "+" and self.s.startswith("+=", self.i):
                self.err("+= append is not supported")
            else:
                self.err(f"expected '=', ':' or '{{' after key {'.'.join(keypath)!r}")
            self._merge_path(obj, keypath, val)

    def _merge_path(self, obj: dict, keypath: list[str], val) -> None:
        node = obj
        for p in keypath[:-1]:
            nxt = node.get(p)
            if not isinstance(nxt, dict):
                nxt = {}
                node[p] = nxt
            node = nxt
        leaf = keypath[-1]
        if isinstance(val, dict) and isinstance(node.get(leaf), dict):
            node[leaf] = _deep_merge(node[leaf], val)
        else:
            node[leaf] = val

    def _match_include(self) -> bool:
        if not self.s.startswith("include", self.i):
            return False
        j = self.i + len("include")
        return j < self.n and self.s[j] in " \t"

    def _parse_include(self) -> dict:
        self.i += len("include")
        self.skip_inline()
        wrapped = None
        for kw in ("required(", "file(", "url("):
            if self.s.startswith(kw, self.i):
                wrapped = kw
                self.i += len(kw)
                self.skip_inline()
                break
        if self.peek() not in "\"'":
            self.err("include expects a quoted path")
        path = self.parse_quoted()
        self.skip_inline()
        if wrapped:
            if self.peek() != ")":
                self.err("unterminated include(...)")
            self.i += 1
        if wrapped == "url(":
            self.err("include url(...) is not supported (no network)")
        full = path if os.path.isabs(path) else os.path.join(self.base_dir or ".", path)
        if not os.path.exists(full):
            if wrapped == "required(":
                raise ConfigError(f"required include not found: {full}")
            return {}  # HOCON: missing non-required include is ignored
        with open(full) as fh:
            sub = _Parser(fh.read(), base_dir=os.path.dirname(full))
        return sub.parse_root()

    # ----------------------------------------------------------- keys
    def parse_key(self) -> list[str]:
        parts: list[str] = []
        buf = ""
        while self.i < self.n:
            ch = self.s[self.i]
            if ch in "\"'":
                parts.append(buf) if buf else None
                buf = ""
                parts.append("\0Q" + self.parse_quoted())  # literal, no dot-split
                continue
            if ch in "=:{\n" or ch in " \t" and self._key_ends_here():
                break
            if ch in " \t":
                self.i += 1
                continue
            buf += ch
            self.i += 1
        if buf:
            parts.append(buf)
        out: list[str] = []
        for p in parts:
            if p.startswith("\0Q"):
                out.append(p[2:])
            else:
                out.extend(seg for seg in p.split(".") if seg)
        if not out:
            self.err("empty key")
        return out

    def _key_ends_here(self) -> bool:
        j = self.i
        while j < self.n and self.s[j] in " \t":
            j += 1
        return j >= self.n or self.s[j] in "=:{\n"

    # --------------------------------------------------------- values
    def parse_quoted(self) -> str:
        q = self.s[self.i]
        if self.s.startswith(q * 3, self.i):  # triple-quoted
            end = self.s.find(q * 3, self.i + 3)
            if end < 0:
                self.err("unterminated triple-quoted string")
            out = self.s[self.i + 3 : end]
            self.i = end + 3
            return out
        self.i += 1
        out = []
        while self.i < self.n:
            ch = self.s[self.i]
            if ch == "\\" and self.i + 1 < self.n:
                nxt = self.s[self.i + 1]
                out.append(
                    {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", q: q}.get(nxt, "\\" + nxt)
                )
                self.i += 2
                continue
            if ch == q:
                self.i += 1
                return "".join(out)
            if ch == "\n":
                break
            out.append(ch)
            self.i += 1
        self.err("unterminated string")

    def parse_subst(self) -> _Subst:
        assert self.s.startswith("${", self.i)
        self.i += 2
        optional = self.peek() == "?"
        if optional:
            self.i += 1
        end = self.s.find("}", self.i)
        if end < 0:
            self.err("unterminated ${...} substitution")
        path = self.s[self.i : end].strip()
        self.i = end + 1
        if not path:
            self.err("empty substitution path")
        return _Subst(path, optional)

    def parse_list(self) -> list:
        assert self.peek() == "["
        self.i += 1
        items = []
        while True:
            self.skip_blank(commas=True)
            if self.i >= self.n:
                self.err("unterminated list")
            if self.peek() == "]":
                self.i += 1
                return items
            items.append(self.parse_value(in_list=True))

    def parse_value(self, in_list: bool = False):
        """One value: chunks concatenated until newline / ',' / close.
        The value may start on the next line (``key =`` + newline)."""
        self.skip_blank()  # value may follow on the next line
        parts: list = []  # ("str", s) | ("raw", s) | value | _Subst
        while self.i < self.n:
            ch = self.s[self.i]
            if ch == "\n" or ch == "," or ch == "}" or ch == "]":
                break
            if self.at_comment():
                self.skip_comment()
                break
            if ch == "{":
                parts.append(("val", self.parse_object()))
                self.skip_inline()
                continue
            if ch == "[":
                parts.append(("val", self.parse_list()))
                self.skip_inline()
                continue
            if self.s.startswith("${", self.i):
                parts.append(("sub", self.parse_subst()))
                continue
            if ch in "\"'":
                parts.append(("str", self.parse_quoted()))
                continue
            # unquoted run: up to a chunk boundary
            j = self.i
            while j < self.n and self.s[j] not in "\n,}]\"'{[" and not (
                self.s[j] == "$" and self.s.startswith("${", j)
            ) and not (self.s[j] == "#" or self.s.startswith("//", j)):
                j += 1
            parts.append(("raw", self.s[self.i : j]))
            self.i = j
        if not parts:
            self.err("missing value")
        # trim trailing whitespace of the final raw chunk
        if parts and parts[-1][0] == "raw":
            tag, s = parts[-1]
            parts[-1] = (tag, s.rstrip())
            if not parts[-1][1]:
                parts.pop()
        if not parts:
            self.err("missing value")
        if len(parts) == 1:
            tag, v = parts[0]
            if tag == "raw":
                return _scalar(v.strip())
            return v
        out = _Concat()
        for tag, v in parts:
            out.append(v)
        return out


# ------------------------------------------------- substitution engine
def _lookup(root: dict, dotted: str):
    node = root
    for part in dotted.split("."):
        if not isinstance(node, dict) or part not in node:
            return ("missing", None)
        node = node[part]
    if _has_pending(node):
        return ("pending", None)
    return ("ok", node)


def _has_pending(v) -> bool:
    if isinstance(v, (_Subst, _Concat)):
        return True
    if isinstance(v, dict):
        return any(_has_pending(x) for x in v.values())
    if isinstance(v, list):
        return any(_has_pending(x) for x in v)
    return False


def _concat_combine(parts: list):
    vals = [p for p in parts if p is not _DROPPED]
    if not vals:
        return _DROPPED
    if len(vals) == 1:
        return vals[0]
    if all(isinstance(v, list) for v in vals):
        out: list = []
        for v in vals:
            out.extend(v)
        return out
    if all(isinstance(v, dict) for v in vals):
        merged: dict = {}
        for v in vals:
            merged = _deep_merge(merged, v)
        return merged
    # string concatenation: raw chunks keep their literal spacing
    return "".join("" if v is None else str(v) for v in vals).strip()


class _Dropped:
    """Sentinel: optional substitution with no target — field vanishes."""


_DROPPED = _Dropped()


def _resolve_node(v, root: dict, final: bool):
    """One resolution step; returns (new_value, changed)."""
    if isinstance(v, _Subst):
        status, target = _lookup(root, v.path)
        if status == "ok":
            return target, True
        if status == "missing":
            if v.optional:
                return _DROPPED, True
            if final:
                raise ConfigError(f"unresolved substitution ${{{v.path}}}")
        return v, False
    if isinstance(v, _Concat):
        changed = False
        new_parts = []
        for p in v:
            np, ch = _resolve_node(p, root, final)
            changed = changed or ch
            new_parts.append(np)
        if any(isinstance(p, (_Subst, _Concat)) for p in new_parts):
            out = _Concat(new_parts)
            return out, changed
        return _concat_combine(new_parts), True
    if isinstance(v, dict):
        changed = False
        for k in list(v):
            nv, ch = _resolve_node(v[k], root, final)
            changed = changed or ch
            if nv is _DROPPED:
                del v[k]
            else:
                v[k] = nv
        return v, changed
    if isinstance(v, list):
        changed = False
        out = []
        for item in v:
            nv, ch = _resolve_node(item, root, final)
            changed = changed or ch
            if nv is not _DROPPED:
                out.append(nv)
        v[:] = out
        return v, changed
    return v, False


def _resolve(tree: dict) -> dict:
    for _ in range(100):
        _, changed = _resolve_node(tree, tree, final=False)
        if not _has_pending(tree):
            return tree
        if not changed:
            break
    # final pass: raise on required, drop optional
    _resolve_node(tree, tree, final=True)
    if _has_pending(tree):  # cycle of required substitutions
        raise ConfigError("substitution cycle detected")
    return tree


# ---------------------------------------------------------- public API
def parse_hocon(text: str, base_dir: str | None = None) -> dict:
    """Parse HOCON text → plain dict (substitutions resolved,
    includes loaded relative to ``base_dir``)."""
    tree = _Parser(text, base_dir=base_dir).parse_root()
    return _resolve(tree)


@lru_cache(maxsize=64)
def load_config(path: str) -> dict:
    """Reference: config_parser.py:29-43 (pyhocon parse, LRU-cached).
    JSON parses directly; otherwise pyhocon when available, else the
    parser above."""
    with open(path) as fh:
        text = fh.read()
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        pass
    if _HAVE_PYHOCON:  # pragma: no cover
        return ConfigFactory.parse_file(path).as_plain_ordered_dict()
    return parse_hocon(text, base_dir=os.path.dirname(os.path.abspath(path)))


def get_path(tree: dict, dotted: str, default=None):
    """``get_path(cfg, 'modeling_settings.cv_params.n_folds')``."""
    node = tree
    for part in dotted.split("."):
        if not isinstance(node, dict) or part not in node:
            return default
        node = node[part]
    return node
