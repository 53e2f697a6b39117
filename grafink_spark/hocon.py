"""Minimal HOCON parser — enough for the reference's config surface.

The reference's configs are HOCON
(common/src/main/scala/com/astrolabsoftware/grafink/models/Config.scala:100-124
loads them with pureconfig; e.g. core/src/main/resources/application.conf).
pyhocon is not available in this environment, so this module implements
the subset those files actually use:

- ``key = value``, ``key: value``, and ``key { ... }`` object syntax
- nested objects, arrays (comma- and/or newline-separated), inline
  JSON-style objects inside arrays
- quoted and unquoted scalars (int/float/bool/null coercion)
- dotted bare keys (``a.b = v`` → nested)
- ``#`` and ``//`` comments, trailing commas, optional root braces
- duplicate-key object deep-merge (later wins for scalars)

Not supported (unused by the reference configs): substitutions
(``${...}``), includes, multi-line strings, concatenation of quoted
strings. Hitting one raises ValueError rather than misparsing.
"""

from __future__ import annotations

from typing import Any


class _Parser:
    def __init__(self, text: str):
        self.s = text
        self.i = 0
        self.n = len(text)

    # ---------------------------------------------------------- scanning

    def _peek(self) -> str:
        return self.s[self.i] if self.i < self.n else ""

    def _skip_ws(self, newlines: bool = True) -> None:
        while self.i < self.n:
            c = self.s[self.i]
            if c in " \t\r" or (newlines and c == "\n"):
                self.i += 1
            elif c == "#" or self.s.startswith("//", self.i):
                while self.i < self.n and self.s[self.i] != "\n":
                    self.i += 1
            else:
                return

    def _skip_inline_ws(self) -> None:
        self._skip_ws(newlines=False)

    def _error(self, msg: str) -> ValueError:
        line = self.s.count("\n", 0, self.i) + 1
        return ValueError(f"HOCON parse error at line {line}: {msg}")

    # ------------------------------------------------------------ tokens

    def _quoted_string(self) -> str:
        assert self._peek() == '"'
        self.i += 1
        out = []
        while self.i < self.n:
            c = self.s[self.i]
            if c == "\\":
                esc = self.s[self.i + 1 : self.i + 2]
                mapped = {"n": "\n", "t": "\t", '"': '"', "\\": "\\", "/": "/"}
                if esc not in mapped:
                    raise self._error(f"unsupported escape \\{esc}")
                out.append(mapped[esc])
                self.i += 2
            elif c == '"':
                self.i += 1
                return "".join(out)
            else:
                out.append(c)
                self.i += 1
        raise self._error("unterminated string")

    def _bare(self, stop: str) -> str:
        start = self.i
        while self.i < self.n and self.s[self.i] not in stop:
            if self.s[self.i] == "#" or self.s.startswith("//", self.i):
                break
            self.i += 1
        return self.s[start : self.i].strip()

    # ------------------------------------------------------------ values

    def parse_value(self, in_array: bool) -> Any:
        self._skip_ws()
        c = self._peek()
        if c == "{":
            return self.parse_object()
        if c == "[":
            return self.parse_array()
        if c == '"':
            return self._quoted_string()
        if self.s.startswith("${", self.i):
            raise self._error("substitutions (${...}) are not supported")
        stop = ",]\n" if in_array else "\n,}"
        raw = self._bare(stop)
        if raw == "":
            raise self._error("empty value")
        return _coerce(raw)

    def parse_array(self) -> list[Any]:
        assert self._peek() == "["
        self.i += 1
        out: list[Any] = []
        while True:
            self._skip_ws()
            if self._peek() == "":
                raise self._error("unterminated array")
            if self._peek() == "]":
                self.i += 1
                return out
            out.append(self.parse_value(in_array=True))
            self._skip_ws(newlines=False)
            # explicit EOF guard: "" is a substring of any string, so a
            # bare `in ",\n"` test spins forever on a truncated array
            while self._peek() != "" and self._peek() in ",\n":
                self.i += 1
                self._skip_ws(newlines=False)

    def parse_object(self, root: bool = False) -> dict[str, Any]:
        if not root:
            assert self._peek() == "{"
            self.i += 1
        out: dict[str, Any] = {}
        while True:
            self._skip_ws()
            c = self._peek()
            if c == "":
                if root:
                    return out
                raise self._error("unterminated object")
            if c == "}":
                if root:
                    raise self._error("unexpected '}' at top level")
                self.i += 1
                return out
            # key (quoted keys are literal — no dot-path splitting)
            if c == '"':
                key, path = self._quoted_string(), None
            else:
                key = self._bare(":={\n")
                path = key.split(".")
            if not key:
                raise self._error("expected a key")
            self._skip_inline_ws()
            c = self._peek()
            if c != "" and c in ":=":
                self.i += 1
                self._skip_inline_ws()
                value = self.parse_value(in_array=False)
            elif c == "{":
                value = self.parse_object()
            else:
                raise self._error(f"expected ':', '=' or '{{' after key {key!r}")
            _set_path(out, path if path is not None else [key], value)
            self._skip_inline_ws()
            if self._peek() == ",":
                self.i += 1


def _coerce(raw: str) -> Any:
    low = raw.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    if low == "null":
        return None
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        pass
    return raw


def _set_path(obj: dict[str, Any], path: list[str], value: Any) -> None:
    for p in path[:-1]:
        nxt = obj.get(p)
        if not isinstance(nxt, dict):
            nxt = {}
            obj[p] = nxt
        obj = nxt
    key = path[-1]
    old = obj.get(key)
    if isinstance(old, dict) and isinstance(value, dict):
        _merge(old, value)  # HOCON object merge semantics
    else:
        obj[key] = value


def _merge(dst: dict[str, Any], src: dict[str, Any]) -> None:
    for k, v in src.items():
        if isinstance(dst.get(k), dict) and isinstance(v, dict):
            _merge(dst[k], v)
        else:
            dst[k] = v


def loads(text: str) -> dict[str, Any]:
    """Parse HOCON text into a plain dict."""
    p = _Parser(text)
    p._skip_ws()
    if p._peek() == "{":
        obj = p.parse_object()
        p._skip_ws()
        if p._peek() != "":
            raise p._error("trailing content after root object")
        return obj
    return p.parse_object(root=True)


def load(path: str) -> dict[str, Any]:
    with open(path) as f:
        return loads(f.read())
