"""Lens config: load (RON or JSON), compile allow/skip regex sets.

Reference: lens loading main.rs:86-106 (S1); regex compile
bootstrap.rs:56-64 (F1); rule semantics from the public spyglass-lens
crate v0.1.6 as exercised at bootstrap.rs:70-94,131-164. The RON
reader below is a from-scratch minimal parser sufficient for lens
files (fixtures/test.ron, fixtures/test-atp.ron) — not a general RON
implementation.

Spark mapping: the config lives on the driver; ``seeds_df``/``rules_df``
materialize small broadcast-able DataFrames; the allow/skip sets fold
into single anchored alternations evaluated with ``rlike`` so admission
filtering stays inside whole-stage codegen (SURVEY.md §4).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field


@dataclass
class SanitizeConfig:
    remove_query_parameter: bool = False


@dataclass
class LensRule:
    """kind ∈ {skip, limit_depth, sanitize} (LensRule variants)."""

    kind: str
    pattern: str
    max_depth: int | None = None
    sanitize: SanitizeConfig | None = None

    def to_regex(self) -> str:
        """Glob-ish pattern → anchored regex (spyglass-lens semantics:
        ``*`` matches any run of characters)."""
        esc = re.escape(self.pattern).replace(r"\*", ".*")
        return f"^{esc}"


@dataclass
class LensConfig:
    name: str = "lens"
    domains: list[str] = field(default_factory=list)
    urls: list[str] = field(default_factory=list)
    rules: list[LensRule] = field(default_factory=list)

    # -- regex sets (F1) ----------------------------------------------------
    def into_regexes(self) -> tuple[list[str], list[str]]:
        """→ (allowed, skipped) regex lists.

        domains allow the whole host (http or https, any path); ``$``
        URLs allow exactly that URL; other URLs allow the prefix.
        skip rules populate the skipped set; limit_depth contributes an
        allowed regex bounding path depth.
        """
        allowed: list[str] = []
        skipped: list[str] = []
        for d in self.domains:
            allowed.append(rf"^(http|https)://{re.escape(d)}(/.*)?$")
        for u in self.urls:
            if u.endswith("$"):
                allowed.append(f"^{re.escape(u[:-1])}$")
            else:
                allowed.append(f"^{re.escape(u)}.*")
        for r in self.rules:
            if r.kind == "skip":
                skipped.append(r.to_regex())
            elif r.kind == "limit_depth" and r.max_depth is not None:
                # {0,N} segments, matching spyglass-lens LimitURLDepth:
                # EVERY depth up to the limit is admitted (r5 review:
                # the old single optional group of N segments matched
                # only depth 0 or exactly N, silently dropping every
                # intermediate depth from the frontier)
                base = re.escape(r.pattern).replace(r"\*", ".*")
                allowed.append(
                    f"^{base}((/[^/]+){{0,{r.max_depth}}}/?)$"
                )
        return allowed, skipped

    def alternations(self) -> tuple[str, str]:
        """Fold each set into ONE alternation for a single codegen'd
        ``rlike`` pass (the RegexSet equivalent, bootstrap.rs:58-64)."""
        allowed, skipped = self.into_regexes()
        allow = "|".join(f"(?:{p})" for p in allowed) if allowed else "^$"
        skip = "|".join(f"(?:{p})" for p in skipped) if skipped else r"(?!)a^"
        return allow, skip

    def seeds(self) -> list[tuple[str, str]]:
        """→ [(seed, kind)] with kind ∈ {domain, prefix, exact} (F3)."""
        out: list[tuple[str, str]] = [(d, "domain") for d in self.domains]
        for u in self.urls:
            if u.endswith("$"):
                out.append((u[:-1], "exact"))
            else:
                out.append((u, "prefix"))
        return out


# ---------------------------------------------------------------- RON-lite

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|//[^\n]*)
  | (?P<str>"(?:[^"\\]|\\.)*")
  | (?P<num>-?\d+(?:\.\d+)?)
  | (?P<bool>true|false)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<punct>[()\[\]{},:])
    """,
    re.VERBOSE,
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    toks, i = [], 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise ValueError(f"RON parse error at offset {i}: {text[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind != "ws":
            toks.append((kind, m.group()))
    return toks


class _RonParser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks, self.i = toks, 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def value(self):
        kind, tok = self.peek()
        if kind == "str":
            self.next()
            return json.loads(tok)
        if kind == "num":
            self.next()
            return float(tok) if "." in tok else int(tok)
        if kind == "bool":
            self.next()
            return tok == "true"
        if kind == "ident":
            self.next()
            if tok == "None":
                return None
            nk, nt = self.peek()
            if nt == "(":  # Some(x) or Variant(args...)
                args = self.seq("(", ")")
                if tok == "Some":
                    return args[0]
                return {"__variant__": tok, "args": args}
            return tok  # bare enum variant
        if tok == "(":  # struct or tuple
            return self.struct_or_tuple()
        if tok == "[":
            return self.seq("[", "]")
        if tok == "{":
            out = {}
            self.next()
            while self.peek()[1] != "}":
                k = self.value()
                assert self.next()[1] == ":"
                out[k] = self.value()
                if self.peek()[1] == ",":
                    self.next()
            self.next()
            return out
        raise ValueError(f"unexpected token {tok!r}")

    def seq(self, open_t: str, close_t: str) -> list:
        assert self.next()[1] == open_t
        out = []
        while self.peek()[1] != close_t:
            out.append(self.value())
            if self.peek()[1] == ",":
                self.next()
        self.next()
        return out

    def struct_or_tuple(self):
        assert self.next()[1] == "("
        # struct if first token is ident followed by ':'
        if (
            self.peek()[0] == "ident"
            and self.i + 1 < len(self.toks)
            and self.toks[self.i + 1][1] == ":"
        ):
            out = {}
            while self.peek()[1] != ")":
                key = self.next()[1]
                assert self.next()[1] == ":"
                out[key] = self.value()
                if self.peek()[1] == ",":
                    self.next()
            self.next()
            return out
        vals = []
        while self.peek()[1] != ")":
            vals.append(self.value())
            if self.peek()[1] == ",":
                self.next()
        self.next()
        return vals


def _rule_from_obj(obj) -> LensRule | None:
    if isinstance(obj, dict) and "__variant__" in obj:
        v, args = obj["__variant__"], obj["args"]
        if v == "SkipURL":
            return LensRule("skip", args[0])
        if v == "LimitURLDepth":
            return LensRule("limit_depth", args[0], max_depth=int(args[1]))
        if v == "SanitizeUrls":
            cfg = args[1] if len(args) > 1 else {}
            return LensRule(
                "sanitize",
                args[0],
                sanitize=SanitizeConfig(bool(cfg.get("remove_query_parameter"))),
            )
    if isinstance(obj, dict) and "kind" in obj:  # JSON form
        return LensRule(
            obj["kind"],
            obj.get("pattern", ""),
            max_depth=obj.get("max_depth"),
            sanitize=SanitizeConfig(obj.get("remove_query", False))
            if obj.get("kind") == "sanitize"
            else None,
        )
    return None


def loads(text: str) -> LensConfig:
    """Parse a lens from RON or JSON text."""
    text = text.strip()
    raw = (
        json.loads(text)
        if text.startswith("{")
        else _RonParser(_tokenize(text)).value()
    )
    rules = [r for r in map(_rule_from_obj, raw.get("rules", []) or []) if r]
    return LensConfig(
        name=raw.get("name", "lens"),
        domains=list(raw.get("domains", []) or []),
        urls=list(raw.get("urls", []) or []),
        rules=rules,
    )


def load(path: str) -> LensConfig:
    """Local path or http(s) URL (main.rs:86-106 accepts both)."""
    if path.startswith(("http://", "https://")):  # pragma: no cover - no net
        import urllib.request

        with urllib.request.urlopen(path, timeout=10) as r:
            return loads(r.read().decode("utf-8"))
    with open(path, encoding="utf-8") as f:
        return loads(f.read())


def dumps(cfg: LensConfig) -> str:
    """Serialize a lens back to RON (K6, main.rs:203-212: the folder
    crawler synthesizes a lens of sorted $-exact URLs). Strings are
    json.dumps-escaped — the tokenizer's string rule and _RonParser's
    json.loads already speak exactly that dialect, and an unescaped
    embedded quote previously terminated the token early (r5 review:
    the synthesized lens was unparseable)."""
    urls = ",\n        ".join(json.dumps(u) for u in cfg.urls)
    domains = ", ".join(json.dumps(d) for d in cfg.domains)
    return (
        "(\n"
        '    version: "1",\n'
        f"    name: {json.dumps(cfg.name)},\n"
        '    author: "netrunner_spark",\n'
        f"    domains: [{domains}],\n"
        f"    urls: [\n        {urls}\n    ]\n"
        ")\n"
    )


def folder_lens(name: str, urls: list[str]) -> str:
    """Sorted $-exact lens for a folder crawl (K6 semantics)."""
    return dumps(LensConfig(name=name, urls=[u + "$" for u in sorted(urls)]))
