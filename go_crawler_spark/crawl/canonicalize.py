"""URL canonicalization + xxhash64 — the shared kernel (SURVEY.md §2 B2/B9/E4).

One definition, two consumers: the Spark engine (as a vectorized pandas
UDF — sanctioned kernel #1 of 3, no per-row Python in the engine
otherwise) and the pure-Python reference simulator. Sharing the kernel
is what makes the golden-trace comparison a test of the *engine*, not of
two divergent URL grammars.

Semantics (each mapped to the reference):
- relative→absolute resolution via RFC-3986 ``urljoin`` — mirrors
  ``resolveURL`` (/root/reference/internal/usecase/crawler.go:162-179):
  absolute URLs pass through, relative resolve against the base.
- validity gate: scheme ∈ {http, https} and non-empty host — mirrors
  ``url.ParseRequestURI`` in NewCrawlJob
  (/root/reference/internal/domain/model/crawl_job.go:29-40); invalid → None.
- NFKC normalization — the Python equivalent of Go ``width.Narrow`` +
  the full-width symbol map (job_posting_parser.go:617-641).
- lowercase scheme/host, drop default ports, strip fragments, empty
  path → "/". Query strings are kept byte-exact: the reference keys its
  URL-seen set on exact strings (crawl_job_client.go:235-254), and
  pagination URLs differ only in the query.

``xxhash64_py`` reimplements XXH64 (public algorithm) with Spark's
seed=42 so the simulator's url_hash matches ``F.xxhash64`` exactly —
verified by a parity test in tests/test_canonicalize.py.
"""

from __future__ import annotations

import re
import unicodedata
from urllib.parse import urljoin, urlsplit, urlunsplit

import pandas as pd

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canon_url(base: str | None, href: str) -> str | None:
    """Resolve ``href`` against ``base`` and canonicalize; None if invalid."""
    if href is None:
        return None
    href = unicodedata.normalize("NFKC", href.strip())
    try:
        absolute = urljoin(base, href) if base else href
        parts = urlsplit(absolute)
        scheme = parts.scheme.lower()
        if scheme not in ("http", "https") or not parts.hostname:
            return None
        host = parts.hostname.lower()
        port = parts.port  # raises ValueError on a malformed port (":0,+")
    except ValueError:
        return None
    netloc = host if port is None or str(port) == _DEFAULT_PORTS[scheme] else f"{host}:{port}"
    path = parts.path or "/"
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def host_of(url: str) -> str:
    return urlsplit(url).hostname or ""


def path_of(url: str) -> str:
    return urlsplit(url).path or "/"


# --- XXH64 (seed 42, Spark parity) ------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M64


def xxhash64_py(data: bytes | str, seed: int = 42) -> int:
    """XXH64 over bytes; signed-int64 result matching Spark F.xxhash64."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


# --- vectorized kernel (engine side) -----------------------------------

# fast-path guard: printable-ASCII root-relative href, no fragment, no
# dot segments, not protocol-relative — for these, resolution against a
# canonical base is pure string concat and NFKC is the identity
_SIMPLE_HREF = re.compile(
    # root-relative, printable ASCII; no protocol-relative "//", no dot
    # segments (a "/." or "/.." segment ends at "/", "?", or end-of-string
    # — RFC-3986 remove_dot_segments rewrites all three, so all three must
    # fall to the slow path), no fragment, and no trailing "?" (urlunsplit
    # drops an empty query, plain concat would keep it)
    # lookaheads are anchored at position 0 (before the leading "/" is
    # consumed) so a dot segment in the FIRST path segment ("/.?q") is
    # rejected too — the r2 fast-path bug was anchoring them after "^/".
    # ";" always falls to the slow path: urljoin resolves via urlparse,
    # which strips an empty params part ("/a;" -> "/a").
    r"^(?!.*\.\.)(?!.*/\.{1,2}(?:[/?]|$))(?!.*#)(?!.*;)(?!.*\?$)/(?!/)[!-~]+$"
)
_CANON_BASE = re.compile(r"^(https?://[^/?#\s]+)/")


def canonicalize_batch(base: pd.Series, href: pd.Series) -> pd.Series:
    """Pandas-batch canonicalization: the engine's kernel #1.

    Registered via mapInPandas in engine.py; operates on Arrow batches,
    never row-at-a-time through Spark's Python-UDF row path.

    Two tiers: a vectorized string-concat fast path for simple
    root-relative ASCII hrefs under an already-canonical base (the
    overwhelming majority of links a crawl discovers — frontier URLs are
    canonical by induction), and the full ``canon_url`` fallback for
    everything else (absolute, dot-segment, fragment-bearing, non-ASCII,
    odd bases). A parity test asserts both tiers agree on the fast-path
    domain.
    """
    href_ok = href.str.match(_SIMPLE_HREF, na=False)
    prefix = base.str.extract(_CANON_BASE, expand=False)
    fast = href_ok & prefix.notna()
    out = pd.Series(index=href.index, dtype=object)
    if fast.any():
        out[fast] = prefix[fast] + href[fast]
    slow = ~fast
    if slow.any():
        out[slow] = [
            canon_url(b, u) for b, u in zip(base[slow], href[slow])
        ]
    return out
