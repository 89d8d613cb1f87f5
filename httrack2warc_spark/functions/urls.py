"""URL canonicalization and percent codecs — THE semantic kernel of the URL-seen set.

Reference semantics being reproduced (behavioral spec, not a port):

- ``fixupUrl``      — reference ``httrack/HtsUtil.java:28-43``: parse; if the scheme is
  empty (early HTTrack logs) prepend ``http://``; WHATWG-canonicalize (urlcanon lib);
  fragments are *intentionally preserved* (the strip is commented out in the reference).
- ``percentEncode`` — reference ``httrack/HtsUtil.java:48-61`` ("mode 0"): UTF-8 bytes
  ≤0x1f, 0x7f, space and ``"`` become lowercase ``%xx``; ``\\`` becomes ``/``;
  everything else passes through. Golden: ``a b \\0 "c"`` → ``a%20b%20%00%20%22c%22``
  (``test/.../HtsUtilTest.java:6-8``).
- ``percentDecode`` — reference ``httrack/HttrackCrawl.java:280-293``: char-wise ``%xx``
  decode, tolerant of a trailing/malformed ``%``.
- ``stripProtocol`` — reference ``httrack/HtsUtil.java:63-65``: drop one leading
  ``https?://``.
- ``makeHeaderKey`` — reference ``httrack/HttrackCrawl.java:88-90``:
  ``stripProtocol(fixupUrl(url))`` — the scheme-collapsed join key for header FIFO queues.

The WHATWG canonicalizer below implements the subset of the WHATWG URL spec that the
urlcanon library applies and that the reference's fixtures exercise: control/space trim,
tab/newline removal, scheme+host lowercasing, default-port elision, backslash→slash in
special schemes, dot-segment resolution, per-component percent-encode sets (existing
``%`` sequences are left untouched — fixture ``page%20WITH%20%22special%22%20chars.html``
must round-trip verbatim, and ``?page=1&query=2&FOO=3&&BaR=4&&#anchor`` keeps its query
and fragment byte-for-byte — ``Httrack2WarcTest.java:82``), numeric IPv4 host
normalization, and IDNA/punycode for non-ASCII hosts (stdlib ``encodings.idna``).

Everything is exposed three ways: a plain-Python function (driver-side / tests), a
vectorized ``pandas_udf`` (executor hot path — Arrow batches, no per-row Python from
Spark's perspective), and where the semantics allow, a pure-Column expression that
stays inside whole-stage codegen (``strip_protocol_col``, ``url_host_col``).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

__all__ = [
    "canonicalize_url",
    "canonicalize_urls_udf",
    "make_header_key",
    "make_header_key_udf",
    "percent_decode",
    "percent_decode_udf",
    "percent_encode",
    "percent_encode_udf",
    "strip_protocol",
    "strip_protocol_col",
    "url_host",
    "url_host_col",
]

# ---------------------------------------------------------------------------
# WHATWG-subset canonicalizer
# ---------------------------------------------------------------------------

_SPECIAL_PORTS = {"http": "80", "https": "443", "ws": "80", "wss": "443", "ftp": "21"}
_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.\-]*):(.*)$", re.DOTALL)
_TAB_NL = str.maketrans("", "", "\t\n\r")

# WHATWG percent-encode sets (existing '%' passes through untouched).
_C0 = set(range(0x00, 0x20)) | {0x7F}
_FRAGMENT_SET = _C0 | {ord(c) for c in ' "<>`'}
_QUERY_SET = _C0 | {ord(c) for c in ' "<>#'}
_SPECIAL_QUERY_SET = _QUERY_SET | {ord("'")}
_PATH_SET = _QUERY_SET | {ord(c) for c in "`?{}"}
_USERINFO_SET = _PATH_SET | {ord(c) for c in "/:;=@[\\]^|"}


def _pct_encode(s: str, encode_set: set[int]) -> str:
    out = []
    for b in s.encode("utf-8", errors="surrogatepass"):
        if b in encode_set or b > 0x7E:
            out.append("%%%02X" % b)
        else:
            out.append(chr(b))
    return "".join(out)


def _normalize_ipv4(host: str) -> str | None:
    """WHATWG IPv4 parser: last dotted part numeric ⇒ whole host must be numeric."""
    parts = host.split(".")
    if parts and parts[-1] == "":
        parts = parts[:-1]
    if not parts or len(parts) > 4:
        return None

    def parse_num(p: str) -> int | None:
        if not p:
            return None
        try:
            if p[:2].lower() == "0x":
                return int(p[2:], 16) if len(p) > 2 else 0
            if p[0] == "0" and len(p) > 1:
                return int(p, 8)
            return int(p, 10)
        except ValueError:
            return None

    last = parse_num(parts[-1])
    if last is None:
        return None
    nums = []
    for p in parts:
        n = parse_num(p)
        if n is None:
            return None
        nums.append(n)
    if any(n > 255 for n in nums[:-1]):
        return None
    if nums[-1] >= 256 ** (5 - len(nums)):
        return None
    ip = nums[-1]
    for i, n in enumerate(nums[:-1]):
        ip += n << (8 * (3 - i))
    return ".".join(str((ip >> (8 * (3 - i))) & 0xFF) for i in range(4))


def _idna_host(host: str) -> str:
    """Punycode non-ASCII labels (WHATWG domain-to-ASCII; reference urlcanon
    does the same for IDN hosts). Per-label so empty labels (leading/trailing
    dots) survive; labels the codec rejects pass through unchanged."""
    out = []
    for lab in host.split("."):
        if lab and any(ord(c) > 0x7E for c in lab):
            try:
                lab = lab.encode("idna").decode("ascii")
            except UnicodeError:
                pass
        out.append(lab)
    return ".".join(out)


def _canonical_host(host: str) -> str:
    host = host.lower()
    # existing percent-escapes in hosts are rare; decode then re-check (WHATWG
    # host parser percent-decodes its input)
    if "%" in host:
        host = percent_decode(host)
    if host.startswith("[") and host.endswith("]"):
        return host  # IPv6 literal: pass through (lowercased)
    if any(ord(c) > 0x7E for c in host):
        host = _idna_host(host)
    ipv4 = _normalize_ipv4(host)
    if ipv4 is not None:
        return ipv4
    return host


def _resolve_dots(path: str) -> str:
    """RFC 3986 / WHATWG path dot-segment resolution over a '/'-split path."""
    segments = path.split("/")
    out: list[str] = []
    for i, seg in enumerate(segments):
        low = seg.lower()
        if low in (".", "%2e"):
            if i == len(segments) - 1:
                out.append("")
            continue
        if low in ("..", ".%2e", "%2e.", "%2e%2e"):
            if len(out) > 1:
                out.pop()
            if i == len(segments) - 1:
                out.append("")
            continue
        out.append(seg)
    if out and out[0] != "":
        out.insert(0, "")
    return "/".join(out) if out else "/"


def canonicalize_url(raw: str | None) -> str | None:
    """WHATWG-canonicalize one URL; scheme-less input gets ``http://`` prepended
    (reference ``HtsUtil.java:31-34`` — early HTTrack logs omit the scheme)."""
    if raw is None:
        return None
    url = raw.strip(" \x00\x01\x02\x03\x04\x05\x06\x07\x08\t\n\x0b\x0c\r\x0e\x0f"
                    "\x10\x11\x12\x13\x14\x15\x16\x17\x18\x19\x1a\x1b\x1c\x1d\x1e\x1f")
    url = url.translate(_TAB_NL)

    m = _SCHEME_RE.match(url)
    if m and (m.group(1).lower() in _SPECIAL_PORTS or m.group(2).startswith("//")):
        scheme = m.group(1).lower()
        rest = m.group(2)
    else:
        scheme = "http"
        rest = "//" + url

    special = scheme in _SPECIAL_PORTS
    if not special:
        # non-special scheme: lowercase scheme only, pass the rest through
        return scheme + ":" + rest

    # swallow any run of slashes/backslashes after the scheme (WHATWG special-URL rule)
    i = 0
    while i < len(rest) and rest[i] in "/\\":
        i += 1
    rest = rest[i:]

    # authority ends at first / \ ? #
    j = 0
    while j < len(rest) and rest[j] not in "/\\?#":
        j += 1
    authority, after = rest[:j], rest[j:]

    userinfo = ""
    host_port = authority
    if "@" in authority:
        ui, host_port = authority.rsplit("@", 1)
        userinfo = _pct_encode(ui, _USERINFO_SET) + "@"

    port = ""
    host = host_port
    # split port at last ':' not inside an IPv6 bracket
    if ":" in host_port and not host_port.endswith("]"):
        bracket = host_port.rfind("]")
        colon = host_port.rfind(":")
        if colon > bracket:
            host, port = host_port[:colon], host_port[colon + 1 :]
    host = _canonical_host(host)
    if port:
        port = port.lstrip("0") or "0"
        if _SPECIAL_PORTS.get(scheme) == port:
            port = ""
    port_part = (":" + port) if port else ""

    # split path / query / fragment; backslash == slash in special URLs
    frag = ""
    if "#" in after:
        after, f = after.split("#", 1)
        frag = "#" + _pct_encode(f, _FRAGMENT_SET)
    query = ""
    if "?" in after:
        after, q = after.split("?", 1)
        qset = _SPECIAL_QUERY_SET if special else _QUERY_SET
        query = "?" + _pct_encode(q, qset)
    path = after.replace("\\", "/")
    path = _resolve_dots(path) if path else "/"
    path = _pct_encode(path, _PATH_SET)

    return f"{scheme}://{userinfo}{host}{port_part}{path}{query}{frag}"


# ---------------------------------------------------------------------------
# HTTrack percent codecs (mode 0)
# ---------------------------------------------------------------------------

def percent_encode(s: str | None) -> str | None:
    """HTTrack mode-0 percent-encode (reference ``HtsUtil.java:48-61``)."""
    if s is None:
        return None
    out = []
    for b in s.encode("utf-8"):
        # NB: the reference compares *signed* Java bytes, so every byte
        # >= 0x80 is negative and satisfies `b <= 31` — i.e. all non-ASCII
        # bytes are percent-encoded too.
        if b <= 31 or b >= 0x80 or b == 127 or b == 0x20 or b == 0x22:
            out.append("%%%02x" % b)
        elif b == 0x5C:  # backslash
            out.append("/")
        else:
            out.append(chr(b))
    return "".join(out)


def percent_decode(s: str | None) -> str | None:
    """Tolerant char-wise %xx decode (reference ``HttrackCrawl.java:280-293``:
    a '%' with fewer than 2 chars after it passes through literally)."""
    if s is None:
        return None
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%" and i + 2 < n:
            try:
                out.append(chr(int(s[i + 1 : i + 3], 16)))
                i += 3
                continue
            except ValueError:
                pass
        out.append(c)
        i += 1
    return "".join(out)


_PROTOCOL_RE = re.compile(r"^https?://")


def strip_protocol(url: str | None) -> str | None:
    """Reference ``HtsUtil.java:63-65``."""
    if url is None:
        return None
    return _PROTOCOL_RE.sub("", url, count=1)


def make_header_key(url: str | None) -> str | None:
    """Reference ``HttrackCrawl.java:88-90``: scheme-collapsed canonical key."""
    if url is None:
        return None
    return strip_protocol(canonicalize_url(url))


def url_host(url: str | None) -> str | None:
    """Host (incl. port) of a canonical URL — the politeness partition key."""
    if url is None:
        return None
    rest = _PROTOCOL_RE.sub("", url, count=1)
    for stop in "/?#":
        k = rest.find(stop)
        if k != -1:
            rest = rest[:k]
    if "@" in rest:
        rest = rest.rsplit("@", 1)[1]
    return rest.lower()


# ---------------------------------------------------------------------------
# Column-level (JVM, whole-stage-codegen) variants where exactly expressible
# ---------------------------------------------------------------------------

def strip_protocol_col(col: Column) -> Column:
    return F.regexp_replace(col, "^https?://", "")


def url_host_col(col: Column) -> Column:
    """JVM-side host extraction for *already canonical* URLs (no userinfo decode)."""
    return F.lower(
        F.regexp_extract(col, r"^(?:https?://)?(?:[^/?#]*@)?([^/?#:]*)", 1)
    )


# ---------------------------------------------------------------------------
# pandas UDFs (Arrow-vectorized executor path)
# ---------------------------------------------------------------------------

# Already-canonical fast path: a URL matching this pattern is a fixpoint of
# ``canonicalize_url`` — provably, clause by clause:
#   * scheme literal ``http``/``https`` (lowercase, special ⇒ no scheme work);
#   * host: dot-separated lowercase ASCII labels, no leading/trailing hyphen
#     or dot, no port/userinfo/IPv6, and the FINAL label starts with a letter
#     (WHATWG treats a host whose last label is numeric as an IPv4 candidate,
#     which can rewrite — excluded here), so IDNA/lowercase/port-stripping
#     are all identity;
#   * path: mandatory ``/`` then nonempty segments of characters outside
#     every WHATWG path percent-encode set, no ``%`` (hex-case
#     renormalization), no segment starting with ``.`` (dot-segment
#     resolution), no empty segment, optional trailing slash;
#   * no ``?``/``#`` (query/fragment encode sets untouched), no backslash,
#     no whitespace/control characters (strip/translate are identity).
# The mask is one C-level vectorized regex pass; only the residue takes the
# per-row Python canonicalizer. test_urls pins fastpath == slow path on
# hypothesis-generated URLs and on every fixture URL.
_SEG = r"[A-Za-z0-9_~!$&'()*+,;=:@-][A-Za-z0-9_~!$&'()*+,;=:@.-]*"
_CANONICAL_FAST_RE = re.compile(
    r"^https?://"
    r"(?:[a-z0-9](?:[a-z0-9-]*[a-z0-9])?\.)*"      # inner labels
    r"[a-z](?:[a-z0-9-]*[a-z0-9])?"                # final label: letter-led
    rf"/(?:{_SEG}/)*(?:{_SEG})?$"
)


def canonicalize_url_series(urls: pd.Series) -> pd.Series:
    """Vectorized canonicalizer: fast-path mask in one C regex pass, per-row
    Python only for the residue. Exposed for direct parity testing."""
    fast = urls.str.match(_CANONICAL_FAST_RE, na=False)
    if fast.all():
        return urls
    out = urls.copy()
    slow = ~fast & urls.notna()
    if slow.any():
        out[slow] = urls[slow].map(canonicalize_url)
    return out


@pandas_udf(StringType())
def canonicalize_urls_udf(urls: pd.Series) -> pd.Series:
    return canonicalize_url_series(urls)


@pandas_udf(StringType())
def make_header_key_udf(urls: pd.Series) -> pd.Series:
    return urls.map(make_header_key, na_action="ignore")


@pandas_udf(StringType())
def percent_encode_udf(s: pd.Series) -> pd.Series:
    return s.map(percent_encode, na_action="ignore")


@pandas_udf(StringType())
def percent_decode_udf(s: pd.Series) -> pd.Series:
    return s.map(percent_decode, na_action="ignore")
