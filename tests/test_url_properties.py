"""Property-based tests (hypothesis) for the URL kernel.

The canonical form is the URL-seen set's identity — if canonicalization is
not idempotent, a re-discovered URL hashes differently and the dedup
silently breaks. These properties hold for ALL inputs, not just fixtures.
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from httrack2warc_spark.functions.digests import sha1_base32
from httrack2warc_spark.functions.urls import (
    canonicalize_url,
    make_header_key,
    percent_decode,
    percent_encode,
    strip_protocol,
    url_host,
)

# URL-ish text: printable ASCII plus some unicode, no surrogates
url_text = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FF),
    min_size=1,
    max_size=80,
)

host_label = st.text(alphabet=string.ascii_letters + string.digits + "-", min_size=1, max_size=12)
path_seg = st.text(alphabet=string.ascii_letters + string.digits + "._~%-", min_size=0, max_size=12)


@st.composite
def http_urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https", ""]))
    host = ".".join(draw(st.lists(host_label, min_size=1, max_size=3)))
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = "/".join(draw(st.lists(path_seg, min_size=0, max_size=4)))
    query = draw(st.sampled_from(["", "?a=1&b=2", "?page=1&&X=%20"]))
    frag = draw(st.sampled_from(["", "#anchor", "#fr ag"]))
    prefix = f"{scheme}://" if scheme else ""
    return f"{prefix}{host}{port}/{path}{query}{frag}"


@settings(max_examples=300, deadline=None)
@given(http_urls())
def test_canonicalize_idempotent(url):
    once = canonicalize_url(url)
    assert canonicalize_url(once) == once


@settings(max_examples=300, deadline=None)
@given(http_urls())
def test_canonical_form_shape(url):
    c = canonicalize_url(url)
    assert c.startswith(("http://", "https://"))
    # default ports never survive
    host_part = c.split("://", 1)[1].split("/", 1)[0]
    if c.startswith("http://"):
        assert not host_part.endswith(":80")
    if c.startswith("https://"):
        assert not host_part.endswith(":443")


@settings(max_examples=300, deadline=None)
@given(http_urls())
def test_header_key_scheme_collapse(url):
    """http/https variants of one URL must share a header key
    (HttrackCrawl.java:71-75) — except when an explicit :80/:443 port makes
    default-port elision scheme-dependent; the reference's urlcanon behaves
    identically there (the key scheme is admittedly fragile, see the
    reference's own comment)."""
    bare = strip_protocol(canonicalize_url(url))
    stripped = strip_protocol(url)
    hostpart = stripped.split("/", 1)[0]
    if not (hostpart.endswith(":80") or hostpart.endswith(":443")):
        assert make_header_key("http://" + stripped) == make_header_key(
            "https://" + stripped
        )
    assert "://" not in bare.split("/", 1)[0]


@settings(max_examples=200, deadline=None)
@given(url_text)
def test_canonicalize_total(raw):
    """Never crashes, never returns empty for non-empty input."""
    out = canonicalize_url(raw)
    assert isinstance(out, str) and out


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=1, max_codepoint=127),
               min_size=0, max_size=80))
def test_percent_encode_decode_roundtrip(s):
    """mode-0 encode is reversible for ASCII inputs w/o literal % or backslash
    (backslash→slash is lossy by design, HtsUtil.java:55; non-ASCII is
    byte-level asymmetric in the reference too — encode works on UTF-8 bytes,
    decode on chars)."""
    if "%" in s or "\\" in s:
        return
    assert percent_decode(percent_encode(s)) == s


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=256))
def test_sha1_base32_shape(data):
    d = sha1_base32(data)
    assert len(d) == 32
    assert set(d) <= set(string.ascii_uppercase + "234567")


@settings(max_examples=200, deadline=None)
@given(http_urls())
def test_url_host_matches_canonical(url):
    c = canonicalize_url(url)
    h = url_host(c)
    assert h == h.lower()
    assert "/" not in h and "#" not in h and "?" not in h
