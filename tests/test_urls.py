"""Golden tests for the URL kernel (reference HtsUtilTest + fixture URLs)."""

from httrack2warc_spark.functions.digests import sha1_base32
from httrack2warc_spark.functions.urls import (
    canonicalize_url,
    make_header_key,
    percent_decode,
    percent_encode,
    strip_protocol,
    url_host,
)


def test_percent_encode_golden():
    # test/.../HtsUtilTest.java:6-8
    assert percent_encode('a b \0 "c"') == "a%20b%20%00%20%22c%22"


def test_percent_encode_backslash():
    assert percent_encode("a\\b") == "a/b"


def test_percent_encode_non_ascii():
    """Java signed-byte semantics: every byte >= 0x80 satisfies `b <= 31`,
    so non-ASCII UTF-8 bytes are percent-encoded (HtsUtil.java:48-61)."""
    assert percent_encode("ü") == "%c3%bc"          # U+00FC = 0xC3 0xBC
    assert percent_encode("naïve dir") == "na%c3%afve%20dir"
    assert percent_encode("日") == "%e6%97%a5"


def test_percent_decode_tolerant():
    assert percent_decode("a%20b") == "a b"
    assert percent_decode("a%2") == "a%2"  # trailing % passes through
    assert percent_decode("%zz") == "%zz"


def test_canonicalize_fixture_urls():
    # fixture URLs must round-trip verbatim (Httrack2WarcTest.java:82,90)
    for u in [
        "http://test.example.org/query.html?page=1&query=2&FOO=3&&BaR=4&&#anchor",
        "http://test.example.org/page%20WITH%20%22special%22%20chars.html",
        "http://test.example.org/",
        "http://test.example.org/robots.txt",
    ]:
        assert canonicalize_url(u) == u


def test_canonicalize_schemeless():
    # early HTTrack logs omit the scheme (HtsUtil.java:31-34, HtsTxtParserTest.testEarly)
    assert (
        canonicalize_url("www.industry.gov.au/acreagereleases/ar_home.html")
        == "http://www.industry.gov.au/acreagereleases/ar_home.html"
    )


def test_canonicalize_normalization():
    assert canonicalize_url("HTTP://Example.COM:80/a/../b/./c") == "http://example.com/b/c"
    assert canonicalize_url("https://example.com:443/") == "https://example.com/"
    assert canonicalize_url("http://example.com") == "http://example.com/"
    assert canonicalize_url("http://example.com\\x\\y") == "http://example.com/x/y"
    assert canonicalize_url("http://0x7f.0.0.1/") == "http://127.0.0.1/"
    assert canonicalize_url("http://example.com/a b\"c") == "http://example.com/a%20b%22c"
    assert canonicalize_url("http://example.com/x#fr ag") == "http://example.com/x#fr%20ag"


def test_canonicalize_idna_hosts():
    """Non-ASCII hosts punycode like WHATWG domain-to-ASCII (urlcanon parity);
    already-encoded and trailing-dot hosts pass through stably."""
    from httrack2warc_spark.functions.urls import canonicalize_url

    assert (
        canonicalize_url("http://münchen.example.de/path")
        == "http://xn--mnchen-3ya.example.de/path"
    )
    assert canonicalize_url("HTTP://日本語.JP/x") == "http://xn--wgv71a119e.jp/x"
    # idempotent: canonical output canonicalizes to itself
    assert (
        canonicalize_url("http://xn--mnchen-3ya.example.de/path")
        == "http://xn--mnchen-3ya.example.de/path"
    )
    assert canonicalize_url("http://café.fr./") == "http://xn--caf-dma.fr./"


def test_strip_protocol_and_header_key():
    assert strip_protocol("https://a.b/c") == "a.b/c"
    assert strip_protocol("http://a.b/c") == "a.b/c"
    assert strip_protocol("ftp://a.b/c") == "ftp://a.b/c"
    # http/https collapse onto one key (HttrackCrawl.java:71-75)
    assert make_header_key("http://A.B/c") == make_header_key("https://A.B/c")


def test_url_host():
    assert url_host("http://User@A.b:8080/x?q#f") == "a.b:8080"
    assert url_host("http://test.example.org/") == "test.example.org"


def test_sha1_base32_golden():
    # empty-body digest (test/.../RedirectWriterTest.java:36)
    assert sha1_base32(b"") == "3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ"


def test_canonicalize_fast_path_fixpoint_and_parity():
    """The vectorized fast path (functions/urls.py::_CANONICAL_FAST_RE) may
    only ever pass through URLs that are fixpoints of canonicalize_url, and
    the series implementation must equal the per-row map on adversarial
    inputs (scheme case, ports, userinfo, IPv4-ish hosts, dot segments,
    percent escapes, backslashes, IDNA, schemeless)."""
    import random

    import pandas as pd

    from httrack2warc_spark.functions.urls import (
        _CANONICAL_FAST_RE, canonicalize_url, canonicalize_url_series)

    rng = random.Random(7)
    chars_seg = "Abz09_~!$&'()*+,;=:@-."
    for _ in range(5000):
        host = ".".join(
            ("".join(rng.choice("abz09-") for _ in range(rng.randint(1, 6)))
             .strip("-") or "a")
            for _ in range(rng.randint(1, 3)))
        host += ".x" + "".join(
            rng.choice("abz09") for _ in range(rng.randint(0, 4)))
        segs = ["".join(rng.choice(chars_seg) for _ in range(rng.randint(1, 8)))
                for _ in range(rng.randint(0, 4))]
        path = "/" + "/".join(segs) + (rng.choice(["", "/"]) if segs else "")
        u = rng.choice(["http", "https"]) + "://" + host + path
        if _CANONICAL_FAST_RE.match(u):
            assert canonicalize_url(u) == u, u

    adversarial = [
        "http://host0.example.com/page/1.html", "HTTP://Host.COM/A b",
        "http://host.com", "http://host.com/", "http://host.com//x",
        "http://host.com/./x", "http://host.com/../x", "http://host.com/x/..",
        "http://host.com/%2e/x", "http://host.com/x?q=1#f",
        "example.org/no/scheme", "https://h.com:443/x", "http://h.com:80/x",
        "http://h.com:8080/x", "http://USER:p@h.com/x", "http://127.0.0.1/x",
        "http://0x7f.1/x", "http://h.com/x\\y", "  http://h.com/x  ",
        "http://xn--bcher-kva.com/x", "http://bücher.com/x", "ftp://h.com/x",
        "mailto:a@b.com", "http://h.com/a%2Fb", "http://h.com/a%2fb",
        "http://1.2.3.4.5/x", "http://h.com./x", "http://h_y.com/x",
        "http://h.com/..", "http://h.com/'quote'", "http://h.com/seg./x",
        "http://h.com/x/",
    ]
    s = pd.Series(adversarial, dtype=object)
    got = canonicalize_url_series(s)
    want = s.map(canonicalize_url, na_action="ignore")
    assert list(got) == list(want)
