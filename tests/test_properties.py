"""Property-based tests (hypothesis): normalizer idempotency/stability,
bloom no-false-negatives, codec exactness, RON round-trips."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from netrunner_spark.images import decode_image, encode_image, psnr
from netrunner_spark.operators.seen import _bit_positions, _set_bits, _test_bits
from netrunner_spark.urlnorm import normalize_href, rfc3986_normalize

_hosts = st.from_regex(r"[a-z][a-z0-9]{0,10}(\.[a-z]{2,5}){1,2}", fullmatch=True)
_paths = st.from_regex(r"(/[A-Za-z0-9._~%-]{0,12}){0,4}/?", fullmatch=True)
_urls = st.builds(
    lambda s, h, p, q, f: f"{s}://{h}{p}{q}{f}",
    st.sampled_from(["http", "https", "HTTP", "HttPs"]),
    _hosts,
    _paths,
    st.sampled_from(["", "?a=1", "?x=%2f"]),
    st.sampled_from(["", "#frag", "#a/b"]),
)


@given(_urls)
@settings(max_examples=300, deadline=None)
def test_normalize_idempotent(url):
    once = rfc3986_normalize(url)
    assert once is not None
    assert rfc3986_normalize(once) == once  # fixed point
    assert "#" not in once  # fragment stripped
    assert once.split("://")[0].islower()


@given(_urls, st.sampled_from(["/x", "x.html", "//other.test/p", "http://up.test/"]))
@settings(max_examples=200, deadline=None)
def test_normalize_href_total(base, href):
    out = normalize_href(base, href)
    assert out is None or out.startswith(("http://", "https://"))
    if href.startswith("//") or href.startswith("http://"):
        assert out is None or out.startswith("https://")  # upgrade rule


@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=500))
@settings(max_examples=50, deadline=None)
def test_bloom_no_false_negatives(keys):
    bits = np.zeros((1 << 20) // 8, dtype=np.uint8)
    arr = np.array(keys, dtype=np.int64).astype(np.uint64)
    _set_bits(bits, arr)
    assert _test_bits(bits, arr).all()  # every inserted key reads back
    pos = _bit_positions(arr)
    assert (pos >= 0).all() and (pos < (1 << 20)).all()


@given(st.integers(min_value=0, max_value=2**32), st.sampled_from(["png", "jpeg"]))
@settings(max_examples=30, deadline=None)
def test_codec_invariants(seed, fmt):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    dec = decode_image(encode_image(arr, fmt))
    assert dec.shape == arr.shape
    if fmt == "png":
        assert np.array_equal(dec, arr)  # lossless exact
    else:
        assert psnr(arr, dec) >= 40.0  # input_hint invariant
        # decode is deterministic (re-decode identical)
        assert np.array_equal(decode_image(encode_image(arr, fmt)), dec)


@given(
    st.lists(_urls, max_size=5),
    st.lists(_hosts, max_size=3),
)
@settings(max_examples=50, deadline=None)
def test_lens_ron_roundtrip(urls, domains):
    from netrunner_spark import lens as lens_mod

    cfg = lens_mod.LensConfig(name="prop", domains=domains, urls=urls)
    back = lens_mod.loads(lens_mod.dumps(cfg))
    assert back.urls == urls
    assert back.domains == domains


# --------------------------------------------------- SymSpell lemma


def _deletions(w: str) -> set:
    return {w} | {w[:i] + w[i + 1 :] for i in range(len(w))}


def _lev1_edits(w: str, alphabet: str) -> set:
    """All words at Levenshtein distance exactly 1 from w."""
    out = set()
    for i in range(len(w)):
        out.add(w[:i] + w[i + 1 :])  # deletion
        for c in alphabet:
            if c != w[i]:
                out.add(w[:i] + c + w[i + 1 :])  # substitution
    for i in range(len(w) + 1):
        for c in alphabet:
            out.add(w[:i] + c + w[i:])  # insertion
    out.discard(w)
    return out


@given(st.from_regex(r"[ab]{1,6}", fullmatch=True))
@settings(max_examples=200, deadline=None)
def test_deletion_neighborhoods_cover_every_lev1_pair(w):
    """The lemma spell_candidates' candidate generation rests on: any
    pair at Levenshtein distance 1 shares a deletion-neighborhood
    member (so the variant equi-join can never MISS a true pair)."""
    for other in _lev1_edits(w, "ab"):
        assert _deletions(w) & _deletions(other), (w, other)
