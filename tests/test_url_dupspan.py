"""Planted-input tests for the URL-canonicalization family and the
duplicated-span (substring-dedup) signal — adversarial cases the
synthetic corpus never exercises: crawl variants of one page that must
collapse to a single canonical url, params that must survive, and
documents with known shared/unique 5-gram structure."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


@pytest.fixture(scope="module")
def crawl_variants(ray_session):
    # five crawl-time variants of the SAME logical page + two controls
    rows = [
        {"doc_id": 0, "url": "https://www.News.Example.com/World/p1/?utm_source=tw&id=9#top"},
        {"doc_id": 1, "url": "HTTP://news.example.com/World/p1?id=9&utm_campaign=x"},
        {"doc_id": 2, "url": "https://News.EXAMPLE.com/World/p1/?ref=feed&id=9"},
        {"doc_id": 3, "url": "news.example.com/World/p1?id=9"},  # schemeless
        {"doc_id": 4, "url": "https://www.news.example.com/World/p1?fbclid=abc&id=9&gclid=z"},
        # controls: different path case / different real param
        {"doc_id": 5, "url": "https://news.example.com/world/p1?id=9"},
        {"doc_id": 6, "url": "https://news.example.com/World/p1?id=10"},
    ]
    return rd.from_pandas(pd.DataFrame(rows))


def test_canonicalize_collapses_crawl_variants(crawl_variants):
    from omop2obo_ray.pipelines.curate import canonicalize_urls

    out = (canonicalize_urls(crawl_variants).to_pandas()
           .set_index("doc_id")["url"])
    # all five variants collapse to one canonical form
    assert set(out[[0, 1, 2, 3, 4]]) == {"news.example.com/World/p1?id=9"}
    # paths stay case-sensitive; real params distinguish pages
    assert out[5] == "news.example.com/world/p1?id=9"
    assert out[6] == "news.example.com/World/p1?id=10"


def test_canonicalize_edge_urls(ray_session):
    from omop2obo_ray.pipelines.curate import canonicalize_urls

    rows = [
        # bare host with trailing slash and only-tracking query
        {"doc_id": 0, "url": "https://www.a.com/?utm_source=x"},
        # no query, fragment only
        {"doc_id": 1, "url": "http://a.com/path/#frag"},
        # tracking param in the middle of real ones
        {"doc_id": 2, "url": "a.com/p?x=1&utm_medium=email&y=2"},
    ]
    out = (canonicalize_urls(rd.from_pandas(pd.DataFrame(rows)))
           .to_pandas().set_index("doc_id")["url"])
    assert out[0] == "a.com"
    assert out[1] == "a.com/path"
    assert out[2] == "a.com/p?x=1&y=2"


def test_host_stats_counts(crawl_variants):
    from omop2obo_ray.pipelines.curate import canonicalize_urls, host_stats

    out = (host_stats(canonicalize_urls(crawl_variants)).to_pandas()
           .set_index("host"))
    assert set(out.index) == {"news.example.com"}
    assert int(out.loc["news.example.com", "n_pages"]) == 7
    # distinct query-stripped paths: /World/p1 and /world/p1
    assert int(out.loc["news.example.com", "n_paths"]) == 2


def test_dup_span_stats_planted(ray_session):
    from omop2obo_ray.pipelines.textpipe import dup_span_stats

    shared = "the quick brown fox jumps over the lazy dog"  # 9 tokens
    rows = [
        # A and B share the 9-token span (5 shared 5-grams) inside
        # otherwise-unique text
        {"doc_id": 0, "text": f"alpha beta gamma delta {shared} epsilon"},
        {"doc_id": 1, "text": f"{shared} zeta eta theta iota kappa"},
        # C: fully unique
        {"doc_id": 2, "text": "one two three four five six seven eight"},
        # D: too short for any 5-gram -> no row
        {"doc_id": 3, "text": "just four tokens here"},
    ]
    docs = rd.from_pandas(pd.DataFrame(rows))
    out = (dup_span_stats(docs, n=5, min_df=2).to_pandas()
           .set_index("doc_id").sort_index())
    assert list(out.index) == [0, 1, 2]  # doc 3 emits no row
    # doc0: 10 total 5-grams (14 tokens), 5 of them inside the shared span
    assert out.loc[0, "total_ngrams"] == 10
    assert out.loc[0, "dup_ngrams"] == 5
    assert out.loc[0, "dup_fraction"] == pytest.approx(0.5)
    assert out.loc[1, "total_ngrams"] == 10
    assert out.loc[1, "dup_ngrams"] == 5
    assert out.loc[2, "dup_ngrams"] == 0
    assert out.loc[2, "dup_fraction"] == 0.0


def test_dedup_lines_corpus_planted(ray_session):
    from omop2obo_ray.pipelines.curate import dedup_lines_corpus

    rows = [
        # doc0 owns every one of its lines (first occurrence), including
        # the within-doc repeat of "dup line" (kept once, at idx 1)
        {"doc_id": 0, "text": "alpha\ndup line\nbeta\ndup line"},
        # doc1: loses "dup line", keeps its own two
        {"doc_id": 1, "text": "dup line\ngamma\ndelta"},
        # doc2: identical single line to doc1's "gamma" -> emptied, dropped
        {"doc_id": 2, "text": "gamma"},
        # doc3: untouched
        {"doc_id": 3, "text": "epsilon"},
    ]
    docs = rd.from_pandas(pd.DataFrame(rows))
    out = (dedup_lines_corpus(docs).to_pandas()
           .set_index("doc_id")["text"].to_dict())
    assert out == {
        0: "alpha\ndup line\nbeta",
        1: "gamma\ndelta",
        3: "epsilon",
    }


def test_tfidf_corpus_scores_planted(ray_session):
    import numpy as np

    from omop2obo_ray.pipelines.textpipe import tfidf_corpus_scores

    rows = [
        {"doc_id": 0, "text": "apple apple banana"},
        {"doc_id": 1, "text": "banana cherry"},
        {"doc_id": 2, "text": "cherry cherry cherry"},
    ]
    docs = rd.from_pandas(pd.DataFrame(rows))
    out = tfidf_corpus_scores(docs).to_pandas()
    got = {(r.doc_id, r.token): r.score for r in out.itertuples()}

    def idf(df):
        return np.log((1 + 3) / (1 + df)) + 1

    # doc0: apple tf=2 df=1, banana tf=1 df=2
    w = np.array([2 * idf(1), 1 * idf(2)])
    w = w / np.sqrt((w ** 2).sum())
    assert got[(0, "apple")] == pytest.approx(w[0], rel=1e-12)
    assert got[(0, "banana")] == pytest.approx(w[1], rel=1e-12)
    # doc2: single distinct token -> unit norm
    assert got[(2, "cherry")] == pytest.approx(1.0, rel=1e-12)
    assert len(got) == 5


def test_stratified_sample_planted(ray_session):
    from omop2obo_ray.pipelines.curate import stratified_sample

    rows = [{"doc_id": i, "source": "big" if i < 50 else "small"}
            for i in range(55)]
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = stratified_sample(ds, group="source", key="doc_id", k=3).to_pandas()
    by_group = out.groupby("source").size().to_dict()
    # exactly k rows for the big stratum, all rows for the small one
    assert by_group == {"big": 3, "small": 3}
    # deterministic across invocations
    out2 = stratified_sample(ds, group="source", key="doc_id", k=3).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


def test_heavy_hitters_planted_zipf(ray_session):
    from omop2obo_ray.pipelines.curate import heavy_hitters

    # 5 planted heavy tokens with huge counts over a long tail
    heavy = {"aaa": 400, "bbb": 300, "ccc": 250, "ddd": 200, "eee": 150}
    words = [w for w, n in heavy.items() for _ in range(n)]
    words += [f"tail{i}" for i in range(500)]  # 500 singletons
    rng = np.random.RandomState(7)
    rng.shuffle(words)
    # 20 docs
    docs = pd.DataFrame({
        "doc_id": range(20),
        "text": [" ".join(words[i::20]) for i in range(20)]})
    out = heavy_hitters(rd.from_pandas(docs), k=5).to_pandas()
    got = dict(zip(out["token"], out["est"]))
    assert list(out["token"]) == ["aaa", "bbb", "ccc", "ddd", "eee"]
    for w, n in heavy.items():
        # count-min never underestimates; slack bounded by eN
        assert n <= got[w] <= n + 10


# ---------------------------------------------------------------------------
# property: canonicalization is idempotent and variant-invariant
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _label = st.text(alphabet="abcdefghijklmnopqrstuvwxyzABC123", min_size=1,
                     max_size=8)

    @st.composite
    def _urls(draw):
        scheme = draw(st.sampled_from(["", "http://", "https://", "HTTPS://"]))
        www = draw(st.sampled_from(["", "www."]))
        host = ".".join(draw(st.lists(_label, min_size=1, max_size=3)))
        segs = draw(st.lists(_label, min_size=0, max_size=3))
        path = "".join(f"/{s}" for s in segs)
        trail = draw(st.sampled_from(["", "/"]))
        params = draw(st.lists(st.one_of(
            st.tuples(st.sampled_from(["utm_source", "utm_x", "ref",
                                       "fbclid", "gclid"]), _label),
            st.tuples(_label.filter(
                lambda s: not s.startswith("utm") and s not in
                ("ref", "fbclid", "gclid")), _label)),
            max_size=4))
        query = "&".join(f"{k}={v}" for k, v in params)
        frag = draw(st.sampled_from(["", "#sec", "#x/y?z"]))
        return (scheme + www + host + path + trail
                + (f"?{query}" if query else "") + frag)

    @given(_urls())
    @settings(max_examples=200, deadline=None)
    def test_canonicalize_idempotent(url):
        import pyarrow as pa

        from omop2obo_ray.pipelines.curate import _canonicalize_url_array

        once = _canonicalize_url_array(pa.array([url], pa.string()))[0].as_py()
        twice = _canonicalize_url_array(
            pa.array([once], pa.string()))[0].as_py()
        assert twice == once
        assert "utm_" not in once and "#" not in once
        host = once.split("/")[0].split("?")[0]
        assert host == host.lower() and not host.startswith("www.")
except ImportError:  # hypothesis absent: property check skipped
    pass
