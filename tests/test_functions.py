"""Unit tests for the pure kernels — exact-value asserts in the
reference's test style (tests/test_data_utils.py:165-183, :245-385)."""

from __future__ import annotations

import numpy as np
import pytest

from omop2obo_ray.functions.aho import AhoCorasick
from omop2obo_ray.functions.html import expected_text, extract_text, render_page_html
from omop2obo_ray.functions.normalize import build_vocab_dict, normalize_source_code
from omop2obo_ray.functions.textproc import corpus_key, preprocess_tokens, sentences
from omop2obo_ray.functions.tfidf import TfidfIndex, filters_matches, ngrams

VOCAB = build_vocab_dict(
    ["snomed", "icd10", "umls", "orphanet"],
    [
        ["SNOMEDCT_US", "http://www.snomedbrowser.com/codes/details"],
        ["ICD10CM"],
        ["UMLS"],
        ["Orphanet", "http://www.orpha.net/ordo/orphanet"],
    ],
)


class TestNormalize:
    """Mirrors the normalization examples in data_utils.py:241-244."""

    def test_plain_prefix(self):
        assert normalize_source_code("ICD10CM:C85.92", VOCAB) == "icd10:c85.92"

    def test_url_with_underscore(self):
        assert (
            normalize_source_code("http://www.orpha.net/ordo/orphanet_1920", VOCAB)
            == "orphanet:1920"
        )

    def test_snomedbrowser_url(self):
        assert (
            normalize_source_code(
                "http://www.snomedbrowser.com/codes/details/12132356564", VOCAB
            )
            == "snomed:12132356564"
        )

    def test_unknown_prefix_passthrough(self):
        assert normalize_source_code("FOO:Bar123", VOCAB) == "FOO:bar123"

    def test_empty(self):
        assert normalize_source_code("", VOCAB) == ""


class TestAhoCorasick:
    def test_basic_match(self):
        ac = AhoCorasick(["abc", "bcd"])
        spans = ac.scan("xabcdx", word_boundaries=False)
        assert ("abc" in ["xabcdx"[s:e] for s, e in spans])
        assert ("bcd" in ["xabcdx"[s:e] for s, e in spans])

    def test_word_boundaries(self):
        ac = AhoCorasick(["lace"])
        assert ac.scan("necklace here") == []
        assert [("lace")] == ["a lace b"[s:e] for s, e in ac.scan("a lace b")]

    def test_longest_nonoverlapping(self):
        ac = AhoCorasick(["severe pain", "pain"])
        text = "has severe pain today"
        spans = ac.longest_nonoverlapping(text)
        assert [text[s:e] for s, e in spans] == ["severe pain"]

    def test_multiword_over_punct(self):
        ac = AhoCorasick(["heart attack"])
        spans = ac.longest_nonoverlapping("a heart attack. heart attacked")
        # second occurrence fails the right boundary ('attacked')
        assert len(spans) == 1


class TestTextproc:
    def test_stopword_and_tokenize(self):
        # stopword removal happens pre-lowercasing, as in the reference
        assert preprocess_tokens("the Liver of a Dog") == ["liver", "dog"]

    def test_ascii_fold(self):
        assert preprocess_tokens("café liver") == ["caf", "liver"]

    def test_corpus_key_is_md5(self):
        k = corpus_key("ID1", ["a", "b"])
        assert k.startswith("ID1_") and len(k) == len("ID1_") + 32

    def test_sentences(self):
        assert sentences("One two. Three four!\nFive") == ["One two", "Three four", "Five"]


class TestTfidf:
    def test_ngrams(self):
        assert ngrams(["a", "b", "c"], 1, 2) == ["a", "b", "c", "a b", "b c"]

    def test_identical_text_scores_one(self):
        idx = TfidfIndex([["liver", "disease"], ["heart", "attack"]],
                         ["HP_1", "HP_2"], ["hp", "hp"])
        top = idx.top_n(["liver", "disease"], 10, 0.25)
        assert top[0][1] == "HP_1" and abs(top[0][0] - 1.0) < 1e-12

    def test_floor_filters(self):
        idx = TfidfIndex([["liver", "disease"], ["heart", "attack"]],
                         ["HP_1", "HP_2"], ["hp", "hp"])
        top = idx.top_n(["unrelated", "words"], 10, 0.25)
        assert top == []

    def test_idf_formula(self):
        # one doc, one term: idf = ln(2/2)+1 = 1, tf=1, l2 → weight 1.0
        idx = TfidfIndex([["x"]], ["HP_1"], ["hp"])
        assert idx.idf[idx.vocab["x"]] == pytest.approx(1.0)


class TestFiltersMatches:
    """Five enumerated scenarios, mirroring tests/test_data_utils.py:245-385
    (the percentile-keep rule of string_similarity.py:180-204)."""

    def test_keeps_max_per_uri(self):
        out = filters_matches([(0.9, "HP_1"), (0.5, "HP_1"), (0.8, "HP_2")], 0)
        assert (0.9, "HP_1") in out and (0.5, "HP_1") not in out

    def test_percentile_cut(self):
        matches = [(1.0, "A"), (0.8, "B"), (0.6, "C"), (0.4, "D")]
        out = filters_matches(matches, 75)
        # np.percentile([1.0,.8,.6,.4], 75) = 0.85 → only 1.0 kept
        assert out == [(1.0, "A")]

    def test_percentile_zero_keeps_all(self):
        matches = [(0.9, "A"), (0.3, "B")]
        assert len(filters_matches(matches, 0)) == 2

    def test_single_match(self):
        assert filters_matches([(0.7, "A")], 75) == [(0.7, "A")]

    def test_interpolated_cut_keeps_two(self):
        matches = [(1.0, "A"), (0.95, "B"), (0.1, "C"), (0.05, "D")]
        # 75th pct of [1.0,.95,.1,.05] = 0.9625 → A only? 1.0>=0.9625, .95<0.9625
        out = filters_matches(matches, 75)
        assert out == [(1.0, "A")]


class TestHtml:
    def test_roundtrip(self):
        paras = ["Hello world & friends", "Second  para with   spaces"]
        html = render_page_html("Title here", paras)
        assert extract_text(html) == expected_text("Title here", paras)

    def test_script_dropped(self):
        assert "var" not in extract_text(b"<p>keep</p><script>var x=2;</script>")

    def test_entity_unescape(self):
        assert extract_text(b"<p>a &amp; b</p>") == "a & b"

    def test_empty(self):
        assert extract_text(b"") == ""


def test_asof_join_semantics(ray_session):
    """Distributed as-of join: latest right row at-or-before each left
    ts per key; left rows with no earlier right row are dropped."""
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.relational import asof_join

    left = rd.from_pandas(pd.DataFrame({
        "k": [1, 1, 1, 2, 3],
        "t": pd.to_datetime(["2024-01-05", "2024-01-10", "2024-01-01",
                             "2024-01-07", "2024-01-07"]),
        "lv": [10, 11, 12, 20, 30],
    }))
    right = rd.from_pandas(pd.DataFrame({
        "rk": [1, 1, 2],
        "rt": pd.to_datetime(["2024-01-04", "2024-01-08", "2024-01-07"]),
        "rv": [100, 200, 300],
    }))
    out = asof_join(left, right, key_left="k", key_right="rk",
                    ts_left="t", ts_right="rt", right_cols=["rv"]).to_pandas()
    got = {(r["_key"], r["lv"]): r["rv"] for _, r in out.iterrows()}
    assert got == {
        (1, 10): 100,   # 01-05 → latest ≤ is 01-04
        (1, 11): 200,   # 01-10 → 01-08
        (2, 20): 300,   # exact-date match is inclusive
    }  # (1,12) has no earlier right row; key 3 has no right rows at all


class TestJointIdfFit:
    """Opt-in joint TF-IDF fit (reference string_similarity.py:323-326):
    extra_df must reproduce EXACTLY the scores of a vectorizer fit on
    ontology ∪ clinical corpus while the matrix stays ontology-only."""

    ONT = [["liver", "disease"], ["heart", "attack"],
           ["liver", "failure", "acute"]]
    URIS = ["HP_1", "HP_2", "HP_3"]
    ONTS = ["hp", "hp", "hp"]
    CLIN = [["patient", "liver", "pain"], ["acute", "heart", "pain"],
            ["disease", "of", "liver"]]

    def test_joint_scores_match_joint_fit_oracle(self):
        from omop2obo_ray.functions.tfidf import df_of_token_lists

        joint = TfidfIndex(
            self.ONT, self.URIS, self.ONTS,
            extra_df=df_of_token_lists(self.CLIN),
            extra_n_docs=len(self.CLIN))
        # oracle: one vocabulary fit on BOTH corpora (clinical rows in
        # the matrix too — we compare only the ontology-row scores)
        oracle = TfidfIndex(
            self.ONT + self.CLIN,
            self.URIS + ["C1", "C2", "C3"],
            self.ONTS + ["x", "x", "x"])
        for q in self.CLIN + [["liver"], ["acute", "liver", "failure"]]:
            got = joint.cosine_scores(q)
            want = oracle.cosine_scores(q)[: len(self.ONT)]
            np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_joint_fit_changes_scores_vs_default(self):
        from omop2obo_ray.functions.tfidf import df_of_token_lists

        default = TfidfIndex(self.ONT, self.URIS, self.ONTS)
        joint = TfidfIndex(
            self.ONT, self.URIS, self.ONTS,
            extra_df=df_of_token_lists(self.CLIN),
            extra_n_docs=len(self.CLIN))
        q = ["liver", "pain"]  # 'pain' is clinical-only vocab
        assert not np.allclose(default.cosine_scores(q),
                               joint.cosine_scores(q))


def test_sample_corpus_df_full_sample_parity(ray_session):
    """With max_docs ≥ corpus size the distributed sampler's dfs equal
    the local per-doc-distinct oracle exactly."""
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.functions.tfidf import df_of_token_lists
    from omop2obo_ray.state.lexicon import sample_corpus_df

    texts = ["liver disease is chronic", "acute heart attack",
             "liver failure", "heart disease of the liver"]
    ds = rd.from_pandas(pd.DataFrame({"text": texts}))
    got_df, got_n = sample_corpus_df(ds, max_docs=100)
    want = df_of_token_lists([preprocess_tokens(t) for t in texts])
    assert got_n == len(texts)
    assert got_df == want

    # thinned sample: deterministic, bounded, and a subset of the full dfs
    big = rd.from_pandas(pd.DataFrame(
        {"text": [f"token{i} liver common" for i in range(200)]}))
    df1, n1 = sample_corpus_df(big, max_docs=50)
    df2, n2 = sample_corpus_df(big, max_docs=50)
    assert (df1, n1) == (df2, n2)
    assert 0 < n1 < 200
    full, _ = sample_corpus_df(big, max_docs=1000)
    assert all(df1[t] <= full[t] for t in df1)
