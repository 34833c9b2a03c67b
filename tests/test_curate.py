"""Corpus-curation operator tests with planted adversarial inputs —
real PII strings, degenerate repetition, unicode whitespace — so the
kernels are proven on data the synthetic corpus never exercises."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data as rd


@pytest.fixture(scope="module")
def pii_docs(ray_session):
    rows = [
        {"doc_id": 0, "text": "contact me at jane.doe+spam@example.co.uk today"},
        {"doc_id": 1, "text": "server at 192.168.0.1 and 10.0.0.255 responded"},
        {"doc_id": 2, "text": "call +1 555-867-5309 or 020 7946 0958 now"},
        {"doc_id": 3, "text": "email bob@x.io from 127.0.0.1 phone 4155551234"},
        {"doc_id": 4, "text": "no pii here just words and 42 numbers"},
    ]
    return rd.from_pandas(pd.DataFrame(rows))


def test_pii_redact_planted(pii_docs):
    from omop2obo_ray.pipelines.curate import pii_redact

    out = pii_redact(pii_docs).to_pandas().set_index("doc_id")["text"]
    assert out[0] == "contact me at <EMAIL> today"
    assert out[1] == "server at <IP> and <IP> responded"
    assert out[2] == "call <PHONE> or <PHONE> now"
    # email redacted before its digits can match the phone rule; bare
    # 10-digit run caught by the phone rule
    assert out[3] == "email <EMAIL> from <IP> phone <PHONE>"
    assert out[4] == "no pii here just words and 42 numbers"


def test_pii_redact_matches_duckdb_on_planted(pii_docs):
    """Engine and oracle share RE2 — must agree on adversarial text,
    not just on the punctuation-free fixture corpus."""
    from omop2obo_ray.pipelines.curate import pii_redact

    eng = pii_redact(pii_docs).to_pandas().sort_values("doc_id")
    src = pii_docs.to_pandas()
    con = duckdb.connect()
    con.register("documents", src)
    sql = (
        "SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(text,"
        "'[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}','<EMAIL>','g'),"
        "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b','<IP>','g'),"
        "'\\+?\\d[\\d\\- ]{7,}\\d','<PHONE>','g') AS text "
        "FROM documents ORDER BY doc_id"
    )
    ora = con.execute(sql).fetchdf()
    assert list(eng["text"]) == list(ora["text"])


@pytest.fixture(scope="module")
def messy_docs(ray_session):
    rows = [
        # degenerate repetition: one token 50x
        {"doc_id": 0, "text": "spam " * 50},
        # healthy prose with punctuation (tokenizer must strip it)
        {"doc_id": 1, "text": "The quick, brown fox -- jumps over 2 lazy dogs!"},
        # unicode whitespace + case
        {"doc_id": 2, "text": "Tabs\tand\nnewlines\r\n  and   Runs"},
        # token-less (punctuation only) — must DROP from stats
        {"doc_id": 3, "text": "!!! --- ???"},
        {"doc_id": 4, "text": "alpha beta gamma delta epsilon zeta eta theta"},
    ]
    return rd.from_pandas(pd.DataFrame(rows))


def test_repetition_stats_planted(messy_docs):
    from omop2obo_ray.pipelines.curate import repetition_stats

    out = repetition_stats(messy_docs).to_pandas().set_index("doc_id")
    assert 3 not in out.index                      # token-less doc dropped
    assert out.loc[0, "n_tokens"] == 50
    assert out.loc[0, "distinct_tokens"] == 1
    assert out.loc[0, "top_token_ratio"] == 1.0
    # 'the quick brown fox jumps over 2 lazy dogs' → 9 tokens, all distinct
    assert out.loc[1, "n_tokens"] == 9
    assert out.loc[1, "distinct_tokens"] == 9
    assert out.loc[2, "n_tokens"] == 5             # tabs/newlines split
    assert out.loc[4, "distinct_tokens"] == 8


def test_repetition_stats_matches_duckdb_on_planted(messy_docs):
    from omop2obo_ray.pipelines.curate import repetition_stats

    eng = repetition_stats(messy_docs).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", messy_docs.to_pandas())
    ora = con.execute(
        "WITH toks AS (SELECT doc_id, "
        "unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok "
        "FROM documents), "
        "tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2) "
        "SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, "
        "CAST(count(*) AS BIGINT) AS distinct_tokens, "
        "round(max(c)::DOUBLE / sum(c), 6) AS top_token_ratio, "
        "round(sum(c * len(tok))::DOUBLE / sum(c), 6) AS mean_token_len "
        "FROM tc GROUP BY doc_id ORDER BY doc_id").fetchdf()
    pd.testing.assert_frame_equal(
        eng[ora.columns], ora, check_dtype=False)


def test_quality_filter_gates(messy_docs):
    from omop2obo_ray.pipelines.curate import quality_filter

    kept = quality_filter(
        messy_docs, min_tokens=5, max_top_token_ratio=0.5,
        min_distinct_ratio=0.5).to_pandas()
    ids = set(kept["doc_id"])
    assert 0 not in ids          # degenerate repetition rejected
    assert 3 not in ids          # token-less rejected
    assert {1, 2, 4} <= ids      # healthy docs survive


def test_hash_sample_deterministic_and_stratified(ray_session):
    from omop2obo_ray.pipelines.curate import hash_sample

    df = pd.DataFrame({"doc_id": np.arange(10_000, dtype=np.int64),
                       "text": "x"})
    ds = rd.from_pandas(df)
    a = hash_sample(ds, rate_pct=30).to_pandas()
    b = hash_sample(ds, rate_pct=30).to_pandas()
    assert list(a["doc_id"]) == list(b["doc_id"])          # reproducible
    assert abs(len(a) / 10_000 - 0.30) < 0.02              # unbiased rate
    # nested property: a 10% sample is a subset of the 30% sample only if
    # thresholds nest — they do (same hash, smaller cutoff)
    small = hash_sample(ds, rate_pct=10).to_pandas()
    assert set(small["doc_id"]) <= set(a["doc_id"])


def test_group_quantiles_matches_numpy(ray_session):
    from omop2obo_ray.pipelines.curate import group_quantiles

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "k": np.repeat(["a", "b", "c"], 333),
        "v": rng.normal(100, 15, 999),
    })
    out = group_quantiles(rd.from_pandas(df), "k", "v").to_pandas()
    out = out.set_index("k").sort_index()
    for k in "abc":
        vals = df.loc[df["k"] == k, "v"].to_numpy()
        assert out.loc[k, "q50"] == pytest.approx(np.quantile(vals, 0.5), abs=1e-4)
        assert out.loc[k, "q95"] == pytest.approx(np.quantile(vals, 0.95), abs=1e-4)


def test_source_stats_dup_rate(ray_session):
    from omop2obo_ray.pipelines.curate import source_stats

    rows = [
        {"doc_id": 0, "source": "s1", "text": "aaaa"},
        {"doc_id": 1, "source": "s1", "text": "aaaa"},   # dup within s1
        {"doc_id": 2, "source": "s1", "text": "bb"},
        {"doc_id": 3, "source": "s2", "text": "cccccc"},
    ]
    out = source_stats(rd.from_pandas(pd.DataFrame(rows))).to_pandas()
    out = out.set_index("source")
    assert out.loc["s1", "n_docs"] == 3
    assert out.loc["s1", "distinct_texts"] == 2
    assert out.loc["s1", "avg_chars"] == pytest.approx(10 / 3, abs=1e-4)
    assert out.loc["s2", "distinct_texts"] == 1


def test_normalize_text_unicode_whitespace(ray_session):
    from omop2obo_ray.pipelines.curate import normalize_text

    rows = [{"doc_id": 0, "text": "  MiXeD \t Case\r\n\n  RUNS  "},
            {"doc_id": 1, "text": "already clean"}]
    out = normalize_text(rd.from_pandas(pd.DataFrame(rows))).to_pandas()
    out = out.set_index("doc_id")["text"]
    assert out[0] == "mixed case runs"
    assert out[1] == "already clean"


def test_histogram_quantile_known_bins(ray_session):
    """Hand-computable histogram: key 1 has 10 values in bins 0..4 (two
    per bin, width 10) -> q50 = lower edge of first bin reaching 5 of
    10 = bin 2 -> 20.0; q95 -> bin 4 -> 40.0. Key 2 single value."""
    from omop2obo_ray.pipelines.curate import histogram_quantile

    vals = [1, 5, 12, 18, 23, 27, 33, 38, 44, 49]
    rows = [{"k": 1, "v": float(v)} for v in vals] + [{"k": 2, "v": 7.0}]
    out = histogram_quantile(
        rd.from_pandas(pd.DataFrame(rows)), "k", "v", width=10.0
    ).to_pandas().set_index("k")
    assert out.loc[1, "q50"] == 20.0
    assert out.loc[1, "q95"] == 40.0
    assert out.loc[2, "q50"] == 0.0 and out.loc[2, "q95"] == 0.0


def test_histogram_quantile_partials_merge_across_blocks(ray_session):
    """The same key split across many blocks must merge its partial bin
    counts exactly (the mergeable-sketch property)."""
    from omop2obo_ray.pipelines.curate import histogram_quantile

    df = pd.DataFrame({"k": [7] * 100, "v": np.arange(100, dtype=float)})
    ds = rd.from_pandas(df).repartition(10)
    out = histogram_quantile(ds, "k", "v", width=10.0).to_pandas()
    assert len(out) == 1
    # cum counts 10 per bin; q50 -> first cum >= 50 -> bin 4 -> 40.0;
    # q95 -> first cum >= 95 -> bin 9 -> 90.0
    assert out["q50"].iloc[0] == 40.0
    assert out["q95"].iloc[0] == 90.0


def test_window_sliding_fanout_invariant(ray_session):
    """Every event lands in exactly size/step = 3 hopping windows, so
    the window counts must sum to 3x the event count, and each window's
    span must cover its events (spot-checked via the tumbling hour)."""
    import pyarrow.parquet as pq

    from omop2obo_ray.pipelines.relational import q_window_sliding

    sf = "/root/testdata/sf0.001"
    out = q_window_sliding(sf).to_pandas()
    n_events = pq.read_metadata(f"{sf}/events.parquet").num_rows
    assert out["n"].sum() == 3 * n_events
    assert (out["window_start"] % 1200 == 0).all()


def test_ordered_prefix_sum_matches_numpy(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.curate import ordered_prefix_sum

    rng = np.random.RandomState(21)
    ids = rng.permutation(200)  # shuffled input order
    vals = rng.randint(0, 50, 200)
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "n": vals})
                        ).repartition(7)  # force multiple blocks
    got = (ordered_prefix_sum(ds, key="doc_id", value="n")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    order = np.argsort(ids)
    want = np.concatenate(([0], np.cumsum(vals[order])[:-1]))
    assert (got["doc_id"].to_numpy() == ids[order]).all()
    assert (got["offset"].to_numpy() == want).all()


def test_pack_sequences_straddle_and_empty(ray_session):
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.curate import pack_sequences

    # seq_len=10: doc0 fills [0,8), doc1 straddles 8..18 -> bins 0..1,
    # doc2 is empty at offset 18 -> bin 1..1, doc3 exactly ends a bin
    df = pd.DataFrame({"doc_id": [0, 1, 2, 3],
                       "n": [8, 10, 0, 2]})
    got = (pack_sequences(rd.from_pandas(df), seq_len=10)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["offset"].tolist() == [0, 8, 18, 18]
    assert got["bin_first"].tolist() == [0, 0, 1, 1]
    assert got["bin_last"].tolist() == [0, 1, 1, 1]


def test_decontaminate_boundary_and_drop(ray_session):
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.curate import decontaminate

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["the Hash Value is here",     # case-folded match
                 "hash values differ",          # boundary: no match
                 "a data query and a data query again",  # distinct=1
                 "clean text entirely"]})
    ds = rd.from_pandas(docs)
    probes = ["hash value", "data query"]
    flagged = (decontaminate(ds, probes).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
    assert flagged["contaminated"].tolist() == [True, False, True, False]
    assert flagged["n_probes_matched"].tolist() == [1, 0, 1, 0]
    kept = decontaminate(ds, probes, mode="drop").to_pandas()
    assert sorted(kept["doc_id"]) == [1, 3]
    assert list(kept.columns) == ["doc_id", "text"]


def test_table_profile_values(ray_session):
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.curate import table_profile

    df = pd.DataFrame({
        "k": [3, 1, 2, 2, None],
        "s": ["b", "a", None, None, "c"]})
    df["k"] = df["k"].astype("Int64")
    got = (table_profile(rd.from_pandas(df).repartition(3))
           .to_pandas().set_index("column"))
    assert got.loc["k", "n_rows"] == 5
    assert got.loc["k", "n_nulls"] == 1
    assert got.loc["k", "n_distinct"] == 3
    assert got.loc["k", "min_str"] == "1"
    assert got.loc["k", "max_str"] == "3"
    assert got.loc["s", "n_nulls"] == 2
    assert got.loc["s", "n_distinct"] == 3
    assert got.loc["s", "min_str"] == "a"
    assert got.loc["s", "max_str"] == "c"


def test_latest_per_key_election(ray_session):
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.curate import latest_per_key

    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5],
        "user_id": ["u1", "u1", "u2", "u2", "u3"],
        "ts": [10, 30, 20, 20, 5],   # u2 has a ts tie -> max id wins
        "payload": ["a", "b", "c", "d", "e"]})
    got = (latest_per_key(rd.from_pandas(df).repartition(3),
                          key="user_id", ts_col="ts", id_col="event_id")
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    assert got["event_id"].tolist() == [2, 4, 5]
    assert got["payload"].tolist() == ["b", "d", "e"]
    assert list(got.columns) == ["event_id", "user_id", "ts", "payload"]


def _nb_reference(docs, alpha=1.0):
    """Direct multinomial-NB reference (dense dict arithmetic)."""
    import re
    import math

    tok = re.compile("[a-z0-9]+")
    toks = {d: tok.findall(t.lower()) for d, t, _ in docs}
    classes = sorted({c for _, _, c in docs})
    n_docs = len(docs)
    prior = {c: math.log(sum(1 for _, _, cc in docs if cc == c) / n_docs)
             for c in classes}
    counts: dict = {}
    totals = {c: 0 for c in classes}
    vocab = set()
    for d, _, c in docs:
        for t in toks[d]:
            counts[(c, t)] = counts.get((c, t), 0) + 1
            totals[c] += 1
            vocab.add(t)
    v = len(vocab)
    out = {}
    for d, _, _ in docs:
        best, best_s = None, -math.inf
        for c in classes:
            s = prior[c]
            for t in toks[d]:
                s += math.log((counts.get((c, t), 0) + alpha)
                              / (totals[c] + alpha * v))
            if s > best_s + 1e-12:
                best, best_s = c, s
        out[d] = (best, math.floor(best_s * 1e4 + 1e-6))
    return out


def test_nb_classifier_matches_reference(ray_session):
    from omop2obo_ray.pipelines.curate import nb_classify, nb_train

    docs = [
        (0, "the cat sat on the mat", "en"),
        (1, "cat and dog play", "en"),
        (2, "le chat dort sur le lit", "fr"),
        (3, "le chien et le chat", "fr"),
        (4, "der hund und die katze", "de"),
        (5, "die katze schlaeft", "de"),
        (6, "cat dog mat play", "en"),
        (7, "chat chien lit", "fr"),
    ]
    df = pd.DataFrame(docs, columns=["doc_id", "text", "lang"])
    ds = rd.from_pandas(df)
    model = nb_train(ds, label_col="lang")
    got = (nb_classify(ds, model).to_pandas()
           .set_index("doc_id"))
    want = _nb_reference(docs)
    for d, (cls, sq) in want.items():
        assert got.loc[d, "label_pred"] == cls, d
        assert int(got.loc[d, "score_q"]) == sq, d
    # self-training on separable corpora recovers the labels
    assert (got["label_pred"] == df.set_index("doc_id")["lang"]).all()


def test_nb_classifier_unknown_token_and_empty_doc(ray_session):
    from omop2obo_ray.pipelines.curate import nb_classify, nb_train

    train = pd.DataFrame({
        "doc_id": [0, 1], "text": ["aaa bbb", "ccc ddd"],
        "lang": ["x", "y"]})
    model = nb_train(rd.from_pandas(train), label_col="lang")
    score = pd.DataFrame({
        "doc_id": [10, 11, 12],
        "text": ["aaa zzz", "", "ccc ccc"]})
    got = (nb_classify(rd.from_pandas(score), model).to_pandas()
           .set_index("doc_id"))
    assert got.loc[10, "label_pred"] == "x"   # unknown zzz is neutral
    assert got.loc[12, "label_pred"] == "y"
    # empty doc: prior-only score, tie on uniform priors → smallest class
    assert got.loc[11, "label_pred"] == "x"


def test_bm25_scores_match_reference(ray_session):
    from omop2obo_ray.pipelines.curate import bm25_scores
    import math
    import re

    docs = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "quick quick fox"),
        (2, "lazy afternoon nap"),
        (3, "completely unrelated words here"),
        (4, ""),
    ]
    terms = ["quick", "lazy"]
    k1, b = 1.2, 0.75
    tok = re.compile("[a-z0-9]+")
    toks = {d: tok.findall(t.lower()) for d, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    want = {}
    for d, _ in docs:
        s, hit = 0.0, False
        for t in terms:
            tf = toks[d].count(t)
            if tf:
                hit = True
                df = sum(1 for v in toks.values() if t in v)
                idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
                s += idf * (tf * (k1 + 1)) / (
                    tf + k1 * (1 - b + b * len(toks[d]) / avgdl))
        if hit:
            want[d] = s

    df_in = pd.DataFrame(docs, columns=["doc_id", "text"])
    got = (bm25_scores(rd.from_pandas(df_in), terms)
           .to_pandas().set_index("doc_id")["score"].to_dict())
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12), d
    # tf saturation: doc 1 has tf=2 for 'quick' but is shorter, so it
    # outranks doc 0 on 'quick' alone; both match 'quick'
    assert got[1] > 0 and got[0] > 0


def test_winnow_fingerprints_reference_and_guarantee(ray_session):
    from omop2obo_ray.pipelines.curate import winnow_fingerprints
    import hashlib
    import re

    k, w = 3, 2
    docs = [
        (0, "a b c d e f"),
        (1, "x y z a b c d q"),   # shares 'a b c d' (len k+1) with doc 0
        (2, "one two"),           # shorter than k → no fingerprints
        (3, "p q r"),             # exactly k tokens → global min
    ]
    tok = re.compile("[a-z0-9]+")

    def ref(text):
        t = tok.findall(text.lower())
        n = len(t) - k + 1
        if n <= 0:
            return set()
        hs = [hashlib.md5(" ".join(t[i:i + k]).encode()).hexdigest()
              for i in range(n)]
        if n <= w:
            return {min(hs)}
        return {min(hs[i:i + w]) for i in range(n - w + 1)}

    got = (winnow_fingerprints(
        rd.from_pandas(pd.DataFrame(docs, columns=["doc_id", "text"])),
        k=k, w=w).to_pandas())
    by_doc = {d: set(g["fp"]) for d, g in got.groupby("doc_id")}
    for d, text in docs:
        assert by_doc.get(d, set()) == ref(text), d
    # winnowing guarantee: a shared substring of ≥ w+k−1 tokens ⇒ at
    # least one shared fingerprint
    assert by_doc[0] & by_doc[1]


def test_mixture_sample_ratio_and_determinism(ray_session):
    from omop2obo_ray.pipelines.curate import mixture_sample

    rng = np.random.RandomState(7)
    rows = []
    for i in range(900):
        src = ["big", "mid", "small"][i % 3]
        # big docs are long, small docs short → token totals differ
        n = {"big": 40, "mid": 20, "small": 10}[src]
        rows.append((i, src, " ".join(
            f"w{rng.randint(0, 50)}" for _ in range(n))))
    df = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    ds = rd.from_pandas(df)
    out = mixture_sample(ds, {"big": 1, "mid": 1}).to_pandas()
    # 'small' absent from weights → dropped entirely
    assert set(out["source"]) <= {"big", "mid"}
    # equal weights: the tighter source (mid, fewer tokens) is kept
    # whole; big is downsampled toward mid's token mass
    toks = out.assign(nt=out["text"].str.split().str.len())
    t_big = toks.loc[toks["source"] == "big", "nt"].sum()
    t_mid = toks.loc[toks["source"] == "mid", "nt"].sum()
    assert t_mid == df.loc[df["source"] == "mid", "text"].str.split().str.len().sum()
    assert 0.8 <= t_big / t_mid <= 1.2  # doc-level hash noise tolerance
    # determinism
    again = mixture_sample(ds, {"big": 1, "mid": 1}).to_pandas()
    assert sorted(again["doc_id"]) == sorted(out["doc_id"])


# ---------------------------------------------------------------------------
# char-bigram LM perplexity
# ---------------------------------------------------------------------------

def _lm_py_oracle(train_texts, score_texts, alpha=1.0):
    """Pure-python add-alpha char-bigram LM with the engine's exact
    fallback rules (unseen bigram → per-c1 default; unseen c1 →
    ln(alpha/(alpha*V)))."""
    import collections
    import math

    def fold(t):
        return "".join(chr(ord(c) + 32) if "A" <= c <= "Z" else c
                       for c in t)

    chars = set()
    big = collections.Counter()
    for t in train_texts:
        t = fold(t)
        chars.update(t)
        for a, b in zip(t, t[1:]):
            big[(a, b)] += 1
    v = len(chars)
    tot = collections.Counter()
    for (a, _b), n in big.items():
        tot[a] += n

    out = {}
    for i, t in enumerate(score_texts):
        t = fold(t)
        if len(t) < 2:
            continue
        s = 0.0
        for a, b in zip(t, t[1:]):
            if (a, b) in big:
                s -= math.log((big[(a, b)] + alpha) / (tot[a] + alpha * v))
            elif a in tot:
                s -= math.log(alpha / (tot[a] + alpha * v))
            else:
                s -= math.log(alpha / (alpha * v))
        out[i] = (len(t) - 1, s / (len(t) - 1))
    return out


def test_lm_perplexity_matches_oracle_with_unseen(ray_session):
    from omop2obo_ray.pipelines.curate import lm_perplexity, lm_train_bigrams

    train = ["The cat sat on the mat", "a web Page about data",
             "more TRAINING text here", "short"]
    # doc 2 has an unseen bigram ('zq'), doc 3 an entirely unseen char
    # ('#'), doc 4 is too short to score (no bigrams)
    score = ["the cat", "zq unseen pair", "hash # char", "x", ""]
    tr = rd.from_items([{"doc_id": i, "text": t}
                        for i, t in enumerate(train)])
    sc = rd.from_items([{"doc_id": i, "text": t}
                        for i, t in enumerate(score)])
    model = lm_train_bigrams(tr)
    got = lm_perplexity(sc, model).to_pandas().set_index("doc_id")

    exp = _lm_py_oracle(train, score)
    assert set(got.index) == set(exp)
    for i, (nb, mean_nll) in exp.items():
        assert got.loc[i, "n_bigrams"] == nb
        assert got.loc[i, "nll_q"] == int(
            np.floor(mean_nll * 1e4 + 1e-6))


def test_lm_train_partials_merge_across_blocks(ray_session):
    # identical corpus split 1-doc-per-block vs one block must train
    # the identical model (counting pass is associative)
    from omop2obo_ray.pipelines.curate import lm_perplexity, lm_train_bigrams

    texts = [f"doc number {i} with shared charset" for i in range(12)]
    one = rd.from_items([{"doc_id": i, "text": t}
                         for i, t in enumerate(texts)]).repartition(1)
    many = rd.from_items([{"doc_id": i, "text": t}
                          for i, t in enumerate(texts)]).repartition(12)
    m1 = lm_train_bigrams(one)
    m2 = lm_train_bigrams(many)
    assert np.array_equal(m1.bigram_keys, m2.bigram_keys)
    assert np.allclose(m1.log_prob, m2.log_prob)
    assert m1.vocab_size == m2.vocab_size

    s1 = lm_perplexity(one, m1).to_pandas().sort_values("doc_id")
    s2 = lm_perplexity(many, m2).to_pandas().sort_values("doc_id")
    assert s1["nll_q"].tolist() == s2["nll_q"].tolist()


# ---------------------------------------------------------------------------
# HyperLogLog distinct sketch
# ---------------------------------------------------------------------------

def _hll_py_oracle(groups_to_values, p=12):
    import hashlib
    import math

    m = 1 << p
    out = {}
    for g, vals in groups_to_values.items():
        regs = {}
        for v in set(vals):
            h = int(hashlib.md5(v.encode()).hexdigest()[:16], 16)
            w = h >> p
            rho = (64 - p + 1) if w == 0 else (w & -w).bit_length()
            r = h % m
            regs[r] = max(regs.get(r, 0), rho)
        nz = len(regs)
        zeros = m - nz
        s = sum(2.0 ** -r for r in sorted(regs.values())) + zeros * 1.0
        alpha = 0.7213 / (1.0 + 1.079 / m)
        raw = alpha * m * m / s
        est = m * math.log(m / zeros) if (raw <= 2.5 * m and zeros > 0) else raw
        out[g] = (nz, est)
    return out


def test_hll_matches_oracle_and_error_bound(ray_session):
    from omop2obo_ray.pipelines.curate import hll_distinct

    rng = np.random.default_rng(11)
    rows = []
    truth = {"a": 5000, "b": 300, "c": 17}
    vals = {g: [f"{g}-val-{i}" for i in range(n)] for g, n in truth.items()}
    for g, vs in vals.items():
        for v in vs:
            # duplicates must not change the estimate
            for _ in range(int(rng.integers(1, 3))):
                rows.append({"g": g, "v": v})
    rng.shuffle(rows)
    ds = rd.from_items(rows).repartition(8)
    got = hll_distinct(ds, "g", "v").to_pandas().set_index("g")

    exp = _hll_py_oracle(vals)
    for g, n_true in truth.items():
        nz, est = exp[g]
        assert got.loc[g, "nz"] == nz
        # engine vs oracle: identical up to summation reassociation
        assert abs(got.loc[g, "est_q"] - int(np.floor(est * 1e3 + 1e-6))) <= 1
        # sketch vs truth: 1.04/sqrt(4096) ~ 1.6% std err; allow 5 sigma
        assert abs(got.loc[g, "est_q"] / 1e3 - n_true) <= max(
            5 * 1.04 / 64 * n_true, 3)


def test_hll_partition_invariant(ray_session):
    from omop2obo_ray.pipelines.curate import hll_distinct

    rows = [{"g": "x", "v": f"tok{i % 700}"} for i in range(4000)]
    one = rd.from_items(rows).repartition(1)
    many = rd.from_items(rows).repartition(16)
    a = hll_distinct(one, "g", "v").to_pandas()
    b = hll_distinct(many, "g", "v").to_pandas()
    # max-merge of registers is associative/idempotent → bit-identical
    assert a["nz"].tolist() == b["nz"].tolist()
    assert a["est_q"].tolist() == b["est_q"].tolist()


def test_ccnet_buckets_terciles_and_ties(ray_session):
    from omop2obo_ray.pipelines.curate import ccnet_quality_buckets

    # src A: 9 docs with three distinct quality levels (3 docs each, by
    # construction of repeated vs varied text); ties must share buckets
    rows = []
    for i in range(3):
        rows.append({"doc_id": i, "source": "A",
                     "text": "aaaa aaaa aaaa aaaa"})          # low NLL
    for i in range(3, 6):
        rows.append({"doc_id": i, "source": "A",
                     "text": "the quick brown fox jumps"})     # mid
    for i in range(6, 9):
        rows.append({"doc_id": i, "source": "A",
                     "text": "zq xv jk qp wz bv km yx"})       # high NLL
    out = (ccnet_quality_buckets(rd.from_items(rows).repartition(3))
           .to_pandas().sort_values("doc_id"))
    assert len(out) == 9
    # identical texts → identical nll_q → identical bucket
    for lo in (0, 3, 6):
        assert out.iloc[lo:lo + 3]["bucket"].nunique() == 1
    b = out.groupby("bucket")["nll_q"].mean()
    assert b["head"] < b["middle"] < b["tail"]
    # buckets ordered by threshold: every head nll <= every tail nll
    assert out[out.bucket == "head"]["nll_q"].max() <= \
        out[out.bucket == "tail"]["nll_q"].min()


def test_search_all_terms_and_postings(ray_session):
    from omop2obo_ray.pipelines.curate import postings, search_all_terms

    docs = rd.from_items([
        {"doc_id": 1, "text": "alpha beta gamma"},
        {"doc_id": 2, "text": "alpha delta"},
        {"doc_id": 3, "text": "Beta ALPHA beta"},   # case-folded, dup tokens
        {"doc_id": 4, "text": ""},
    ])
    hits = sorted(search_all_terms(docs, ["alpha", "beta"])
                  .to_pandas()["doc_id"])
    assert hits == [1, 3]
    p = postings(docs).to_pandas()
    assert len(p) == len(p.drop_duplicates())          # globally distinct
    assert sorted(p[p.token == "beta"]["doc_id"]) == [1, 3]
    assert set(p[p.doc_id == 3]["token"]) == {"alpha", "beta"}


def test_bloom_no_false_negatives_and_fp_rate(ray_session):
    from omop2obo_ray.pipelines.curate import bloom_build, bloom_probe

    ref_vals = [f"inserted-{i}" for i in range(2000)]
    other = [f"absent-{i}" for i in range(4000)]
    bloom = bloom_build(
        rd.from_items([{"v": v} for v in ref_vals]).repartition(8),
        "v", n_bits=1 << 16, k=4)
    got = bloom_probe(
        rd.from_items([{"v": v} for v in ref_vals + other]),
        "v", bloom).to_pandas().set_index("v")["member"]
    # Bloom guarantee: NO false negatives, ever
    assert got.loc[ref_vals].all()
    # FP rate ~ (1-e^{-kn/m})^k ≈ 0.24% at n=2000,m=65536,k=4; 5× slack
    assert got.loc[other].mean() <= 0.012


def test_bloom_partition_invariant(ray_session):
    from omop2obo_ray.pipelines.curate import bloom_build

    rows = [{"v": f"tok{i % 300}"} for i in range(2000)]
    b1 = bloom_build(rd.from_items(rows).repartition(1), "v",
                     n_bits=1 << 12, k=3)
    b16 = bloom_build(rd.from_items(rows).repartition(16), "v",
                      n_bits=1 << 12, k=3)
    assert np.array_equal(b1.bits, b16.bits)   # set union is the merge


def test_bloom_semi_join_exact_even_with_forced_fps(ray_session):
    """bloom_semi_join ≡ pandas isin for semi AND anti — with n_bits
    tiny enough that the bloom pre-filter passes many false positives,
    so the exact-verification join is proven to remove every one."""
    from omop2obo_ray.pipelines.curate import bloom_semi_join

    rng = np.random.default_rng(5)
    left = pd.DataFrame({"k": rng.integers(0, 500, 3000),
                         "payload": np.arange(3000)})
    right = pd.DataFrame({"rk": rng.integers(0, 500, 120)})
    member = left["k"].isin(set(right["rk"]))
    for how, want in (("left_semi", left[member]),
                      ("left_anti", left[~member])):
        got = bloom_semi_join(
            rd.from_pandas(left).repartition(6),
            rd.from_pandas(right).repartition(3),
            on="k", right_on="rk", how=how,
            n_bits=1 << 8, k=2,              # saturated → heavy FPs
        ).to_pandas().sort_values("payload").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got, want.sort_values("payload").reset_index(drop=True),
            check_dtype=False)   # exchange may restore ints as Int64


def test_train_test_split_deterministic_and_disjoint(ray_session):
    from omop2obo_ray.pipelines.curate import train_test_split

    ds = rd.range(20000).map_batches(
        lambda b: b.rename_columns(["doc_id"]), batch_format="pyarrow")
    a = train_test_split(ds).to_pandas().set_index("doc_id")["split"]
    b = train_test_split(ds.repartition(16)).to_pandas() \
        .set_index("doc_id")["split"]
    assert (a.sort_index() == b.sort_index()).all()   # shard-invariant
    frac = a.value_counts(normalize=True)
    assert abs(frac.get("val", 0) - 0.05) < 0.01
    assert abs(frac.get("test", 0) - 0.05) < 0.01
    assert abs(frac.get("train", 0) - 0.90) < 0.02


def test_select_until_budget_matches_numpy(ray_session):
    from omop2obo_ray.pipelines.curate import select_until_budget

    rng = np.random.default_rng(3)
    n = 500
    rows = [{"doc_id": i, "score": int(rng.integers(0, 50)),
             "w": int(rng.integers(1, 100))} for i in range(n)]
    budget = 8000
    got = (select_until_budget(
        rd.from_items(rows).repartition(8), budget,
        score_col="score", weight_col="w")
        .to_pandas().sort_values("doc_id"))

    order = sorted(rows, key=lambda r: (-r["score"], r["doc_id"]))
    acc, keep = 0, {}
    for r in order:
        acc += r["w"]
        if acc <= budget:
            keep[r["doc_id"]] = acc
    assert got["doc_id"].tolist() == sorted(keep)
    assert got.set_index("doc_id")["cum"].to_dict() == keep
    # the kept set is exactly a PREFIX of the quality ordering
    assert set(keep) == {r["doc_id"] for r in order[:len(keep)]}


def test_chunk_documents_windows_and_edges(ray_session):
    from omop2obo_ray.pipelines.curate import chunk_documents

    toks = [f"t{i}" for i in range(10)]
    docs = rd.from_items([
        {"doc_id": 1, "text": " ".join(toks)},   # 10 toks, c=4 o=1 → step 3
        {"doc_id": 2, "text": "solo"},
        {"doc_id": 3, "text": ""},
    ])
    got = (chunk_documents(docs, chunk_tokens=4, overlap=1)
           .to_pandas().sort_values(["doc_id", "chunk_id"]))
    d1 = got[got.doc_id == 1]
    assert d1["chunk"].tolist() == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9", "t9"]
    assert d1["n_tokens"].tolist() == [4, 4, 4, 1]
    assert got[got.doc_id == 2]["chunk"].tolist() == ["solo"]
    # empty text: split(' ') yields one empty token (shared rule with
    # the SQL oracle) → one chunk
    assert got[got.doc_id == 3]["chunk"].tolist() == [""]

    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_rep_ngram_stats_planted(ray_session):
    from omop2obo_ray.pipelines.curate import rep_ngram_stats

    docs = rd.from_items([
        {"doc_id": 1, "text": "a b c a b c a b c"},  # "a b c" x3 etc.
        {"doc_id": 2, "text": "all tokens are unique here ok"},
        {"doc_id": 3, "text": "too short"},           # < 3 tokens → drop
    ])
    out = (rep_ngram_stats(docs, n=3).to_pandas()
           .set_index("doc_id"))
    # doc1 grams: abc bca cab abc bca cab abc → 7 grams, abc×3 bca×2 cab×2
    assert out.loc[1, "total_ngrams"] == 7
    assert out.loc[1, "dup_ngrams"] == 7
    assert out.loc[1, "top_ngram_count"] == 3
    assert out.loc[2, "dup_ngrams"] == 0
    assert out.loc[2, "total_ngrams"] == 4
    assert 3 not in out.index


def test_similarity_join_planted(ray_session):
    from omop2obo_ray.pipelines.curate import similarity_join

    left = rd.from_items([
        {"id": 1, "name": "red green blue"},
        {"id": 2, "name": "cyan magenta yellow"},
        {"id": 3, "name": "the the the common"},     # dup tokens collapse
    ])
    right = rd.from_items([
        {"id": 10, "name": "red green navy"},        # 2/4 with 1 → 0.5
        {"id": 11, "name": "magenta yellow cyan"},   # identical set to 2
        {"id": 12, "name": "unrelated words only"},
    ])
    got = (similarity_join(left, right, key_l="id", text_l="name",
                           key_r="id", text_r="name", threshold_ppt=500)
           .to_pandas().sort_values(["lk", "rk"]))
    pairs = set(zip(got["lk"], got["rk"]))
    assert pairs == {(1, 10), (2, 11)}
    row = got.set_index(["lk", "rk"]).loc[(2, 11)]
    assert row["n_shared"] == 3 and row["l_size"] == 3 and row["r_size"] == 3


def test_similarity_join_max_df_skew_guard(ray_session):
    from omop2obo_ray.pipelines.curate import similarity_join

    # 'common' appears everywhere; with max_df=2 it is excluded from
    # the metric, so the only surviving pair shares rare tokens
    left = rd.from_items([
        {"id": i, "name": f"common rare{i}"} for i in range(1, 5)])
    right = rd.from_items([
        {"id": 10, "name": "common rare1"},
        {"id": 11, "name": "common other"},
    ])
    got = similarity_join(left, right, key_l="id", text_l="name",
                          key_r="id", text_r="name",
                          threshold_ppt=900, max_df=2).to_pandas()
    assert set(zip(got["lk"], got["rk"])) == {(1, 10)}


def test_bigram_pmi_matches_handcount(ray_session):
    from omop2obo_ray.pipelines.curate import bigram_pmi

    # "x y" appears 6x; unigrams: x=6, y=6, z=4; pairs M=10+... build
    # a corpus where one collocation dominates
    docs = rd.from_items([
        {"doc_id": i, "text": "x y z"} for i in range(4)] + [
        {"doc_id": 10 + i, "text": "x y"} for i in range(2)])
    got = bigram_pmi(docs, min_count=2).to_pandas() \
        .set_index(["tok_a", "tok_b"])
    import math
    n_tok = 4 * 3 + 2 * 2            # 16 tokens
    m_pairs = 4 * 2 + 2 * 1          # 10 adjacent pairs
    assert got.loc[("x", "y"), "n_ab"] == 6
    pmi_xy = math.log((6 / m_pairs) / ((6 / n_tok) * (6 / n_tok)))
    assert got.loc[("x", "y"), "pmi_q"] == int(
        np.floor(pmi_xy * 1e4 + 1e-6))
    assert got.loc[("y", "z"), "n_ab"] == 4
    # pairs never cross documents: ("z","x") only if docs concatenated
    assert ("z", "x") not in got.index
    # min_count gate
    assert len(bigram_pmi(docs, min_count=7).to_pandas()) == 0


def _brute_cooc(texts, window, min_count):
    import re
    from collections import Counter

    c = Counter()
    for t in texts:
        toks = re.findall("[a-z0-9]+", t.lower())
        for i, w1 in enumerate(toks):
            for j in range(i + 1, min(i + window + 1, len(toks))):
                c[(w1, toks[j])] += 1
    return {k: v for k, v in c.items() if v >= min_count}


def test_cooc_counts_matches_handcount(ray_session):
    from omop2obo_ray.pipelines.curate import cooc_counts

    texts = ["the cat sat on the mat",
             "the cat ate the mat",
             "a dog sat on a log",
             "",
             "one"]
    ds = rd.from_items([{"doc_id": i, "text": t}
                        for i, t in enumerate(texts)]).repartition(4)
    got = (cooc_counts(ds, window=2, min_count=2).to_pandas()
           .set_index(["w1", "w2"])["n"].to_dict())
    assert got == _brute_cooc(texts, 2, 2)


def test_cooc_counts_no_cross_doc_pairs(ray_session):
    # identical token at each doc boundary: boundary-straddling pairs
    # must not be counted even when docs share one flattened block
    from omop2obo_ray.pipelines.curate import cooc_counts

    ds = rd.from_items([{"doc_id": i, "text": "alpha beta"}
                        for i in range(6)])
    got = (cooc_counts(ds, window=3, min_count=1).to_pandas()
           .set_index(["w1", "w2"])["n"].to_dict())
    # within-doc only: (alpha, beta) ×6 — never (beta, alpha) across
    assert got == {("alpha", "beta"): 6}


def test_c4_clean_rules(ray_session):
    from omop2obo_ray.pipelines.curate import c4_clean

    docs = [
        # doc 0: 3 good lines → kept verbatim
        (0, "one two three four.\nfive six seven eight!\nnine ten ok?"),
        # doc 1: short line + no-terminal + javascript dropped → only
        # 1 surviving line < min_lines → doc dropped
        (1, "hi there.\nno terminal here\nplease enable JavaScript."),
        # doc 2: lorem ipsum anywhere kills the whole doc
        (2, "one two three four.\nfive six seven eight.\nlorem ipsum dolor sit."),
        # doc 3: brace kills the whole doc
        (3, "one two three four.\nfive six seven eight.\nif (x) { return; }"),
        # doc 4: good + bad lines → bad filtered, doc kept
        (4, "alpha beta gamma delta.\ntiny.\nepsilon zeta eta theta."),
    ]
    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in docs])
    got = (c4_clean(ds, min_words=3, min_lines=2).to_pandas()
           .set_index("doc_id")["text"].to_dict())
    assert set(got) == {0, 4}
    assert got[0] == docs[0][1]
    assert got[4] == "alpha beta gamma delta.\nepsilon zeta eta theta."


def test_synth_paragraph_docs_contract(ray_session):
    # the synthesized pages obey the arithmetic contract the SQL oracle
    # rebuilds: line count, banned-line positions, lorem/brace tails
    from omop2obo_ray.pipelines.curate import synth_paragraph_docs

    ds = rd.from_items([{"doc_id": i, "source": f"s{i%3}"}
                        for i in (0, 11, 13, 7)])
    got = (synth_paragraph_docs(ds).to_pandas()
           .set_index("doc_id")["text"].to_dict())
    for did in (0, 11, 13, 7):
        lines = got[did].split("\n")
        nl = 3 + did % 4
        extra = (1 if did % 11 == 0 else 0) + (1 if did % 13 == 0 else 0)
        assert len(lines) == nl + extra, did
        for i in range(nl):
            if i % 5 == 2:
                assert lines[i] == "ok no."
            elif i % 7 == 3:
                assert "javascript" in lines[i]
            elif (did + i) % 3 == 0:
                assert not lines[i].endswith(".")
    assert "lorem ipsum" in got[0] and "{" in got[13]


def test_char_entropy_known_values(ray_session):
    import math

    from omop2obo_ray.pipelines.curate import char_entropy

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": ["aaaa",          # single symbol -> 0
                 "abab",          # uniform over 2 -> 1 bit
                 "ab",            # uniform over 2 -> 1 bit
                 "",              # empty -> 0, n=0
                 "aééb"],  # é is non-ASCII: filtered out
    }))
    got = (char_entropy(docs).to_pandas()
           .set_index("doc_id").sort_index())
    assert got.loc[0, "n_chars"] == 4 and got.loc[0, "entropy"] == 0.0
    assert got.loc[1, "entropy"] == pytest.approx(1.0)
    assert got.loc[2, "entropy"] == pytest.approx(1.0)
    assert got.loc[3, "n_chars"] == 0 and got.loc[3, "entropy"] == 0.0
    # doc 4: only 'a' and 'b' counted (n=2, uniform -> 1 bit)
    assert got.loc[4, "n_chars"] == 2
    assert got.loc[4, "entropy"] == pytest.approx(1.0)

    # independent python oracle on a longer mixed string
    txt = "the quick brown fox! 123"
    docs2 = rd.from_pandas(pd.DataFrame({"doc_id": [9], "text": [txt]}))
    got2 = char_entropy(docs2).to_pandas().iloc[0]
    from collections import Counter
    cnt = Counter(c for c in txt if 0x20 <= ord(c) <= 0x7e)
    n = sum(cnt.values())
    want = math.log2(n) - sum(v * math.log2(v) for v in cnt.values()) / n
    assert got2["n_chars"] == n
    assert got2["entropy"] == pytest.approx(want, rel=1e-12)


def test_dsir_weights_order_and_identity(ray_session):
    from omop2obo_ray.pipelines.curate import (dsir_weights,
                                               lm_perplexity,
                                               lm_train_bigrams)

    # target domain = letter-ish prose; raw corpus adds digit-heavy
    # docs. A target-like held-out doc must outscore a digit-heavy one.
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": list(range(8)),
        "source": ["wiki"] * 3 + ["web"] * 5,
        "text": ["the cat sat on the mat",
                 "the dog sat on the log",
                 "a cat and a dog sat",
                 "000 111 222 333 444 555",
                 "999 888 777 666 000 111",
                 "the cat sat on a log",   # target-like web doc
                 "123 456 789 000 111 222",
                 "the dog and the cat sat"],  # target-like web doc
    }))
    got = (dsir_weights(docs, target_col="source", target_value="wiki")
           .to_pandas().set_index("doc_id").sort_index())
    assert set(got.index) == set(range(8))
    # every target-like doc beats every digit doc
    targetish = [0, 1, 2, 5, 7]
    digits = [3, 4, 6]
    assert got.loc[targetish, "weight_q"].min() > \
        got.loc[digits, "weight_q"].max()

    # wiring identity: weight_q == raw nll_q − target nll_q from the
    # underlying scorers
    m_t = lm_train_bigrams(docs.map_batches(
        lambda b: b.filter(b["source"].to_pandas().eq("wiki").pipe(
            lambda s: __import__("pyarrow").array(s.to_numpy()))),
        batch_format="pyarrow", batch_size=None))
    m_r = lm_train_bigrams(docs)
    st = (lm_perplexity(docs, m_t).to_pandas()
          .set_index("doc_id")["nll_q"])
    sr = (lm_perplexity(docs, m_r).to_pandas()
          .set_index("doc_id")["nll_q"])
    for k in range(8):
        assert got.loc[k, "weight_q"] == sr[k] - st[k]


def _py_bpe_train(texts, n_merges, min_count=2):
    """Single-process reference BPE (Sennrich'16) with the same
    deterministic tie-break (max count, then lexicographic pair)."""
    import re
    from collections import Counter

    words = Counter()
    for t in texts:
        words.update(re.findall(r"[a-z0-9]+", (t or "").lower()))
    vocab = {w: list(w) for w in words}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            f = words[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (l, r), n = min(pairs.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if n < min_count:
            break
        merges.append((l, r, n))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == l
                        and syms[i + 1] == r):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab, words


def test_bpe_train_matches_reference(ray_session):
    from omop2obo_ray.pipelines.curate import bpe_train

    texts = ["the cat sat on the mat", "the mats were flat",
             "that cat is fat", "batter up, the bat flew",
             "aaaa aa aaaa"]  # overlapping-pair rewrite case
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": range(len(texts)), "text": texts}))
    got = bpe_train(docs, n_merges=12)
    want, _, _ = _py_bpe_train(texts, 12)
    assert len(got) == len(want)
    for i, (l, r, n) in enumerate(want):
        row = got.iloc[i]
        assert (row["left"], row["right"], row["n"]) == (l, r, n), i


def test_bpe_token_counts_match_reference(ray_session):
    import re

    from omop2obo_ray.pipelines.curate import bpe_token_counts, bpe_train

    texts = ["the cat sat on the mat", "the mats were flat",
             "that cat is fat", "zzz unseen word"]
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": range(len(texts)), "text": texts}))
    merges = bpe_train(docs.filter(lambda r: r["doc_id"] < 3),
                       n_merges=8)
    got = (bpe_token_counts(docs, merges).to_pandas()
           .set_index("doc_id")["n_bpe_tokens"].sort_index())
    want_merges, vocab, _ = _py_bpe_train(texts[:3], 8)

    def enc_len(word):
        syms = list(word)
        for l, r, _n in want_merges:
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == l
                        and syms[i + 1] == r):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    for k, t in enumerate(texts):
        words = re.findall(r"[a-z0-9]+", t.lower())
        assert got[k] == sum(enc_len(w) for w in words), k


def _lev_full(a, b):
    la, lb = len(a), len(b)
    dp = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, lb + 1):
            cur = min(dp[j] + 1, dp[j - 1] + 1,
                      prev + (a[i - 1] != b[j - 1]))
            prev, dp[j] = dp[j], cur
    return dp[lb]


def test_lev_band_matches_full_dp():
    import itertools
    import random

    from omop2obo_ray.pipelines.curate import _lev_band

    rng = random.Random(11)
    alpha = "abc"
    # exhaustive short strings + random medium ones
    shorts = ["".join(p) for n in range(4)
              for p in itertools.product(alpha, repeat=n)]
    for k in (1, 2):
        for a in shorts:
            for b in shorts:
                want = _lev_full(a, b)
                got = _lev_band(a, b, k)
                assert got == (want if want <= k else k + 1), (a, b, k)
        for _ in range(200):
            a = "".join(rng.choice("abcde")
                        for _ in range(rng.randint(0, 15)))
            b = "".join(rng.choice("abcde")
                        for _ in range(rng.randint(0, 15)))
            want = _lev_full(a, b)
            got = _lev_band(a, b, k)
            assert got == (want if want <= k else k + 1), (a, b, k)


def test_edit_distance_join_planted(ray_session):
    from omop2obo_ray.pipelines.curate import edit_distance_join

    right = rd.from_pandas(pd.DataFrame({
        "rid": [1, 2, 3, 4],
        "name": ["chocolate", "vanilla", "strawberry", "mint"]}))
    left = rd.from_pandas(pd.DataFrame({
        "qid": [10, 11, 12, 13, 14, 15],
        "q": ["chocolate",    # exact (dist 0)
              "choclate",     # deletion (dist 1)
              "vanillas",     # insertion (dist 1)
              "vanilla",      # exact
              "strawbeery",   # substitution+? -> strawberry dist 1? no: strawbeery vs strawberry = sub 'e'->'r' at one pos => dist 1
              "mnt"]}))      # deletion (dist 1)
    got = (edit_distance_join(left, right, key_l="qid", text_l="q",
                              key_r="rid", text_r="name", max_dist=1)
           .to_pandas().sort_values(["lk", "rk"]).reset_index(drop=True))
    want = []
    for qid, q in zip([10, 11, 12, 13, 14, 15],
                      ["chocolate", "choclate", "vanillas", "vanilla",
                       "strawbeery", "mnt"]):
        for rid, name in zip([1, 2, 3, 4],
                             ["chocolate", "vanilla", "strawberry",
                              "mint"]):
            d = _lev_full(q, name)
            if d <= 1:
                want.append((qid, rid, d))
    assert [tuple(r) for r in got[["lk", "rk", "dist"]].to_numpy()] == \
        sorted(want)
    # k=2 must additionally capture distance-2 pairs
    got2 = (edit_distance_join(left, right, key_l="qid", text_l="q",
                               key_r="rid", text_r="name", max_dist=2)
            .to_pandas())
    want2 = {(qid, rid)
             for qid, q in zip([10, 11, 12, 13, 14, 15],
                               ["chocolate", "choclate", "vanillas",
                                "vanilla", "strawbeery", "mnt"])
             for rid, name in zip([1, 2, 3, 4],
                                  ["chocolate", "vanilla", "strawberry",
                                   "mint"])
             if _lev_full(q, name) <= 2}
    assert {(lk, rk) for lk, rk in
            zip(got2["lk"], got2["rk"])} == want2


def test_edit_distance_join_no_candidates(ray_session):
    from omop2obo_ray.pipelines.curate import edit_distance_join

    left = rd.from_pandas(pd.DataFrame({"qid": [1], "q": ["xyzzy"]}))
    right = rd.from_pandas(pd.DataFrame({"rid": [1],
                                         "name": ["aaaaaaaaaa"]}))
    ds = edit_distance_join(left, right, key_l="qid", text_l="q",
                            key_r="rid", text_r="name", max_dist=1)
    # (Ray's to_pandas drops columns for zero-row datasets; the
    # Dataset-level schema is the contract)
    assert ds.count() == 0
    assert ds.schema().names == ["lk", "rk", "dist"]


def test_global_ranks_matches_pandas(ray_session):
    from omop2obo_ray.pipelines.curate import global_ranks

    rng = np.random.RandomState(3)
    df = pd.DataFrame({"k": np.arange(200, dtype=np.int64),
                       "s": rng.randint(0, 50, 200).astype(np.int64)})
    got = (global_ranks(rd.from_pandas(df).repartition(7), "k", "s")
           .to_pandas().set_index("k")["rank"].sort_index())
    want = df.sort_values(["s", "k"], ascending=[False, True])
    want["rank"] = np.arange(1, len(want) + 1, dtype=np.int64)
    want = want.set_index("k")["rank"].sort_index()
    pd.testing.assert_series_equal(got, want)


def test_rrf_fuse_two_lists(ray_session):
    from omop2obo_ray.pipelines.curate import rrf_fuse

    # list A ranks 1..4 = docs 4,3,2,1; list B covers only docs 1,2
    a = pd.DataFrame({"k": [1, 2, 3, 4],
                      "s": np.array([10, 20, 30, 40], dtype=np.int64)})
    b = pd.DataFrame({"k": [1, 2],
                      "s": np.array([5, 1], dtype=np.int64)})
    got = (rrf_fuse([rd.from_pandas(a), rd.from_pandas(b)], "k", "s",
                    k=60, scale=1_000_000)
           .to_pandas().set_index("k")["fused_q"].sort_index())
    want = {
        1: 1_000_000 // 64 + 1_000_000 // 61,
        2: 1_000_000 // 63 + 1_000_000 // 62,
        3: 1_000_000 // 62,
        4: 1_000_000 // 61,
    }
    assert got.to_dict() == want


def test_filter_blocked_hosts_suffix_semantics(ray_session):
    from omop2obo_ray.pipelines.curate import filter_blocked_hosts

    df = pd.DataFrame({
        "url": ["https://ads.example.com/x",        # exact block
                "https://sub.ads.example.com/y",    # subdomain
                "https://badexample.com/z",          # NOT a suffix match
                "HTTPS://ADS.EXAMPLE.COM/upper",     # case-folded
                "https://ok.org/fine",
                "not-a-url"],
        "v": list(range(6))})
    got = (filter_blocked_hosts(rd.from_pandas(df),
                                ["ads.example.com"])
           .to_pandas().sort_values("v"))
    assert got["v"].tolist() == [2, 4, 5]


def test_mention_contexts_first_occurrence_and_window(ray_session):
    from omop2obo_ray.pipelines.curate import mention_contexts

    text = "x" * 30 + "needle" + "y" * 30 + "needle tail pin"
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2], "text": [text, "no hits here"]}))
    got = (mention_contexts(docs, ["needle", "pin", "absent"], window=5)
           .to_pandas().sort_values("probe").reset_index(drop=True))
    assert got["doc_id"].tolist() == [1, 1]
    assert got["probe"].tolist() == ["needle", "pin"]
    # first occurrence only, 1-based, ±5 chars
    assert got["pos"].tolist() == [31, 79]
    assert got["snippet"][0] == "xxxxx" + "needle" + "yyyyy"
    assert got["snippet"][1] == "tail pin"  # window clips at doc end


# ---------------------------------------------------------------------------
# Gopher rule-set signals + zlib compression signal
# ---------------------------------------------------------------------------

def test_gopher_stats_planted_rules(ray_session):
    """Each rule isolated on a planted doc; thresholds at defaults
    except min_words lowered so short fixtures can pass."""
    from omop2obo_ray.pipelines.curate import gopher_stats

    good = ("the data of this corpus and that model have weight with "
            "more plain prose words here to cross the floor easily "
            "now adding several further tokens so the word count "
            "clears twenty five total")
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "text": [
            good,                                   # passes everything
            "\n".join(f"- {c}" for c in "abcdefghij") + "\n" + good,
            good + " ### ### ###",                  # 9 '#' symbols
            "1 2 3 4 5 6 7 8 9 10 " + good,         # digit words drop alpha ratio
            "no stop words here just plain prose",  # 0 stopwords
            good + " one...\ntwo...\nthree...\nfour...",  # ellipsis lines
        ]}))
    got = (gopher_stats(docs, min_words=10).to_pandas()
           .set_index("doc_id"))
    assert got.loc[0, "keep"] == 1
    # doc1: 11 lines, 10 bullets → 100 > 9*11 fails bullet rule (only)
    assert got.loc[1, "n_bullet"] == 10 and got.loc[1, "n_lines"] == 11
    assert got.loc[1, "keep"] == 0
    # doc2: 9 '#' symbols vs 37 words → 90 > 37 fails symbol rule
    assert got.loc[2, "n_symbols"] == 9 and got.loc[2, "keep"] == 0
    # doc3: 10 digit-only words lower alpha fraction below 0.8
    assert got.loc[3, "keep"] == 0
    # doc4: only stopword-free words → n_stop < 2
    assert got.loc[4, "n_stop"] < 2 and got.loc[4, "keep"] == 0
    # doc5: all 4 lines end in '...' → fails ellipsis rule
    assert got.loc[5, "n_ellipsis"] == 4 and got.loc[5, "keep"] == 0


def test_gopher_stats_matches_sql_oracle(ray_session):
    """Engine over synth_gopher_docs ≡ the SQL oracle recomputing the
    synth contract AND every signal in DuckDB — the same comparison
    the external driver gate runs."""
    from omop2obo_ray.pipelines.curate import (gopher_stats,
                                               gopher_stats_sql,
                                               synth_gopher_docs)

    base = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64)})
    got = (gopher_stats(synth_gopher_docs(rd.from_pandas(base)),
                        min_words=20, symbol_ratio_x10=1,
                        bullet_ratio_x10=4, ellipsis_ratio_x10=4,
                        alpha_ratio_x5=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", base)
    want = con.execute(gopher_stats_sql(
        min_words=20, symbol_ratio_x10=1, bullet_ratio_x10=4,
        ellipsis_ratio_x10=4, alpha_ratio_x5=2) + " ORDER BY doc_id").df()
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()].astype("int64"),
        want.astype("int64"))
    # the keep mix exercises three different failure rules
    keep_by_mod = got.assign(m=got["doc_id"] % 4).groupby("m")["keep"].mean()
    assert keep_by_mod[1] == 1.0
    assert keep_by_mod[0] == 0.0 and keep_by_mod[2] == 0.0


def test_compression_stats_matches_zlib(ray_session):
    import zlib

    from omop2obo_ray.pipelines.curate import compression_stats

    rows = [
        {"doc_id": 0, "text": "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa" * 20},
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog " * 8},
        {"doc_id": 2, "text": "k9$Qz!7w@Xv#2m&Lp*4r^Ht%8s(Jd)3f"},
        {"doc_id": 3, "text": ""},
    ]
    got = (compression_stats(rd.from_pandas(pd.DataFrame(rows)))
           .to_pandas().set_index("doc_id").sort_index())
    for r in rows:
        b = r["text"].encode("utf-8")
        assert got.loc[r["doc_id"], "raw_len"] == len(b)
        assert got.loc[r["doc_id"], "comp_len"] == len(zlib.compress(b, 6))
        assert got.loc[r["doc_id"], "ratio_q"] == \
            len(zlib.compress(b, 6)) * 10000 // max(len(b), 1)
    # repetitive text compresses far better than high-entropy text
    assert got.loc[0, "ratio_q"] < got.loc[1, "ratio_q"] < got.loc[2, "ratio_q"]


def test_ngram_decontaminate_planted(ray_session):
    """A corpus doc sharing one 5-gram with the benchmark is flagged;
    paraphrases and short docs are not; drop mode removes exactly the
    contaminated rows."""
    from omop2obo_ray.pipelines.curate import ngram_decontaminate

    bench = rd.from_pandas(pd.DataFrame({
        "doc_id": [100],
        "text": ["What is the boiling point of water at sea level"]}))
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            # contains 'the boiling point of water' verbatim (2 grams
            # overlap: positions give 4 shared 5-grams)
            "we discussed the boiling point of water at length",
            "water boils at one hundred degrees when pressure is low",
            "short doc",
            # repeated shared gram must count ONCE (distinct grams)
            "the boiling point of water yes the boiling point of water",
        ]}))
    got = (ngram_decontaminate(docs, bench, n=5).to_pandas()
           .set_index("doc_id").sort_index())
    assert got.loc[0, "contaminated"] == 1 and got.loc[0, "n_hits"] >= 1
    assert got.loc[1, "contaminated"] == 0
    assert got.loc[2, "contaminated"] == 0 and got.loc[2, "n_hits"] == 0
    # doc3 contains 'the boiling point of water' TWICE — the
    # duplicated benchmark gram counts once (distinct-gram semantics)
    assert got.loc[3, "n_hits"] == 1
    assert got.loc[3, "contaminated"] == 1

    kept = ngram_decontaminate(docs, bench, n=5,
                               mode="drop").to_pandas()
    assert sorted(kept["doc_id"]) == [1, 2]


def test_ngram_decontaminate_matches_sql_oracle(ray_session):
    """Engine ≡ the DuckDB oracle on texts with repeated grams, case
    differences and punctuation (the token rule is shared)."""
    from omop2obo_ray.pipelines.curate import (ngram_decontaminate,
                                               ngram_decontaminate_sql)

    base = pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64) * 97,  # ids 0,97,… so
        # the % 97 bench filter selects doc 0 only
        "text": [
            "Alpha beta GAMMA delta epsilon zeta eta theta",
            "alpha beta gamma delta epsilon differs at the end here",
            "unrelated words entirely disjoint from everything else",
            "ALPHA BETA GAMMA DELTA EPSILON zeta repeated tail",
            "tiny",
            "alpha beta gamma delta epsilon zeta eta theta again",
            "punct, should! not? matter: alpha beta gamma delta epsilon",
            "",
        ]})
    base["doc_id"] = np.arange(8, dtype=np.int64)
    docs = rd.from_pandas(base)
    bench = rd.from_pandas(base[base["doc_id"] % 97 == 0])
    got = (ngram_decontaminate(docs, bench, n=5).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", base)
    want = (con.execute(ngram_decontaminate_sql() + " ORDER BY doc_id")
            .df())
    pd.testing.assert_frame_equal(
        got.astype({"n_hits": "int64", "contaminated": "int64"}),
        want.astype({"n_hits": "int64", "contaminated": "int64"}))
    # the case-folded verbatim copy (doc 3 prefix) must be flagged
    assert got.loc[3, "contaminated"] == 1


def test_resolve_hrefs_matches_urljoin(ray_session):
    """Every planted case — fast paths AND fallbacks — must equal
    urllib.parse.urljoin exactly (the RFC 3986 reference)."""
    from urllib.parse import urljoin

    from omop2obo_ray.pipelines.curate import resolve_hrefs

    base = "https://host.test/a/b/index.html"
    hrefs = [
        "https://other.example.com/p",        # absolute, fast
        "HTTPS://UPPER.example.com/p",        # uppercase scheme → slow
        "mailto:someone@example.com",         # non-relative scheme
        "//cdn.example.com/lib.js",           # protocol-relative, fast
        "/rooted/path?q=1#f",                 # root-relative, fast
        "/rooted/../dotty",                   # root + dots → slow
        "sub/page.html",                      # relative
        "./same/dir",                         # dot segment
        "../up/one",                          # dotdot
        "../../up/two",                       # beyond root
        "?query=only",                        # bare query
        "#frag",                              # bare fragment
        "",                                   # empty → base
        "https://abs.com/x/./y/../z",         # absolute with dots → slow
    ]
    edges = rd.from_pandas(pd.DataFrame({
        "src": [base] * len(hrefs), "dst": hrefs}))
    got = resolve_hrefs(edges).to_pandas()
    for _, row in got.iterrows():
        assert row["resolved"] == urljoin(base, row["dst"]), row["dst"]


def test_resolve_hrefs_base_side_divergence(ray_session):
    """Bases that _BASE_ROOT_RE misparses (uppercase scheme, no scheme)
    or whose scheme is outside urllib's uses_relative set must route to
    the per-row urljoin fallback — the fast paths stay ≡ urljoin for
    every BASE, not just every href."""
    from urllib.parse import urljoin

    from omop2obo_ray.pipelines.curate import resolve_hrefs

    cases = [
        ("HTTPS://Host.test/a/x", "/p"),          # uppercase base scheme
        ("HTTPS://Host.test/a/x", "//cdn.example.com/l"),
        ("itms-apps://h/a", "/p"),                # non-uses_relative scheme
        ("itms-apps://h/a", "//x/y"),
        ("mailto:a@b.c", "/p"),                   # no authority at all
        ("host.test/a/x", "/p"),                  # schemeless base
        ("", "/p"),                               # empty base
        ("https://ok.test/a/x", "/p"),            # control: fast path
    ]
    edges = rd.from_pandas(pd.DataFrame(
        {"src": [b for b, _ in cases], "dst": [h for _, h in cases]}))
    got = resolve_hrefs(edges).to_pandas()
    for _, row in got.iterrows():
        assert row["resolved"] == urljoin(row["src"], row["dst"]), (
            row["src"], row["dst"])


def test_resolve_hrefs_synth_contract(ray_session):
    """synth_href_edges resolution follows the arithmetic contract the
    SQL oracle rebuilds (one case per resolution class)."""
    from omop2obo_ray.pipelines.curate import (resolve_hrefs,
                                               synth_href_edges)

    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(8, dtype=np.int64)}))
    got = (resolve_hrefs(synth_href_edges(docs)).to_pandas()
           .set_index("doc_id").sort_index()["resolved"])
    assert got[0] == "https://abs-0.example.com/p"
    assert got[1] == "https://cdn-1.example.com/lib.js"
    assert got[2] == "https://host-2.test/section/2/page"
    assert got[3] == "https://host-3.test/a/up/3"
    assert got[4] == "https://abs-4.example.com/p"


def test_split_sentences_rules(ray_session):
    from omop2obo_ray.pipelines.curate import split_sentences

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "One sentence. Two!  Three? And a tail without mark",
            "Trailing mark.",              # no split (no ws after '.')
            "Ends with delim. ",           # empty fragment dropped
            "",                            # nothing
        ]}))
    got = (split_sentences(docs).to_pandas()
           .sort_values(["doc_id", "sent_idx"]).reset_index(drop=True))
    d0 = got[got["doc_id"] == 0]
    assert d0["sentence"].tolist() == [
        "One sentence", "Two", "Three", "And a tail without mark"]
    assert d0["sent_idx"].tolist() == [0, 1, 2, 3]
    assert got[got["doc_id"] == 1]["sentence"].tolist() == [
        "Trailing mark."]
    assert got[got["doc_id"] == 2]["sentence"].tolist() == [
        "Ends with delim"]
    assert (got["doc_id"] == 3).sum() == 0


def test_rolling_window_matches_sql(ray_session):
    """rolling_window ≡ DuckDB SUM OVER (ROWS BETWEEN k PRECEDING AND
    CURRENT ROW) on a planted multi-user frame, quantized."""
    import duckdb as _dd

    from omop2obo_ray.pipelines.relational import rolling_window

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "user_id": np.repeat([1, 2, 3], 7),
        "event_id": np.arange(21, dtype=np.int64),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.permutation(21), unit="m"),
        "value": rng.normal(100, 20, 21)})
    got = (rolling_window(rd.from_pandas(df), "user_id",
                          ["ts", "event_id"], "value", preceding=3)
           .to_pandas())
    got["roll_q"] = np.floor(got["roll"] * 1e4 + 1e-6).astype(np.int64)
    got = (got[["user_id", "event_id", "roll_q"]]
           .sort_values(["user_id", "event_id"]).reset_index(drop=True))
    con = _dd.connect()
    con.register("events", df)
    want = con.execute(
        "SELECT user_id, event_id, CAST(floor(SUM(value) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) * 1e4 + 1e-6) "
        "AS BIGINT) AS roll_q FROM events "
        "ORDER BY user_id, event_id").df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))

    # mean variant: first frame = the row itself
    m = (rolling_window(rd.from_pandas(df), "user_id",
                        ["ts", "event_id"], "value", preceding=3,
                        agg="mean").to_pandas())
    first = df.sort_values(["ts", "event_id"]).groupby("user_id").head(1)
    for _, r in first.iterrows():
        got_first = m[(m["user_id"] == r["user_id"])
                      & (m["event_id"] == r["event_id"])]["roll"].iloc[0]
        assert got_first == pytest.approx(r["value"])


def test_parse_robots_groups_and_precedence():
    from omop2obo_ray.pipelines.curate import (_robots_allowed,
                                               parse_robots)

    txt = """# comment
User-agent: googlebot
User-agent: bingbot
Disallow: /private
Allow: /private/ok

User-agent: *
Disallow: /tmp
"""
    # stacked agents share a group; exact agent beats '*'
    assert parse_robots(txt, "googlebot") == [
        ("/private", False), ("/private/ok", True)]
    assert parse_robots(txt, "BingBot") == parse_robots(txt, "googlebot")
    assert parse_robots(txt, "*") == [("/tmp", False)]
    assert parse_robots(txt, "other") == [("/tmp", False)]
    assert parse_robots("", "*") == []

    rules = parse_robots(txt, "googlebot")
    assert _robots_allowed("/public", rules)          # no match → allow
    assert not _robots_allowed("/private/x", rules)   # disallow prefix
    assert _robots_allowed("/private/ok/y", rules)    # longer allow wins


def test_filter_robots_disallowed(ray_session):
    from omop2obo_ray.pipelines.curate import (filter_robots_disallowed,
                                               synth_robots)

    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(200, dtype=np.int64)}))
    pages, robots = synth_robots(docs)
    kept = filter_robots_disallowed(pages, robots).to_pandas()
    d = kept["doc_id"].to_numpy()
    # contract: blocked iff d%10 == (d%20)%7 and (d%20) odd
    blocked = [x for x in range(200)
               if x % 10 == (x % 20) % 7 and (x % 20) % 2 == 1]
    assert sorted(set(range(200)) - set(d)) == blocked
    # hosts with no robots row are fully allowed
    no_row = filter_robots_disallowed(
        pages, rd.from_pandas(pd.DataFrame(
            {"host": ["zz.test"], "robots_txt": ["User-agent: *\nDisallow: /"]})))
    assert no_row.to_pandas().shape[0] == 200


def test_filter_robots_port_and_userinfo(ray_session):
    """URLs with explicit ports or userinfo must still match the
    bare-hostname robots key (the authority is normalized before the
    lookup, not treated as an unknown host)."""
    from omop2obo_ray.pipelines.curate import filter_robots_disallowed

    robots = rd.from_pandas(pd.DataFrame({
        "host": ["h.test"],
        "robots_txt": ["User-agent: *\nDisallow: /secret\n"]}))
    pages = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "url": [
            "https://h.test/secret/a",          # blocked (bare host)
            "https://h.test:8443/secret/a",     # blocked (port)
            "https://bob@h.test/secret/a",      # blocked (userinfo)
            "https://bob@h.test:8443/secret/a", # blocked (both)
            "https://h.test:8443/public",       # allowed path
            "https://other.test:8443/secret",   # unknown host → allowed
        ]}))
    kept = sorted(filter_robots_disallowed(pages, robots)
                  .to_pandas()["doc_id"].tolist())
    assert kept == [4, 5]


def test_window_lag_lead_matches_sql(ray_session):
    """window_lag_lead ≡ DuckDB LAG/LEAD OVER (PARTITION BY key ORDER
    BY …) on a planted multi-user frame, including null partition
    edges."""
    import duckdb as _dd

    from omop2obo_ray.pipelines.relational import window_lag_lead

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "user_id": np.repeat([1, 2, 3], 5),
        "event_id": np.arange(15, dtype=np.int64),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.permutation(15), unit="m"),
        "value": rng.normal(50, 10, 15)})
    got = (window_lag_lead(rd.from_pandas(df), "user_id",
                           ["ts", "event_id"], "value")
           .to_pandas()
           .sort_values(["user_id", "event_id"]).reset_index(drop=True))
    con = _dd.connect()
    con.register("events", df)
    want = con.execute(
        "SELECT user_id, event_id, LAG(value) OVER w AS lag_v, "
        "LEAD(value) OVER w AS lead_v FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) "
        "ORDER BY user_id, event_id").df()
    for col in ("lag_v", "lead_v"):
        g = got[col].to_numpy(dtype=float)
        w = want[col].to_numpy(dtype=float)
        assert np.isnan(g).sum() == 3  # one edge null per user
        assert ((np.isnan(g) & np.isnan(w))
                | (np.abs(g - w) < 1e-9)).all()


def test_grouped_rollup_matches_sql(ray_session):
    """grouped_rollup ≡ DuckDB GROUP BY ROLLUP with GROUPING()-derived
    level ids; partial-combine across many small blocks must merge to
    the global answer."""
    import duckdb as _dd

    from omop2obo_ray.pipelines.relational import grouped_rollup

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], 400),
        "b": rng.choice(["p", "q"], 400),
        "v": rng.integers(1, 50, 400).astype(float)})
    # many tiny blocks so every level's partials really merge
    ds = rd.from_pandas(df).repartition(13)
    got = (grouped_rollup(ds, ["a", "b"], "v").to_pandas()
           .sort_values(["lvl", "a", "b"]).reset_index(drop=True))
    con = _dd.connect()
    con.register("t", df)
    want = con.execute(
        "SELECT coalesce(a, 'ALL') AS a, coalesce(b, 'ALL') AS b, "
        "2 - GROUPING(a) - GROUPING(b) AS lvl, sum(v) AS sum_v, "
        "count(*) AS n_rows FROM t GROUP BY ROLLUP(a, b) "
        "ORDER BY lvl, a, b").df()
    assert len(got) == len(want)
    assert (got["a"] == want["a"]).all()
    assert (got["b"] == want["b"]).all()
    assert (got["lvl"].to_numpy() == want["lvl"].to_numpy()).all()
    assert np.allclose(got["sum_v"], want["sum_v"])
    assert (got["n_rows"].to_numpy() == want["n_rows"].to_numpy()).all()


def test_grouped_cube_matches_sql(ray_session):
    """grouped_cube ≡ DuckDB GROUP BY CUBE with a GROUPING_ID bitmask;
    all 2^m grouping sets must merge exactly across many small blocks,
    including the 3-key case with mixed rolled-up slots."""
    import duckdb as _dd

    from omop2obo_ray.pipelines.relational import grouped_cube

    rng = np.random.default_rng(23)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], 500),
        "b": rng.choice(["p", "q"], 500),
        "c": rng.choice(["u", "v"], 500),
        "val": rng.integers(1, 50, 500).astype(float)})
    ds = rd.from_pandas(df).repartition(11)
    got = (grouped_cube(ds, ["a", "b", "c"], "val").to_pandas()
           .sort_values(["gid", "a", "b", "c"]).reset_index(drop=True))
    con = _dd.connect()
    con.register("t", df)
    want = con.execute(
        "SELECT coalesce(a, 'ALL') AS a, coalesce(b, 'ALL') AS b, "
        "coalesce(c, 'ALL') AS c, "
        "GROUPING(a)*4 + GROUPING(b)*2 + GROUPING(c) AS gid, "
        "sum(val) AS sum_v, count(*) AS n_rows FROM t "
        "GROUP BY CUBE(a, b, c) ORDER BY gid, a, b, c").df()
    assert len(got) == len(want) == 36  # 3*2*2+3*2+3*2+2*2+3+2+2+1
    for col in ("a", "b", "c"):
        assert (got[col] == want[col]).all()
    assert (got["gid"].to_numpy() == want["gid"].to_numpy()).all()
    assert np.allclose(got["sum_v"], want["sum_v"])
    assert (got["n_rows"].to_numpy() == want["n_rows"].to_numpy()).all()


def test_funnel_steps_matches_sql(ray_session):
    """funnel_steps ≡ the unrolled greedy-earliest SQL recurrence; ties
    within a type and out-of-order arrivals must not change the
    result; a user whose steps occur in the wrong order stalls."""
    import duckdb as _dd

    from omop2obo_ray.pipelines.relational import funnel_steps

    rng = np.random.default_rng(5)
    n = 600
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "event_type": rng.choice(
            ["view", "click", "purchase", "error"], n),
        "ts": pd.to_datetime(
            rng.integers(0, 500, n), unit="s", origin="2026-01-01"),
        "event_id": np.arange(n)})
    steps = ["view", "click", "purchase"]
    got = (funnel_steps(rd.from_pandas(df).repartition(7), steps)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    con = _dd.connect()
    con.register("events", df)
    want = con.execute(
        "WITH s1 AS (SELECT user_id, min(ts) AS t FROM events "
        "WHERE event_type = 'view' GROUP BY user_id), "
        "s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
        "JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t "
        "WHERE e.event_type = 'click' GROUP BY e.user_id), "
        "s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
        "JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t "
        "WHERE e.event_type = 'purchase' GROUP BY e.user_id), "
        "u AS (SELECT DISTINCT user_id FROM events "
        "WHERE event_type IN ('view', 'click', 'purchase')) "
        "SELECT u.user_id, CASE WHEN s3.t IS NOT NULL THEN 3 "
        "WHEN s2.t IS NOT NULL THEN 2 WHEN s1.t IS NOT NULL THEN 1 "
        "ELSE 0 END AS steps FROM u "
        "LEFT JOIN s1 ON s1.user_id = u.user_id "
        "LEFT JOIN s2 ON s2.user_id = u.user_id "
        "LEFT JOIN s3 ON s3.user_id = u.user_id "
        "ORDER BY u.user_id").df()
    assert (got["user_id"].to_numpy() == want["user_id"].to_numpy()).all()
    assert (got["steps"].to_numpy() == want["steps"].to_numpy()).all()


def test_funnel_steps_strict_order_and_ties(ray_session):
    from omop2obo_ray.pipelines.relational import funnel_steps

    t = pd.to_datetime
    df = pd.DataFrame([
        # u1: completes all three strictly in order
        (1, "view", t("2026-01-01 00:00:00")),
        (1, "click", t("2026-01-01 00:00:05")),
        (1, "purchase", t("2026-01-01 00:00:09")),
        # u2: click at SAME ts as view — strict > means not counted
        (2, "view", t("2026-01-01 00:00:00")),
        (2, "click", t("2026-01-01 00:00:00")),
        # u3: purchase BEFORE click — stalls at 2
        (3, "view", t("2026-01-01 00:00:00")),
        (3, "purchase", t("2026-01-01 00:00:01")),
        (3, "click", t("2026-01-01 00:00:02")),
        # u4: non-funnel event filtered out; lone view → steps 1
        (4, "error", t("2026-01-01 00:00:00")),
        (4, "view", t("2026-01-01 00:00:07")),
    ], columns=["user_id", "event_type", "ts"])
    got = (funnel_steps(rd.from_pandas(df),
                        ["view", "click", "purchase"])
           .to_pandas().set_index("user_id")["steps"])
    assert got[1] == 3 and got[2] == 1 and got[3] == 2 and got[4] == 1


def test_cohort_retention_matches_sql(ray_session):
    """cohort_retention ≡ DuckDB first-day-cohort × distinct-active-day
    offsets; cross-block user duplication must collapse to one user
    per (cohort, offset)."""
    import duckdb as _dd

    from omop2obo_ray.pipelines.relational import cohort_retention

    rng = np.random.default_rng(9)
    n = 800
    df = pd.DataFrame({
        "user_id": rng.integers(0, 50, n),
        "ts": pd.to_datetime(rng.integers(0, 21 * 86400, n), unit="s",
                             origin="2026-02-01"),
        "event_type": rng.choice(["a", "b"], n)})
    got = (cohort_retention(rd.from_pandas(df).repartition(9))
           .to_pandas().sort_values(["cohort", "day_offset"])
           .reset_index(drop=True))
    con = _dd.connect()
    con.register("events", df)
    want = con.execute(
        "WITH ud AS (SELECT DISTINCT user_id, "
        "date_trunc('day', ts) AS day FROM events), "
        "f AS (SELECT user_id, min(day) AS cohort FROM ud "
        "GROUP BY user_id) "
        "SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort, "
        "datediff('day', f.cohort, ud.day) AS day_offset, "
        "count(*) AS n_users FROM ud JOIN f USING (user_id) "
        "GROUP BY 1, 2 ORDER BY 1, 2").df()
    assert (got["cohort"] == want["cohort"]).all()
    assert (got["day_offset"].to_numpy()
            == want["day_offset"].to_numpy()).all()
    assert (got["n_users"].to_numpy() == want["n_users"].to_numpy()).all()
    # day-0 row of the earliest cohort contains every user first seen
    # that day, exactly once
    d0 = got[(got["cohort"] == got["cohort"].min())
             & (got["day_offset"] == 0)]
    assert len(d0) == 1 and d0["n_users"].iloc[0] >= 1


def test_skyline2d_matches_bruteforce(ray_session):
    """Block-local fronts + one merge must equal the O(n²) dominance
    oracle, including duplicate co-optimal points and equal-x /
    equal-y strictness edges."""
    from omop2obo_ray.pipelines.relational import skyline2d

    rng = np.random.default_rng(17)
    df = pd.DataFrame({
        "pid": np.arange(300, dtype=np.int64),
        "price": np.round(rng.uniform(1, 50, 300), 1),
        "size": rng.integers(1, 30, 300)})
    # force duplicate co-optimal rows and strictness edges
    df.loc[0, ["price", "size"]] = (1.0, 29)
    df.loc[1, ["price", "size"]] = (1.0, 29)   # duplicate optimum: keep both
    df.loc[2, ["price", "size"]] = (1.0, 28)   # same x, smaller y: dominated
    df.loc[3, ["price", "size"]] = (1.1, 29)   # same y, bigger x: dominated

    got = (skyline2d(rd.from_pandas(df).repartition(9),
                     "price", "size", cols=["pid"])
           .to_pandas().sort_values("pid").reset_index(drop=True))

    p = df["price"].to_numpy()
    s = df["size"].to_numpy()
    dominated = np.array([
        bool(np.any((p <= p[i]) & (s >= s[i])
                    & ((p < p[i]) | (s > s[i]))))
        for i in range(len(df))])
    exp = df[~dominated].sort_values("pid").reset_index(drop=True)
    assert list(got["pid"]) == list(exp["pid"])
    assert {0, 1} <= set(got["pid"]) and 2 not in set(got["pid"]) \
        and 3 not in set(got["pid"])


def test_ntile_matches_sql(ray_session):
    """Per-key NTILE(4) over a total order ≡ DuckDB, including
    partitions smaller than n and exact fat-tile row counts."""
    import duckdb

    from omop2obo_ray.pipelines.relational import ntile

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "k": rng.integers(0, 12, 400),      # some keys will have < 4 rows
        "v": rng.integers(0, 50, 400),
        "rid": np.arange(400, dtype=np.int64)})
    df = df[~((df["k"] == 11) & (df.index > 2))]  # force a tiny partition
    got = (ntile(rd.from_pandas(df).repartition(7), "k", ["v", "rid"], 4)
           .to_pandas().sort_values(["k", "v", "rid"])
           .reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT k, v, rid,
               NTILE(4) OVER (PARTITION BY k ORDER BY v, rid) AS tile
        FROM df ORDER BY k, v, rid""").df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_grouped_corr_matches_sql(ray_session):
    """Sufficient-stats corr/slope/intercept ≡ DuckDB corr/regr_* per
    group (null pairs excluded, degenerate groups null)."""
    import duckdb

    from omop2obo_ray.pipelines.relational import grouped_corr

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "k": rng.integers(0, 6, 500),
        "x": rng.normal(10, 3, 500),
        "y": rng.normal(0, 1, 500)})
    df["y"] = df["y"] + 0.5 * df["x"]
    df.loc[5, "x"] = np.nan                       # pairwise-null exclusion
    df.loc[df["k"] == 5, "x"] = 7.0               # zero-variance group
    got = (grouped_corr(rd.from_pandas(df).repartition(6), "k", "x", "y")
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT k, count(*) FILTER (x IS NOT NULL AND y IS NOT NULL) AS n,
               corr(y, x) AS corr, regr_slope(y, x) AS slope,
               regr_intercept(y, x) AS intercept
        FROM df GROUP BY k ORDER BY k""").df()
    assert list(got["k"]) == list(exp["k"])
    assert list(got["n"]) == list(exp["n"])
    for c in ["corr", "slope", "intercept"]:
        np.testing.assert_allclose(got[c], exp[c], rtol=1e-9, atol=1e-12)
    assert np.isnan(got.loc[got["k"] == 5, "corr"]).all()


def test_streaks_matches_sql(ray_session):
    """Islands per user ≡ the DENSE_RANK gaps-and-islands oracle:
    duplicate same-day events collapse, gaps split runs."""
    import duckdb

    from omop2obo_ray.pipelines.relational import streaks

    ts = pd.to_datetime([
        "2026-01-01 05:00", "2026-01-01 23:00", "2026-01-02 01:00",
        "2026-01-04 12:00",                      # gap → new island
        "2026-01-01 00:00", "2026-01-03 00:00", "2026-01-04 00:00"])
    df = pd.DataFrame({"user_id": [1, 1, 1, 1, 2, 2, 2], "ts": ts})
    got = (streaks(rd.from_pandas(df).repartition(4))
           .to_pandas().sort_values(["user_id", "start_day"])
           .reset_index(drop=True))
    exp = duckdb.sql("""
        WITH days AS (SELECT DISTINCT user_id,
                             CAST(date_trunc('day', ts) AS DATE) AS day
                      FROM df),
        ranked AS (SELECT user_id, day,
                          day - CAST(DENSE_RANK() OVER (
                              PARTITION BY user_id ORDER BY day)
                              AS INTEGER) AS island FROM days)
        SELECT user_id, strftime(MIN(day), '%Y-%m-%d') AS start_day,
               COUNT(*) AS n_days
        FROM ranked GROUP BY user_id, island
        ORDER BY user_id, start_day""").df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert list(got["n_days"]) == [2, 1, 1, 2]


def test_skipgram_pairs_matches_sql(ray_session):
    """Combiner-first pair counts ≡ the ordered self-join oracle
    (both directions, window 2, sequences shorter than the window)."""
    import duckdb

    from omop2obo_ray.pipelines.relational import skipgram_pairs

    rng = np.random.default_rng(9)
    n = 300
    df = pd.DataFrame({
        "user_id": rng.integers(0, 15, n),      # some users get 1 event
        "event_type": rng.choice(list("abcde"), n),
        "ts": pd.to_datetime("2026-01-01")
        + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
        "event_id": np.arange(n, dtype=np.int64)})
    got = (skipgram_pairs(rd.from_pandas(df).repartition(5), window=2)
           .to_pandas().sort_values(["center", "context"])
           .reset_index(drop=True))
    exp = duckdb.sql("""
        WITH seq AS (SELECT user_id, event_type, ROW_NUMBER() OVER
            (PARTITION BY user_id ORDER BY ts, event_id) AS pos FROM df)
        SELECT a.event_type AS center, b.event_type AS context,
               COUNT(*) AS n
        FROM seq a JOIN seq b ON a.user_id = b.user_id
            AND a.pos <> b.pos AND abs(a.pos - b.pos) <= 2
        GROUP BY 1, 2 ORDER BY center, context""").df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_cap_per_key_matches_sql(ray_session):
    """Hash-order per-key cap ≡ the ROW_NUMBER oracle; keys under the
    cap keep everything, selection is reproducible."""
    import duckdb

    from omop2obo_ray.pipelines.relational import cap_per_key

    rng = np.random.default_rng(21)
    df = pd.DataFrame({
        "k": rng.integers(0, 10, 200),
        "rid": np.arange(200, dtype=np.int64),
        "v": rng.integers(0, 99, 200)})
    got = (cap_per_key(rd.from_pandas(df).repartition(6), "k", "rid", 5,
                       cols=["v"])
           .to_pandas().sort_values(["k", "rid"]).reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT k, rid, v FROM (
            SELECT k, rid, v, ROW_NUMBER() OVER (PARTITION BY k
                ORDER BY (rid * 2654435761) % 4294967296, rid) AS rn
            FROM df) WHERE rn <= 5 ORDER BY k, rid""").df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got.groupby("k").size().max() <= 5
    # rerun: identical selection (determinism)
    again = (cap_per_key(rd.from_pandas(df), "k", "rid", 5, cols=["v"])
             .to_pandas().sort_values(["k", "rid"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, again, check_dtype=False)


def test_scd2_intervals_matches_sql(ray_session):
    """SCD2 compaction ≡ the lag-change / run-number oracle: runs with
    duplicate timestamps break on the tiebreak, half-open intervals
    chain exactly, last run per key is open (null effective_to)."""
    import duckdb

    from omop2obo_ray.pipelines.relational import scd2_intervals

    rng = np.random.default_rng(11)
    n = 400
    df = pd.DataFrame({
        "user_id": rng.integers(0, 12, n),
        "event_type": rng.choice(list("abc"), n),
        # coarse second grid → plenty of exact-duplicate timestamps
        "ts": pd.to_datetime("2026-01-01")
        + pd.to_timedelta(rng.integers(0, 50, n), unit="s"),
        "event_id": np.arange(n, dtype=np.int64)})
    # sort by ALL columns — (user, from, value) is not a total order
    # when duplicate timestamps produce a@t, b@t, a@t (two runs with
    # identical key/from/value but different effective_to); the driver
    # gate's canon() sorts all columns the same way
    sort_cols = ["user_id", "effective_from", "event_type",
                 "effective_to"]
    got = (scd2_intervals(rd.from_pandas(df).repartition(5))
           .to_pandas()
           .sort_values(sort_cols, na_position="last")
           .reset_index(drop=True))
    exp = duckdb.sql("""
        WITH o AS (SELECT user_id, ts, event_id, event_type,
                     lag(event_type) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS prev FROM df),
        r AS (SELECT user_id, ts, event_type,
                sum(CASE WHEN prev IS NULL OR prev <> event_type
                    THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                    AS run FROM o),
        runs AS (SELECT user_id, run, min(event_type) AS event_type,
                        min(ts) AS effective_from
                 FROM r GROUP BY user_id, run)
        SELECT user_id, event_type, effective_from,
               lead(effective_from) OVER (PARTITION BY user_id
                   ORDER BY run) AS effective_to
        FROM runs""").df().sort_values(
        sort_cols, na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # intervals chain: within a key every effective_to equals the next
    # effective_from, and exactly one open interval per key
    opens = got[got["effective_to"].isna()].groupby("user_id").size()
    assert (opens == 1).all()


def test_gap_fill_matches_sql(ray_session):
    """Calendar densification ≡ generate_series + IGNORE-NULLS
    last_value oracle: spans are per-key, fills carry the last
    observation of the most recent observed day, observed flags exact."""
    import duckdb

    from omop2obo_ray.pipelines.relational import gap_fill

    rng = np.random.default_rng(5)
    n = 300
    df = pd.DataFrame({
        "user_id": rng.integers(0, 15, n),
        "event_type": rng.choice(list("xyz"), n),
        # sparse day grid with intra-day duplicates → gaps AND ties
        "ts": pd.to_datetime("2026-02-01")
        + pd.to_timedelta(rng.integers(0, 40, n), unit="D")
        + pd.to_timedelta(rng.integers(0, 3, n), unit="s"),
        "event_id": np.arange(n, dtype=np.int64)})
    got = (gap_fill(rd.from_pandas(df).repartition(5))
           .to_pandas()
           .sort_values(["user_id", "day_num"]).reset_index(drop=True)
           [["user_id", "day_num", "event_type", "observed"]])
    exp = duckdb.sql("""
        WITH ranked AS (SELECT user_id,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                 AS day_num, event_type,
               row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                   ORDER BY ts DESC, event_id DESC) AS rn FROM df),
        obs AS (SELECT user_id, day_num, event_type
                FROM ranked WHERE rn = 1),
        span AS (SELECT user_id, min(day_num) AS d0, max(day_num) AS d1
                 FROM obs GROUP BY user_id),
        grid AS (SELECT user_id, unnest(generate_series(d0, d1))
                   AS day_num FROM span),
        j AS (SELECT g.user_id, g.day_num, o.event_type,
                CASE WHEN o.user_id IS NULL THEN 0 ELSE 1 END AS observed
              FROM grid g LEFT JOIN obs o
                ON g.user_id = o.user_id AND g.day_num = o.day_num)
        SELECT user_id, day_num,
               last_value(event_type IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY day_num) AS event_type,
               observed
        FROM j""").df().sort_values(
        ["user_id", "day_num"]).reset_index(drop=True)[
        ["user_id", "day_num", "event_type", "observed"]]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # gaps exist (otherwise the fixture tests nothing)
    assert (got["observed"] == 0).any()
    # every key's span is contiguous
    for _, g in got.groupby("user_id"):
        d = g["day_num"].to_numpy()
        assert (np.diff(d) == 1).all()


def test_weighted_sample_matches_sql_and_is_weighted(ray_session):
    """A-Res selection ≡ the shared ln(u)/w ORDER BY ... LIMIT oracle,
    and heavier rows are actually overrepresented."""
    import duckdb

    from omop2obo_ray.pipelines.relational import weighted_sample

    rng = np.random.default_rng(9)
    n = 5000
    df = pd.DataFrame({
        "rid": np.arange(1, n + 1, dtype=np.int64),
        # two-tier weights: 10% heavy (w=50), rest light (w=1)
        "w": np.where(rng.random(n) < 0.1, 50.0, 1.0)})
    got = (weighted_sample(rd.from_pandas(df).repartition(6), 200,
                           weight_col="w", id_col="rid")
           .to_pandas().sort_values("rid").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT rid, w FROM df
        ORDER BY ln((((rid * 2654435761) % 4294967296) + 0.5)
                    / 4294967296.0) / w DESC, rid
        LIMIT 200""").df().sort_values("rid").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # heavy rows (~10% of population, 50x weight) dominate the sample
    assert (got["w"] == 50.0).mean() > 0.5
    # idempotent re-run (determinism)
    again = (weighted_sample(rd.from_pandas(df).repartition(3), 200,
                             weight_col="w", id_col="rid")
             .to_pandas().sort_values("rid").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, again, check_dtype=False)


def test_interval_join_matches_sql(ray_session):
    """Point-in-time join ≡ the SQL range predicate: facts before the
    key's first interval drop, open intervals catch the tail, half-open
    boundaries are exact (ts == effective_to goes to the NEXT run)."""
    import duckdb

    from omop2obo_ray.pipelines.relational import (interval_join,
                                                   scd2_intervals)

    rng = np.random.default_rng(13)
    n = 350
    ev = pd.DataFrame({
        "user_id": rng.integers(0, 10, n),
        "event_type": rng.choice(list("pq"), n),
        "ts": pd.to_datetime("2026-03-01")
        + pd.to_timedelta(rng.integers(0, 2000, n), unit="min"),
        "event_id": np.arange(n, dtype=np.int64)})
    iv = scd2_intervals(rd.from_pandas(ev)).to_pandas()
    # facts: same stream shifted back 90 min → some precede the first
    # interval (drop), some land exactly on boundaries
    facts = ev[["user_id", "ts", "event_id"]].copy()
    facts["ts"] = facts["ts"] - pd.to_timedelta(90, unit="min")
    facts = facts.rename(columns={"event_id": "fact_id"})
    got = (interval_join(rd.from_pandas(facts).repartition(4),
                         rd.from_pandas(iv).repartition(3))
           .to_pandas()
           .sort_values(["user_id", "fact_id"]).reset_index(drop=True)
           [["user_id", "fact_id", "ts", "event_type",
             "effective_from", "effective_to"]])
    exp = duckdb.sql("""
        SELECT f.user_id, f.fact_id, f.ts, i.event_type,
               i.effective_from, i.effective_to
        FROM facts f JOIN iv i
          ON f.user_id = i.user_id AND f.ts >= i.effective_from
         AND (i.effective_to IS NULL OR f.ts < i.effective_to)
        """).df().sort_values(
        ["user_id", "fact_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert len(got) < len(facts)   # pre-first-interval facts dropped
    assert len(got) > 0


def test_window_rank_matches_sql(ray_session):
    import duckdb

    from omop2obo_ray.pipelines.relational import window_rank

    rng = np.random.default_rng(21)
    df = pd.DataFrame({"k": rng.integers(0, 20, 500),
                       "rid": np.arange(500, dtype=np.int64),
                       "v": rng.integers(0, 8, 500).astype(float)})
    got = (window_rank(rd.from_pandas(df).repartition(4),
                       key_col="k", val_col="v")
           .to_pandas().sort_values(["k", "rid"]).reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT k, rid, v,
               rank() OVER (PARTITION BY k ORDER BY v) AS rnk,
               dense_rank() OVER (PARTITION BY k ORDER BY v) AS drnk
        FROM df""").df().sort_values(["k", "rid"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp,
                                  check_dtype=False)


def test_window_pct_matches_sql(ray_session):
    """PERCENT_RANK/CUME_DIST ≡ DuckDB bit-for-bit (integer-ratio IEEE
    divisions), incl. 1-row partitions (PERCENT_RANK = 0)."""
    import duckdb

    from omop2obo_ray.pipelines.relational import window_pct

    rng = np.random.default_rng(22)
    df = pd.DataFrame({"k": rng.integers(0, 20, 500),
                       "rid": np.arange(500, dtype=np.int64),
                       "v": rng.integers(0, 8, 500).astype(float)})
    df.loc[0, "k"] = 99  # singleton partition
    got = (window_pct(rd.from_pandas(df).repartition(4),
                      key_col="k", val_col="v")
           .to_pandas().sort_values(["k", "rid"]).reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT k, rid, v,
               percent_rank() OVER (PARTITION BY k ORDER BY v) AS pct_rank,
               cume_dist() OVER (PARTITION BY k ORDER BY v) AS cume
        FROM df""").df().sort_values(["k", "rid"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp,
                                  check_dtype=False)


def test_ewma_matches_recurrence(ray_session):
    """ewma ≡ the explicit y = (1-a)y' + a·x recurrence per key in
    (ts, id) order, across partition boundaries."""
    from omop2obo_ray.pipelines.relational import ewma

    rng = np.random.default_rng(33)
    n = 400
    df = pd.DataFrame({
        "user_id": rng.integers(0, 15, n),
        "ts": pd.to_datetime(rng.integers(0, 10_000, n), unit="s"),
        "event_id": np.arange(n, dtype=np.int64),
        "value": rng.normal(50, 10, n)})
    got = (ewma(rd.from_pandas(df).repartition(5), alpha=0.3)
           .to_pandas().set_index("event_id")["y"])

    exp = {}
    for _, g in df.sort_values(["user_id", "ts", "event_id"]) \
                  .groupby("user_id"):
        y = None
        for eid, x in zip(g["event_id"], g["value"]):
            y = x if y is None else 0.7 * y + 0.3 * x
            exp[eid] = y
    for eid, y in exp.items():
        assert abs(got[eid] - y) < 1e-9, eid


def test_sorted_neighborhood_pairs_exact(ray_session):
    """sorted_neighborhood_pairs ≡ the rank-difference self-join
    oracle: every pair within `window` positions of the global
    (key, id) order appears exactly once, across block boundaries."""
    from omop2obo_ray.pipelines.relational import (
        sorted_neighborhood_pairs)

    rng = np.random.default_rng(41)
    n = 300
    df = pd.DataFrame({
        "k": [f"key{v:03d}" for v in rng.integers(0, 80, n)],
        "rid": np.arange(1000, 1000 + n, dtype=np.int64)})
    got = (sorted_neighborhood_pairs(
        rd.from_pandas(df).repartition(7), key_col="k",
        id_col="rid", window=5).to_pandas())
    got_pairs = sorted(zip(got["id_a"], got["id_b"]))
    assert len(got_pairs) == len(set(got_pairs)), "duplicate pairs"

    srt = df.sort_values(["k", "rid"], kind="mergesort").reset_index(
        drop=True)
    exp = []
    ids = srt["rid"].to_numpy()
    for d in range(1, 5):
        exp += list(zip(ids[:-d], ids[d:]))
    assert got_pairs == sorted(exp)


def test_er_cluster_matches_pipeline_oracle(ray_session):
    """er_cluster ≡ the replayed contract: sorted-neighborhood
    candidates (rank diff < window) → lev<=1 verify → union-find →
    singleton backfill. Planted alias groups + noise singletons."""
    from omop2obo_ray.pipelines.curate import er_cluster

    rows = []
    for g in range(12):
        base = f"entity{g * 7919 % 1000:03d}"
        for d in range(4):
            rows.append((g * 10 + d, base + ("" if d == 0 else
                                             chr(ord("a") + d))))
    rows += [(900 + i, f"zzunique{i:02d}xx") for i in range(5)]
    df = pd.DataFrame(rows, columns=["id", "name"])

    got = (er_cluster(rd.from_pandas(df).repartition(4),
                      id_col="id", text_col="name", window=6)
           .to_pandas().set_index("id")["cluster"].to_dict())

    def lev(a, b):
        m = np.zeros((len(a) + 1, len(b) + 1), int)
        m[:, 0] = np.arange(len(a) + 1)
        m[0, :] = np.arange(len(b) + 1)
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                m[i, j] = min(m[i - 1, j] + 1, m[i, j - 1] + 1,
                              m[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
        return m[len(a), len(b)]

    srt = df.sort_values(["name", "id"]).reset_index(drop=True)
    parent = {i: i for i in df["id"]}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(srt)):
        for j in range(i + 1, min(i + 6, len(srt))):
            a, b = srt.iloc[i], srt.iloc[j]
            if lev(a["name"], b["name"]) <= 1:
                ra, rb = find(a["id"]), find(b["id"])
                parent[max(ra, rb)] = min(ra, rb)
    exp = {i: find(i) for i in df["id"]}
    assert got == exp


def test_entity_pair_pmi_matches_oracle(ray_session):
    """entity_pair_pmi ≡ the per-doc distinct-pair df oracle."""
    from itertools import combinations

    from omop2obo_ray.pipelines.curate import entity_pair_pmi

    docs = ["alpha beta gamma alpha", "alpha beta xx", "beta gamma",
            "alpha gamma zz beta", "solo", "alpha beta"]
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    got = (entity_pair_pmi(rd.from_pandas(df).repartition(3),
                           min_len=4, min_pair_count=2)
           .to_pandas().set_index(["a", "b"]))

    N = len(docs)
    dfreq, pfreq = {}, {}
    for t in docs:
        ents = sorted({w for w in t.split() if len(w) >= 4})
        for e in ents:
            dfreq[e] = dfreq.get(e, 0) + 1
        for a, b in combinations(ents, 2):
            pfreq[(a, b)] = pfreq.get((a, b), 0) + 1
    exp = {k: v for k, v in pfreq.items() if v >= 2}
    assert set(got.index) == set(exp)
    for (a, b), cab in exp.items():
        assert got.loc[(a, b), "cab"] == cab
        want = np.log(cab * N / (dfreq[a] * dfreq[b]))
        assert abs(got.loc[(a, b), "pmi"] - want) < 1e-9


def test_assoc_rules_matches_oracle(ray_session):
    """assoc_rules ≡ the itertools replay (both directions, conf
    filter); entity_pair_pmi still green after the refactor."""
    import itertools
    import math

    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.curate import assoc_rules, entity_pair_pmi

    docs = [
        "alpha bravo charlie x",
        "alpha bravo delta",
        "alpha bravo",
        "charlie delta echoecho",
        "alpha charlie",
    ]
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    N = len(docs)

    dfreq, pcnt = {}, {}
    for t in docs:
        ents = sorted({w for w in t.split() if len(w) >= 5})
        for e in ents:
            dfreq[e] = dfreq.get(e, 0) + 1
        for a, b in itertools.combinations(ents, 2):
            pcnt[(a, b)] = pcnt.get((a, b), 0) + 1

    want = {}
    for (a, b), cab in pcnt.items():
        if cab < 2:
            continue
        lift = cab * N / (dfreq[a] * dfreq[b])
        for ante, cons, ca in ((a, b, dfreq[a]), (b, a, dfreq[b])):
            conf = cab / ca
            if conf >= 0.6:
                want[(ante, cons)] = (cab, conf, lift)

    got = assoc_rules(rd.from_pandas(df).repartition(2), min_conf=0.6) \
        .to_pandas().set_index(["antecedent", "consequent"])
    assert len(got) == len(want)
    for k, (cab, conf, lift) in want.items():
        assert got.loc[k, "cab"] == cab, k
        assert abs(got.loc[k, "conf"] - conf) < 1e-12
        assert abs(got.loc[k, "lift"] - lift) < 1e-12

    pmi = entity_pair_pmi(rd.from_pandas(df).repartition(2)) \
        .to_pandas().set_index(["a", "b"])
    for (a, b), cab in pcnt.items():
        if cab >= 2:
            assert abs(pmi.loc[(a, b), "pmi"]
                       - math.log(cab * N / (dfreq[a] * dfreq[b]))) < 1e-12


def test_mask_tokens_matches_replay(ray_session):
    """mask_tokens ≡ the pinned-hash python replay; deterministic
    across repartitions."""
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.curate import mask_tokens

    df = pd.DataFrame({
        "doc_id": [7, 12, 99],
        "text": ["the quick brown fox jumps over the lazy dog",
                 "a b c d e f g h i j k l m n o p",
                 "single"]})
    M = 1000000007

    want = []
    for did, text in zip(df["doc_id"], df["text"]):
        for pos, tok in enumerate(text.split(" ")):
            h = ((did % M) * 30011 + pos * 48271 + 17) % M % 100
            want.append((did, pos, tok,
                         "[MASK]" if h < 15 else tok))

    got = mask_tokens(rd.from_pandas(df).repartition(2)) \
        .to_pandas().sort_values(["doc_id", "pos"])
    assert list(map(tuple, got.itertuples(index=False))) == sorted(want)
    assert (got["masked_text"] == "[MASK]").any()

    got2 = mask_tokens(rd.from_pandas(df).repartition(3)).to_pandas()
    assert sorted(map(tuple, got2.itertuples(index=False))) == sorted(want)


def test_regex_extract_named_groups(ray_session):
    """regex_extract pulls named groups; non-matches null out, rows
    never drop."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from omop2obo_ray.pipelines.curate import regex_extract

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["GET /index.html 200", "POST /api/v1 500",
                 "garbage line"]})
    got = regex_extract(
        rd.from_pandas(df).repartition(2),
        r"(?P<verb>[A-Z]+) (?P<path>\S+) (?P<code>[0-9]{3})",
        keep_cols=["doc_id"]).to_pandas().set_index("doc_id")
    assert got.loc[1].tolist() == ["GET", "/index.html", "200"]
    assert got.loc[2].tolist() == ["POST", "/api/v1", "500"]
    assert got.loc[3].isna().all()

    with pytest.raises(ValueError, match="named group"):
        regex_extract(rd.from_pandas(df), "[A-Z]+")


def test_json_flatten_paths(ray_session):
    """json_flatten: nested paths, scalar stringification, malformed
    and missing handling."""
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.curate import json_flatten

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "payload": [
            '{"id": 7, "meta": {"lang": "en", "depth": 2}, "ok": true}',
            '{"id": 8, "meta": {"lang": "de"}, "ok": false}',
            '{"id": 9, "meta": "notdict", "tags": [1, 2]}',
            'not json at all',
            None]})
    got = json_flatten(
        rd.from_pandas(df).repartition(2),
        ["id", "meta.lang", "meta.depth", "ok", "tags", "nope.x"],
        keep_cols=["doc_id"]).to_pandas().set_index("doc_id")
    assert got.loc[1].tolist() == ["7", "en", "2", "true", None,
                                   None]
    assert got.loc[2].tolist() == ["8", "de", None, "false", None,
                                   None]
    assert got.loc[3, "meta_lang"] is None     # non-dict intermediate
    assert got.loc[3, "tags"] == "[1,2]"       # compact nested
    assert got.loc[4].tolist() == [None] * 6   # malformed
    assert got.loc[5].tolist() == [None] * 6   # null payload


def test_grouped_outliers_matches_oracle(ray_session):
    """grouped_outliers ≡ the numpy population-std oracle; singleton
    and zero-variance groups null out."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.relational import grouped_outliers

    rows = []
    rid = 0
    for g, vals in [("a", [10, 11, 9, 10, 12, 50]),    # 50 = outlier
                    ("b", [5, 5, 5, 5]),               # zero variance
                    ("c", [7]),                        # singleton
                    ("d", [0, 100])]:
        for v in vals:
            rows.append((rid, g, v))
            rid += 1
    df = pd.DataFrame(rows, columns=["id", "key", "val"])

    got = grouped_outliers(rd.from_pandas(df).repartition(3),
                           "key", "val", "id", z_thresh=2.0) \
        .to_pandas().set_index("id").sort_index()
    assert len(got) == len(df)
    for g in ("a", "b", "c", "d"):
        vals = df[df["key"] == g]["val"].to_numpy(float)
        mean, std = vals.mean(), vals.std()
        for _, r in df[df["key"] == g].iterrows():
            row = got.loc[r["id"]]
            if len(vals) <= 1 or std == 0:
                assert pd.isna(row["z"]) and row["is_outlier"] == 0
            else:
                z = (r["val"] - mean) / std
                assert abs(row["z"] - z) < 1e-9
                assert row["is_outlier"] == int(abs(z) > 2.0)
    assert got[got["is_outlier"] == 1].index.tolist() == [5]


def test_kfold_assign_balanced_and_deterministic(ray_session):
    """kfold_assign: ±1 balance per stratum, hash-rank replay,
    repartition-stable."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from omop2obo_ray.pipelines.relational import kfold_assign

    df = pd.DataFrame({
        "id": range(100),
        "label": ["x" if i % 3 else "y" for i in range(100)]})

    got = kfold_assign(rd.from_pandas(df).repartition(4), 5,
                       id_col="id", strata_col="label").to_pandas()
    assert len(got) == 100 and set(got["fold"]) == set(range(5))
    for lab, g in got.groupby("label"):
        counts = g["fold"].value_counts()
        assert counts.max() - counts.min() <= 1, lab

    # replay: within stratum, rank by (hash, id) % 5
    want = {}
    for lab, g in df.groupby("label"):
        ids = g["id"].to_numpy(np.int64)
        h = (ids * np.int64(2654435761)) % np.int64(2**32)
        order = np.lexsort((ids, h))
        for r, idx in enumerate(order):
            want[ids[idx]] = r % 5
    assert {r["id"]: r["fold"] for _, r in got.iterrows()} == want

    got2 = kfold_assign(rd.from_pandas(df).repartition(7), 5,
                        id_col="id", strata_col="label").to_pandas()
    assert got.set_index("id")["fold"].to_dict() \
        == got2.set_index("id")["fold"].to_dict()

    with pytest.raises(ValueError, match="k must be"):
        kfold_assign(rd.from_pandas(df), 1, id_col="id")


def test_token_label_mi_matches_oracle(ray_session):
    """token_label_mi ≡ the pure-python doc-frequency PMI oracle."""
    import math

    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.curate import token_label_mi

    docs = [
        ("hello bonjour world", "en"),
        ("hello world again today", "en"),
        ("bonjour monde bonjour", "fr"),
        ("monde encore hello", "fr"),
        ("world today hello", "en"),
    ]
    df = pd.DataFrame(docs, columns=["text", "lang"])
    df["doc_id"] = range(len(df))
    N = len(docs)

    ntc, nt, nc = {}, {}, {}
    for text, lab in docs:
        nc[lab] = nc.get(lab, 0) + 1
        for t in {w for w in text.split() if len(w) >= 5}:
            ntc[(t, lab)] = ntc.get((t, lab), 0) + 1
            nt[t] = nt.get(t, 0) + 1

    got = token_label_mi(rd.from_pandas(df).repartition(2),
                         min_len=5, min_count=2).to_pandas() \
        .set_index(["token", "label"])
    want = {k: v for k, v in ntc.items() if v >= 2}
    assert len(got) == len(want)
    for (t, lab), v in want.items():
        row = got.loc[(t, lab)]
        assert row["n_tc"] == v
        assert abs(row["mi"]
                   - math.log(v * N / (nt[t] * nc[lab]))) < 1e-12
    # 'monde' is a strong fr signal (2/2 fr docs, 0 en docs)
    assert got.loc[("monde", "fr"), "mi"] > 0


def test_cusum_flags_matches_recurrence(ray_session):
    """cusum_flags ≡ the literal Page recurrence replay."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.relational import cusum_flags

    rows = []
    vals = {"a": [10, 10, 14, 15, 16, 9, 10, 3, 2, 10],
            "b": [10] * 5}
    rid = 0
    for k, vs in vals.items():
        for t, v in enumerate(vs):
            rows.append((rid, k, t, v))
            rid += 1
    df = pd.DataFrame(rows, columns=["id", "key", "ts", "val"])

    got = cusum_flags(rd.from_pandas(df).repartition(3),
                      key_col="key", ts_col="ts", val_col="val",
                      id_col="id", target=10, threshold=5.0) \
        .to_pandas().set_index("id").sort_index()
    for k, vs in vals.items():
        sp = sn = 0.0
        sub = df[df["key"] == k].sort_values("ts")
        for _, r in sub.iterrows():
            d = r["val"] - 10
            sp = max(0.0, sp + d)
            sn = min(0.0, sn + d)
            row = got.loc[r["id"]]
            assert abs(row["cusum_pos"] - sp) < 1e-12, r["id"]
            assert abs(row["cusum_neg"] - sn) < 1e-12
            assert row["flag"] == int(sp > 5.0 or sn < -5.0)
    # the planted drift up (14,15,16) alarms from id 3 and stays
    # elevated until the crash (3,2), which alarms the negative side
    assert got[got["flag"] == 1].index.tolist() == [3, 4, 5, 6, 7,
                                                    8, 9]


def test_er_eval_matches_oracle(ray_session):
    """er_eval ≡ hand-computed pairwise P/R on planted clusters."""
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.curate import er_eval

    # clusters: {1,2,3}, {4,5}, {6}  → pp = 3 + 1 + 0 = 4
    adf = pd.DataFrame({"node": [1, 2, 3, 4, 5, 6],
                        "cluster": [1, 1, 1, 4, 4, 6]})
    # gold: (1,2) TP, (2,3) TP, (4,5) TP, (1,4) FN-only,
    # (7,8) both-missing FN
    gdf = pd.DataFrame({"a": [1, 2, 4, 1, 7],
                        "b": [2, 3, 5, 4, 8]})
    got = er_eval(rd.from_pandas(adf).repartition(2),
                  rd.from_pandas(gdf).repartition(2)).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert r["tp"] == 3 and r["predicted_pairs"] == 4 \
        and r["gold_pairs"] == 5
    assert abs(r["precision"] - 3 / 4) < 1e-12
    assert abs(r["recall"] - 3 / 5) < 1e-12
    p, q = 3 / 4, 3 / 5
    assert abs(r["f1"] - 2 * p * q / (p + q)) < 1e-12


def test_calibration_bins_matches_oracle(ray_session):
    """calibration_bins ≡ the numpy binning oracle (boundary scores
    land per IEEE floor, empty bins absent)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.relational import calibration_bins

    rng = np.random.RandomState(3)
    s = np.r_[rng.uniform(0, 1, 200), [0.0, 1.0, 0.3, 0.999]]
    y = (rng.uniform(0, 1, len(s)) < s).astype(int)  # calibrated-ish
    df = pd.DataFrame({"score": s, "label": y})

    b = np.minimum(np.floor(s * 10).astype(int), 9)
    got = calibration_bins(rd.from_pandas(df).repartition(3),
                           score_col="score", label_col="label") \
        .to_pandas().set_index("bin").sort_index()
    assert set(got.index) == set(np.unique(b))
    for bb in np.unique(b):
        m = b == bb
        assert got.loc[bb, "n"] == m.sum()
        assert abs(got.loc[bb, "mean_score"] - s[m].mean()) < 1e-9
        assert abs(got.loc[bb, "frac_pos"] - y[m].mean()) < 1e-12
        assert abs(got.loc[bb, "gap"]
                   - abs(y[m].mean() - s[m].mean())) < 1e-9
    # score 1.0 clamps into bin 9
    assert got.loc[9, "n"] >= 2


def test_readability_scores_matches_oracle(ray_session):
    """readability_scores ≡ the regex-count replay; empty text nulls."""
    import re

    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.curate import readability_scores

    texts = ["The cat sat. The dog ran! Did it?",
             "Incomprehensibility notwithstanding, antidisestablishmentarianism perseveres.",
             "no punctuation here at all",
             ""]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = readability_scores(rd.from_pandas(df).repartition(2)) \
        .to_pandas().set_index("doc_id")
    for i, t in enumerate(texts):
        w = len(re.findall(r"\S+", t))
        s = len(re.findall(r"[.!?]+", t))
        sy = len(re.findall(r"[aeiouy]+", t.lower()))
        assert got.loc[i, "n_words"] == w
        assert got.loc[i, "n_sentences"] == s
        assert got.loc[i, "n_syllables"] == sy
        if w:
            fk = 0.39 * (w / max(s, 1)) + 11.8 * (sy / w) - 15.59
            assert abs(got.loc[i, "fk_grade"] - fk) < 1e-12
        else:
            assert pd.isna(got.loc[i, "fk_grade"])
    # long latinate words score much harder than the cat sentence
    assert got.loc[1, "fk_grade"] > got.loc[0, "fk_grade"] + 5


def test_classifier_eval_matches_sklearn_conventions(ray_session):
    """classifier_eval ≡ hand confusion incl. zero-division classes."""
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.curate import classifier_eval

    preds = ["a", "a", "a", "b", "b", "c", "a"]
    golds = ["a", "a", "b", "b", "b", "b", "d"]
    df = pd.DataFrame({"pred": preds, "gold": golds})
    got = classifier_eval(rd.from_pandas(df).repartition(3)) \
        .to_pandas().set_index("label")
    assert set(got.index) == {"a", "b", "c", "d"}
    a = got.loc["a"]
    assert (a["tp"], a["fp"], a["fn"]) == (2, 2, 0)
    assert abs(a["precision"] - 0.5) < 1e-12 and a["recall"] == 1.0
    b = got.loc["b"]
    assert (b["tp"], b["fp"], b["fn"]) == (2, 0, 2)
    c = got.loc["c"]            # predicted once, never gold
    assert (c["tp"], c["fp"], c["fn"]) == (0, 1, 0)
    assert c["precision"] == 0.0 and c["recall"] == 0.0 \
        and c["f1"] == 0.0
    d = got.loc["d"]            # gold once, never predicted
    assert (d["tp"], d["fp"], d["fn"], d["support"]) == (0, 0, 1, 1)


def test_ndcg_at_k_matches_oracle(ray_session):
    """ndcg_at_k ≡ the textbook replay: graded rels, unjudged
    retrieved docs, relevant-but-unretrieved docs, empty-qrel query."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.curate import ndcg_at_k

    runs = [(1, 10, 0.9), (1, 11, 0.8), (1, 12, 0.7), (1, 13, 0.6),
            (2, 20, 0.5), (2, 21, 0.4),
            (3, 30, 0.3)]
    qrels = [(1, 10, 3), (1, 12, 1), (1, 99, 2),   # 99 not retrieved
             (2, 21, 2)]
    rdf = pd.DataFrame(runs, columns=["qid", "doc_id", "score"])
    qdf = pd.DataFrame(qrels, columns=["qid", "doc_id", "rel"])

    got = ndcg_at_k(rd.from_pandas(rdf).repartition(2),
                    rd.from_pandas(qdf).repartition(2), k=3) \
        .to_pandas().set_index("qid").sort_index()

    rel_by = {}
    for q_, d_, r_ in qrels:
        rel_by[(q_, d_)] = r_
    for qid in (1, 2, 3):
        rr = sorted([x for x in runs if x[0] == qid],
                    key=lambda x: (-x[2], x[1]))[:3]
        rels = [rel_by.get((qid, d), 0) for _, d, _ in rr]
        dcg = sum(r / np.log2(i + 2) for i, r in enumerate(rels))
        ideal = sorted([r for (q_, _), r in rel_by.items()
                        if q_ == qid], reverse=True)[:3]
        idcg = sum(r / np.log2(i + 2) for i, r in enumerate(ideal))
        ndcg = dcg / idcg if idcg else 0.0
        assert abs(got.loc[qid, "dcg"] - dcg) < 1e-12, qid
        assert abs(got.loc[qid, "idcg"] - idcg) < 1e-12
        assert abs(got.loc[qid, "ndcg"] - ndcg) < 1e-12
    assert got.loc[3, "ndcg"] == 0.0


def test_mrr_at_k_matches_oracle(ray_session):
    """mrr_at_k: first-relevant rank within the window, null past k."""
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.curate import mrr_at_k

    runs = [(1, 10, 0.9), (1, 11, 0.8), (1, 12, 0.7),
            (2, 20, 0.9), (2, 21, 0.8), (2, 22, 0.7), (2, 23, 0.6),
            (3, 30, 0.5)]
    qrels = [(1, 11, 2), (2, 23, 1), (3, 99, 3)]
    rdf = pd.DataFrame(runs, columns=["qid", "doc_id", "score"])
    qdf = pd.DataFrame(qrels, columns=["qid", "doc_id", "rel"])

    got = mrr_at_k(rd.from_pandas(rdf).repartition(2),
                   rd.from_pandas(qdf).repartition(2), k=3) \
        .to_pandas().set_index("qid").sort_index()
    assert got.loc[1, "first_rel_rank"] == 2 \
        and abs(got.loc[1, "rr"] - 0.5) < 1e-15
    # q2's only relevant doc ranks 4th — outside k=3
    assert pd.isna(got.loc[2, "first_rel_rank"]) \
        and got.loc[2, "rr"] == 0.0
    # q3's relevant doc was never retrieved
    assert pd.isna(got.loc[3, "first_rel_rank"]) \
        and got.loc[3, "rr"] == 0.0


def test_recall_at_k_matches_oracle(ray_session):
    """recall_at_k: hits in window over ALL relevants (retrieved or
    not); no-relevant queries report 0/0 → 0.0."""
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.curate import recall_at_k

    runs = [(1, 10, 0.9), (1, 11, 0.8), (1, 12, 0.7), (1, 13, 0.6),
            (2, 20, 0.5),
            (3, 30, 0.4)]
    qrels = [(1, 11, 1), (1, 13, 2), (1, 99, 1),  # 99 unretrieved
             (2, 20, 3)]
    got = recall_at_k(
        rd.from_pandas(pd.DataFrame(
            runs, columns=["qid", "doc_id", "score"])).repartition(2),
        rd.from_pandas(pd.DataFrame(
            qrels, columns=["qid", "doc_id", "rel"])).repartition(2),
        k=3).to_pandas().set_index("qid").sort_index()
    # q1: top-3 = 10,11,12 → hit 11 only; relevants = 11,13,99
    assert (got.loc[1, "hits"], got.loc[1, "n_rel"]) == (1, 3)
    assert abs(got.loc[1, "recall"] - 1 / 3) < 1e-15
    assert got.loc[2].tolist() == [1, 1, 1.0]
    assert got.loc[3].tolist() == [0, 0, 0.0]


def test_ap_at_k_matches_oracle(ray_session):
    """ap_at_k ≡ the textbook TREC replay."""
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.curate import ap_at_k

    runs = [(1, 10, 0.9), (1, 11, 0.8), (1, 12, 0.7), (1, 13, 0.6)]
    qrels = [(1, 10, 1), (1, 12, 2), (1, 99, 1)]
    got = ap_at_k(
        rd.from_pandas(pd.DataFrame(
            runs, columns=["qid", "doc_id", "score"])).repartition(2),
        rd.from_pandas(pd.DataFrame(
            qrels, columns=["qid", "doc_id", "rel"])).repartition(2),
        k=3).to_pandas().set_index("qid")
    # top-3: 10(rel), 11, 12(rel) → P@1=1, P@3=2/3; n_rel=3
    want = (1.0 + 2 / 3) / 3
    assert got.loc[1, "n_rel"] == 3
    assert abs(got.loc[1, "ap"] - want) < 1e-12


def test_gini_per_key_matches_oracle(ray_session):
    """gini_per_key ≡ the sorted-formula replay; uniform → 0,
    all-mass-on-one → (n-1)/n, singleton/zero-total → null."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.relational import gini_per_key

    rows = []
    data = {"uni": [5, 5, 5, 5], "one": [0, 0, 0, 12],
            "mix": [1, 2, 3, 10], "single": [7], "zero": [0, 0]}
    for k, vs in data.items():
        rows += [(k, v) for v in vs]
    df = pd.DataFrame(rows, columns=["key", "val"])

    got = gini_per_key(rd.from_pandas(df).repartition(3),
                       key_col="key", val_col="val") \
        .to_pandas().set_index("key")
    assert got.loc["uni", "gini"] == 0.0
    assert abs(got.loc["one", "gini"] - 3 / 4) < 1e-15
    x = np.sort(np.array(data["mix"]))
    i = np.arange(1, 5)
    want = np.sum((2 * i - 5) * x) / (4 * x.sum())
    assert abs(got.loc["mix", "gini"] - want) < 1e-15
    assert pd.isna(got.loc["single", "gini"])
    assert pd.isna(got.loc["zero", "gini"])
    assert got.loc["mix", "n"] == 4 and got.loc["mix", "total"] == 16


def test_bag_set_op_matches_sql_all_semantics(ray_session):
    """bag_set_op ≡ DuckDB INTERSECT ALL / EXCEPT ALL."""
    import duckdb
    import pandas as pd
    import pytest
    import ray.data as rd

    from omop2obo_ray.pipelines.relational import bag_set_op

    l = pd.DataFrame({"a": [1, 1, 1, 2, 2, 3],
                      "b": ["x", "x", "y", "z", "z", "w"]})
    r = pd.DataFrame({"a": [1, 1, 2, 4],
                      "b": ["x", "x", "z", "q"]})
    con = duckdb.connect()
    con.register("l", l)
    con.register("r", r)
    for op, sql in (("intersect", "INTERSECT ALL"),
                    ("except", "EXCEPT ALL")):
        got = sorted(map(tuple, bag_set_op(
            rd.from_pandas(l).repartition(3),
            rd.from_pandas(r).repartition(2), op).to_pandas()
            .itertuples(index=False)))
        want = sorted(map(tuple, con.sql(
            f"SELECT * FROM l {sql} SELECT * FROM r").df()
            .itertuples(index=False)))
        assert got == want, op
    with pytest.raises(ValueError, match="unknown op"):
        bag_set_op(rd.from_pandas(l), rd.from_pandas(r), "union")


def test_mad_outliers_matches_oracle(ray_session):
    """mad_outliers ≡ the Iglewicz-Hoaglin replay; MAD robustness
    shown where mean/std would miss the outlier."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.relational import mad_outliers

    rows, rid = [], 0
    data = {"a": [10, 10, 11, 9, 10, 300],  # 300 = wild outlier
            "b": [5, 5, 5, 5],              # MAD 0 → null
            "c": [7]}
    for k, vs in data.items():
        for v in vs:
            rows.append((rid, k, v)); rid += 1
    df = pd.DataFrame(rows, columns=["id", "key", "val"])

    got = mad_outliers(rd.from_pandas(df).repartition(3),
                       key_col="key", val_col="val", id_col="id",
                       z_thresh=3.5).to_pandas() \
        .set_index("id").sort_index()
    v = np.array(data["a"], float)
    med = np.median(v); mad = np.median(np.abs(v - med))
    for i, x in enumerate(data["a"]):
        z = 0.6745 * (x - med) / mad
        assert abs(got.loc[i, "mad_z"] - z) < 1e-12
        assert got.loc[i, "is_outlier"] == int(abs(z) > 3.5)
    assert got.loc[5, "is_outlier"] == 1          # the 300
    assert got[got["key"] == "b"]["mad_z"].isna().all()
    assert pd.isna(got.loc[10, "mad_z"])          # singleton c


def test_ks_drift_matches_scipy_convention(ray_session):
    """ks_drift ≡ the ECDF-max replay (and scipy where available)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.relational import ks_drift

    rng = np.random.RandomState(11)
    a = rng.randint(0, 40, 300)
    b = rng.randint(10, 50, 200)   # shifted distribution
    got = ks_drift(
        rd.from_pandas(pd.DataFrame({"v": a})).repartition(3),
        rd.from_pandas(pd.DataFrame({"v": b})).repartition(2)) \
        .to_pandas().iloc[0]
    vals = np.unique(np.r_[a, b])
    e1 = np.searchsorted(np.sort(a), vals, side="right") / len(a)
    e2 = np.searchsorted(np.sort(b), vals, side="right") / len(b)
    want = np.max(np.abs(e1 - e2))
    assert got["n1"] == 300 and got["n2"] == 200
    assert abs(got["d_stat"] - want) < 1e-12
    try:
        from scipy.stats import ks_2samp
        assert abs(got["d_stat"] - ks_2samp(a, b).statistic) < 1e-12
    except ImportError:
        pass
    # identical samples → D = 0
    same = ks_drift(
        rd.from_pandas(pd.DataFrame({"v": a})).repartition(2),
        rd.from_pandas(pd.DataFrame({"v": a})).repartition(3)) \
        .to_pandas().iloc[0]
    assert same["d_stat"] == 0.0


def test_psi_drift_matches_oracle(ray_session):
    """psi_drift ≡ the textbook replay; skipped-bin accounting."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.relational import psi_drift

    a = [0] * 50 + [1] * 30 + [2] * 20 + [9] * 5   # 9 only in a
    b = [0] * 30 + [1] * 40 + [2] * 30 + [7] * 10  # 7 only in b
    got = psi_drift(
        rd.from_pandas(pd.DataFrame({"v": a})).repartition(3),
        rd.from_pandas(pd.DataFrame({"v": b})).repartition(2)) \
        .to_pandas().iloc[0]
    n1, n2 = len(a), len(b)
    psi = 0.0
    for v in (0, 1, 2):
        p1 = a.count(v) / n1
        p2 = b.count(v) / n2
        psi += (p1 - p2) * np.log(p1 / p2)
    assert (got["n1"], got["n2"]) == (n1, n2)
    assert got["n_bins"] == 5 and got["n_skipped"] == 2
    assert abs(got["psi"] - psi) < 1e-12


def test_vocab_overlap_matches_oracle(ray_session):
    """vocab_overlap ≡ the set-arithmetic replay."""
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.curate import vocab_overlap

    l = pd.DataFrame({"text": ["alpha beta gamma", "beta delta"]})
    r = pd.DataFrame({"text": ["beta gamma epsilon",
                               "zeta beta epsilon"]})
    sl = {"alpha", "beta", "gamma", "delta"}
    sr = {"beta", "gamma", "epsilon", "zeta"}
    got = vocab_overlap(rd.from_pandas(l).repartition(2),
                        rd.from_pandas(r).repartition(2)) \
        .to_pandas().iloc[0]
    assert (got["vocab1"], got["vocab2"]) == (len(sl), len(sr))
    assert got["shared"] == len(sl & sr)
    assert abs(got["jaccard"] - len(sl & sr) / len(sl | sr)) < 1e-15
    assert abs(got["containment_1in2"]
               - len(sl & sr) / len(sl)) < 1e-15


def test_js_divergence_matches_oracle(ray_session):
    """js_divergence ≡ the textbook replay incl. one-sided bins;
    bounded by ln 2; identical samples → 0."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.relational import js_divergence

    a = [0] * 50 + [1] * 30 + [9] * 20     # 9 only in a
    b = [0] * 30 + [1] * 60 + [7] * 10     # 7 only in b
    got = js_divergence(
        rd.from_pandas(pd.DataFrame({"v": a})).repartition(3),
        rd.from_pandas(pd.DataFrame({"v": b})).repartition(2)) \
        .to_pandas().iloc[0]
    vals = sorted(set(a) | set(b))
    p = np.array([a.count(v) for v in vals]) / len(a)
    q = np.array([b.count(v) for v in vals]) / len(b)
    m = 0.5 * (p + q)
    want = 0.5 * sum(x * np.log(x / y) for x, y in zip(p, m) if x) \
        + 0.5 * sum(x * np.log(x / y) for x, y in zip(q, m) if x)
    assert got["n_bins"] == 4
    assert abs(got["jsd"] - want) < 1e-12
    assert 0.0 < got["jsd"] <= np.log(2)

    same = js_divergence(
        rd.from_pandas(pd.DataFrame({"v": a})).repartition(2),
        rd.from_pandas(pd.DataFrame({"v": a})).repartition(3)) \
        .to_pandas().iloc[0]
    assert same["jsd"] == 0.0


def test_cramers_v_matches_scipy_convention(ray_session):
    """cramers_v ≡ the contingency replay (zero cells included) and
    scipy where available."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.relational import cramers_v

    rng = np.random.RandomState(5)
    a = rng.choice(["x", "y", "z"], 300)
    # b correlated with a, plus a level never seen with z
    b = np.where(a == "x",
                 rng.choice(["p", "q"], 300, p=[0.8, 0.2]),
                 rng.choice(["q", "r"], 300, p=[0.6, 0.4]))
    df = pd.DataFrame({"a": a, "b": b})
    got = cramers_v(rd.from_pandas(df).repartition(3),
                    a_col="a", b_col="b").to_pandas().iloc[0]

    tab = pd.crosstab(df["a"], df["b"]).to_numpy(float)
    n = tab.sum()
    e = np.outer(tab.sum(1), tab.sum(0)) / n
    chi2 = float(((tab - e) ** 2 / e).sum())
    v = np.sqrt(chi2 / (n * min(tab.shape[0] - 1,
                                tab.shape[1] - 1)))
    assert got["n"] == 300 and got["r"] == 3 and got["c"] == 3
    assert abs(got["chi2"] - chi2) < 1e-9
    assert abs(got["v"] - v) < 1e-12
    try:
        from scipy.stats import chi2_contingency
        assert abs(got["chi2"]
                   - chi2_contingency(tab, correction=False)[0]) < 1e-9
    except ImportError:
        pass


def test_spearman_per_key_matches_rank_oracle(ray_session):
    """spearman_per_key ≡ Pearson-on-average-ranks replay (ties
    included; scipy absent in this container)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.relational import spearman_per_key

    rng = np.random.RandomState(9)
    rows = []
    for key, n in (("a", 40), ("b", 25)):
        x = rng.randint(0, 10, n)           # ties guaranteed
        y = x * 3 + rng.randint(0, 5, n)    # monotone-ish + noise
        rows += [(key, int(xi), int(yi)) for xi, yi in zip(x, y)]
    rows += [("c", 1, 1)]                   # singleton → null
    rows += [("d", 2, 5), ("d", 2, 7)]      # constant x → null
    df = pd.DataFrame(rows, columns=["key", "x", "y"])

    got = spearman_per_key(rd.from_pandas(df).repartition(3),
                           key_col="key", x_col="x", y_col="y") \
        .to_pandas().set_index("key")
    for key in ("a", "b"):
        sub = df[df["key"] == key]
        rx = sub["x"].rank(method="average").to_numpy(float)
        ry = sub["y"].rank(method="average").to_numpy(float)
        want = np.corrcoef(rx, ry)[0, 1]
        assert abs(got.loc[key, "rho"] - want) < 1e-12, key
        assert got.loc[key, "rho"] > 0.8       # monotone-ish signal
    assert pd.isna(got.loc["c", "rho"])
    assert pd.isna(got.loc["d", "rho"])


def test_entropy_per_key_matches_oracle(ray_session):
    """entropy_per_key ≡ -Σ p ln p replay; uniform = ln k, point
    mass = 0."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.relational import entropy_per_key

    rows = []
    data = {"uni": ["a", "b", "c", "d"] * 5,
            "point": ["z"] * 7,
            "mix": ["x"] * 6 + ["y"] * 3 + ["w"]}
    for k, vs in data.items():
        rows += [(k, v) for v in vs]
    df = pd.DataFrame(rows, columns=["key", "val"])

    got = entropy_per_key(rd.from_pandas(df).repartition(3),
                          key_col="key", val_col="val") \
        .to_pandas().set_index("key")
    assert abs(got.loc["uni", "entropy"] - np.log(4)) < 1e-12
    assert got.loc["point", "entropy"] == 0.0
    c = np.array([6, 3, 1], float) / 10
    assert abs(got.loc["mix", "entropy"]
               - (-np.sum(c * np.log(c)))) < 1e-12
    assert got.loc["mix", "n_distinct"] == 3 \
        and got.loc["mix", "n"] == 10


def test_alias_table_matches_counts(ray_session):
    """alias_table ≡ pandas count/total/prior replay, lowercased,
    empties dropped, min_count cutting pairs but not totals."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.graph import alias_table

    e = pd.DataFrame({
        "anchor_text": ["Paris", "paris", "paris", "click here",
                        "click here", "", "ville lumiere"],
        "dst": ["e1", "e1", "e2", "e1", "e3", "e9", "e1"]})
    got = (alias_table(rd.from_pandas(e).repartition(3), min_count=2)
           .to_pandas().sort_values(["mention", "dst"])
           .reset_index(drop=True))
    # paris: e1 n=2 total=3 p=2/3 (e2 cut by min_count but counted
    # in total); click here: both n=1, cut; ville lumiere n=1 cut
    assert got["mention"].tolist() == ["paris"]
    assert got["dst"].tolist() == ["e1"]
    assert got["n"].tolist() == [2]
    assert got["total"].tolist() == [3]
    assert abs(got["p"].iloc[0] - 2 / 3) < 1e-12

    got_all = (alias_table(rd.from_pandas(e).repartition(3))
               .to_pandas())
    assert len(got_all) == 5  # (paris,e1),(paris,e2),(ch,e1),(ch,e3),(vl,e1)
    assert int(got_all["n"].sum()) == 6  # empty mention dropped


def test_mode_per_key_deterministic_tiebreak(ray_session):
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.relational import mode_per_key

    df = pd.DataFrame({
        "k": [1, 1, 1, 2, 2, 3],
        "v": ["b", "a", "b", "z", "a", "q"]})
    got = (mode_per_key(rd.from_pandas(df).repartition(3), "k", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert got["mode"].tolist() == ["b", "a", "q"]  # tie 2: lex min
    assert got["n"].tolist() == [2, 1, 1]


def test_merge_intervals_matches_oracle(ray_session):
    """merge_intervals ≡ brute-force sweep, closed and open
    conventions, across multi-block input."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.relational import merge_intervals

    rng = np.random.RandomState(3)
    rows = []
    for k in range(6):
        for _ in range(40):
            s = int(rng.randint(0, 200))
            rows.append({"k": k, "s": s, "e": s + int(rng.randint(0, 15))})
    df = pd.DataFrame(rows)

    def brute(g, closed):
        ivs = sorted(zip(g["s"], g["e"]))
        out = []
        for s, e in ivs:
            if out and (s <= out[-1][1] if closed else s < out[-1][1]):
                out[-1][1] = max(out[-1][1], e)
                out[-1][2] += 1
            else:
                out.append([s, e, 1])
        return out

    for closed in (True, False):
        got = (merge_intervals(rd.from_pandas(df).repartition(5),
                               key_col="k", start_col="s",
                               end_col="e", closed=closed)
               .to_pandas().sort_values(["k", "start"])
               .reset_index(drop=True))
        want = []
        for k, g in df.groupby("k"):
            for s, e, n in brute(g, closed):
                want.append((k, s, e, n))
        want = pd.DataFrame(want, columns=["k", "start", "end",
                                           "n_merged"])
        pd.testing.assert_frame_equal(
            got, want.sort_values(["k", "start"])
            .reset_index(drop=True), check_dtype=False)


def test_normalize_unicode_matches_unicodedata(ray_session):
    """normalize_unicode ≡ python unicodedata over combining marks,
    precomposed chars and NFKC compatibility forms."""
    import unicodedata

    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.curate import normalize_unicode

    texts = ["café", "éclair", "Åmstrong",
             "ﬁne ①", "plain ascii", ""]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    for form in ("NFC", "NFKC"):
        got = (normalize_unicode(rd.from_pandas(df).repartition(2),
                                 form=form, out_col="norm")
               .to_pandas().sort_values("doc_id"))
        want = [unicodedata.normalize(form, t) for t in texts]
        assert got["norm"].tolist() == want
    import pytest

    with pytest.raises(ValueError, match="unknown form"):
        normalize_unicode(rd.from_pandas(df), form="NFX")


def test_hearst_patterns_extraction(ray_session):
    """hearst_patterns finds all three pattern families, all matches
    per doc, correct hypernym/hyponym orientation, counts merged
    across blocks."""
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.curate import hearst_patterns

    docs = pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": [
        "Metals such as iron are heavy. Metals such as iron rust.",
        "tools including hammers help",
        "cats and other animals sleep",
        "nothing to see here"]})
    got = (hearst_patterns(rd.from_pandas(docs).repartition(3))
           .to_pandas()
           .sort_values(["hypernym", "hyponym"])
           .reset_index(drop=True))
    rows = {(r.hypernym, r.hyponym, r.pattern): r.n
            for r in got.itertuples()}
    assert rows == {
        ("metals", "iron", "such_as"): 2,
        ("tools", "hammers", "including"): 1,
        ("animals", "cats", "and_other"): 1}


def test_rouge_n_matches_reference_impl(ray_session):
    """rouge_n ≡ a direct clipped-multiset replay (bigram), incl.
    short docs, one-sided ids and zero denominators."""
    import re
    from collections import Counter

    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.curate import rouge_n

    cands = pd.DataFrame({"doc_id": [1, 2, 3, 5], "text": [
        "the cat sat on the mat",
        "a b a b a", "short", "only in cand side"]})
    refs = pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": [
        "the cat sat on a mat today",
        "a b a", "tiny", "only in ref side"]})
    got = (rouge_n(rd.from_pandas(cands).repartition(2),
                   rd.from_pandas(refs).repartition(2))
           .to_pandas().set_index("doc_id").sort_index())

    def grams(t):
        toks = re.findall(r"[a-z0-9]+", t.lower())
        return Counter(" ".join(toks[j:j + 2])
                       for j in range(len(toks) - 1))

    for i in [1, 2]:
        c, r = grams(cands.set_index("doc_id").loc[i, "text"]), \
            grams(refs.set_index("doc_id").loc[i, "text"])
        ov = sum((c & r).values())
        nc, nr = sum(c.values()), sum(r.values())
        assert got.loc[i, "n_overlap"] == ov
        assert got.loc[i, "precision"] == ov / nc
        assert got.loc[i, "recall"] == ov / nr
    # doc 3: both sides single-token -> zero grams both sides
    assert got.loc[3, ["n_cand", "n_ref", "f1"]].tolist() == [0, 0, 0]
    # one-sided ids
    assert got.loc[4, "n_cand"] == 0 and got.loc[4, "n_ref"] == 3
    assert got.loc[5, "n_ref"] == 0 and got.loc[5, "precision"] == 0.0


def test_bleu_score_matches_reference_impl(ray_session):
    """bleu_score ≡ direct Papineni replay (BLEU-2, no smoothing):
    clipped precisions, brevity penalty, zero-p convention."""
    import math
    import re
    from collections import Counter

    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.curate import bleu_score

    cands = pd.DataFrame({"doc_id": [1, 2, 3], "text": [
        "the cat sat on the mat",
        "completely different words here",
        "short one"]})
    refs = pd.DataFrame({"doc_id": [1, 2, 3], "text": [
        "the cat sat on a mat today please",
        "nothing shared at all friend",
        "short one exactly"]})
    got = (bleu_score(rd.from_pandas(cands).repartition(2),
                      rd.from_pandas(refs).repartition(2))
           .to_pandas().set_index("doc_id").sort_index())

    def replay(ct, rt):
        c = re.findall(r"[a-z0-9]+", ct.lower())
        r = re.findall(r"[a-z0-9]+", rt.lower())
        ps = []
        for n in (1, 2):
            cg = Counter(tuple(c[j:j + n]) for j in range(len(c) - n + 1))
            rg = Counter(tuple(r[j:j + n]) for j in range(len(r) - n + 1))
            tot = sum(cg.values())
            ov = sum((cg & rg).values())
            ps.append(ov / tot if tot else 0.0)
        bp = 1.0 if len(c) >= len(r) else math.exp(1 - len(r) / len(c))
        bleu = (bp * math.exp(sum(math.log(p) for p in ps) / 2)
                if all(p > 0 for p in ps) else 0.0)
        return ps, bp, bleu

    for i in (1, 2, 3):
        ps, bp, bleu = replay(cands.set_index("doc_id").loc[i, "text"],
                              refs.set_index("doc_id").loc[i, "text"])
        assert abs(got.loc[i, "p1"] - ps[0]) < 1e-12
        assert abs(got.loc[i, "p2"] - ps[1]) < 1e-12
        assert abs(got.loc[i, "bp"] - bp) < 1e-12
        assert abs(got.loc[i, "bleu"] - bleu) < 1e-12
    assert got.loc[2, "bleu"] == 0.0  # no shared grams


def test_profile_table_matches_duckdb(ray_session):
    """profile_table ≡ DuckDB count/count-distinct/varchar-extrema
    over a frame with nulls and multi-block layout."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.relational import profile_table

    df = pd.DataFrame({
        "a": [1, 2, 2, None, 10, 9],
        "b": ["x", None, "y", "x", None, "z"],
        "c": [5, 5, 5, 5, 5, 5]})
    got = (profile_table(rd.from_pandas(df).repartition(3),
                         ["a", "b", "c"])
           .to_pandas().set_index("column").sort_index())
    con = duckdb.connect()
    con.register("t", df)
    for c in ["a", "b", "c"]:
        w = con.execute(
            f"SELECT count(*) AS n, "
            f"count(*) - count({c}) AS n_null, "
            f"count(DISTINCT {c}) AS nd, "
            f"min(CAST({c} AS VARCHAR)) AS mn, "
            f"max(CAST({c} AS VARCHAR)) AS mx FROM t").df().iloc[0]
        assert got.loc[c, "n"] == w["n"]
        assert got.loc[c, "n_null"] == w["n_null"]
        assert got.loc[c, "n_distinct"] == w["nd"]
        # engine str-casts floats (pandas nullable) — compare as
        # canonicalized numerics for column a
        if c == "b":
            assert got.loc[c, ["min_val", "max_val"]].tolist() == \
                [w["mn"], w["mx"]]


def test_dataset_diff_multi_key(ray_session):
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.relational import dataset_diff

    old = pd.DataFrame({"s": ["a", "a", "b"], "p": ["x", "y", "x"],
                        "extra": [1, 2, 3]})
    new = pd.DataFrame({"s": ["a", "c", "a"], "p": ["x", "z", "x"],
                        "extra": [9, 9, 9]})  # dup (a,x) in new
    got = (dataset_diff(rd.from_pandas(old).repartition(2),
                        rd.from_pandas(new).repartition(2),
                        ["s", "p"])
           .to_pandas().sort_values(["s", "p"])
           .reset_index(drop=True))
    want = {("a", "x"): "kept", ("a", "y"): "removed",
            ("b", "x"): "removed", ("c", "z"): "added"}
    assert {(r.s, r.p): r.status for r in got.itertuples()} == want


def test_ab_proportion_test_matches_scipy_form(ray_session):
    """ab_proportion_test ≡ the pooled two-proportion z formula,
    incl. the control row itself (z = 0), degenerate pools and
    explicit control selection."""
    import math

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.relational import ab_proportion_test

    rng = np.random.RandomState(5)
    rows = []
    for arm, p, n in [("control", 0.10, 400), ("t1", 0.14, 380),
                      ("t2", 0.09, 420)]:
        conv = rng.binomial(1, p, n)
        rows.extend({"arm": arm, "converted": int(c)} for c in conv)
    df = pd.DataFrame(rows)
    got = (ab_proportion_test(rd.from_pandas(df).repartition(4))
           .to_pandas().set_index("arm"))

    cn = (df["arm"] == "control").sum()
    cc = df.loc[df["arm"] == "control", "converted"].sum()
    for arm in ["t1", "t2"]:
        n = (df["arm"] == arm).sum()
        conv = df.loc[df["arm"] == arm, "converted"].sum()
        pp = (conv + cc) / (n + cn)
        z = (conv / n - cc / cn) / math.sqrt(
            pp * (1 - pp) * (1 / n + 1 / cn))
        assert abs(got.loc[arm, "z"] - z) < 1e-12
        assert got.loc[arm, "n"] == n
    assert got.loc["control", "z"] == 0.0

    # degenerate: all-zero conversions -> z = 0
    dz = pd.DataFrame({"arm": ["a"] * 5 + ["b"] * 5,
                       "converted": [0] * 10})
    g2 = (ab_proportion_test(rd.from_pandas(dz)).to_pandas()
          .set_index("arm"))
    assert (g2["z"] == 0.0).all()


def test_gunzip_column_modes(ray_session):
    import gzip
    import zlib

    import pandas as pd
    import pytest
    import ray.data as rd

    from omop2obo_ray.pipelines.curate import gunzip_column

    body = b"<html>payload</html>"
    df = pd.DataFrame({"doc_id": [1, 2, 3, 4], "payload": [
        gzip.compress(body), zlib.compress(body * 2),
        b"not compressed", None]})
    got = (gunzip_column(rd.from_pandas(df).repartition(2))
           .to_pandas().set_index("doc_id").sort_index())
    assert got.loc[1, "payload"] == body
    assert got.loc[2, "payload"] == body * 2
    assert got.loc[3, "payload"] is None  # on_error='null'
    assert got.loc[4, "payload"] is None

    keep = (gunzip_column(rd.from_pandas(df), on_error="keep")
            .to_pandas().set_index("doc_id").sort_index())
    assert keep.loc[3, "payload"] == b"not compressed"
    with pytest.raises(Exception):
        gunzip_column(rd.from_pandas(df),
                      on_error="raise").to_pandas()


def test_cohens_kappa_matches_sklearn_formula(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.curate import cohens_kappa

    rng = np.random.RandomState(3)
    a = rng.choice(["x", "y", "z"], 300)
    agree_mask = rng.rand(300) < 0.7
    b = np.where(agree_mask, a, rng.choice(["x", "y", "z"], 300))
    df = pd.DataFrame({"label_a": a, "label_b": b})
    got = cohens_kappa(rd.from_pandas(df).repartition(4)).to_pandas()

    n = len(df)
    po = (a == b).mean()
    pe = sum(((a == l).sum() * (b == l).sum()) for l in "xyz") / n**2
    kappa = (po - pe) / (1 - pe)
    assert got["n"].iloc[0] == n
    assert abs(got["po"].iloc[0] - po) < 1e-12
    assert abs(got["kappa"].iloc[0] - kappa) < 1e-12

    # degenerate: both constant and equal -> pe = 1 -> kappa 0
    dz = pd.DataFrame({"label_a": ["k"] * 5, "label_b": ["k"] * 5})
    g2 = cohens_kappa(rd.from_pandas(dz)).to_pandas()
    assert g2["kappa"].iloc[0] == 0.0 and g2["po"].iloc[0] == 1.0


def test_transition_probs_matches_replay(ray_session):
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.relational import transition_probs

    ev = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2, 2, 2, 3],
        "ts": pd.to_datetime(
            ["2024-01-01 00:00", "2024-01-01 00:01",
             "2024-01-01 00:02", "2024-01-01 00:03",
             "2024-01-01 01:00", "2024-01-01 01:01",
             "2024-01-01 01:02", "2024-01-01 02:00"]),
        "event_id": range(8),
        "event_type": ["a", "b", "a", "c", "a", "b", "b", "a"]})
    got = (transition_probs(rd.from_pandas(ev).repartition(3))
           .to_pandas().sort_values(["cur", "nxt"])
           .reset_index(drop=True))
    # user1: a->b, b->a, a->c ; user2: a->b, b->b ; user3: none
    want = {("a", "b"): 2, ("a", "c"): 1, ("b", "a"): 1, ("b", "b"): 1}
    assert {(r.cur, r.nxt): r.n for r in got.itertuples()} == want
    a_total = got[got["cur"] == "a"]["total"].iloc[0]
    assert a_total == 3
    assert abs(got.set_index(["cur", "nxt"]).loc[("a", "b"), "p"]
               - 2 / 3) < 1e-12


def test_interarrival_stats_matches_replay(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.relational import interarrival_stats

    ev = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 3],
        "ts": pd.to_datetime(
            ["2024-01-01 00:00:00", "2024-01-01 00:00:10",
             "2024-01-01 00:01:10", "2024-01-01 05:00:00",
             "2024-01-01 05:00:07", "2024-01-02 00:00:00"]),
        "event_id": range(6)})
    got = (interarrival_stats(rd.from_pandas(ev).repartition(3))
           .to_pandas().set_index("user_id").sort_index())
    assert got.loc[1, "n_gaps"] == 2
    assert got.loc[1, "sum_s"] == 70
    assert got.loc[1, "sumsq_s"] == 10**2 + 60**2
    assert abs(got.loc[1, "mean_s"] - 35.0) < 1e-12
    var = (100 + 3600) / 2 - 35.0**2
    assert abs(got.loc[1, "std_s"] - np.sqrt(var)) < 1e-12
    assert got.loc[2, "n_gaps"] == 1 and got.loc[2, "sum_s"] == 7
    assert 3 not in got.index  # single event: no gap

    # tz-aware timestamps (ADVICE r4): naive-epoch subtraction raised
    # TypeError before; gaps are tz-invariant so results must match
    ev_tz = ev.assign(ts=ev["ts"].dt.tz_localize("UTC")
                      .dt.tz_convert("US/Pacific"))
    got_tz = (interarrival_stats(rd.from_pandas(ev_tz).repartition(3))
              .to_pandas().set_index("user_id").sort_index())
    pd.testing.assert_frame_equal(got_tz, got)


def test_lift_table_matches_replay(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from omop2obo_ray.pipelines.relational import lift_table

    rng = np.random.RandomState(1)
    n = 203  # non-multiple of bins: fat/thin bins exercised
    score = rng.rand(n)
    label = (rng.rand(n) < score).astype(int)  # higher score→pos
    df = pd.DataFrame({"score": score, "label": label})
    got = (lift_table(rd.from_pandas(df).repartition(4))
           .to_pandas().sort_values("bin").reset_index(drop=True))
    order = np.argsort(-score, kind="mergesort")
    sizes = np.full(10, n // 10)
    sizes[:n % 10] += 1
    start = 0
    base_rate = label.mean()
    for b in range(10):
        seg = label[order][start:start + sizes[b]]
        start += sizes[b]
        assert got.loc[b, "n"] == sizes[b]
        assert got.loc[b, "n_pos"] == seg.sum()
        assert abs(got.loc[b, "lift"]
                   - (seg.mean() / base_rate)) < 1e-12
    assert got.loc[0, "lift"] > got.loc[9, "lift"]  # monotone-ish
