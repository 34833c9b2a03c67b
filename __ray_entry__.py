"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``      — flagship KG pipeline over /root/testdata/sf0.001.
- ``queries()``    — one callable per implemented operator/pipeline
                     (SURVEY.md §2 + training-data ops), keyed by name.
- ``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible
                     query (same column names; floats rounded on both
                     sides). Hash-dependent ops (MinHash/SimHash dedup,
                     count-min heavy hitters, language-ID, IVF buckets)
                     run their gates in ``hash_mode='sql'`` — md5
                     arithmetic DuckDB replays exactly — and are
                     hash-checked. Only genuinely non-SQL-expressible
                     ops (the tiered KG pipeline, iterative training,
                     zlib, eigendecompositions) remain rows-only.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"


def _round_cols(ds, cols: dict[str, int]):
    import pyarrow as pa
    import pyarrow.compute as pc

    def rnd(batch: pa.Table) -> pa.Table:
        for c, nd in cols.items():
            i = batch.column_names.index(c)
            batch = batch.set_column(
                i, c, pc.round(batch[c], ndigits=nd, round_mode="half_to_even")
            )
        return batch

    return ds.map_batches(rnd, batch_format="pyarrow")


def entry() -> Any:
    """Flagship pipeline on sf0.001: documents-as-pages → tiered
    entity linking → (subj, pred, obj) triples."""
    from omop2obo_ray.pipelines.flagship import kg_over_documents

    return kg_over_documents(SF0001)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[str], Any]]:
    from omop2obo_ray.pipelines import relational as R

    def q_filter_threshold(sf):
        return _round_cols(R.q_filter_threshold(sf), {"avg_value": 6})

    def q_lineitem_agg(sf):
        return _round_cols(R.q_lineitem_agg(sf), {"revenue": 2})

    def q_window_tumbling(sf):
        return _round_cols(R.q_window_tumbling(sf), {"sum_value": 2})

    def q_token_stats(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import analyze_text

        docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return analyze_text(docs).select_columns(
            ["doc_id", "n_tokens_ws", "n_tokens_bpe", "stop_ratio"])

    def q_md5_fingerprint(sf):
        import hashlib

        import pyarrow as pa
        import ray.data as rd

        docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return docs.map_batches(
            lambda b: pa.table(
                {
                    "doc_id": b["doc_id"],
                    "fp": pa.array(
                        [hashlib.md5((t or "").encode()).hexdigest()
                         for t in b["text"].to_pylist()],
                        pa.string(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )

    def q_embedding_topk(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import brute_force_topk

        emb = rd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
        q0 = emb.filter(lambda r: r["vec_id"] == 0).take(1)[0]
        out = brute_force_topk(emb, [(0, list(q0["embedding"]))], k=10)
        return out[["vec_id", "cos"]]

    # ---- corpus-curation operators (curate.py) ----
    def q_pii_redact(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import pii_redact

        docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return pii_redact(docs)

    def q_repetition_stats(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import repetition_stats

        docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return repetition_stats(docs)

    def q_quality_filter(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import quality_filter

        docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return quality_filter(docs)

    def q_hash_sample(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import hash_sample

        docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return hash_sample(docs)

    def q_group_quantiles(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import group_quantiles

        li = rd.read_parquet(
            f"{sf}/lineitem.parquet", columns=["l_returnflag", "l_extendedprice"])
        return group_quantiles(li, "l_returnflag", "l_extendedprice")

    def q_source_stats(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import source_stats

        docs = rd.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text", "source"])
        return source_stats(docs)

    def q_normalize_text(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import normalize_text

        docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return normalize_text(docs)

    def q_histogram_quantile(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import histogram_quantile

        ev = rd.read_parquet(f"{sf}/events.parquet", columns=["user_id", "value"])
        return histogram_quantile(ev, "user_id", "value", width=20.0)

    def q_jaccard_pairs(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import jaccard_ngram_pairs

        docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return jaccard_ngram_pairs(docs, n=3, threshold=0.8, max_df=50)

    def q_containment_pairs(sf):
        # asymmetric excerpt/superset detection: directed pairs where
        # doc_a's 3-gram set is >= 60% covered by doc_b's
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import containment_ngram_pairs

        docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return containment_ngram_pairs(docs, n=3, threshold=0.6,
                                       max_df=50)

    def q_dup_span_stats(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import dup_span_stats

        docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return dup_span_stats(docs, n=5, min_df=2)

    def q_canonical_urls(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import canonicalize_urls, synth_urls

        docs = rd.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "source", "lang"])
        return canonicalize_urls(synth_urls(docs))

    def q_mention_contexts(sf):
        # KWIC evidence snippets: first occurrence per (doc, probe)
        # with a ±20-char window; substring semantics shared with
        # strpos (no token boundaries)
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import mention_contexts

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        return mention_contexts(docs, ["data", "web", "market"],
                                window=20)

    def q_blocked_hosts(sf):
        # domain-list filter over the synthetic CC urls: one blocked
        # registrable domain (catches the www subdomain) + one blocked
        # exact full host
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import (filter_blocked_hosts,
                                                   synth_urls)

        docs = rd.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "source", "lang"])
        return filter_blocked_hosts(
            synth_urls(docs),
            ["src3.example.com", "src7.example.com",
             "www.src11.example.com"]).select_columns(["doc_id"])

    def q_host_stats(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import (
            canonicalize_urls, host_stats, synth_urls)

        docs = rd.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "source", "lang"])
        return host_stats(canonicalize_urls(synth_urls(docs)))

    def q_stratified_sample(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import stratified_sample

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "source"])
        return stratified_sample(docs, group="source", key="doc_id", k=5)

    def q_tfidf_scores(sf):
        # same epsilon-floor quantized gate as pagerank (float sums +
        # ln(); full-precision scores stay on the operator)
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import tfidf_corpus_scores

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        scores = tfidf_corpus_scores(docs)

        def _q(batch: pa.Table) -> pa.Table:
            s = batch["score"].combine_chunks().to_numpy(zero_copy_only=False)
            q = np.floor(s * 1e4 + 1e-6).astype(np.int64)
            return pa.table({"doc_id": batch["doc_id"],
                             "token": batch["token"],
                             "score_q": pa.array(q, pa.int64())})

        return scores.map_batches(_q, batch_format="pyarrow",
                                  batch_size=None)

    def q_dedup_lines(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import dedup_lines_corpus

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        return dedup_lines_corpus(docs)

    def _lineitem_edges(sf):
        # order→part bipartite edge list, namespaced node ids (the
        # expression is a shared contract with the SQL oracle)
        import pandas as pd
        import ray.data as rd

        lin = rd.read_parquet(f"{sf}/lineitem.parquet",
                              columns=["l_orderkey", "l_partkey"])

        def _e(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "src": "o" + df["l_orderkey"].astype(str),
                "dst": "p" + df["l_partkey"].astype(str)})

        return lin.map_batches(_e, batch_format="pandas", batch_size=None)

    def q_pagerank(sf):
        # gate column: epsilon-shifted floor quantization to 1e-4.
        # The ranks are rationals that terminate in decimal, so they sit
        # EXACTLY on round()'s .5 boundaries; partition-order float
        # noise (~1e-15 relative) then flips round(…, k) run-to-run.
        # floor(x*1e4 + 1e-6) moves the decision boundary to
        # k - 1e-6 — a value these rational sums never come within
        # noise distance of. Same expression verbatim in the oracle.
        import numpy as np
        import pyarrow as pa

        from omop2obo_ray.pipelines.graph import pagerank

        ranks = pagerank(_lineitem_edges(sf), iterations=3, damping=0.85)

        def _q(batch: pa.Table) -> pa.Table:
            r = batch["rank"].combine_chunks().to_numpy(zero_copy_only=False)
            q = np.floor(r * 1e4 + 1e-6).astype(np.int64)
            return pa.table({"node": batch["node"],
                             "rank_q": pa.array(q, pa.int64())})

        return ranks.map_batches(_q, batch_format="pyarrow", batch_size=None)

    def q_label_propagation(sf):
        # 2-round synchronous label propagation over the symmetrized
        # order→part graph; labels are strings and the tie-break is
        # integer-count + lexicographic min, so the gate is exact (no
        # float quantization needed)
        from omop2obo_ray.pipelines.graph import label_propagation

        return label_propagation(_lineitem_edges(sf), iterations=2)

    def q_personalized_pagerank(sf):
        # 2-iteration PPR around a 3-order seed set over the
        # symmetrized order→part graph; same epsilon-floor quantizer
        # rationale as q_pagerank (noise ≪ the 1e-6 quantum shift)
        import numpy as np
        import pyarrow as pa

        from omop2obo_ray.pipelines.graph import personalized_pagerank

        ranks = personalized_pagerank(
            _lineitem_edges(sf), ["o1", "o2", "o3"], iterations=2,
            damping=0.85, undirected=True)

        def _q(batch: pa.Table) -> pa.Table:
            r = batch["rank"].combine_chunks().to_numpy(
                zero_copy_only=False)
            q = np.floor(r * 1e6 + 1e-6).astype(np.int64)
            return pa.table({"node": batch["node"],
                             "rank_q": pa.array(q, pa.int64())})

        return ranks.map_batches(_q, batch_format="pyarrow",
                                 batch_size=None)

    def q_degree_stats(sf):
        from omop2obo_ray.pipelines.graph import degree_stats

        return degree_stats(_lineitem_edges(sf))

    def q_taxonomy_rollup(sf):
        # mention counts (lineitem rows per part) rolled up the
        # implicit part taxonomy (parent = p_partkey // 2) — each
        # concept's total includes every descendant's count
        import ray.data as rd

        from omop2obo_ray.functions.shuffle import coarse_aggregate
        from omop2obo_ray.pipelines.graph import taxonomy_rollup

        li = rd.read_parquet(f"{sf}/lineitem.parquet",
                             columns=["l_partkey"])
        counts = coarse_aggregate(
            li, ["l_partkey"],
            lambda df: df.groupby("l_partkey", sort=False).size()
            .rename("n").reset_index()
            .rename(columns={"l_partkey": "concept"}))

        part = rd.read_parquet(f"{sf}/part.parquet",
                               columns=["p_partkey"])

        def to_edges(b):
            import pyarrow as pa
            k = b["p_partkey"].to_numpy(zero_copy_only=False)
            p = k // 2
            keep = (p >= 1) & (p != k)
            return pa.table({"child": pa.array(k[keep], pa.int64()),
                             "parent": pa.array(p[keep], pa.int64())})

        edges = part.map_batches(to_edges, batch_format="pyarrow",
                                 batch_size=None)
        return taxonomy_rollup(counts, edges)

    def q_match_bgp(sf):
        # SPARQL-core basic-graph-pattern match over a triple store
        # synthesized from the TPC-H geography: ?c in_nation ?n .
        # ?n in_region r1 . ?s in_nation ?n — a 3-pattern BGP with a
        # constant pushdown and a shared-variable star join. Bag
        # semantics on both sides (?c and ?s each bind EVERY in_nation
        # subject of the nation: customers and suppliers alike).
        import pandas as pd
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import match_bgp

        cust = rd.read_parquet(f"{sf}/customer.parquet",
                               columns=["c_custkey", "c_nationkey"])
        nat = rd.read_parquet(f"{sf}/nation.parquet",
                              columns=["n_nationkey", "n_regionkey"])
        supp = rd.read_parquet(f"{sf}/supplier.parquet",
                               columns=["s_suppkey", "s_nationkey"])

        def _t(skey, pred, okey, sp, op):
            def inner(df: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame({
                    "subj": sp + df[skey].astype(str),
                    "pred": pred,
                    "obj": op + df[okey].astype(str)})
            return inner

        triples = (
            cust.map_batches(_t("c_custkey", "in_nation", "c_nationkey",
                                "c", "n"), batch_format="pandas",
                             batch_size=None)
            .union(nat.map_batches(_t("n_nationkey", "in_region",
                                      "n_regionkey", "n", "r"),
                                   batch_format="pandas", batch_size=None))
            .union(supp.map_batches(_t("s_suppkey", "in_nation",
                                       "s_nationkey", "s", "n"),
                                    batch_format="pandas",
                                    batch_size=None)))
        return match_bgp(triples, [("?c", "in_nation", "?n"),
                                   ("?n", "in_region", "r1"),
                                   ("?s", "in_nation", "?n")])

    def q_bgp_optional(sf):
        # SPARQL OPTIONAL: suppliers with their nation, optionally the
        # nation's region — in_region triples exist only for
        # n_regionkey <> 0, so region-0 nations yield null ?r
        # (coalesced to 'none' on both sides: the hash gate must be
        # null-representation independent)
        import pandas as pd
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import match_bgp

        nat = rd.read_parquet(f"{sf}/nation.parquet",
                              columns=["n_nationkey", "n_regionkey"])
        supp = rd.read_parquet(f"{sf}/supplier.parquet",
                               columns=["s_suppkey", "s_nationkey"])

        def _supp(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "subj": "s" + df["s_suppkey"].astype(str),
                "pred": "in_nation",
                "obj": "n" + df["s_nationkey"].astype(str)})

        def _reg(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["n_regionkey"] != 0]
            return pd.DataFrame({
                "subj": "n" + df["n_nationkey"].astype(str),
                "pred": "in_region",
                "obj": "r" + df["n_regionkey"].astype(str)})

        triples = (supp.map_batches(_supp, batch_format="pandas",
                                    batch_size=None)
                   .union(nat.map_batches(_reg, batch_format="pandas",
                                          batch_size=None)))
        out = match_bgp(triples, [("?s", "in_nation", "?n")],
                        optional_patterns=[("?n", "in_region", "?r")])

        def _fill(df: pd.DataFrame) -> pd.DataFrame:
            df["r"] = df["r"].fillna("none")
            return df

        return out.map_batches(_fill, batch_format="pandas",
                               batch_size=None)

    def q_bgp_minus(sf):
        # SPARQL MINUS: customers with their nation, minus bindings
        # whose nation sits in region r0 (anti-join on ?n)
        import pandas as pd
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import match_bgp

        cust = rd.read_parquet(f"{sf}/customer.parquet",
                               columns=["c_custkey", "c_nationkey"])
        nat = rd.read_parquet(f"{sf}/nation.parquet",
                              columns=["n_nationkey", "n_regionkey"])

        def _c(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "subj": "c" + df["c_custkey"].astype(str),
                "pred": "in_nation",
                "obj": "n" + df["c_nationkey"].astype(str)})

        def _r(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "subj": "n" + df["n_nationkey"].astype(str),
                "pred": "in_region",
                "obj": "r" + df["n_regionkey"].astype(str)})

        triples = (cust.map_batches(_c, batch_format="pandas",
                                    batch_size=None)
                   .union(nat.map_batches(_r, batch_format="pandas",
                                          batch_size=None)))
        return match_bgp(triples, [("?c", "in_nation", "?n")],
                         minus_patterns=[("?n", "in_region", "r0")])

    def q_ego_subgraph(sf):
        # DESCRIBE-style 1-hop ball around nation n3 over the geo KG:
        # n3's own triple, plus every in_nation triple pointing AT n3
        import pandas as pd
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import ego_subgraph

        cust = rd.read_parquet(f"{sf}/customer.parquet",
                               columns=["c_custkey", "c_nationkey"])
        nat = rd.read_parquet(f"{sf}/nation.parquet",
                              columns=["n_nationkey", "n_regionkey"])

        def _c(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "subj": "c" + df["c_custkey"].astype(str),
                "pred": "in_nation",
                "obj": "n" + df["c_nationkey"].astype(str)})

        def _r(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "subj": "n" + df["n_nationkey"].astype(str),
                "pred": "in_region",
                "obj": "r" + df["n_regionkey"].astype(str)})

        triples = (cust.map_batches(_c, batch_format="pandas",
                                    batch_size=None)
                   .union(nat.map_batches(_r, batch_format="pandas",
                                          batch_size=None)))
        return ego_subgraph(triples, ["n3"], hops=1)

    def q_robots_filter(sf):
        # crawl-politeness gate over the synth_robots contract: the
        # REAL parser + longest-match matcher run on synthesized
        # robots.txt text; the oracle rebuilds the keep set by pure
        # arithmetic (blocked iff d%10 == (d%20)%7 and d%20 odd)
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import (
            filter_robots_disallowed, synth_robots)

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id"])
        pages, robots = synth_robots(docs)
        return filter_robots_disallowed(pages, robots)

    def q_rolling_window(sf):
        # frame-based window: 4-row rolling sum of value per user over
        # (ts, event_id) order; epsilon-floor quantized on both sides
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import rolling_window

        ev = rd.read_parquet(f"{sf}/events.parquet",
                             columns=["user_id", "event_id", "ts",
                                      "value"])
        out = rolling_window(ev, "user_id", ["ts", "event_id"],
                             "value", preceding=3)

        def _q(batch: pa.Table) -> pa.Table:
            r = batch["roll"].combine_chunks().to_numpy(
                zero_copy_only=False)
            return pa.table({
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "roll_q": pa.array(
                    np.floor(r * 1e4 + 1e-6).astype(np.int64))})

        return out.map_batches(_q, batch_format="pyarrow",
                               batch_size=None)

    def q_void_stats(sf):
        # VoID descriptor over the geo triple store: per-predicate
        # triple count + exact distinct subject/object counts
        import pandas as pd
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import kg_void_stats

        cust = rd.read_parquet(f"{sf}/customer.parquet",
                               columns=["c_custkey", "c_nationkey"])
        nat = rd.read_parquet(f"{sf}/nation.parquet",
                              columns=["n_nationkey", "n_regionkey"])
        supp = rd.read_parquet(f"{sf}/supplier.parquet",
                               columns=["s_suppkey", "s_nationkey"])

        def _t(skey, pred, okey, sp, op):
            def inner(df: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame({
                    "subj": sp + df[skey].astype(str),
                    "pred": pred,
                    "obj": op + df[okey].astype(str)})
            return inner

        triples = (
            cust.map_batches(_t("c_custkey", "in_nation", "c_nationkey",
                                "c", "n"), batch_format="pandas",
                             batch_size=None)
            .union(nat.map_batches(_t("n_nationkey", "in_region",
                                      "n_regionkey", "n", "r"),
                                   batch_format="pandas", batch_size=None))
            .union(supp.map_batches(_t("s_suppkey", "in_nation",
                                       "s_nationkey", "s", "n"),
                                    batch_format="pandas",
                                    batch_size=None)))
        return kg_void_stats(triples)

    def q_shacl_validate(sf):
        # SHACL-lite cardinality gate: every 7th customer gets a SECOND
        # in_nation edge (violates 1..1), every customer NOT divisible
        # by 3 lacks an email (violates has_email 1..); the shape
        # rules and the planted violations are pure doc_id arithmetic
        import pandas as pd
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import validate_shapes

        cust = rd.read_parquet(f"{sf}/customer.parquet",
                               columns=["c_custkey", "c_nationkey"])

        def _t(df: pd.DataFrame) -> pd.DataFrame:
            base = pd.DataFrame({
                "subj": "c" + df["c_custkey"].astype(str),
                "pred": "in_nation",
                "obj": "n" + df["c_nationkey"].astype(str)})
            dup = df[df["c_custkey"] % 7 == 0]
            extra = pd.DataFrame({
                "subj": "c" + dup["c_custkey"].astype(str),
                "pred": "in_nation",
                "obj": "n" + ((dup["c_nationkey"] + 1) % 25).astype(str)})
            mail = df[df["c_custkey"] % 3 == 0]
            emails = pd.DataFrame({
                "subj": "c" + mail["c_custkey"].astype(str),
                "pred": "email",
                "obj": "e" + mail["c_custkey"].astype(str)})
            return pd.concat([base, extra, emails], ignore_index=True)

        triples = cust.map_batches(_t, batch_format="pandas",
                                   batch_size=None)
        return validate_shapes(triples, [
            ("one_nation", "in_nation", "in_nation", 1, 1),
            ("has_email", "in_nation", "email", 1, 99)])

    def q_split_sentences(sf):
        # sentence splitting over a synthesized punctuation contract
        # (the fixture text is punctuation-free); rule = RE2
        # SENTENCE_SPLIT_RE shared verbatim, empty tail fragment
        # exercised by the trailing '? '
        import pandas as pd
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import split_sentences

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id"])

        def _synth(df: pd.DataFrame) -> pd.DataFrame:
            d = df["doc_id"].astype(str)
            return pd.DataFrame({
                "doc_id": df["doc_id"],
                "text": "First bit " + d + ". Second bit! Third "
                        + (df["doc_id"] % 5).astype(str) + "? "})

        return split_sentences(docs.map_batches(
            _synth, batch_format="pandas", batch_size=None))

    def q_construct(sf):
        # SPARQL CONSTRUCT: mint inverse has_member edges for every
        # customer→nation binding, plus derived c in_region r triples
        # from an OPTIONAL whose unbound rows (region-0 nations,
        # excluded from in_region) are skipped per CONSTRUCT semantics
        import pandas as pd
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import construct

        cust = rd.read_parquet(f"{sf}/customer.parquet",
                               columns=["c_custkey", "c_nationkey"])
        nat = rd.read_parquet(f"{sf}/nation.parquet",
                              columns=["n_nationkey", "n_regionkey"])

        def _c(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "subj": "c" + df["c_custkey"].astype(str),
                "pred": "in_nation",
                "obj": "n" + df["c_nationkey"].astype(str)})

        def _r(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["n_regionkey"] != 0]
            return pd.DataFrame({
                "subj": "n" + df["n_nationkey"].astype(str),
                "pred": "in_region",
                "obj": "r" + df["n_regionkey"].astype(str)})

        triples = (cust.map_batches(_c, batch_format="pandas",
                                    batch_size=None)
                   .union(nat.map_batches(_r, batch_format="pandas",
                                          batch_size=None)))
        return construct(
            triples, [("?c", "in_nation", "?n")],
            optional_patterns=[("?n", "in_region", "?r")],
            template=[("?n", "has_member", "?c"),
                      ("?c", "in_region", "?r")])

    def q_property_path(sf):
        # SPARQL property path c47 subclass_of* ?x over the halving
        # class chain (min-hop semantics shared with the oracle)
        import pandas as pd
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import property_path

        part = rd.read_parquet(f"{sf}/part.parquet",
                               columns=["p_partkey"])

        def _t(df: pd.DataFrame) -> pd.DataFrame:
            mid = (1 + df["p_partkey"] % 60).to_numpy()
            par = mid // 2
            keep = par >= 1
            return pd.DataFrame({
                "subj": "c" + pd.Series(mid[keep]).astype(str),
                "pred": "subclass_of",
                "obj": "c" + pd.Series(par[keep]).astype(str)})

        triples = part.map_batches(_t, batch_format="pandas",
                                   batch_size=None)
        return property_path(triples, "subclass_of", ["c47", "c58"],
                             max_hops=8)

    def q_infer_types(sf):
        # RDFS-lite subclass entailment: each part asserted with class
        # c(1 + p_partkey % 60); the class DAG is the id-halving chain
        # c_k ⊑ c_{k//2} ⊑ … ⊑ c_1 (the taxonomy_rollup contract, on
        # the class vocabulary). Edges dedup to dimension size (≤ 60
        # rows) before the closure build.
        import pandas as pd
        import ray.data as rd

        from omop2obo_ray.functions.shuffle import coarse_aggregate
        from omop2obo_ray.pipelines.graph import infer_types

        part = rd.read_parquet(f"{sf}/part.parquet",
                               columns=["p_partkey"])

        def _typed(df: pd.DataFrame) -> pd.DataFrame:
            mid = 1 + df["p_partkey"] % 60
            return pd.DataFrame({
                "entity": "p" + df["p_partkey"].astype(str),
                "cls": "c" + mid.astype(str)})

        def _edges(df: pd.DataFrame) -> pd.DataFrame:
            mid = (1 + df["p_partkey"] % 60).to_numpy()
            par = mid // 2
            keep = par >= 1
            return pd.DataFrame({
                "child": "c" + pd.Series(mid[keep]).astype(str),
                "parent": "c" + pd.Series(par[keep]).astype(str)})

        typed = part.map_batches(_typed, batch_format="pandas",
                                 batch_size=None)
        edges = coarse_aggregate(
            part.map_batches(_edges, batch_format="pandas",
                             batch_size=None),
            ["child", "parent"],
            lambda df: df.drop_duplicates(["child", "parent"]))
        return infer_types(typed, edges)

    def q_connected_components(sf):
        # customer→order bipartite: components are per-customer stars
        # (diameter 2 → propagation converges in ~3 rounds; the
        # order→part graph's giant component needs ~50 rounds ≈ 45 s —
        # right algorithm, wrong demo graph for a timed gate)
        import pandas as pd
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import connected_components

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey", "o_custkey"])

        def _e(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "src": "c" + df["o_custkey"].astype(str),
                "dst": "o" + df["o_orderkey"].astype(str)})

        edges = orders.map_batches(_e, batch_format="pandas",
                                   batch_size=None)
        return connected_components(edges)

    def q_connected_components_alt(sf):
        # honest multi-round case for the large-star/small-star path:
        # CHAIN graphs (consecutive orderkeys linked within each
        # (priority, orderkey%8) partition → 40 chains of ~n/40 nodes).
        # Min-label propagation would need diameter ≈ chain-length
        # rounds (~375 at sf0.01 — infeasible); alternating converges
        # in O(log n) ≈ 9. The component structure stays closed-form
        # for the oracle: every partition is one chain, so
        # component = lexicographic min of 'o'||orderkey per partition.
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import (
            connected_components_alternating)

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey", "o_orderpriority"])

        def _part(df: pd.DataFrame) -> pd.DataFrame:
            return df.assign(pkey=df["o_orderpriority"].astype(str) + "#"
                             + (df["o_orderkey"] % 8).astype(str))

        def _chain(g: pd.DataFrame) -> pd.DataFrame:
            # one complete partition per group (bounded: 5 priorities
            # × 8 buckets = 40 groups) → consecutive-orderkey chain
            k = np.sort(g["o_orderkey"].to_numpy())
            if len(k) < 2:
                return pd.DataFrame({"src": pd.Series(dtype=str),
                                     "dst": pd.Series(dtype=str)})
            lab = np.char.add("o", k.astype(str))
            return pd.DataFrame({"src": lab[:-1], "dst": lab[1:]})

        edges = (orders.map_batches(_part, batch_format="pandas",
                                    batch_size=None)
                 .groupby("pkey").map_groups(_chain,
                                             batch_format="pandas"))
        return connected_components_alternating(edges)

    def q_sameas_resolve(sf):
        # owl:sameAs smushing over a planted alias graph: within each
        # (nationkey, custkey%4) partition the customers form one
        # sameAs CHAIN (consecutive sorted custkeys), so the canonical
        # id is the lexicographic min of 'c'||custkey per partition —
        # closed-form for the oracle. Data triples exercise BOTH
        # rewrite sides: (c, memberOf, n) collapses subjects,
        # ('hub', cites, c) collapses objects; distinct after rewrite.
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import sameas_resolve

        cust = rd.read_parquet(f"{sf}/customer.parquet",
                               columns=["c_custkey", "c_nationkey"])

        def _part(df: pd.DataFrame) -> pd.DataFrame:
            return df.assign(pkey=df["c_nationkey"].astype(str) + "#"
                             + (df["c_custkey"] % 4).astype(str))

        def _chain(g: pd.DataFrame) -> pd.DataFrame:
            k = np.sort(g["c_custkey"].to_numpy())
            if len(k) < 2:
                return pd.DataFrame({"subj": pd.Series(dtype=str),
                                     "pred": pd.Series(dtype=str),
                                     "obj": pd.Series(dtype=str)})
            lab = np.char.add("c", k.astype(str))
            return pd.DataFrame({"subj": lab[:-1], "pred": "owl:sameAs",
                                 "obj": lab[1:]})

        same = (cust.map_batches(_part, batch_format="pandas",
                                 batch_size=None)
                .groupby("pkey").map_groups(_chain, batch_format="pandas"))

        def _data(df: pd.DataFrame) -> pd.DataFrame:
            c = "c" + df["c_custkey"].astype(str)
            n = "n" + df["c_nationkey"].astype(str)
            return pd.DataFrame({
                "subj": pd.concat([c, pd.Series(["hub"] * len(df))],
                                  ignore_index=True),
                "pred": ["memberOf"] * len(df) + ["cites"] * len(df),
                "obj": pd.concat([n, c], ignore_index=True)})

        data = cust.map_batches(_data, batch_format="pandas",
                                batch_size=None)
        return sameas_resolve(same.union(data))

    def q_heavy_hitters(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import heavy_hitters

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        # sql hash mode + uncapped per-block candidates: the candidate
        # union is then exactly the distinct-token set, so the DuckDB
        # oracle replays the count-min estimates partition-independently
        return heavy_hitters(docs, k=20, hash_mode="sql",
                             candidates_per_block=10**6)

    # ---- rows-only (non-SQL-expressible) ----
    def q_kg_triples(sf):
        from omop2obo_ray.pipelines.flagship import kg_over_documents

        return kg_over_documents(sf).select_columns(
            ["subj", "pred", "obj", "ontology", "evidence"]
        )

    def q_dedup_minhash(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import (
            minhash_candidate_pairs,
            verify_jaccard_pairs,
        )

        docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        # hash_mode='sql': md5_number_lower-based shingle/permutation/
        # band hashes the DuckDB oracle replays value-for-value —
        # promotes this gate from rows-only to hash-checked (VERDICT r4
        # #1). The default blake2b fast path keeps its pytest oracles.
        pairs = minhash_candidate_pairs(docs, hash_mode="sql")
        return verify_jaccard_pairs(docs, pairs, threshold=0.8,
                                    hash_mode="sql")

    def q_near_dup_join(sf):
        # cross-corpus contamination check: the documents table split by
        # doc_id parity plays train (even) vs eval (odd); near-dup pairs
        # crossing the split are exactly what a decontamination run
        # needs. hash_mode='sql' makes the LSH candidate set (and so
        # the whole result) DuckDB-replayable — SQL-checked since r5
        import pyarrow.compute as pc
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import near_dup_join

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])

        def _side(par):
            return docs.map_batches(
                lambda b, p=par: b.filter(pc.equal(
                    pc.bit_wise_and(b["doc_id"].combine_chunks(), 1), p)),
                batch_format="pyarrow", batch_size=None)

        return near_dup_join(_side(0), _side(1), threshold=0.8,
                             hash_mode="sql")

    def q_simhash(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import simhash_signatures

        docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return simhash_signatures(docs, hash_mode="sql")

    def q_simhash_near_pairs(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import simhash_near_pairs

        docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return simhash_near_pairs(docs, hash_mode="sql")

    def q_langid(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import analyze_text

        docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        # every projected column is DuckDB-replayable (the RE2-safe
        # tokenizers were designed for this); the blake2b rolling-hash
        # fingerprint stays covered by md5_fingerprint + pytest
        return analyze_text(docs).select_columns(
            ["doc_id", "lang_pred", "stop_ratio", "punct_ratio",
             "n_tokens_ws", "n_tokens_bpe"])

    def q_ivf_buckets(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import ivf_bucket_assignments

        emb = rd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
        return ivf_bucket_assignments(emb).select_columns(["vec_id", "ivf_bucket"])

    def q_ann_ivf(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import ivf_topk

        emb = rd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
        qs = [(r["vec_id"], list(r["embedding"]))
              for r in emb.filter(lambda r: r["vec_id"] < 3).take(3)]
        return ivf_topk(emb, qs, k=5, n_centroids=8, n_probe=3)

    def q_ann_pq(sf):
        # PQ scale path: train codebooks distributed, encode the
        # corpus to m-byte codes, ADC top-k (rows-only: iterative
        # k-means training is not SQL-expressible)
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import (pq_encode,
                                                     pq_topk, pq_train)

        emb = rd.read_parquet(f"{sf}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
        qs = [(r["vec_id"], list(r["embedding"]))
              for r in emb.filter(lambda r: r["vec_id"] < 3).take(3)]
        cb = pq_train(emb, m=4, k=16, iterations=3)
        return pq_topk(pq_encode(emb, cb), qs, cb, k=5)

    def q_ann_ivfpq(sf):
        # the FAISS-standard IVFADC layout: coarse k-means buckets
        # prune the scan (n_probe/n_centroids of the corpus), residual
        # PQ codes score it (rows-only: iterative training)
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import ivfpq_topk

        emb = rd.read_parquet(f"{sf}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
        qs = [(r["vec_id"], list(r["embedding"]))
              for r in emb.filter(lambda r: r["vec_id"] < 3).take(3)]
        return ivfpq_topk(emb, qs, n_centroids=8, n_probe=3, m=4,
                          k_codebook=16, k=5, iterations=3)

    def q_pack_sequences(sf):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import pack_sequences

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])

        def _count(batch: pa.Table) -> pa.Table:
            toks = pc.split_pattern_regex(
                pc.utf8_lower(batch["text"]), pattern="[^a-z0-9_]+")
            la = toks.combine_chunks()
            ne = pc.greater(pc.utf8_length(la.flatten()), 0).to_numpy(
                zero_copy_only=False).astype(np.int64)
            off = la.offsets.to_numpy()
            cs = np.concatenate(([0], np.cumsum(ne)))
            counts = cs[off[1:]] - cs[off[:-1]]
            return pa.table({"doc_id": batch["doc_id"],
                             "n": pa.array(counts, pa.int64())})

        counted = docs.map_batches(_count, batch_format="pyarrow",
                                   batch_size=None)
        return pack_sequences(counted, seq_len=256)

    def q_latest_per_key(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import latest_per_key

        ev = rd.read_parquet(
            f"{sf}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type", "value"])
        return latest_per_key(ev, key="user_id", ts_col="ts",
                              id_col="event_id")

    def q_table_profile(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import table_profile

        orders = rd.read_parquet(
            f"{sf}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderstatus",
                     "o_orderpriority"])
        return table_profile(orders)

    def q_decontaminate(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import decontaminate

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        probes = ["hash value", "data query", "slow filter"]
        return decontaminate(docs, probes).select_columns(
            ["doc_id", "n_probes_matched", "contaminated"])

    def q_label_centroids(sf):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import group_centroids

        emb = rd.read_parquet(f"{sf}/embeddings.parquet",
                              columns=["label", "embedding"])
        cents = group_centroids(emb, group_col="label")

        def _q(batch: pa.Table) -> pa.Table:
            # same epsilon-floor quantized gate as pagerank: full-
            # precision means, quantization shared verbatim with the SQL
            a = batch["avg"].combine_chunks().to_numpy(zero_copy_only=False)
            q = np.floor(a * 10000.0 + 0.000001).astype(np.int64)
            return pa.table({"label": batch["label"], "dim": batch["dim"],
                             "avg_q": pa.array(q, pa.int64())})

        return cents.map_batches(_q, batch_format="pyarrow")

    def q_kmeans_centroids(sf):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import kmeans_fit

        emb = rd.read_parquet(f"{sf}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
        cents = kmeans_fit(emb, k=8, iterations=10)
        k, dim = cents.shape
        return pd.DataFrame({
            "cid": np.repeat(np.arange(k, dtype=np.int64), dim),
            "dim": np.tile(np.arange(dim, dtype=np.int64), k),
            "val": cents.reshape(-1)})

    def q_remove_dup_spans(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import remove_dup_spans

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        return remove_dup_spans(docs, n=5, min_df=2)

    def q_dup_clusters(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import (
            dup_clusters,
            minhash_candidate_pairs,
            verify_jaccard_pairs,
        )

        docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        pairs = minhash_candidate_pairs(docs, hash_mode="sql")
        verified = verify_jaccard_pairs(docs, pairs, threshold=0.8,
                                        hash_mode="sql")
        return dup_clusters(verified)

    def q_dup_clusters_distributed(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import (
            dup_clusters_distributed,
            minhash_candidate_pairs,
            verify_jaccard_pairs,
        )

        docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        pairs = minhash_candidate_pairs(docs, hash_mode="sql")
        verified = verify_jaccard_pairs(docs, pairs, threshold=0.8,
                                        hash_mode="sql")
        return dup_clusters_distributed(verified)

    def q_clip_cells(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.export import clip_excel_cells

        docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return clip_excel_cells(docs, max_len=100)

    def q_near_dedup_corpus(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import near_dedup_corpus

        docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return near_dedup_corpus(docs, threshold=0.8,
                                 hash_mode="sql").select_columns(["doc_id"])

    def q_embedding_near_pairs(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import embedding_near_pairs

        emb = rd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
        return embedding_near_pairs(emb, threshold=0.3)

    def q_mixture_sample(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import mixture_sample

        docs = rd.read_parquet(
            f"{sf}/documents.parquet",
            columns=["doc_id", "text", "source"])
        out = mixture_sample(docs, {"src0": 3, "src1": 1, "src2": 1})
        return out.select_columns(["doc_id", "source"])

    def q_winnow(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import winnow_fingerprints

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        return winnow_fingerprints(docs, k=5, w=4)

    def q_jsonl_roundtrip(sf):
        # sharded JSONL export → native read_json import; text salted
        # with quote/backslash/newline so the JSON escaper is exercised
        import tempfile

        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data as rd

        from omop2obo_ray.sources.jsonl import read_jsonl, write_jsonl

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])

        def mk(b: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": b["doc_id"],
                "text": pc.binary_join_element_wise(
                    b["text"], ' "q\\', "\nend", "")})

        d = tempfile.mkdtemp(prefix="jsonl_gate_")
        write_jsonl(docs.map_batches(mk, batch_format="pyarrow",
                                     batch_size=None), d)
        return read_jsonl(d)

    def q_warc_roundtrip(sf):
        # frame documents as WARC response records (payload salted
        # with CRLFCRLF + a fake banner to stress Content-Length
        # framing), write partitioned .warc parts, parse back
        import tempfile

        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data as rd

        from omop2obo_ray.sources.warc import read_warc, write_warc

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])

        def mk(b: pa.Table) -> pa.Table:
            key = pc.cast(b["doc_id"], pa.string())
            return pa.table({
                "url": pc.binary_join_element_wise(
                    "https://ex.org/", key, ""),
                "warc_ts": pa.array(["2024-01-01T00:00:00Z"] * len(b)),
                "payload": pc.binary_join_element_wise(
                    b["text"], "\r\n\r\nWARC/1.0 fake", "")})

        pages = docs.map_batches(mk, batch_format="pyarrow",
                                 batch_size=None)
        d = tempfile.mkdtemp(prefix="warc_gate_")
        write_warc(pages, d)

        def dec(b: pa.Table) -> pa.Table:
            return pa.table({
                "url": b["url"], "warc_ts": b["warc_ts"],
                "body": pc.cast(b["payload"], pa.string())})

        return read_warc(d).map_batches(dec, batch_format="pyarrow",
                                        batch_size=None)

    def q_ntriples_roundtrip(sf):
        # serialize part-derived triples (literals salted with
        # quote/backslash/newline/tab — the full escape table) to
        # partitioned .nt files and parse them back; the gate passing
        # means the escaper and parser round-trip exactly
        import tempfile

        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data as rd

        from omop2obo_ray.sources.ntriples import (read_ntriples,
                                                   write_ntriples)

        part = rd.read_parquet(f"{sf}/part.parquet",
                               columns=["p_partkey", "p_name"])

        def mk(b: pa.Table) -> pa.Table:
            key = pc.cast(b["p_partkey"], pa.string())
            subj = pc.binary_join_element_wise("urn:part/", key, "")
            obj = pc.binary_join_element_wise(
                b["p_name"], ' "q\\', "\n\tend", "")
            return pa.table({
                "subject": subj,
                "predicate": pa.array(["urn:rel/hasName"] * len(b)),
                "object": obj})

        triples = part.map_batches(mk, batch_format="pyarrow",
                                   batch_size=None)
        d = tempfile.mkdtemp(prefix="nt_gate_")
        write_ntriples(triples, d)
        return read_ntriples(d).select_columns(
            ["subject", "predicate", "object"])

    def q_rrf_fuse(sf):
        # reciprocal-rank fusion of two deterministic rankings over
        # documents (byte length; a multiplicative-hash score) —
        # contributions are pure integers (scale // (k + rank)), so
        # the gate is exact, no quantizer
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import rrf_fuse

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])

        def mk_a(b: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": b["doc_id"],
                "s": pc.cast(pc.binary_length(b["text"]), pa.int64())})

        def mk_b(b: pa.Table) -> pa.Table:
            k = b["doc_id"].to_numpy(zero_copy_only=False)
            return pa.table({
                "doc_id": b["doc_id"],
                "s": pa.array((k * 2654435761) % 1000000007,
                              pa.int64())})

        a = docs.map_batches(mk_a, batch_format="pyarrow",
                             batch_size=None)
        b = docs.map_batches(mk_b, batch_format="pyarrow",
                             batch_size=None)
        return rrf_fuse([a, b], "doc_id", "s")

    def q_hybrid_search(sf):
        # hybrid retrieval (Cormack'09 ensemble): BM25 lexical ranking
        # fused with dense-cosine ranking by exact-integer RRF —
        # composed from the gated bm25_scores / global_ranks / rrf_fuse
        # operators. Both score lists are epsilon-floor quantized to
        # int64 BEFORE ranking (shift 1e-3 of a quantum, shared
        # verbatim with the oracle) so rank order cannot be flipped by
        # float reassociation between numpy and DuckDB.
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import bm25_scores, rrf_fuse

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        lex = bm25_scores(docs, ["the", "data", "web"])

        def _q(b: pa.Table, col: str) -> pa.Table:
            s = b[col].combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table({
                "doc_id": b["doc_id"],
                "s": pa.array(np.floor(s * 1e6 + 1e-3).astype(np.int64))})

        lexq = lex.map_batches(lambda b: _q(b, "score"),
                               batch_format="pyarrow", batch_size=None)

        emb = rd.read_parquet(f"{sf}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
        # the query vector: embedding of vec_id 0 (driver-held — in
        # production the caller passes it in)
        qrow = emb.filter(lambda r: r["vec_id"] == 0).take(1)
        qv = np.asarray(qrow[0]["embedding"], np.float64)
        qv = qv / np.linalg.norm(qv)

        def _cos(b: pa.Table) -> pa.Table:
            arr = b["embedding"].combine_chunks()
            m = (arr.flatten().to_numpy(zero_copy_only=False)
                 .astype(np.float64).reshape(len(arr), -1))
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            cos = (m / norms[:, None]) @ qv
            return pa.table({"doc_id": b["vec_id"],
                             "score": pa.array(cos, pa.float64())})

        denseq = emb.map_batches(_cos, batch_format="pyarrow",
                                 batch_size=None).map_batches(
            lambda b: _q(b, "score"), batch_format="pyarrow",
            batch_size=None)
        return rrf_fuse([lexq, denseq], "doc_id", "s")

    def q_bm25(sf):
        # full-precision scores on the operator; the gate quantizes
        # with the shared epsilon-floor (sum order differs SQL-side)
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import bm25_scores

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        scored = bm25_scores(docs, ["the", "data", "web"])

        def _q(batch: pa.Table) -> pa.Table:
            s = batch["score"].combine_chunks().to_numpy(
                zero_copy_only=False)
            return pa.table({
                "doc_id": batch["doc_id"],
                "score_q": pa.array(
                    np.floor(s * 1e6 + 1e-9).astype(np.int64))})

        return scored.map_batches(_q, batch_format="pyarrow",
                                  batch_size=None)

    def q_nb_classify(sf):
        # distributed multinomial Naive Bayes: train on (text → lang)
        # counts in-cluster, broadcast the vocab-bounded model, score
        # every doc (pred + epsilon-floor-quantized log-prob score)
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import nb_classify, nb_train

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text", "lang"])
        model = nb_train(docs, label_col="lang")
        return nb_classify(docs, model)

    def q_lm_perplexity(sf):
        # CCNet-style LM quality scoring: char-bigram LM trained in
        # one distributed counting pass, broadcast, scored per doc
        # (mean NLL, epsilon-floor-quantized)
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import (lm_perplexity,
                                                   lm_train_bigrams)

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        model = lm_train_bigrams(docs)
        return lm_perplexity(docs, model)

    def q_hll_distinct(sf):
        # HyperLogLog distinct-token estimate per lang — a SKETCH op
        # that is still hash-gate checkable: md5 hash + integer
        # reg/rho + literally-shared estimator formula on both sides
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import hll_distinct_tokens

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text", "lang"])
        return hll_distinct_tokens(docs, group_col="lang")

    def q_ccnet_buckets(sf):
        # CCNet head/middle/tail terciles per source by LM mean-NLL;
        # thresholds are pure-integer order statistics
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import ccnet_quality_buckets

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text", "source"])
        return ccnet_quality_buckets(docs)

    def q_boolean_search(sf):
        # conjunctive retrieval: docs whose token set contains ALL terms
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import search_all_terms

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        return search_all_terms(docs, ["the", "data"])

    def q_anchor_graph(sf):
        # web-graph extraction: deterministic synthesized html pages →
        # REAL anchor parser → edges; the oracle recomputes the edge
        # set by pure arithmetic, so the gate round-trips the parser
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import (anchor_edges,
                                                  synth_anchor_pages)

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id"])
        return anchor_edges(synth_anchor_pages(docs))

    def q_anchor_texts(sf):
        # anchor TEXT extraction (link-text alias evidence): same
        # synth contract, text = chr(96 + k) per anchor slot
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import (anchor_text_edges,
                                                  synth_anchor_pages)

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id"])
        return anchor_text_edges(synth_anchor_pages(docs))

    def q_bloom_membership(sf):
        # Bloom filter over the documents token vocabulary, probed
        # with the (mostly disjoint) part-name vocabulary — n_bits
        # deliberately tiny (128) so a false positive occurs at sf0.01
        # and the gate verifies FP parity, not just true membership
        import ray.data as rd

        from omop2obo_ray.functions.shuffle import coarse_aggregate
        from omop2obo_ray.pipelines.curate import (bloom_build,
                                                   bloom_probe, postings)

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        bloom = bloom_build(postings(docs), "token", n_bits=128, k=3)
        part = rd.read_parquet(f"{sf}/part.parquet",
                               columns=["p_partkey", "p_name"])
        probes = coarse_aggregate(
            postings(part, key_col="p_partkey", text_col="p_name")
            .select_columns(["token"]), ["token"],
            lambda df: df.drop_duplicates())
        return bloom_probe(probes, "token", bloom)

    def q_triangle_count(sf):
        # degree-oriented distributed triangle counting over the shared
        # deterministic triangle-bearing graph (_synth_tri_edges)
        from omop2obo_ray.pipelines.graph import triangle_count

        return triangle_count(_synth_tri_edges(sf))

    def q_train_test_split(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import train_test_split

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id"])
        return train_test_split(docs)

    def q_select_budget(sf):
        # DataComp-style selection: best-scored docs until the weight
        # budget is exhausted (score/weight = n_chars here; production
        # feeds lm_perplexity / quality scores)
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import select_until_budget

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "n_chars"])
        return select_until_budget(docs, 100_000, score_col="n_chars",
                                   weight_col="n_chars")

    def q_chunk_documents(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import chunk_documents

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        return chunk_documents(docs, chunk_tokens=64, overlap=16)

    def q_rep_ngrams(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import rep_ngram_stats

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        return rep_ngram_stats(docs, n=3)

    def q_similarity_join(sf):
        # entity resolution: token-Jaccard join between the even- and
        # odd-keyed halves of the part names (integer-exact threshold)
        import pyarrow.compute as _pc
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import similarity_join

        part = rd.read_parquet(f"{sf}/part.parquet",
                               columns=["p_partkey", "p_name"])
        left = part.map_batches(
            lambda b: b.filter(_pc.equal(
                _pc.bit_wise_and(b["p_partkey"], 1), 0)),
            batch_format="pyarrow", batch_size=None)
        right = part.map_batches(
            lambda b: b.filter(_pc.equal(
                _pc.bit_wise_and(b["p_partkey"], 1), 1)),
            batch_format="pyarrow", batch_size=None)
        return similarity_join(
            left, right, key_l="p_partkey", text_l="p_name",
            key_r="p_partkey", text_r="p_name", threshold_ppt=500)

    def q_bigram_pmi(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import bigram_pmi

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        return bigram_pmi(docs, min_count=5)

    def q_hits(sf):
        # integer-exact HITS (unnormalized path counts — no quantizer
        # needed) over the same synthetic 97-node digraph as
        # triangle_count
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import hits

        part = rd.read_parquet(f"{sf}/part.parquet",
                               columns=["p_partkey"])

        def _edges(b: pa.Table) -> pa.Table:
            k = b["p_partkey"].to_numpy(zero_copy_only=False)
            return pa.table({
                "src": pa.array(["n" + str(v % 97) for v in k]),
                "dst": pa.array(["n" + str((v * 3 + 1) % 97) for v in k])})

        return hits(part.map_batches(_edges, batch_format="pyarrow",
                                     batch_size=None), iterations=2)

    def q_semantic_dedup(sf):
        # SemDeDup (k-means cells → within-cell cosine components →
        # keep min-key representative). Rows-only: iterative k-means +
        # component resolution aren't SQL-expressible; pytest carries
        # the exact numpy-oracle identity check.
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import semantic_dedup

        emb = rd.read_parquet(f"{sf}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
        kept = semantic_dedup(emb, threshold=0.95, n_clusters=4,
                              train_iterations=2)
        return kept.select_columns(["vec_id"])

    def q_embedding_near_pairs_lsh(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import embedding_near_pairs_lsh

        emb = rd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
        return embedding_near_pairs_lsh(emb, threshold=0.3)

    def q_n3c_mapping_table(sf):
        from omop2obo_ray.pipelines.export import triples_to_mapping_table
        from omop2obo_ray.pipelines.flagship import kg_over_documents

        return triples_to_mapping_table(
            kg_over_documents(sf).select_columns(
                ["subj", "pred", "obj", "ontology", "evidence"]))

    def q_cooc_counts(sf):
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import cooc_counts

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        return cooc_counts(docs, window=3, min_count=2)

    def q_c4_clean(sf):
        # C4 line/doc quality rules over synthesized multi-line pages
        # (the fixture is single-line; the synth contract is shared with
        # the oracle, anchor_graph-style, so the REAL RE2 kernels are
        # what the gate round-trips)
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import c4_clean, synth_paragraph_docs

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "source"])
        return c4_clean(synth_paragraph_docs(docs))

    def q_gopher_stats(sf):
        # full Gopher §A1.1 rule set (line + lexical rules) over
        # synthesized multi-line pages exercising every rule; the
        # thresholds are tuned so three DIFFERENT rules decide:
        # doc_id%4==0 fails min-words, %4∈{2,3} fail the symbol ratio,
        # %4==1 passes everything
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import (gopher_stats,
                                                   synth_gopher_docs)

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id"])
        return gopher_stats(synth_gopher_docs(docs), min_words=20,
                            symbol_ratio_x10=1, bullet_ratio_x10=4,
                            ellipsis_ratio_x10=4, alpha_ratio_x5=2)

    def q_ngram_decontam(sf):
        # GPT-3-style n-gram collision decontamination: benchmark =
        # every 97th document (eval-suite-sized), corpus = all docs;
        # a doc is contaminated iff it shares a 5-gram with the bench
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import ngram_decontaminate

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        bench = docs.map_batches(
            lambda df: df[df["doc_id"] % 97 == 0],
            batch_format="pandas", batch_size=None)
        return ngram_decontaminate(docs, bench, n=5)

    def q_resolve_hrefs(sf):
        # RFC 3986 href resolution over the synth_href_edges contract
        # (one resolution class per doc_id % 4: absolute /
        # protocol-relative / root-relative / ../ fallback)
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import (resolve_hrefs,
                                                   synth_href_edges)

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id"])
        return resolve_hrefs(synth_href_edges(docs))

    def q_compression_stats(sf):
        # zlib compression-ratio signal (rows-only: DuckDB has no zlib;
        # the pytest oracle is the python zlib library itself)
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import compression_stats

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        return compression_stats(docs)

    def q_embedding_covariance(sf):
        # epsilon-floor quantized gate (float sums reassociate between
        # numpy partials and DuckDB; full precision stays on the op)
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import embedding_covariance

        emb = rd.read_parquet(f"{sf}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
        cov = embedding_covariance(emb)

        def _q(batch: pa.Table) -> pa.Table:
            c = batch["cov"].combine_chunks().to_numpy(zero_copy_only=False)
            q = np.floor(c * 1e6 + 1e-9).astype(np.int64)
            return pa.table({"i": batch["i"], "j": batch["j"],
                             "cov_q": pa.array(q, pa.int64())})

        return cov.map_batches(_q, batch_format="pyarrow", batch_size=None)

    def q_pca_projection(sf):
        # rows-only: the eigendecomposition isn't SQL-expressible;
        # pytest carries the exact numpy-identity check
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import pca_project

        emb = rd.read_parquet(f"{sf}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
        return pca_project(emb, 4)

    def _synth_tri_edges(sf):
        # deterministic triangle-bearing graph shared by triangle_count
        # / clustering_coefficient / kcore (orders/lineitem graphs are
        # bipartite — no triangles; the old v→3v+1 mod-97 permutation
        # graph is a union of cycles — ALSO triangle-free, so gates on
        # it passed trivially at 0). Two rules per part row k:
        # dense core n(k%23)—n(k%29) (by CRT every cross pair appears,
        # so the core is K29 minus the {n23..n28} clique — rich in
        # triangles, min degree 23) + fringe cycle c(k%509)—c(k%509+1)
        # (all degree ≤ 2: zero triangles, peeled by any k≥3 core).
        import pyarrow as pa
        import ray.data as rd

        part = rd.read_parquet(f"{sf}/part.parquet",
                               columns=["p_partkey"])

        def _edges(b: pa.Table) -> pa.Table:
            k = b["p_partkey"].to_numpy(zero_copy_only=False)
            src = (["n" + str(v % 23) for v in k]
                   + ["c" + str(v % 509) for v in k])
            dst = (["n" + str(v % 29) for v in k]
                   + ["c" + str((v % 509) + 1) for v in k])
            return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

        return part.map_batches(_edges, batch_format="pyarrow",
                                batch_size=None)

    def q_clustering_coefficient(sf):
        # coeff = 2·tri/(d·(d−1)) is the SAME double expression on both
        # sides, so the epsilon-floor quantizer is deterministic even on
        # boundary rationals like 0.5
        import numpy as np
        import pyarrow as pa

        from omop2obo_ray.pipelines.graph import clustering_coefficient

        cc = clustering_coefficient(_synth_tri_edges(sf))

        def _q(batch: pa.Table) -> pa.Table:
            c = batch["coeff"].combine_chunks().to_numpy(
                zero_copy_only=False)
            q = np.floor(c * 1e6 + 1e-9).astype(np.int64)
            return pa.table({"node": batch["node"], "d": batch["d"],
                             "tri": batch["tri"],
                             "coeff_q": pa.array(q, pa.int64())})

        return cc.map_batches(_q, batch_format="pyarrow", batch_size=None)

    def q_bfs_hops(sf):
        # frontier BFS over the order↔part bipartite graph from seed
        # parts (p_partkey % 97 == 0 — a bounded, SQL-shareable seed
        # rule); oracle = recursive CTE with UNION dedup
        from omop2obo_ray.pipelines.graph import bfs_hops

        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        part = rd.read_parquet(f"{sf}/part.parquet", columns=["p_partkey"])

        def _seed(b: pa.Table) -> pa.Table:
            k = b["p_partkey"].to_numpy(zero_copy_only=False)
            return b.filter(pa.array(k % 97 == 0))

        seed_rows = part.map_batches(
            _seed, batch_format="pyarrow", batch_size=None).take_all()
        seeds = ["p" + str(r["p_partkey"]) for r in seed_rows]
        return bfs_hops(_lineitem_edges(sf), seeds, max_hops=3)

    def q_kcore(sf):
        # SQL-checked via a 4-round UNROLLED peeling oracle: on the
        # _synth_tri_edges fixture the fringe cycles (degree ≤ 2) peel
        # in round 1 and the dense core (min degree ≥ 6 at every sf)
        # is already stable, so fixpoint ≤ 1 round ≪ the 4 unrolled —
        # the engine runs to fixpoint, the oracle just unrolls past it
        from omop2obo_ray.pipelines.graph import kcore

        return kcore(_synth_tri_edges(sf), 3)

    def q_neighborhood(sf):
        # HyperBall neighborhood function (per-node ball sizes at each
        # radius), exact bitset mode — integer counts, gate exact; the
        # HLL scale path is pytest-gated against this mode. Oracle =
        # bounded-hop recursive CTE + min-distance + radius join.
        from omop2obo_ray.pipelines.graph import neighborhood_function

        return neighborhood_function(_synth_tri_edges(sf), max_t=2,
                                     mode="exact")

    def q_harmonic(sf):
        # bounded-radius harmonic centrality from exact ball sizes;
        # fixed ascending-t 2-term IEEE fold shared with the oracle
        from omop2obo_ray.pipelines.graph import harmonic_centrality

        return harmonic_centrality(_synth_tri_edges(sf), max_t=2,
                                   mode="exact")

    def q_image_meta(sf):
        # REAL multimodal header parse: build a genuine PNG byte
        # column from orderkeys (magic + IHDR, width = k%1920+1,
        # height = k%1080+1) with a zero-loop buffer construction,
        # then parse it back; oracle recomputes the dims
        # arithmetically. Exact gate.
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import image_meta

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _mk(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            n = len(k)
            w = (k % 1920 + 1).astype(np.int64)
            h = (k % 1080 + 1).astype(np.int64)
            m = np.zeros((n, 24), np.uint8)
            m[:, :8] = np.frombuffer(b"\x89PNG\r\n\x1a\n", np.uint8)
            m[:, 11] = 13                      # IHDR length
            m[:, 12:16] = np.frombuffer(b"IHDR", np.uint8)
            for j in range(4):
                m[:, 16 + j] = (w >> (8 * (3 - j))) & 0xFF
                m[:, 20 + j] = (h >> (8 * (3 - j))) & 0xFF
            offs = (np.arange(n + 1, dtype=np.int32) * 24)
            payload = pa.Array.from_buffers(
                pa.binary(), n,
                [None, pa.py_buffer(offs.tobytes()),
                 pa.py_buffer(m.tobytes())])
            return pa.table({"doc_id": pa.array(k, pa.int64()),
                             "payload": payload})

        ds = orders.map_batches(_mk, batch_format="pyarrow",
                                batch_size=None)
        return image_meta(ds)

    def q_audio_meta(sf):
        # REAL WAV header parse: plant canonical RIFF/fmt bytes from
        # orderkeys (zero-loop build), parse back; oracle recomputes
        # arithmetically. Exact gate.
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import audio_meta

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _mk(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            n = len(k)
            ch = (k % 8 + 1).astype(np.int64)
            sr = ((k % 4 + 1) * 8000).astype(np.int64)
            bits = (8 * (k % 3 + 1)).astype(np.int64)
            m = np.zeros((n, 36), np.uint8)
            m[:, 0:4] = np.frombuffer(b"RIFF", np.uint8)
            m[:, 4] = 28                        # chunk size (LE)
            m[:, 8:16] = np.frombuffer(b"WAVEfmt ", np.uint8)
            m[:, 16] = 16                       # fmt length
            m[:, 20] = 1                        # PCM
            m[:, 22] = ch & 0xFF
            for j in range(4):
                m[:, 24 + j] = (sr >> (8 * j)) & 0xFF
            m[:, 34] = bits & 0xFF
            offs = (np.arange(n + 1, dtype=np.int32) * 36)
            payload = pa.Array.from_buffers(
                pa.binary(), n,
                [None, pa.py_buffer(offs.tobytes()),
                 pa.py_buffer(m.tobytes())])
            return pa.table({"doc_id": pa.array(k, pa.int64()),
                             "payload": payload})

        ds = orders.map_batches(_mk, batch_format="pyarrow",
                                batch_size=None)
        return audio_meta(ds)

    def q_sniff_format(sf):
        # magic-byte content-type routing: plant one of 4 real magics
        # by k % 4 (png / jpeg / pdf / none), detect back; oracle
        # recomputes the planted label arithmetically. Exact.
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import sniff_format

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _mk(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            n = len(k)
            sel = (k % 4).astype(np.int64)
            m = np.zeros((n, 12), np.uint8)
            mag = {0: b"\x89PNG\r\n\x1a\n", 1: b"\xff\xd8\xff",
                   2: b"%PDF"}
            for s, bts in mag.items():
                rows_ = sel == s
                m[rows_, :len(bts)] = np.frombuffer(bts, np.uint8)
            offs = (np.arange(n + 1, dtype=np.int32) * 12)
            payload = pa.Array.from_buffers(
                pa.binary(), n,
                [None, pa.py_buffer(offs.tobytes()),
                 pa.py_buffer(m.tobytes())])
            return pa.table({"doc_id": pa.array(k, pa.int64()),
                             "payload": payload})

        ds = orders.map_batches(_mk, batch_format="pyarrow",
                                batch_size=None)
        return sniff_format(ds)

    def q_bmp_decode(sf):
        # REAL PIXEL decode (not just headers): plant genuine
        # uncompressed 24-bit bottom-up BGR BMPs (w = k%4+1,
        # h = k%3+1, stride padding included) whose DECODED pixel
        # (r, c, ch) = (k + 3*(r*w+c) + ch) % 251; the engine must
        # undo the row flip, the BGR order and the padding to get
        # px_sum = Σ_{i<3wh} (k+i)%251 and first_px = k%251 — the
        # oracle recomputes both arithmetically with generate_series.
        # Builder is vectorized per (w, h) combo (12 combos, each a
        # zero-row-loop matrix build). Exact gate.
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import image_decode

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _mk(b: pa.Table) -> pa.Table:
            k0 = b["o_orderkey"].to_numpy(zero_copy_only=False)
            n = len(k0)
            ws = (k0 % 4 + 1).astype(np.int64)
            hs = (k0 % 3 + 1).astype(np.int64)
            bufs, order = [], []
            for w in range(1, 5):
                for h in range(1, 4):
                    rows = np.nonzero((ws == w) & (hs == h))[0]
                    if not len(rows):
                        continue
                    k = k0[rows]
                    stride = ((w * 3 + 3) // 4) * 4
                    size = 54 + stride * h
                    m = np.zeros((len(rows), size), np.uint8)
                    m[:, 0], m[:, 1] = 0x42, 0x4D           # BM
                    m[:, 2] = size & 0xFF
                    m[:, 3] = (size >> 8) & 0xFF
                    m[:, 10] = 54                            # data offset
                    m[:, 14] = 40                            # DIB size
                    m[:, 18], m[:, 22] = w, h                # dims (LE)
                    m[:, 26], m[:, 28] = 1, 24               # planes/bpp
                    for j in range(h):                       # file rows
                        r = h - 1 - j                        # bottom-up
                        for bpos in range(stride):
                            p = 54 + j * stride + bpos
                            if bpos >= 3 * w:
                                continue                     # padding 0
                            c, cb = bpos // 3, bpos % 3      # BGR byte
                            off = 3 * (r * w + c) + (2 - cb)
                            m[:, p] = ((k + off) % 251) & 0xFF
                    bufs.append(m)
                    order.append(rows)
            idx = np.concatenate(order)
            inv = np.empty(n, np.int64)
            inv[idx] = np.arange(n)
            flat = [bytes(row) for mm in bufs for row in mm]
            payload = pa.array(flat, pa.binary()).take(
                pa.array(inv, pa.int64()))
            return pa.table({"doc_id": pa.array(k0, pa.int64()),
                             "payload": payload})

        ds = orders.map_batches(_mk, batch_format="pyarrow",
                                batch_size=None)
        return image_decode(ds)

    def q_png_decode(sf):
        # REAL PNG PIXEL decode (zlib inflate + scanline unfilter,
        # stdlib-only): plant genuine compressed PNGs (w = k%4+1,
        # h = k%3+1, RGB, filter-0 rows) whose flat sample i =
        # (k + i) % 251; the engine walks chunks, inflates IDAT and
        # unfilters; the oracle recomputes the planted arithmetic.
        # Exact gate. (Builder compresses per payload — zlib has no
        # batch form; gate-scale only.)
        import zlib

        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import image_decode

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _mk(b: pa.Table) -> pa.Table:
            import struct

            def chunk(typ, body):
                return (struct.pack(">I", len(body)) + typ + body
                        + struct.pack(">I", zlib.crc32(typ + body)))

            ks = b["o_orderkey"].to_numpy(zero_copy_only=False)
            payloads = []
            for k in ks:
                k = int(k)
                w, h = k % 4 + 1, k % 3 + 1
                px = (k + np.arange(3 * w * h, dtype=np.int64)) % 251
                rows = px.reshape(h, 3 * w).astype(np.uint8)
                raw = b"".join(b"\x00" + r.tobytes() for r in rows)
                ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
                payloads.append(
                    b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", zlib.compress(raw))
                    + chunk(b"IEND", b""))
            return pa.table({
                "doc_id": pa.array(ks, pa.int64()),
                "payload": pa.array(payloads, pa.binary())})

        ds = orders.map_batches(_mk, batch_format="pyarrow",
                                batch_size=None)
        return image_decode(ds)

    def q_jpeg_decode(sf):
        # REAL JPEG PIXEL decode (pure-numpy Huffman + IDCT, VERDICT
        # r4 #4 + the r5 progressive extension): plant genuine JPEGs
        # that decode EXACTLY — constant 8x8 blocks ride the DC-only
        # path (F00 = 8*(v-128), quant 1, IDCT -> v losslessly).
        # k%4 in (0,): grayscale 8x8 BASELINE with v = k%251;
        # k%4 == 2: the SAME grayscale image as a PROGRESSIVE (SOF2)
        # stream — DC first/refine + AC scans with successive
        # approximation — whose planted arithmetic (hence the oracle)
        # is identical, so the gate pins the progressive decoder too;
        # odd k: 4:2:0 16x16 BASELINE color with Y quadrants
        # v_j = (k+17j)%251 and Cb=Cr=0 (RGB = Y exactly). px_sum +
        # first_px pin Huffman, DC prediction, MCU layout, chroma
        # upsample and the color transform in every mode.
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import (
            encode_jpeg_baseline,
            encode_progressive,
            image_decode,
        )

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _mk(b: pa.Table) -> pa.Table:
            q1 = np.ones((8, 8), np.int32)

            def const_block(v):
                c = np.zeros((8, 8), np.int64)
                c[0, 0] = 8 * (int(v) - 128)
                return c

            ks = b["o_orderkey"].to_numpy(zero_copy_only=False)
            payloads = []
            for k in ks:
                k = int(k)
                if k % 4 == 2:
                    payloads.append(encode_progressive(
                        [const_block(k % 251)], None, None, 8, 8,
                        (1, 1), q1, q1, dc_split=2, ac_split=1))
                elif k % 2 == 0:
                    payloads.append(encode_jpeg_baseline(
                        [const_block(k % 251)], None, None, 8, 8,
                        (1, 1), q1, q1))
                else:
                    ys = [const_block((k + 17 * j) % 251)
                          for j in range(4)]
                    z = np.zeros((8, 8), np.int64)
                    payloads.append(encode_jpeg_baseline(
                        ys, [z], [z], 16, 16, (2, 2), q1, q1))
            return pa.table({
                "doc_id": pa.array(ks, pa.int64()),
                "payload": pa.array(payloads, pa.binary())})

        ds = orders.map_batches(_mk, batch_format="pyarrow",
                                batch_size=None)
        return image_decode(ds)

    def q_mjpeg_frames(sf):
        # REAL video-frame sampling (r5): plant Motion-JPEG AVIs — 6
        # grayscale constant-block frames v_j = (k+29j)%251 — parse
        # the RIFF container, decode each sampled frame with the real
        # JPEG decoder, sample 3 evenly (src = i*(T-1)//(n-1) =>
        # frames 0,2,5). Constant frames decode exactly, so f_mean =
        # v and f_std = 0 and the oracle replays the arithmetic.
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import (
            encode_jpeg_baseline,
            sample_frames,
            write_avi_mjpeg,
        )

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _mk(b: pa.Table) -> pa.Table:
            q1 = np.ones((8, 8), np.int32)

            def gray(v):
                c = np.zeros((8, 8), np.int64)
                c[0, 0] = 8 * (int(v) - 128)
                return encode_jpeg_baseline([c], None, None, 8, 8,
                                            (1, 1), q1, q1)

            ks = b["o_orderkey"].to_numpy(zero_copy_only=False)
            payloads = [write_avi_mjpeg(
                [gray((int(k) + 29 * j) % 251) for j in range(6)],
                8, 8) for k in ks]
            return pa.table({
                "doc_id": pa.array(ks, pa.int64()),
                "payload": pa.array(payloads, pa.binary())})

        ds = orders.map_batches(_mk, batch_format="pyarrow",
                                batch_size=None)
        sampled = sample_frames(ds, n_frames=3, mode="mjpeg")

        def _scal(b: pa.Table) -> pa.Table:
            f = b["features"].to_pylist()
            return pa.table({
                "doc_id": b["doc_id"],
                "frame_idx": b["frame_idx"].combine_chunks()
                .cast(pa.int64()),
                "f_mean": pa.array([x[0] for x in f], pa.float64()),
                "f_std": pa.array([x[1] for x in f], pa.float64())})

        return sampled.map_batches(_scal, batch_format="pyarrow",
                                   batch_size=None)

    def q_wav_decode(sf):
        # REAL PCM sample extraction: plant genuine 16-bit WAVs
        # (channels = k%2+1, frames = k%5+2, rate = 8000·(k%3+1))
        # whose flat sample j is the u16 (k·7 + j·13) % 65536 decoded
        # as SIGNED int16 (= ((v+32768)%65536)−32768); the
        # engine must walk the RIFF chunks and view-cast the LE
        # int16s; the oracle recomputes sample_sum / first_sample
        # arithmetically with generate_series. Exact gate.
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import audio_decode

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _mk(b: pa.Table) -> pa.Table:
            k0 = b["o_orderkey"].to_numpy(zero_copy_only=False)
            n = len(k0)
            chs = (k0 % 2 + 1).astype(np.int64)
            frs = (k0 % 5 + 2).astype(np.int64)
            bufs, order = [], []
            for ch in (1, 2):
                for fr in range(2, 7):
                    rows = np.nonzero((chs == ch) & (frs == fr))[0]
                    if not len(rows):
                        continue
                    k = k0[rows]
                    nsmp = fr * ch
                    dlen = 2 * nsmp
                    size = 44 + dlen
                    m = np.zeros((len(rows), size), np.uint8)
                    m[:, 0:4] = np.frombuffer(b"RIFF", np.uint8)
                    m[:, 4] = (36 + dlen) & 0xFF
                    m[:, 8:16] = np.frombuffer(b"WAVEfmt ", np.uint8)
                    m[:, 16] = 16                            # fmt len
                    m[:, 20] = 1                             # PCM
                    m[:, 22] = ch
                    rate = (8000 * (k % 3 + 1)).astype(np.int64)
                    for j in range(4):
                        m[:, 24 + j] = (rate >> (8 * j)) & 0xFF
                        m[:, 28 + j] = ((rate * 2 * ch)
                                        >> (8 * j)) & 0xFF
                    m[:, 32] = 2 * ch                        # block
                    m[:, 34] = 16                            # bits
                    m[:, 36:40] = np.frombuffer(b"data", np.uint8)
                    m[:, 40] = dlen & 0xFF
                    for j in range(nsmp):
                        v = (k * 7 + j * 13) % 65536
                        m[:, 44 + 2 * j] = v & 0xFF
                        m[:, 45 + 2 * j] = (v >> 8) & 0xFF
                    bufs.append(m)
                    order.append(rows)
            idx = np.concatenate(order)
            inv = np.empty(n, np.int64)
            inv[idx] = np.arange(n)
            flat = [bytes(row) for mm in bufs for row in mm]
            payload = pa.array(flat, pa.binary()).take(
                pa.array(inv, pa.int64()))
            return pa.table({"doc_id": pa.array(k0, pa.int64()),
                             "payload": payload})

        ds = orders.map_batches(_mk, batch_format="pyarrow",
                                batch_size=None)
        return audio_decode(ds)

    def q_neighbor_sample(sf):
        # GraphSAGE-style 2-hop pinned-hash neighbor sampling
        # (fanouts [3, 2]) over the synthetic directed orderkey graph
        # (u = k%997 → v = (k·31+7)%997); exact set gate
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import neighbor_sample

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _edges(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            u, v = k % 997, (k * 31 + 7) % 997
            m = u != v
            return pa.table({"src": pa.array(u[m], pa.int64()),
                             "dst": pa.array(v[m], pa.int64())})

        e = orders.map_batches(_edges, batch_format="pyarrow",
                               batch_size=None)
        return neighbor_sample(e, [3, 2])

    def q_dbscan(sf):
        # DBSCAN over the embeddings table, cosine distance eps=0.65
        # (cos >= 0.35; nearest pair-boundary gap >= 2.8e-5 at both
        # SFs, far beyond matmul-vs-list_cosine ulp drift), min_pts=3
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import dbscan_cluster

        emb = rd.read_parquet(f"{sf}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
        return dbscan_cluster(emb, eps=0.65, min_pts=3)

    def q_kge_negatives(sf):
        # KGE corrupted-triple negative sampling over a synthetic
        # orderkey triple store (s = k%211, p = k%7, o = (k·31+5)%211),
        # k=2 negatives per distinct triple; the pinned modular hash
        # and global entity ranks replay exactly in SQL — gate exact
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import kge_negative_samples

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _tri(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            return pa.table({
                "s": pa.array(k % 211, pa.int64()),
                "p": pa.array(k % 7, pa.int64()),
                "o": pa.array((k * 31 + 5) % 211, pa.int64())})

        t = orders.map_batches(_tri, batch_format="pyarrow",
                               batch_size=None)
        return kge_negative_samples(t, 2)

    def q_effective_diameter(sf):
        # ANF effective diameter (q=0.9, interpolated) from exact
        # ball sizes; every arithmetic step single-rounding IEEE on
        # exact integer pair counts — gate exact unquantized
        from omop2obo_ray.pipelines.graph import effective_diameter

        return effective_diameter(_synth_tri_edges(sf), max_t=2,
                                  q=0.9, mode="exact")

    def q_partition_quality(sf):
        # modularity/conductance scoring of a pinned 3-community
        # assignment (digits % 3) over the synthetic graph; integer
        # sums exact, the float finale mirrors the oracle's
        # single-rounding expressions
        import pyarrow as pa
        import pyarrow.compute as pc

        from omop2obo_ray.functions.shuffle import coarse_aggregate
        from omop2obo_ray.pipelines.graph import partition_quality
        from omop2obo_ray.pipelines.textpipe import \
            _sanitize_join_output

        e = _synth_tri_edges(sf)
        nodes = coarse_aggregate(
            e.map_batches(
                lambda b: pa.table({"node": pa.concat_arrays(
                    [b["src"].combine_chunks(),
                     b["dst"].combine_chunks()])}),
                batch_format="pyarrow", batch_size=None),
            ["node"], lambda df: df.drop_duplicates())
        nodes = _sanitize_join_output(
            nodes, pa.schema([("node", pa.string())]))

        def _asg(b: pa.Table) -> pa.Table:
            import numpy as np
            digits = pc.cast(pc.utf8_slice_codeunits(
                b["node"].combine_chunks(), 1, 99), pa.int64()) \
                .to_numpy(zero_copy_only=False)
            comm = pa.array((digits % 3).astype(str), pa.string())
            return pa.table({"node": b["node"], "community": comm})

        asg = nodes.map_batches(_asg, batch_format="pyarrow",
                                batch_size=None)
        return partition_quality(e, asg)

    def q_closeness(sf):
        # bounded-radius closeness centrality from exact ball sizes;
        # Σd is an exact integer in both engines, ONE IEEE division
        # at the end — gate exact unquantized
        from omop2obo_ray.pipelines.graph import closeness_centrality

        return closeness_centrality(_synth_tri_edges(sf), max_t=2,
                                    mode="exact")

    def q_bgp_filter(sf):
        # SPARQL FILTER over the match_bgp geography solutions:
        # exclude nation n3, keep even-suffix ?c via RE2 regex —
        # same regex engine as DuckDB's regexp_matches
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import (filter_bindings,
                                                  match_bgp)

        cust = rd.read_parquet(f"{sf}/customer.parquet",
                               columns=["c_custkey", "c_nationkey"])
        nat = rd.read_parquet(f"{sf}/nation.parquet",
                              columns=["n_nationkey", "n_regionkey"])

        import pandas as pd

        def _t(skey, pred, okey, sp, op):
            def inner(df: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame({
                    "subj": sp + df[skey].astype(str),
                    "pred": pred,
                    "obj": op + df[okey].astype(str)})
            return inner

        triples = (
            cust.map_batches(_t("c_custkey", "in_nation",
                                "c_nationkey", "c", "n"),
                             batch_format="pandas", batch_size=None)
            .union(nat.map_batches(_t("n_nationkey", "in_region",
                                      "n_regionkey", "n", "r"),
                                   batch_format="pandas",
                                   batch_size=None)))
        sols = match_bgp(triples, [("?c", "in_nation", "?n"),
                                   ("?n", "in_region", "?r")])
        return filter_bindings(sols, [
            ("n", "!=", "n3"),
            ("c", "regex", "^c[0-9]*[02468]$")])

    def q_scc(sf):
        # directed SCC over a DENSE synthetic digraph (u = k%97 →
        # v = (k·31+7)%97 — min-label propagation is O(path-to-min),
        # so the gate graph must be low-diameter); giant SCC +
        # periphery; oracle = mutual-reachability closure, exact
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import \
            strongly_connected_components

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _edges(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            u, v = k % 97, (k * 31 + 7) % 97
            m = u != v
            return pa.table({"src": pa.array(u[m], pa.int64()),
                             "dst": pa.array(v[m], pa.int64())})

        e = orders.map_batches(_edges, batch_format="pyarrow",
                               batch_size=None)
        return strongly_connected_components(e)

    def q_quotient_graph(sf):
        # community supergraph over the synthetic graph with the
        # pinned digits%3 assignment (shared with partition_quality)
        import pyarrow as pa
        import pyarrow.compute as pc

        from omop2obo_ray.functions.shuffle import coarse_aggregate
        from omop2obo_ray.pipelines.graph import quotient_graph
        from omop2obo_ray.pipelines.textpipe import \
            _sanitize_join_output

        e = _synth_tri_edges(sf)
        nodes = _sanitize_join_output(coarse_aggregate(
            e.map_batches(
                lambda b: pa.table({"node": pa.concat_arrays(
                    [b["src"].combine_chunks(),
                     b["dst"].combine_chunks()])}),
                batch_format="pyarrow", batch_size=None),
            ["node"], lambda df: df.drop_duplicates()),
            pa.schema([("node", pa.string())]))

        def _asg(b: pa.Table) -> pa.Table:
            import numpy as np
            digits = pc.cast(pc.utf8_slice_codeunits(
                b["node"].combine_chunks(), 1, 99), pa.int64()) \
                .to_numpy(zero_copy_only=False)
            return pa.table({
                "node": b["node"],
                "community": pa.array((digits % 3).astype(str),
                                      pa.string())})

        asg = nodes.map_batches(_asg, batch_format="pyarrow",
                                batch_size=None)
        return quotient_graph(e, asg)

    def q_cc_incremental(sf):
        # incremental CC: assign = CC over the OLD residue chains
        # (m → m+1 inside 12-groups), then fold in NEW bridge edges
        # (m → m+12 for m%24==5) + a brand-new chain (m+10000 →
        # m+10001 for m%48==7); oracle recomputes CC over old ∪ new
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import (
            cc_incremental, connected_components_alternating)

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _old(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            m = k % 1200
            m = m[m % 12 != 11]
            return pa.table({"src": pa.array(m, pa.int64()),
                             "dst": pa.array(m + 1, pa.int64())})

        def _new(b: pa.Table) -> pa.Table:
            import numpy as np
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            m = k % 1200
            b1 = m[m % 24 == 5]
            b2 = m[m % 48 == 7]
            return pa.table({
                "src": pa.array(np.r_[b1, b2 + 10000], pa.int64()),
                "dst": pa.array(np.r_[b1 + 12, b2 + 10001],
                                pa.int64())})

        old_e = orders.map_batches(_old, batch_format="pyarrow",
                                   batch_size=None)
        new_e = orders.map_batches(_new, batch_format="pyarrow",
                                   batch_size=None)
        assign = connected_components_alternating(old_e)
        return cc_incremental(assign, new_e)

    def q_dag_depth(sf):
        # longest-path depth over a synthetic orderkey DAG (parent
        # rules k//8→k and k//64→k — ≤ 2 parents/node, depth ≈
        # log₈(max key)); integer depths, gate exact via a
        # dedup-UNION recursive CTE + max(d)
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import dag_depth

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _edges(b: pa.Table) -> pa.Table:
            import numpy as np
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            k = k[k >= 1]
            s1, d1 = k // 8, k
            m = (k >= 64) & (k // 64 != k // 8)
            s2, d2 = k[m] // 64, k[m]
            return pa.table({
                "src": pa.array(np.r_[s1, s2], pa.int64()),
                "dst": pa.array(np.r_[d1, d2], pa.int64())})

        e = orders.map_batches(_edges, batch_format="pyarrow",
                               batch_size=None)
        return dag_depth(e)

    def q_mis(sf):
        # Luby MIS, first two rounds (deterministic partial — the
        # oracle unrolls the identical two rounds) over a synthetic
        # orderkey graph: u = k % 997, v = (k*31+7) % 997
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import maximal_independent_set

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _edges(b: pa.Table) -> pa.Table:
            import numpy as np
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            u, v = k % 997, (k * 31 + 7) % 997
            m = u != v
            return pa.table({"src": pa.array(u[m], pa.int64()),
                             "dst": pa.array(v[m], pa.int64())})

        e = orders.map_batches(_edges, batch_format="pyarrow",
                               batch_size=None)
        return maximal_independent_set(e, max_rounds=2,
                                       allow_partial=True)

    def q_redirect_resolve(sf):
        # pointer-doubling redirect-chain resolution over a synthetic
        # acyclic redirect map (k → k//2 when k ≥ 2 and k % 3 ≠ 0 —
        # multiples of 3 are terminals); chains are ~log₂(max key)
        # long, resolved in O(log log) doubling rounds. Gate exact.
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import redirect_resolve

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _edges(b: pa.Table) -> pa.Table:
            import numpy as np
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            k = k[(k >= 2) & (k % 3 != 0)]
            return pa.table({
                "src": pa.array(k, pa.int64()),
                "dst": pa.array(k // 2, pa.int64())})

        e = orders.map_batches(_edges, batch_format="pyarrow",
                               batch_size=None)
        return redirect_resolve(e)

    def q_k_truss(sf):
        # 4-truss peeling, exactly 2 unrolled rounds (allow_partial —
        # the oracle unrolls the identical 2 rounds) over a dense
        # synthetic graph on 97 string-id nodes
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import k_truss

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _edges(b: pa.Table) -> pa.Table:
            import numpy as np
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            u, v = k % 41, (k // 41) % 41
            m = u != v
            return pa.table({
                "src": pa.array(np.char.add("n", u[m].astype(str))),
                "dst": pa.array(np.char.add("n", v[m].astype(str)))})

        e = orders.map_batches(_edges, batch_format="pyarrow",
                               batch_size=None)
        return k_truss(e, 4, max_iters=2, allow_partial=True)

    def q_betweenness(sf):
        # rows-only: Brandes dependency accumulation (forward sigma +
        # backward delta recursions) has no tractable SQL equivalent;
        # the pytest oracle carries the exact-identity check
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import betweenness

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _edges(b: pa.Table) -> pa.Table:
            import numpy as np
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            u, v = k % 211, (k * 13 + 5) % 211
            m = u != v
            return pa.table({"src": pa.array(u[m], pa.int64()),
                             "dst": pa.array(v[m], pa.int64())})

        e = orders.map_batches(_edges, batch_format="pyarrow",
                               batch_size=None)
        return betweenness(e, [0, 1, 2, 3, 4], max_hops=6)

    def q_reciprocity(sf):
        # directed reciprocity of the synthetic 211-node link graph;
        # integer counts + one IEEE division, gate exact
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import reciprocity

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _edges(b: pa.Table) -> pa.Table:
            import numpy as np
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            u, v = k % 211, (k * 13 + 5) % 211
            m = u != v
            return pa.table({"src": pa.array(u[m], pa.int64()),
                             "dst": pa.array(v[m], pa.int64())})

        return reciprocity(orders.map_batches(
            _edges, batch_format="pyarrow", batch_size=None))

    def q_assortativity(sf):
        # degree assortativity of the same graph, undirected; corr is
        # float — both sides quantize floor(r*1e6 + 1e-6)
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import assortativity

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _edges(b: pa.Table) -> pa.Table:
            import numpy as np
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            u, v = k % 141, (k // 141) % 141
            m = u != v
            return pa.table({"src": pa.array(u[m], pa.int64()),
                             "dst": pa.array(v[m], pa.int64())})

        out = assortativity(orders.map_batches(
            _edges, batch_format="pyarrow", batch_size=None))

        def _q(b):
            import numpy as np
            import pyarrow as pa
            r = b["r"].combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table({
                "n": b["n"],
                "r_q": pa.array(np.floor(r * 1e6 + 1e-6)
                                .astype(np.int64), pa.int64())})

        return out.map_batches(_q, batch_format="pyarrow",
                               batch_size=None)

    def q_sorted_neighborhood(sf):
        # sorted-neighborhood ER blocking over parts ordered by
        # (p_name, p_partkey), window 4; gate exact (integer pairs)
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import (
            sorted_neighborhood_pairs)

        part = rd.read_parquet(f"{sf}/part.parquet",
                               columns=["p_partkey", "p_name"])
        return sorted_neighborhood_pairs(
            part, key_col="p_name", id_col="p_partkey", window=4)

    def q_er_cluster(sf):
        # end-to-end entity resolution over synthetic alias groups:
        # 7 variants per group differ in one trailing char (lev 1),
        # group prefixes scrambled by *7919 %% 100003 so cross-group
        # lev-1 strays are rare (and deterministic on both sides)
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.functions.shuffle import coarse_aggregate
        from omop2obo_ray.pipelines.curate import er_cluster
        from omop2obo_ray.pipelines.textpipe import (
            _sanitize_join_output)

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _ents(b: pa.Table) -> pa.Table:
            import numpy as np
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            g, d = k % 500, (k // 500) % 7
            pref = (g * 7919) % 100003
            txt = np.char.add(np.char.add(np.char.add(
                "e", pref.astype(str)), "x"), d.astype(str))
            return pa.table({
                "id": pa.array(g * 7 + d, pa.int64()),
                "txt": pa.array(txt.tolist(), pa.large_string())})

        ents = _sanitize_join_output(
            coarse_aggregate(
                orders.map_batches(_ents, batch_format="pyarrow",
                                   batch_size=None),
                ["id"],
                lambda df: df.drop_duplicates(subset=["id"])),
            pa.schema([("id", pa.int64()),
                       ("txt", pa.large_string())]))
        return er_cluster(ents, id_col="id", text_col="txt",
                          window=8)

    def q_edge_embeddedness(sf):
        # per-edge triangle support (Granovetter embeddedness) over
        # the dense 41-node k_truss fixture graph; integer counts,
        # gate exact, zero-support bridges included
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import edge_embeddedness

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _edges(b: pa.Table) -> pa.Table:
            import numpy as np
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            u, v = k % 41, (k // 41) % 41
            m = u != v
            return pa.table({
                "src": pa.array(np.char.add("n", u[m].astype(str))),
                "dst": pa.array(np.char.add("n", v[m].astype(str)))})

        return edge_embeddedness(orders.map_batches(
            _edges, batch_format="pyarrow", batch_size=None))

    def q_powerlaw_alpha(sf):
        # Hill MLE of the degree-tail exponent over the 141-node
        # two-digit graph; ln-sum reassociation -> 1e6 quantizer
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import powerlaw_alpha

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _edges(b: pa.Table) -> pa.Table:
            import numpy as np
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            u, v = k % 141, (k // 141) % 141
            m = u != v
            return pa.table({"src": pa.array(u[m], pa.int64()),
                             "dst": pa.array(v[m], pa.int64())})

        out = powerlaw_alpha(orders.map_batches(
            _edges, batch_format="pyarrow", batch_size=None),
            d_min=2)

        def _q(b):
            import numpy as np
            import pyarrow as pa
            a = b["alpha"].combine_chunks().to_numpy(
                zero_copy_only=False)
            return pa.table({
                "n_tail": b["n_tail"],
                "alpha_q": pa.array(np.floor(a * 1e6 + 1e-6)
                                    .astype(np.int64), pa.int64())})

        return out.map_batches(_q, batch_format="pyarrow",
                               batch_size=None)

    def q_entity_pair_pmi(sf):
        # document-level co-occurrence PMI over length>=5 tokens
        # (bounded per-doc fan-out on this corpus: <=15 entities);
        # ln -> 1e6 quantizer
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import entity_pair_pmi

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        out = entity_pair_pmi(docs, min_len=5, min_pair_count=2)

        def _q(b):
            import numpy as np
            import pyarrow as pa
            p = b["pmi"].combine_chunks().to_numpy(
                zero_copy_only=False)
            return pa.table({
                "a": b["a"], "b": b["b"], "cab": b["cab"],
                "pmi_q": pa.array(np.floor(p * 1e6 + 1e-6)
                                  .astype(np.int64), pa.int64())})

        return out.map_batches(_q, batch_format="pyarrow",
                               batch_size=None)

    def q_wu_palmer(sf):
        # Wu-Palmer similarity for fixed concept pairs over a
        # synthetic binary-tree DAG on orderkey residues (child m →
        # parent m//2, m = o_orderkey % 1021, m >= 2); depth = exact
        # distributed ancestor-closure count (integer), sim =
        # 2.0*lca_depth/(da+db) — single-rounding IEEE ops shared
        # with the oracle, gate exact unquantized
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import wu_palmer

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _edges(b: pa.Table) -> pa.Table:
            import numpy as np
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            m = k % 1021
            m = m[m >= 2]
            return pa.table({
                "child": pa.array(m, pa.int64()),
                "parent": pa.array(m // 2, pa.int64())})

        e = orders.map_batches(_edges, batch_format="pyarrow",
                               batch_size=None)
        return wu_palmer(e, [(40, 41), (13, 97), (96, 97),
                             (5, 119), (2, 3), (500, 1019)])

    def q_resnik_lin(sf):
        # IC-based semantic similarity over the same residue tree;
        # annotation counts = orderkeys per residue (all residues —
        # 0/1 drop via the node-set semi-join inside the op);
        # min_freq exact int, resnik/lin single-ln floats → 1e6
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import resnik_lin

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _edges(b: pa.Table) -> pa.Table:
            import numpy as np
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            m = k % 1021
            m = m[m >= 2]
            return pa.table({
                "child": pa.array(m, pa.int64()),
                "parent": pa.array(m // 2, pa.int64())})

        def _cnt(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            return pa.table({
                "concept": pa.array(k % 1021, pa.int64()),
                "n": pa.array([1] * len(k), pa.int64())})

        e = orders.map_batches(_edges, batch_format="pyarrow",
                               batch_size=None)
        c = orders.map_batches(_cnt, batch_format="pyarrow",
                               batch_size=None)
        out = resnik_lin(e, c, [(40, 41), (13, 97), (96, 97),
                                (5, 119), (2, 3), (500, 1019)])

        def _q(b: pa.Table) -> pa.Table:
            import numpy as np
            r = b["resnik"].combine_chunks().to_numpy(
                zero_copy_only=False)
            l = b["lin"].combine_chunks().to_numpy(
                zero_copy_only=False)
            return pa.table({
                "qa": b["qa"], "qb": b["qb"],
                "min_freq": b["min_freq"],
                "resnik_q": pa.array(np.floor(r * 1e6 + 1e-6)
                                     .astype(np.int64), pa.int64()),
                "lin_q": pa.array(np.floor(l * 1e6 + 1e-6)
                                  .astype(np.int64), pa.int64())})

        return out.map_batches(_q, batch_format="pyarrow",
                               batch_size=None)

    def q_transitive_reduction(sf):
        # minimal equivalent edge set over the residue tree PLUS
        # asserted grandparent shortcuts (m → m//4 for m % 5 == 0,
        # m >= 4) — a shortcut survives only where the intermediate
        # hop's edge is absent from the data; exact integer gate
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import transitive_reduction

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _edges(b: pa.Table) -> pa.Table:
            import numpy as np
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            m = k % 1021
            m1 = m[m >= 2]
            m2 = m[(m >= 4) & (m % 5 == 0)]
            return pa.table({
                "child": pa.array(np.r_[m1, m2], pa.int64()),
                "parent": pa.array(np.r_[m1 // 2, m2 // 4],
                                   pa.int64())})

        e = orders.map_batches(_edges, batch_format="pyarrow",
                               batch_size=None)
        return transitive_reduction(e)

    def q_regex_extract(sf):
        # plant access-log lines from orderkeys (k%7==0 rows are
        # malformed), parse them back with RE2 named groups; oracle
        # recomputes the planted fields. Exact.
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import regex_extract

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _mk(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            verbs = np.array(["GET", "POST", "PUT"])[k % 3]
            code = (200 + (k % 4) * 100).astype(str)
            path = np.char.add("/p/", k.astype(str))
            line = np.char.add(np.char.add(np.char.add(
                np.char.add(verbs, " "), path), " "), code)
            bad = k % 7 == 0
            line = np.where(bad, "malformed line", line)
            return pa.table({
                "doc_id": pa.array(k, pa.int64()),
                "text": pa.array(line, pa.string())})

        ds = orders.map_batches(_mk, batch_format="pyarrow",
                                batch_size=None)
        return regex_extract(
            ds, r"(?P<verb>[A-Z]+) (?P<path>\S+) (?P<code>[0-9]{3})",
            keep_cols=["doc_id"])

    def q_kfold(sf):
        # stratified 4-fold assignment over customers by market
        # segment; pinned-hash ROW_NUMBER replay — exact
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import kfold_assign

        cust = rd.read_parquet(f"{sf}/customer.parquet",
                               columns=["c_custkey", "c_mktsegment"])

        ds = cust.map_batches(
            lambda b: pa.table({
                "id": b["c_custkey"].combine_chunks()
                .cast(pa.int64()),
                "seg": b["c_mktsegment"]}),
            batch_format="pyarrow", batch_size=None)
        return kfold_assign(ds, 4, id_col="id", strata_col="seg")

    def q_token_label_mi(sf):
        # token-vs-language mutual information over documents;
        # ln → 1e6 quantizer
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import token_label_mi

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text", "lang"])
        out = token_label_mi(docs, min_len=5, min_count=2)

        def _q(b: pa.Table) -> pa.Table:
            import numpy as np
            m = b["mi"].combine_chunks().to_numpy(
                zero_copy_only=False)
            return pa.table({
                "token": b["token"], "label": b["label"],
                "n_tc": b["n_tc"],
                "mi_q": pa.array(np.floor(m * 1e6 + 1e-6)
                                 .astype(np.int64), pa.int64())})

        return out.map_batches(_q, batch_format="pyarrow",
                               batch_size=None)

    def q_ndcg(sf):
        # NDCG@5 over synthetic runs (orders) and qrels (part);
        # log2 folds quantized 1e6
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import ndcg_at_k

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])
        part = rd.read_parquet(f"{sf}/part.parquet",
                               columns=["p_partkey"])

        def _runs(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            qid = k % 50
            doc = (k * 7 + 1) % 400
            return pa.table({
                "qid": pa.array(qid, pa.int64()),
                "doc_id": pa.array(doc, pa.int64()),
                "score": pa.array(
                    ((qid * 131 + doc * 17) % 997).astype("float64"),
                    pa.float64())})

        def _qrels(b: pa.Table) -> pa.Table:
            p = b["p_partkey"].to_numpy(zero_copy_only=False)
            qid = p % 50
            doc = (p * 3) % 400
            return pa.table({
                "qid": pa.array(qid, pa.int64()),
                "doc_id": pa.array(doc, pa.int64()),
                "rel": pa.array((qid + doc) % 3 + 1, pa.int64())})

        from omop2obo_ray.functions.shuffle import coarse_aggregate
        runs = coarse_aggregate(
            orders.map_batches(_runs, batch_format="pyarrow",
                               batch_size=None),
            ["qid", "doc_id"], lambda df: df.drop_duplicates())
        qrels = coarse_aggregate(
            part.map_batches(_qrels, batch_format="pyarrow",
                             batch_size=None),
            ["qid", "doc_id"], lambda df: df.drop_duplicates())
        out = ndcg_at_k(runs, qrels, k=5)

        def _q(b: pa.Table) -> pa.Table:
            import numpy as np
            cols = {"qid": b["qid"]}
            for c in ("dcg", "idcg", "ndcg"):
                v = b[c].combine_chunks().to_numpy(
                    zero_copy_only=False)
                cols[c + "_q"] = pa.array(
                    np.floor(v * 1e6 + 1e-6).astype(np.int64),
                    pa.int64())
            return pa.table(cols)

        return out.map_batches(_q, batch_format="pyarrow",
                               batch_size=None)

    def q_mrr(sf):
        # MRR@5 over the same run/qrel fixture as ndcg; rr is one
        # IEEE division of an exact rank — gate exact
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.functions.shuffle import coarse_aggregate
        from omop2obo_ray.pipelines.curate import mrr_at_k

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])
        part = rd.read_parquet(f"{sf}/part.parquet",
                               columns=["p_partkey"])

        def _runs(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            qid = k % 50
            doc = (k * 7 + 1) % 400
            return pa.table({
                "qid": pa.array(qid, pa.int64()),
                "doc_id": pa.array(doc, pa.int64()),
                "score": pa.array(
                    ((qid * 131 + doc * 17) % 997).astype("float64"),
                    pa.float64())})

        def _qrels(b: pa.Table) -> pa.Table:
            p = b["p_partkey"].to_numpy(zero_copy_only=False)
            qid = p % 50
            doc = (p * 3) % 400
            return pa.table({
                "qid": pa.array(qid, pa.int64()),
                "doc_id": pa.array(doc, pa.int64()),
                "rel": pa.array((qid + doc) % 3 + 1, pa.int64())})

        runs = coarse_aggregate(
            orders.map_batches(_runs, batch_format="pyarrow",
                               batch_size=None),
            ["qid", "doc_id"], lambda df: df.drop_duplicates())
        qrels = coarse_aggregate(
            part.map_batches(_qrels, batch_format="pyarrow",
                             batch_size=None),
            ["qid", "doc_id"], lambda df: df.drop_duplicates())
        return mrr_at_k(runs, qrels, k=5)

    def _bag_sides(sf):
        import pyarrow as pa
        import ray.data as rd

        cust = rd.read_parquet(f"{sf}/customer.parquet",
                               columns=["c_nationkey",
                                        "c_mktsegment"])
        supp = rd.read_parquet(f"{sf}/supplier.parquet",
                               columns=["s_suppkey", "s_nationkey"])
        l = cust.map_batches(
            lambda b: pa.table({
                "a": b["c_nationkey"].combine_chunks()
                .cast(pa.int64()),
                "b": b["c_mktsegment"]}),
            batch_format="pyarrow", batch_size=None)

        def _r(b: pa.Table) -> pa.Table:
            import numpy as np
            s = b["s_suppkey"].to_numpy(zero_copy_only=False)
            return pa.table({
                "a": b["s_nationkey"].combine_chunks()
                .cast(pa.int64()),
                "b": pa.array(np.where(s % 2 == 0, "BUILDING",
                                       "MACHINERY"), pa.string())})

        r = supp.map_batches(_r, batch_format="pyarrow",
                             batch_size=None)
        return l, r

    def q_bag_intersect(sf):
        # INTERSECT ALL multiplicity semantics; exact
        from omop2obo_ray.pipelines.relational import bag_set_op

        l, r = _bag_sides(sf)
        return bag_set_op(l, r, "intersect")

    def q_bag_except(sf):
        # EXCEPT ALL multiplicity semantics; exact
        from omop2obo_ray.pipelines.relational import bag_set_op

        l, r = _bag_sides(sf)
        return bag_set_op(l, r, "except")

    def q_ks_drift(sf):
        # KS drift between even- and odd-user event-value samples
        # (floored ints); exact cumsum ECDF comparison
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import ks_drift

        ev = rd.read_parquet(f"{sf}/events.parquet",
                             columns=["user_id", "value"])

        def _side(par):
            def fn(b: pa.Table) -> pa.Table:
                import numpy as np
                u = b["user_id"].to_numpy(zero_copy_only=False)
                v = b["value"].to_numpy(zero_copy_only=False)
                m = (u % 2) == par
                return pa.table({"v": pa.array(
                    np.floor(v[m]).astype(np.int64), pa.int64())})
            return fn

        l = ev.map_batches(_side(0), batch_format="pyarrow",
                           batch_size=None)
        r = ev.map_batches(_side(1), batch_format="pyarrow",
                           batch_size=None)
        return ks_drift(l, r)

    def q_triple_vote(sf):
        # multi-source conflicting triples from lineitem; exact
        # counts + one division
        import pandas as pd
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import triple_vote

        li = rd.read_parquet(f"{sf}/lineitem.parquet",
                             columns=["l_orderkey", "l_partkey",
                                      "l_suppkey"])

        def _t(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "subj": "o" + (df["l_orderkey"] % 500).astype(str),
                "pred": "has",
                "obj": "p" + (df["l_partkey"] % 7).astype(str),
                "source": "s" + (df["l_suppkey"] % 11).astype(str)})

        return triple_vote(li.map_batches(
            _t, batch_format="pandas", batch_size=None))

    def q_label_spreading(sf):
        # seeded typing over the bipartite order-part graph: every
        # 7th order seeded with type 't'||(k%3), 2 unrolled rounds
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import label_spreading

        li = rd.read_parquet(f"{sf}/lineitem.parquet",
                             columns=["l_orderkey", "l_partkey"])

        def _e(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "src": "o" + df["l_orderkey"].astype(str),
                "dst": "p" + df["l_partkey"].astype(str)})

        def _s(df: pd.DataFrame) -> pd.DataFrame:
            m = df["l_orderkey"] % 7 == 0
            k = df.loc[m, "l_orderkey"]
            return pd.DataFrame({
                "node": "o" + k.astype(str),
                "label": "t" + (k % 3).astype(str)
            }).drop_duplicates()

        e = li.map_batches(_e, batch_format="pandas",
                           batch_size=None)
        seeds = li.map_batches(_s, batch_format="pandas",
                               batch_size=None)
        from omop2obo_ray.functions.shuffle import coarse_aggregate
        seeds = coarse_aggregate(seeds, ["node"],
                                 lambda df: df.drop_duplicates())
        return label_spreading(e, seeds, iterations=2)

    def q_entropy_per_key(sf):
        # per-user event-type entropy; ln terms → 1e6
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import entropy_per_key

        ev = rd.read_parquet(f"{sf}/events.parquet",
                             columns=["user_id", "event_type"])

        out = entropy_per_key(
            ev.map_batches(
                lambda b: pa.table({
                    "k": b["user_id"].combine_chunks()
                    .cast(pa.int64()),
                    "v": b["event_type"]}),
                batch_format="pyarrow", batch_size=None),
            key_col="k", val_col="v")

        def _q(b: pa.Table) -> pa.Table:
            import numpy as np
            h = b["entropy"].combine_chunks().to_numpy(
                zero_copy_only=False)
            return pa.table({
                "k": b["k"], "n": b["n"],
                "n_distinct": b["n_distinct"],
                "entropy_q": pa.array(np.floor(h * 1e6 + 1e-6)
                                      .astype(np.int64),
                                      pa.int64())})

        return out.map_batches(_q, batch_format="pyarrow",
                               batch_size=None)

    def q_spearman(sf):
        # per-priority Spearman between quantity and extendedprice
        # ranks over lineitem joined to orders... kept slim: key =
        # l_orderkey % 20, x = quantity, y = floor(extendedprice);
        # rho quantized 1e6 (corr accumulation order differs)
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import spearman_per_key

        li = rd.read_parquet(f"{sf}/lineitem.parquet",
                             columns=["l_orderkey", "l_quantity",
                                      "l_extendedprice"])

        def _mk(b: pa.Table) -> pa.Table:
            import numpy as np
            k = b["l_orderkey"].to_numpy(zero_copy_only=False)
            q = b["l_quantity"].to_numpy(zero_copy_only=False)
            p = b["l_extendedprice"].to_numpy(zero_copy_only=False)
            return pa.table({
                "k": pa.array(k % 20, pa.int64()),
                "x": pa.array(q.astype("int64"), pa.int64()),
                "y": pa.array(np.floor(p).astype("int64"),
                              pa.int64())})

        out = spearman_per_key(li.map_batches(
            _mk, batch_format="pyarrow", batch_size=None),
            key_col="k", x_col="x", y_col="y")

        def _q(b: pa.Table) -> pa.Table:
            import numpy as np
            r = b["rho"].combine_chunks().to_numpy(
                zero_copy_only=False)
            return pa.table({
                "k": b["k"], "n": b["n"],
                "rho_q": pa.array(np.floor(r * 1e6 + 1e-6)
                                  .astype(np.int64), pa.int64())})

        return out.map_batches(_q, batch_format="pyarrow",
                               batch_size=None)

    def q_cramers_v(sf):
        # lang × (doc_id % 4) association; float sums → 1e6
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import cramers_v

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "lang"])

        def _mk(b: pa.Table) -> pa.Table:
            import numpy as np
            d = b["doc_id"].to_numpy(zero_copy_only=False)
            return pa.table({
                "a": b["lang"].combine_chunks().cast(pa.string()),
                "b": pa.array((d % 4).astype(str), pa.string())})

        out = cramers_v(docs.map_batches(
            _mk, batch_format="pyarrow", batch_size=None),
            a_col="a", b_col="b")

        def _q(b: pa.Table) -> pa.Table:
            import numpy as np
            chi = b["chi2"].combine_chunks().to_numpy(
                zero_copy_only=False)
            v = b["v"].combine_chunks().to_numpy(
                zero_copy_only=False)
            return pa.table({
                "n": b["n"], "r": b["r"], "c": b["c"],
                "chi2_q": pa.array(np.floor(chi * 1e6 + 1e-6)
                                   .astype(np.int64), pa.int64()),
                "v_q": pa.array(np.floor(v * 1e6 + 1e-6)
                                .astype(np.int64), pa.int64())})

        return out.map_batches(_q, batch_format="pyarrow",
                               batch_size=None)

    def q_js_divergence(sf):
        # JSD between even/odd-user event-value bins (v // 10);
        # ln terms → 1e6
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import js_divergence

        ev = rd.read_parquet(f"{sf}/events.parquet",
                             columns=["user_id", "value"])

        def _side(par):
            def fn(b: pa.Table) -> pa.Table:
                import numpy as np
                u = b["user_id"].to_numpy(zero_copy_only=False)
                v = b["value"].to_numpy(zero_copy_only=False)
                m = (u % 2) == par
                return pa.table({"v": pa.array(
                    np.floor(v[m]).astype(np.int64) // 10,
                    pa.int64())})
            return fn

        out = js_divergence(
            ev.map_batches(_side(0), batch_format="pyarrow",
                           batch_size=None),
            ev.map_batches(_side(1), batch_format="pyarrow",
                           batch_size=None))

        def _q(b: pa.Table) -> pa.Table:
            import numpy as np
            j = b["jsd"].combine_chunks().to_numpy(
                zero_copy_only=False)
            return pa.table({
                "n1": b["n1"], "n2": b["n2"], "n_bins": b["n_bins"],
                "jsd_q": pa.array(np.floor(j * 1e6 + 1e-6)
                                  .astype(np.int64), pa.int64())})

        return out.map_batches(_q, batch_format="pyarrow",
                               batch_size=None)

    def q_vocab_overlap(sf):
        # vocab Jaccard between even/odd-doc_id document halves;
        # exact int counts + single-rounding ratios
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import vocab_overlap

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])

        def _half(par):
            def fn(b: pa.Table) -> pa.Table:
                d = b["doc_id"].to_numpy(zero_copy_only=False)
                return b.filter(pa.array((d % 2) == par))
            return fn

        return vocab_overlap(
            docs.map_batches(_half(0), batch_format="pyarrow",
                             batch_size=None),
            docs.map_batches(_half(1), batch_format="pyarrow",
                             batch_size=None), min_len=1)

    def q_psi_drift(sf):
        # PSI between even/odd-user event-value bins (v // 10);
        # ln terms → 1e6 quantizer
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import psi_drift

        ev = rd.read_parquet(f"{sf}/events.parquet",
                             columns=["user_id", "value"])

        def _side(par):
            def fn(b: pa.Table) -> pa.Table:
                import numpy as np
                u = b["user_id"].to_numpy(zero_copy_only=False)
                v = b["value"].to_numpy(zero_copy_only=False)
                m = (u % 2) == par
                return pa.table({"v": pa.array(
                    np.floor(v[m]).astype(np.int64) // 10,
                    pa.int64())})
            return fn

        out = psi_drift(
            ev.map_batches(_side(0), batch_format="pyarrow",
                           batch_size=None),
            ev.map_batches(_side(1), batch_format="pyarrow",
                           batch_size=None))

        def _q(b: pa.Table) -> pa.Table:
            import numpy as np
            p = b["psi"].combine_chunks().to_numpy(
                zero_copy_only=False)
            return pa.table({
                "n1": b["n1"], "n2": b["n2"], "n_bins": b["n_bins"],
                "n_skipped": b["n_skipped"],
                "psi_q": pa.array(np.floor(p * 1e6 + 1e-6)
                                  .astype(np.int64), pa.int64())})

        return out.map_batches(_q, batch_format="pyarrow",
                               batch_size=None)

    def q_mad_outliers(sf):
        # robust modified z-scores per order over quantities;
        # medians are identical (a+b)/2 interpolations both sides —
        # exact gate
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import mad_outliers

        li = rd.read_parquet(f"{sf}/lineitem.parquet",
                             columns=["l_orderkey", "l_linenumber",
                                      "l_quantity"])

        def _mk(b: pa.Table) -> pa.Table:
            k = b["l_orderkey"].to_numpy(zero_copy_only=False)
            ln = b["l_linenumber"].to_numpy(zero_copy_only=False)
            q = b["l_quantity"].to_numpy(zero_copy_only=False)
            return pa.table({
                "id": pa.array(k * 10 + ln, pa.int64()),
                "k": pa.array(k, pa.int64()),
                "v": pa.array(q.astype("int64"), pa.int64())})

        return mad_outliers(li.map_batches(
            _mk, batch_format="pyarrow", batch_size=None),
            key_col="k", val_col="v", id_col="id", z_thresh=1.0)

    def q_gini(sf):
        # per-group quantity concentration over lineitem (key =
        # orderkey % 50); exact int numerator/denominator, one
        # division — exact gate
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import gini_per_key

        li = rd.read_parquet(f"{sf}/lineitem.parquet",
                             columns=["l_orderkey", "l_quantity"])

        def _mk(b: pa.Table) -> pa.Table:
            k = b["l_orderkey"].to_numpy(zero_copy_only=False)
            q = b["l_quantity"].to_numpy(zero_copy_only=False)
            return pa.table({
                "key": pa.array(k % 50, pa.int64()),
                "val": pa.array(q.astype("int64"), pa.int64())})

        return gini_per_key(li.map_batches(
            _mk, batch_format="pyarrow", batch_size=None),
            key_col="key", val_col="val")

    def q_ap_at_k(sf):
        # AP@5 over the same run/qrel fixture; float term-sum → 1e6
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.functions.shuffle import coarse_aggregate
        from omop2obo_ray.pipelines.curate import ap_at_k

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])
        part = rd.read_parquet(f"{sf}/part.parquet",
                               columns=["p_partkey"])

        def _runs(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            qid = k % 50
            doc = (k * 7 + 1) % 400
            return pa.table({
                "qid": pa.array(qid, pa.int64()),
                "doc_id": pa.array(doc, pa.int64()),
                "score": pa.array(
                    ((qid * 131 + doc * 17) % 997).astype("float64"),
                    pa.float64())})

        def _qrels(b: pa.Table) -> pa.Table:
            p = b["p_partkey"].to_numpy(zero_copy_only=False)
            qid = p % 50
            doc = (p * 3) % 400
            return pa.table({
                "qid": pa.array(qid, pa.int64()),
                "doc_id": pa.array(doc, pa.int64()),
                "rel": pa.array((qid + doc) % 3 + 1, pa.int64())})

        runs = coarse_aggregate(
            orders.map_batches(_runs, batch_format="pyarrow",
                               batch_size=None),
            ["qid", "doc_id"], lambda df: df.drop_duplicates())
        qrels = coarse_aggregate(
            part.map_batches(_qrels, batch_format="pyarrow",
                             batch_size=None),
            ["qid", "doc_id"], lambda df: df.drop_duplicates())
        out = ap_at_k(runs, qrels, k=5)

        def _q(b: pa.Table) -> pa.Table:
            import numpy as np
            v = b["ap"].combine_chunks().to_numpy(
                zero_copy_only=False)
            return pa.table({
                "qid": b["qid"], "n_rel": b["n_rel"],
                "ap_q": pa.array(np.floor(v * 1e6 + 1e-6)
                                 .astype(np.int64), pa.int64())})

        return out.map_batches(_q, batch_format="pyarrow",
                               batch_size=None)

    def q_recall_at_k(sf):
        # recall@5 over the same run/qrel fixture; exact int ratio
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.functions.shuffle import coarse_aggregate
        from omop2obo_ray.pipelines.curate import recall_at_k

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])
        part = rd.read_parquet(f"{sf}/part.parquet",
                               columns=["p_partkey"])

        def _runs(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            qid = k % 50
            doc = (k * 7 + 1) % 400
            return pa.table({
                "qid": pa.array(qid, pa.int64()),
                "doc_id": pa.array(doc, pa.int64()),
                "score": pa.array(
                    ((qid * 131 + doc * 17) % 997).astype("float64"),
                    pa.float64())})

        def _qrels(b: pa.Table) -> pa.Table:
            p = b["p_partkey"].to_numpy(zero_copy_only=False)
            qid = p % 50
            doc = (p * 3) % 400
            return pa.table({
                "qid": pa.array(qid, pa.int64()),
                "doc_id": pa.array(doc, pa.int64()),
                "rel": pa.array((qid + doc) % 3 + 1, pa.int64())})

        runs = coarse_aggregate(
            orders.map_batches(_runs, batch_format="pyarrow",
                               batch_size=None),
            ["qid", "doc_id"], lambda df: df.drop_duplicates())
        qrels = coarse_aggregate(
            part.map_batches(_qrels, batch_format="pyarrow",
                             batch_size=None),
            ["qid", "doc_id"], lambda df: df.drop_duplicates())
        return recall_at_k(runs, qrels, k=5)

    def q_classifier_eval(sf):
        # per-class confusion P/R/F1 over a deterministic noisy
        # predictor (every 5th doc misread as 'xx'); exact gate
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import classifier_eval

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "lang"])

        def _mk(b: pa.Table) -> pa.Table:
            import numpy as np
            did = b["doc_id"].to_numpy(zero_copy_only=False)
            lang = b["lang"].combine_chunks().cast(pa.string()) \
                .to_numpy(zero_copy_only=False)
            pred = np.where(did % 5 == 0, "xx", lang)
            return pa.table({
                "pred": pa.array(pred, pa.string()),
                "gold": pa.array(lang, pa.string())})

        return classifier_eval(docs.map_batches(
            _mk, batch_format="pyarrow", batch_size=None))

    def q_readability(sf):
        # Flesch-Kincaid over documents; exact RE2 counts + three
        # single-rounding IEEE ops — gate exact unquantized
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import readability_scores

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        return readability_scores(docs)

    def q_calibration(sf):
        # reliability bins over synthetic scores from events
        # (score = floor(value)%100/100, label = event_id%3==0);
        # float bin-sums quantized 1e6, counts/frac_pos exact
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import calibration_bins

        ev = rd.read_parquet(f"{sf}/events.parquet",
                             columns=["event_id", "value"])

        def _mk(b: pa.Table) -> pa.Table:
            import numpy as np
            v = b["value"].to_numpy(zero_copy_only=False)
            eid = b["event_id"].to_numpy(zero_copy_only=False)
            return pa.table({
                "score": pa.array(
                    (np.floor(v).astype(np.int64) % 100) / 100.0,
                    pa.float64()),
                "label": pa.array((eid % 3 == 0).astype(np.int64),
                                  pa.int64())})

        ds = ev.map_batches(_mk, batch_format="pyarrow",
                            batch_size=None)
        out = calibration_bins(ds, score_col="score",
                               label_col="label")

        def _q(b: pa.Table) -> pa.Table:
            import numpy as np
            ms = b["mean_score"].combine_chunks().to_numpy(
                zero_copy_only=False)
            gp = b["gap"].combine_chunks().to_numpy(
                zero_copy_only=False)
            return pa.table({
                "bin": b["bin"], "n": b["n"],
                "mean_score_q": pa.array(
                    np.floor(ms * 1e6 + 1e-6).astype(np.int64),
                    pa.int64()),
                "frac_pos": b["frac_pos"],
                "gap_q": pa.array(
                    np.floor(gp * 1e6 + 1e-6).astype(np.int64),
                    pa.int64())})

        return out.map_batches(_q, batch_format="pyarrow",
                               batch_size=None)

    def q_er_eval(sf):
        # pairwise P/R/F1 of the CC clustering over the old residue
        # chains against synthetic gold pairs (every 3rd chain link
        # = easy TP; cross-group (m, m+12) pairs = planted FNs);
        # exact counts + single-rounding ratios
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.functions.shuffle import coarse_aggregate
        from omop2obo_ray.pipelines.curate import er_eval
        from omop2obo_ray.pipelines.graph import \
            connected_components_alternating

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _old(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            m = k % 1200
            m = m[m % 12 != 11]
            return pa.table({"src": pa.array(m, pa.int64()),
                             "dst": pa.array(m + 1, pa.int64())})

        def _gold(b: pa.Table) -> pa.Table:
            import numpy as np
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            m = k % 1200
            g1 = m[(m % 12 != 11) & (m % 3 == 0)]
            g2 = m[m % 24 == 5]
            return pa.table({
                "a": pa.array(np.r_[g1, g2], pa.int64()),
                "b": pa.array(np.r_[g1 + 1, g2 + 12], pa.int64())})

        assign = connected_components_alternating(
            orders.map_batches(_old, batch_format="pyarrow",
                               batch_size=None))
        gold = coarse_aggregate(
            orders.map_batches(_gold, batch_format="pyarrow",
                               batch_size=None),
            ["a", "b"], lambda df: df.drop_duplicates())
        return er_eval(assign, gold, cluster_col="component")

    def q_cusum(sf):
        # per-user CUSUM drift alarms over event values (floored to
        # ints so both engines fold exact integers); the prefix-
        # extrema identity replays as SQL window functions — exact
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import cusum_flags

        ev = rd.read_parquet(f"{sf}/events.parquet",
                             columns=["event_id", "ts", "user_id",
                                      "value"])

        def _mk(b: pa.Table) -> pa.Table:
            import numpy as np
            v = b["value"].to_numpy(zero_copy_only=False)
            return pa.table({
                "id": b["event_id"].combine_chunks()
                .cast(pa.int64()),
                "k": b["user_id"].combine_chunks().cast(pa.int64()),
                "t": b["ts"].combine_chunks().cast(
                    pa.timestamp("us")).cast(pa.int64()),
                "v": pa.array(np.floor(v).astype(np.int64),
                              pa.int64())})

        ds = ev.map_batches(_mk, batch_format="pyarrow",
                            batch_size=None)
        return cusum_flags(ds, key_col="k", ts_col="t", val_col="v",
                           id_col="id", target=5, threshold=20.0)

    def q_grouped_outliers(sf):
        # per-order quantity z-scores; integer accumulation is exact
        # so the float finale replays unquantized
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import grouped_outliers

        li = rd.read_parquet(f"{sf}/lineitem.parquet",
                             columns=["l_orderkey", "l_linenumber",
                                      "l_quantity"])

        def _mk(b: pa.Table) -> pa.Table:
            k = b["l_orderkey"].to_numpy(zero_copy_only=False)
            ln = b["l_linenumber"].to_numpy(zero_copy_only=False)
            q = b["l_quantity"].to_numpy(zero_copy_only=False)
            return pa.table({
                "id": pa.array(k * 10 + ln, pa.int64()),
                "k": pa.array(k, pa.int64()),
                "v": pa.array(q.astype("int64"), pa.int64())})

        ds = li.map_batches(_mk, batch_format="pyarrow",
                            batch_size=None)
        return grouped_outliers(ds, "k", "v", "id", z_thresh=1.2)

    def q_json_flatten(sf):
        # plant JSON sidecar metadata from orderkeys (k%11==0 rows
        # malformed), flatten three paths back; oracle recomputes
        # the planted fields. Exact.
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import json_flatten

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _mk(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            lang = np.array(["en", "de", "fr"])[k % 3]
            ok = np.where(k % 2 == 0, "true", "false")
            js = np.char.add(np.char.add(np.char.add(np.char.add(
                np.char.add('{"id": ', k.astype(str)),
                ', "meta": {"lang": "'), lang),
                '", "depth": ' + ""), np.char.add(
                (k % 5).astype(str), np.char.add(
                    '}, "ok": ', np.char.add(ok, "}"))))
            js = np.where(k % 11 == 0, "{broken", js)
            return pa.table({
                "doc_id": pa.array(k, pa.int64()),
                "payload": pa.array(js, pa.string())})

        ds = orders.map_batches(_mk, batch_format="pyarrow",
                                batch_size=None)
        return json_flatten(ds, ["id", "meta.lang", "meta.depth",
                                 "ok"], keep_cols=["doc_id"])

    def q_mask_tokens(sf):
        # deterministic MLM masking over documents; pinned-hash
        # election replays exactly in SQL
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import mask_tokens

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        return mask_tokens(docs, rate_pct=15)

    def q_assoc_rules(sf):
        # directed association rules over doc-level entity
        # co-occurrence; conf/lift are single-rounding IEEE ratios of
        # exact counts — gate exact unquantized
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import assoc_rules

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        return assoc_rules(docs, min_len=5, min_pair_count=2,
                           min_conf=0.5)

    def q_bpe_train(sf):
        # rows-only: iterative argmax merge learning has no SQL
        # equivalent; pytest carries the reference-identity check
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import bpe_train

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        return bpe_train(docs, n_merges=10)

    def q_bpe_token_counts(sf):
        # rows-only: counts under the learned merges (iterative model)
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import (bpe_token_counts,
                                                   bpe_train)

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        return bpe_token_counts(docs, bpe_train(docs, n_merges=10))

    def q_dsir_weights(sf):
        # DSIR importance weights: target domain = source 'src0';
        # weight_q is exact int64 (difference of the two quantized
        # LM scores)
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import dsir_weights

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "source", "text"])
        return dsir_weights(docs, target_col="source",
                            target_value="src0")

    def q_edit_join(sf):
        # exact Levenshtein<=1 fuzzy self-match: queries are parts
        # with ONE deterministic character deletion (position =
        # p_partkey % length — arithmetic shared with the oracle);
        # SymSpell deletion-neighborhood blocking is lossless, so the
        # engine must reproduce the oracle's CROSS JOIN ... WHERE
        # levenshtein(...) <= 1 exactly
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import edit_distance_join

        parts = rd.read_parquet(f"{sf}/part.parquet",
                                columns=["p_partkey", "p_name"])

        def mk_queries(df: pd.DataFrame) -> pd.DataFrame:
            pos = (df["p_partkey"].to_numpy()
                   % df["p_name"].str.len().to_numpy()).astype(int)
            return pd.DataFrame({
                "q_id": df["p_partkey"],
                "q_name": [n[:p] + n[p + 1:]
                           for n, p in zip(df["p_name"], pos)]})

        queries = parts.map_batches(mk_queries, batch_format="pandas",
                                    batch_size=None)
        out = edit_distance_join(
            queries, parts, key_l="q_id", text_l="q_name",
            key_r="p_partkey", text_r="p_name", max_dist=1)
        return out.map_batches(
            lambda b: pa.table({"q_id": b["lk"], "p_partkey": b["rk"],
                                "dist": b["dist"]}),
            batch_format="pyarrow", batch_size=None)

    def q_dedup_incremental(sf):
        # crawl-refresh dedup: the "previous snapshot" store is the
        # md5 hashes of docs with doc_id % 3 == 0 (deterministic rule
        # shared with the oracle); survivors = min-doc_id per text
        # among texts NOT in the store
        import tempfile

        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import (_md5_hex_table,
                                                     dedup_incremental)

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        with tempfile.TemporaryDirectory() as store:
            prev = docs.map_batches(
                lambda b: b.filter(pa.array(
                    b["doc_id"].to_numpy(zero_copy_only=False)
                    % 3 == 0)),
                batch_format="pyarrow", batch_size=None)
            _md5_hex_table(prev, "doc_id", "text").select_columns(
                ["h"]).write_parquet(store)
            out = dedup_incremental(docs, store)
            return out.select_columns(["doc_id"]).to_pandas()

    def q_snapshot_diff(sf):
        # crawl diff between two deterministic synthetic snapshots of
        # the documents table (rules shared with the oracle):
        # old = doc_id % 2 == 0 (as-is); new = doc_id % 3 != 1, with
        # text||'x' when doc_id % 5 == 0 — yields all three statuses
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import snapshot_diff

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])

        def mk_old(df: pd.DataFrame) -> pd.DataFrame:
            return df[df["doc_id"] % 2 == 0]

        def mk_new(df: pd.DataFrame) -> pd.DataFrame:
            out = df[df["doc_id"] % 3 != 1].copy(deep=False)
            mod = out["doc_id"] % 5 == 0
            out["text"] = np.where(mod, out["text"] + "x", out["text"])
            return out

        old = docs.map_batches(mk_old, batch_format="pandas",
                               batch_size=None)
        new = docs.map_batches(mk_new, batch_format="pandas",
                               batch_size=None)
        return snapshot_diff(old, new)

    def q_salted_join(sf):
        # skew-safe join path: hot_threshold=5 makes most custkeys
        # "hot" at fixture scale so the salt/replicate rewrite is
        # actually exercised; result must equal the plain join
        import ray.data as rd

        from omop2obo_ray.functions.shuffle import salted_join

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey", "o_custkey"])
        cust = rd.read_parquet(f"{sf}/customer.parquet",
                               columns=["c_custkey", "c_name"])
        return salted_join(orders, cust, on="o_custkey",
                           right_on="c_custkey", hot_threshold=5,
                           n_salts=4)

    def q_bloom_semi(sf):
        # Bloom-pushdown semi join: keep orders whose customer sits in
        # the BUILDING market segment — the bitmap is broadcast-sized,
        # the exact verify join ships only bloom survivors. Gate is the
        # plain IN-subquery semi join (the bloom layer must be
        # semantically invisible).
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import bloom_semi_join

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey", "o_custkey"])
        cust = rd.read_parquet(f"{sf}/customer.parquet",
                               columns=["c_custkey", "c_mktsegment"])
        seg = cust.filter(
            expr="c_mktsegment == 'BUILDING'").select_columns(
                ["c_custkey"])
        return bloom_semi_join(orders, seg, on="o_custkey",
                               right_on="c_custkey", how="left_semi")

    def q_bloom_anti(sf):
        # the anti complement on the same shape: bloom non-members
        # stream straight through with no exchange at all
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import bloom_semi_join

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey", "o_custkey"])
        cust = rd.read_parquet(f"{sf}/customer.parquet",
                               columns=["c_custkey", "c_mktsegment"])
        seg = cust.filter(
            expr="c_mktsegment == 'BUILDING'").select_columns(
                ["c_custkey"])
        return bloom_semi_join(orders, seg, on="o_custkey",
                               right_on="c_custkey", how="left_anti")

    def q_neighbor_mean(sf):
        # one GraphSAGE-mean propagation round over a deterministic
        # synthetic link rule (src = vec_id, dst = (vec_id*7+3) % 499 —
        # shared arithmetic contract with the oracle); mean floats
        # quantized with the shared epsilon-floor
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import neighbor_mean_embeddings

        emb = rd.read_parquet(f"{sf}/embeddings.parquet",
                              columns=["vec_id", "embedding"])

        def _edges(b: pa.Table) -> pa.Table:
            v = b["vec_id"].combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table({"src": pa.array(v, pa.int64()),
                             "dst": pa.array((v * 7 + 3) % 499, pa.int64())})

        edges = emb.select_columns(["vec_id"]).map_batches(
            _edges, batch_format="pyarrow", batch_size=None)
        nm = neighbor_mean_embeddings(edges, emb)

        def _q(batch: pa.Table) -> pa.Table:
            a = batch["avg"].combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table({
                "node": batch["node"], "dim": batch["dim"],
                "avg_q": pa.array(np.floor(a * 1e6 + 1e-9)
                                  .astype(np.int64), pa.int64())})

        return nm.map_batches(_q, batch_format="pyarrow", batch_size=None)

    def q_char_entropy(sf):
        # printable-ASCII Shannon entropy per doc; shared epsilon-floor
        # quantizer (only group-sum reassociation differs)
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import char_entropy

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        ent = char_entropy(docs)

        def _q(batch: pa.Table) -> pa.Table:
            e = batch["entropy"].combine_chunks().to_numpy(
                zero_copy_only=False)
            return pa.table({
                "doc_id": batch["doc_id"], "n_chars": batch["n_chars"],
                "entropy_q": pa.array(np.floor(e * 1e6 + 1e-9)
                                      .astype(np.int64), pa.int64())})

        return ent.map_batches(_q, batch_format="pyarrow",
                               batch_size=None)

    def q_link_prediction(sf):
        # common-neighbors / Adamic-Adar / Jaccard candidate scores
        # over the shared triangle-bearing graph; floats quantized with
        # the shared epsilon-floor (group-sum reassociation only)
        import numpy as np
        import pyarrow as pa

        from omop2obo_ray.pipelines.graph import link_prediction

        lp = link_prediction(_synth_tri_edges(sf))

        def _q(batch: pa.Table) -> pa.Table:
            aa = batch["aa"].combine_chunks().to_numpy(zero_copy_only=False)
            jc = batch["jacc"].combine_chunks().to_numpy(
                zero_copy_only=False)
            return pa.table({
                "a": batch["a"], "b": batch["b"], "cn": batch["cn"],
                "aa_q": pa.array(np.floor(aa * 1e6 + 1e-9)
                                 .astype(np.int64), pa.int64()),
                "jacc_q": pa.array(np.floor(jc * 1e6 + 1e-9)
                                   .astype(np.int64), pa.int64())})

        return lp.map_batches(_q, batch_format="pyarrow", batch_size=None)

    def _geo_triples(sf):
        # shared triple construction for the SPARQL aggregate/modifier
        # gates: customers + suppliers in_nation, nations in_region
        import pandas as pd
        import ray.data as rd

        cust = rd.read_parquet(f"{sf}/customer.parquet",
                               columns=["c_custkey", "c_nationkey"])
        nat = rd.read_parquet(f"{sf}/nation.parquet",
                              columns=["n_nationkey", "n_regionkey"])
        supp = rd.read_parquet(f"{sf}/supplier.parquet",
                               columns=["s_suppkey", "s_nationkey"])

        def _t(skey, pred, okey, sp, op):
            def inner(df: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame({
                    "subj": sp + df[skey].astype(str),
                    "pred": pred,
                    "obj": op + df[okey].astype(str)})
            return inner

        return (
            cust.map_batches(_t("c_custkey", "in_nation", "c_nationkey",
                                "c", "n"), batch_format="pandas",
                             batch_size=None)
            .union(nat.map_batches(_t("n_nationkey", "in_region",
                                      "n_regionkey", "n", "r"),
                                   batch_format="pandas", batch_size=None))
            .union(supp.map_batches(_t("s_suppkey", "in_nation",
                                       "s_nationkey", "s", "n"),
                                    batch_format="pandas",
                                    batch_size=None)))

    def q_bgp_aggregate(sf):
        # SPARQL GROUP BY over BGP bindings: per region, member count
        # (customers + suppliers via in_nation→in_region), distinct
        # nations, min/max nation term (string ordering)
        from omop2obo_ray.pipelines.graph import bgp_aggregate

        return bgp_aggregate(
            _geo_triples(sf),
            [("?m", "in_nation", "?n"), ("?n", "in_region", "?r")],
            ["r"], agg_var="n",
            aggs=("count", "count_distinct", "min", "max"))

    def q_bgp_select(sf):
        # SPARQL solution modifiers: FILTER (codepoint string compare,
        # same collation as SQL VARCHAR) → ORDER BY a total key →
        # LIMIT. ?c binds every in_nation subject (customers AND
        # suppliers), each exactly once, so ORDER BY c is total and the
        # LIMIT cut is deterministic.
        from omop2obo_ray.pipelines.graph import bgp_select

        return bgp_select(
            _geo_triples(sf),
            [("?c", "in_nation", "?n"), ("?n", "in_region", "?r")],
            filters=[("r", "!=", "r0"), ("c", ">", "c2")],
            order_by=["c"], limit=500)

    def q_lag_lead(sf):
        # LAG/LEAD window per user over (ts, event_id); partition edges
        # yield null → sentineled identically on both sides, floats
        # epsilon-floor quantized (house rule)
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import window_lag_lead

        ev = rd.read_parquet(f"{sf}/events.parquet",
                             columns=["user_id", "event_id", "ts",
                                      "value"])
        out = window_lag_lead(ev, "user_id", ["ts", "event_id"], "value")
        sent = np.int64(-(10 ** 15))

        def _q(batch: pa.Table) -> pa.Table:
            def qz(col):
                v = batch[col].combine_chunks().to_numpy(
                    zero_copy_only=False)
                q = np.where(np.isnan(v), sent,
                             np.floor(v * 1e4 + 1e-6)).astype(np.int64)
                return pa.array(q, pa.int64())

            return pa.table({"user_id": batch["user_id"],
                             "event_id": batch["event_id"],
                             "lag_q": qz("lag_v"),
                             "lead_q": qz("lead_v")})

        return out.map_batches(_q, batch_format="pyarrow",
                               batch_size=None)

    def q_rollup(sf):
        # GROUP BY ROLLUP(l_returnflag, l_linestatus): all prefix
        # grouping levels in ONE combiner-first exchange; quantity sums
        # are integral in this data, quantized anyway per house rule
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import grouped_rollup

        li = rd.read_parquet(f"{sf}/lineitem.parquet",
                             columns=["l_returnflag", "l_linestatus",
                                      "l_quantity"])
        out = grouped_rollup(li, ["l_returnflag", "l_linestatus"],
                             "l_quantity")

        def _q(batch: pa.Table) -> pa.Table:
            s = batch["sum_v"].combine_chunks().to_numpy(
                zero_copy_only=False)
            return pa.table({
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "lvl": batch["lvl"],
                "sum_q": pa.array(np.floor(s * 1e2 + 1e-4)
                                  .astype(np.int64), pa.int64()),
                "n_rows": batch["n_rows"]})

        return out.map_batches(_q, batch_format="pyarrow",
                               batch_size=None)

    def q_cube(sf):
        # GROUP BY CUBE(l_returnflag, l_linestatus): ALL 2^m grouping
        # sets in one combiner-first exchange, gid = GROUPING_ID bitmask
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import grouped_cube

        li = rd.read_parquet(f"{sf}/lineitem.parquet",
                             columns=["l_returnflag", "l_linestatus",
                                      "l_quantity"])
        out = grouped_cube(li, ["l_returnflag", "l_linestatus"],
                           "l_quantity")

        def _q(batch: pa.Table) -> pa.Table:
            s = batch["sum_v"].combine_chunks().to_numpy(
                zero_copy_only=False)
            return pa.table({
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "gid": batch["gid"],
                "sum_q": pa.array(np.floor(s * 1e2 + 1e-4)
                                  .astype(np.int64), pa.int64()),
                "n_rows": batch["n_rows"]})

        return out.map_batches(_q, batch_format="pyarrow",
                               batch_size=None)

    def q_funnel(sf):
        # view → click → purchase greedy-earliest funnel per user over
        # the events stream; integer step counts, gate exact
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import funnel_steps

        ev = rd.read_parquet(f"{sf}/events.parquet",
                             columns=["user_id", "event_type", "ts"])
        return funnel_steps(ev, ["view", "click", "purchase"])

    def q_scalar_quantize(sf):
        # SQ8 codes exploded to (vec_id, dim, q) long form for the SQL
        # gate; the quantizer expression is pinned float64-exact on
        # both sides (min/max stats are exact, no sum reassociation)
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import scalar_quantize

        emb = rd.read_parquet(f"{sf}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
        codes, _stats = scalar_quantize(emb)

        def _explode(b: pa.Table) -> pa.Table:
            arr = b["code"].combine_chunks()
            n = len(arr)
            dim = arr.type.byte_width
            buf = np.frombuffer(arr.buffers()[1], np.uint8)[
                arr.offset * dim:(arr.offset + n) * dim]
            vid = b["vec_id"].to_numpy(zero_copy_only=False)
            return pa.table({
                "vec_id": pa.array(np.repeat(vid, dim), pa.int64()),
                "dim": pa.array(np.tile(
                    np.arange(dim, dtype=np.int64), n)),
                "q": pa.array(buf.astype(np.int64), pa.int64())})

        return codes.map_batches(_explode, batch_format="pyarrow",
                                 batch_size=None)

    def q_skyline(sf):
        # Pareto front of parts: minimize p_retailprice, maximize
        # p_size; doubles read from the same parquet on both sides, so
        # comparisons are exact — no quantizer
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import skyline2d

        part = rd.read_parquet(f"{sf}/part.parquet",
                               columns=["p_partkey", "p_retailprice",
                                        "p_size"])
        return skyline2d(part, "p_retailprice", "p_size",
                         cols=["p_partkey"])

    def q_bgp_union(sf):
        # SPARQL UNION over the geo KG: customer bindings carry the
        # region var, supplier branch leaves ?r unbound (null padding)
        import pandas as pd
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import match_bgp_union

        cust = rd.read_parquet(f"{sf}/customer.parquet",
                               columns=["c_custkey", "c_nationkey"])
        supp = rd.read_parquet(f"{sf}/supplier.parquet",
                               columns=["s_suppkey", "s_nationkey"])
        nat = rd.read_parquet(f"{sf}/nation.parquet",
                              columns=["n_nationkey", "n_regionkey"])

        def _c(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "subj": "c" + df["c_custkey"].astype(str),
                "pred": "cust_in",
                "obj": "n" + df["c_nationkey"].astype(str)})

        def _s(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "subj": "s" + df["s_suppkey"].astype(str),
                "pred": "supp_in",
                "obj": "n" + df["s_nationkey"].astype(str)})

        def _r(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "subj": "n" + df["n_nationkey"].astype(str),
                "pred": "in_region",
                "obj": "r" + df["n_regionkey"].astype(str)})

        triples = (cust.map_batches(_c, batch_format="pandas",
                                    batch_size=None)
                   .union(supp.map_batches(_s, batch_format="pandas",
                                           batch_size=None))
                   .union(nat.map_batches(_r, batch_format="pandas",
                                          batch_size=None)))
        return match_bgp_union(
            triples,
            [[("?x", "cust_in", "?n"), ("?n", "in_region", "?r")],
             [("?x", "supp_in", "?n")]])

    def q_random_walks(sf):
        # DeepWalk corpus over the symmetrized distinct order—part
        # bipartite graph (part ids offset by 1e8 into their own id
        # space); pinned integer hash recurrence, gate EXACT
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from omop2obo_ray.functions.shuffle import coarse_aggregate
        from omop2obo_ray.pipelines.graph import random_walks

        li = rd.read_parquet(f"{sf}/lineitem.parquet",
                             columns=["l_orderkey", "l_partkey"])

        def _both(df: pd.DataFrame) -> pd.DataFrame:
            o = df["l_orderkey"].to_numpy()
            p = df["l_partkey"].to_numpy() + 100000000
            return pd.DataFrame({
                "src": np.concatenate([o, p]),
                "dst": np.concatenate([p, o])})

        edges = coarse_aggregate(
            li.map_batches(_both, batch_format="pandas",
                           batch_size=None),
            ["src", "dst"], lambda df: df.drop_duplicates())
        return random_walks(edges, walk_len=2, walks_per_node=2,
                            seed=17)

    def q_weighted_pagerank(sf):
        # anchor-weighted-link-graph analog: rank distributes
        # proportional to l_quantity; same epsilon-floor 1e-4 quantizer
        # as q_pagerank (weighted ranks are generic rationals — the
        # boundary-collision probability is ~1e-10 per node)
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import pagerank

        lin = rd.read_parquet(f"{sf}/lineitem.parquet",
                              columns=["l_orderkey", "l_partkey",
                                       "l_quantity"])

        def _e(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "src": "o" + df["l_orderkey"].astype(str),
                "dst": "p" + df["l_partkey"].astype(str),
                "q": df["l_quantity"].astype(np.float64)})

        edges = lin.map_batches(_e, batch_format="pandas",
                                batch_size=None)
        ranks = pagerank(edges, iterations=2, weight_col="q")

        def _q(batch: pa.Table) -> pa.Table:
            r = batch["rank"].combine_chunks().to_numpy(
                zero_copy_only=False)
            q = np.floor(r * 1e4 + 1e-6).astype(np.int64)
            return pa.table({"node": batch["node"],
                             "rank_q": pa.array(q, pa.int64())})

        return ranks.map_batches(_q, batch_format="pyarrow",
                                 batch_size=None)

    def q_sssp(sf):
        # weighted shortest paths from order 1 over the symmetrized
        # order—part graph (w = quantity, integral in this data →
        # int64-exact); max_rounds=2 pins the ≤2-edge Bellman-Ford
        # table, which the oracle unrolls exactly
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import sssp

        li = rd.read_parquet(f"{sf}/lineitem.parquet",
                             columns=["l_orderkey", "l_partkey",
                                      "l_quantity"])

        def _both(df: pd.DataFrame) -> pd.DataFrame:
            o = df["l_orderkey"].to_numpy()
            p = df["l_partkey"].to_numpy() + 100000000
            w = df["l_quantity"].to_numpy().astype(np.int64)
            return pd.DataFrame({
                "src": np.concatenate([o, p]),
                "dst": np.concatenate([p, o]),
                "w": np.concatenate([w, w])})

        edges = li.map_batches(_both, batch_format="pandas",
                               batch_size=None)
        return sssp(edges, [1], max_rounds=2)

    def q_ntile(sf):
        # NTILE(4) per user over (value, event_id) total order; integer
        # tiles, doubles read from the same parquet — gate exact
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import ntile

        ev = rd.read_parquet(f"{sf}/events.parquet",
                             columns=["user_id", "value", "event_id"])
        return ntile(ev, "user_id", ["value", "event_id"], 4)

    def q_grouped_corr(sf):
        # Pearson corr + regression line of extendedprice on quantity
        # per returnflag; sufficient-stats sums reassociate vs DuckDB's
        # single-pass kernels, so the gate epsilon-floor quantizes
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import grouped_corr

        li = rd.read_parquet(f"{sf}/lineitem.parquet",
                             columns=["l_returnflag", "l_quantity",
                                      "l_extendedprice"])
        out = grouped_corr(li, "l_returnflag", "l_quantity",
                           "l_extendedprice")

        def _q(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "l_returnflag": df["l_returnflag"],
                "n": df["n"],
                "corr_q": np.floor(df["corr"] * 1e6 + 1e-6)
                .astype(np.int64),
                "slope_q": np.floor(df["slope"] * 1e4 + 1e-6)
                .astype(np.int64),
                "icept_q": np.floor(df["intercept"] * 1e2 + 1e-6)
                .astype(np.int64)})

        return out.map_batches(_q, batch_format="pandas",
                               batch_size=None)

    def q_cap_per_key(sf):
        # per-domain page-cap analog: at most 3 events per user by the
        # pinned multiplicative-hash order; integer rows, gate exact
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import cap_per_key

        ev = rd.read_parquet(f"{sf}/events.parquet",
                             columns=["user_id", "event_id",
                                      "event_type"])
        return cap_per_key(ev, "user_id", "event_id", 3,
                           cols=["event_type"])

    def q_skipgram_pairs(sf):
        # item2vec training pairs over per-user event sequences,
        # window 2; integer counts, gate exact
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import skipgram_pairs

        ev = rd.read_parquet(f"{sf}/events.parquet",
                             columns=["user_id", "event_type", "ts",
                                      "event_id"])
        return skipgram_pairs(ev, window=2)

    def q_streaks(sf):
        # consecutive-active-day islands per user; day strings +
        # integer run lengths, gate exact
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import streaks

        ev = rd.read_parquet(f"{sf}/events.parquet",
                             columns=["user_id", "ts"])
        return streaks(ev)

    def q_scd2_intervals(sf):
        # SCD2 validity-interval compaction of the per-user event
        # stream: one row per maximal same-value run, half-open
        # [effective_from, effective_to) with (ts, event_id) tiebreak;
        # timestamps compare exactly, gate exact
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import scd2_intervals

        ev = rd.read_parquet(
            f"{sf}/events.parquet",
            columns=["user_id", "ts", "event_type", "event_id"])
        return scd2_intervals(ev)

    def q_mmr_rerank(sf):
        # rows-only: greedy argmax re-ranking has no SQL equivalent;
        # pytest carries the exact pure-python-oracle identity
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import (brute_force_topk,
                                                     mmr_rerank)

        emb = rd.read_parquet(f"{sf}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
        qs = [(r["vec_id"], list(r["embedding"]))
              for r in emb.filter(
                  lambda r: r["vec_id"] in (0, 1, 2)).take(3)]
        cands = brute_force_topk(emb, qs, k=50)
        reranked = mmr_rerank(rd.from_pandas(
            cands[["qid", "vec_id", "cos"]]), emb, k=10, lam=0.7)
        return reranked.select_columns(["qid", "vec_id", "mmr_rank"])

    def q_window_rank(sf):
        # RANK/DENSE_RANK per order over line quantities (integral
        # doubles → plenty of ties); integer ranks, gate exact
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import window_rank

        lin = rd.read_parquet(
            f"{sf}/lineitem.parquet",
            columns=["l_orderkey", "l_linenumber", "l_quantity"])
        return window_rank(lin, key_col="l_orderkey",
                           val_col="l_quantity")

    def q_window_pct(sf):
        # PERCENT_RANK / CUME_DIST per order over line quantities
        # (integral doubles, heavy ties); exact-ratio gate
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import window_pct

        lin = rd.read_parquet(
            f"{sf}/lineitem.parquet",
            columns=["l_orderkey", "l_linenumber", "l_quantity"])
        return window_pct(lin, key_col="l_orderkey",
                          val_col="l_quantity")

    def q_ewma(sf):
        # per-user exponentially weighted moving average (alpha=0.5)
        # over the event stream; engine emits the recursive scan, the
        # oracle replays the identical recurrence via a row_number
        # recursive CTE; both sides quantize at 1e6 (the two
        # float64 recursions agree to ~1e-11)
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import ewma

        ev = rd.read_parquet(
            f"{sf}/events.parquet",
            columns=["user_id", "ts", "event_id", "value"])
        out = ewma(ev)

        def _q(b):
            import numpy as np
            import pyarrow as pa
            y = b["y"].combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table({
                "user_id": b["user_id"], "event_id": b["event_id"],
                "y_q": pa.array(np.floor(y * 1e6 + 1e-6).astype(np.int64),
                                pa.int64())})

        return out.map_batches(_q, batch_format="pyarrow",
                               batch_size=None)

    def q_interval_join(sf):
        # point-in-time join of a shifted copy of the event stream to
        # its own SCD2 validity intervals; half-open boundary and
        # open-tail semantics exercised, gate exact (timestamps)
        import pandas as pd
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import (interval_join,
                                                       scd2_intervals)

        ev = rd.read_parquet(
            f"{sf}/events.parquet",
            columns=["user_id", "ts", "event_type", "event_id"])
        iv = scd2_intervals(ev)

        def _shift(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "user_id": df["user_id"],
                "ts": df["ts"] - pd.to_timedelta(90, unit="min"),
                "fact_id": df["event_id"]})

        facts = ev.map_batches(_shift, batch_format="pandas",
                               batch_size=None)
        return interval_join(facts, iv)

    def q_weighted_sample(sf):
        # A-Res weighted sampling without replacement over orders,
        # weight = o_totalprice; pinned-hash uniform shared with SQL
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import weighted_sample

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey", "o_totalprice"])
        return weighted_sample(orders, 100, weight_col="o_totalprice",
                               id_col="o_orderkey")

    def q_gap_fill(sf):
        # calendar-spine densification + forward fill per user:
        # integer epoch-day grid, exact gate
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import gap_fill

        ev = rd.read_parquet(
            f"{sf}/events.parquet",
            columns=["user_id", "ts", "event_type", "event_id"])
        return gap_fill(ev)

    def q_cohort_retention(sf):
        # first-active-day cohorts × distinct-active-day offsets;
        # integer counts, gate exact
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import cohort_retention

        ev = rd.read_parquet(f"{sf}/events.parquet",
                             columns=["user_id", "ts"])
        return cohort_retention(ev)

    def q_lift(sf):
        # decile lift table over planted scores with DISTINCT values
        # (score = ((k*37) % 1009) / 1009, pos = (k*13) % 100 <
        # 60*score+10 rounds... kept integer: pos = (k*13)%100 <
        # ((k*37)%1009)//17): NTILE over ORDER BY score DESC
        # replayed; exact ints + single divisions
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import lift_table

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _mk(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            sc = ((k * 37) % 1009).astype(np.float64) \
                + k.astype(np.float64) / 1e9  # distinct tie-break
            pos = ((k * 13) % 100 < ((k * 37) % 1009) // 17)
            return pa.table({
                "score": pa.array(sc, pa.float64()),
                "label": pa.array(pos.astype(np.int64), pa.int64())})

        ds = orders.map_batches(_mk, batch_format="pyarrow",
                                batch_size=None)
        return lift_table(ds)

    def q_wl(sf):
        # 1-WL color refinement (2 rounds) over the synthetic
        # coprime-moduli digraph made undirected; colors are md5 hex
        # on BOTH sides (DuckDB md5 + ordered string_agg) — exact
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import wl_labels

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _edges(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            u, v = k % 499, (k * 31 + 7) % 503
            m = u != v
            return pa.table({"src": pa.array(u[m], pa.int64()),
                             "dst": pa.array(v[m], pa.int64())})

        e = orders.map_batches(_edges, batch_format="pyarrow",
                               batch_size=None)
        return wl_labels(e, rounds=2)

    def q_page_meta(sf):
        # REAL head-metadata parse: render pages with planted title/
        # description/canonical/lang (entity escapes + swapped
        # attribute order by parity); oracle replays the planted
        # fields arithmetically. Exact gate.
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import page_meta

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id"])

        def _mk(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            urls, htmls = [], []
            for k in ids:
                k = int(k)
                lang = ["en", "de", "fr"][k % 3]
                meta = (f'<meta name="description" '
                        f'content="about topic {k % 50}">'
                        if k % 2 == 0 else
                        f'<META CONTENT="about topic {k % 50}" '
                        f'NAME="description">')
                page = (
                    f'<html lang="{lang}"><head>'
                    f'<title>Doc &amp; {k}</title>{meta}'
                    f'<link rel="canonical" '
                    f'href="https://canon-{k % 97}.test/"></head>'
                    f'<body><p>body {k}</p></body></html>')
                urls.append(f"https://host-{k}.test/index")
                htmls.append(page.encode())
            return pa.table({"url": pa.array(urls, pa.string()),
                             "html": pa.array(htmls, pa.binary())})

        pages = docs.map_batches(_mk, batch_format="pyarrow",
                                 batch_size=None)
        return page_meta(pages)

    def q_interarrival(sf):
        # per-user inter-event gap stats: exact int sufficient stats
        # + the single-rounding mean/std expressions the oracle
        # spells identically. Exact gate.
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import \
            interarrival_stats

        ev = rd.read_parquet(f"{sf}/events.parquet",
                             columns=["user_id", "ts", "event_id"])
        return interarrival_stats(ev)

    def q_jl_projection(sf):
        # JL random projection to 8 dims: engine = numpy matmul
        # against the pinned Box-Muller matrix; oracle rebuilds the
        # SAME matrix with SQL sqrt/ln/cos/pi and sums the products.
        # Sum reassociation (numpy pairwise vs SQL sequential)
        # differs at ~1e-15 rel, so the gate quantizes at 1e6
        # (deterministic inputs: verified off-boundary at both SFs).
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import random_projection

        emb = rd.read_parquet(f"{sf}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
        proj = random_projection(emb, 8, seed=17)

        def _unpivot(b: pa.Table) -> pa.Table:
            ids = b["vec_id"].to_numpy(zero_copy_only=False)
            arr = b["proj"].combine_chunks()
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            n = len(ids)
            q = np.floor(flat * 1e6 + 0.5).astype(np.int64)
            return pa.table({
                "vec_id": pa.array(np.repeat(ids, 8), pa.int64()),
                "j": pa.array(np.tile(np.arange(1, 9, dtype=np.int64),
                                      n), pa.int64()),
                "pq": pa.array(q, pa.int64())})

        return proj.map_batches(_unpivot, batch_format="pyarrow",
                                batch_size=None)

    def q_gazetteer(sf):
        # REAL Aho-Corasick span tagging over planted text with
        # arithmetic offsets: 'y'*(k%5) + ' aspirin ' + 'z'*(k%3)
        # [+ ' insulin' when k even]; the oracle recomputes the
        # start/end positions arithmetically. Exact gate.
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.textpipe import gazetteer_spans

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _mk(b: pa.Table) -> pa.Table:
            ks = b["o_orderkey"].to_numpy(zero_copy_only=False)
            txt = []
            for k in ks:
                k = int(k)
                t = "y" * (k % 5) + " aspirin " + "z" * (k % 3)
                if k % 2 == 0:
                    t += " insulin"
                txt.append(t)
            return pa.table({"doc_id": pa.array(ks, pa.int64()),
                             "text": pa.array(txt, pa.string())})

        ds = orders.map_batches(_mk, batch_format="pyarrow",
                                batch_size=None)
        return gazetteer_spans(ds, ["aspirin", "insulin"])

    def q_transitions(sf):
        # first-order Markov next-event estimates per user sequence;
        # LEAD window oracle; exact ints + one shared division
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import transition_probs

        ev = rd.read_parquet(f"{sf}/events.parquet",
                             columns=["user_id", "event_type", "ts",
                                      "event_id"])
        return transition_probs(ev)

    def q_gunzip(sf):
        # REAL decompression: builder gzip-compresses each doc's
        # text; the engine inflates; text identity vs the table is
        # the gate. Exact.
        import gzip

        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import gunzip_column

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])

        def _mk(b: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": b["doc_id"],
                "payload": pa.array(
                    [gzip.compress(t.encode())
                     for t in b["text"].to_pylist()], pa.binary())})

        gz = docs.map_batches(_mk, batch_format="pyarrow",
                              batch_size=None)
        out = gunzip_column(gz)
        return out.map_batches(
            lambda b: pa.table({
                "doc_id": b["doc_id"],
                "text": pa.array(
                    [v.decode() for v in b["payload"].to_pylist()],
                    pa.string())}),
            batch_format="pyarrow", batch_size=None)

    def q_kappa(sf):
        # Cohen's kappa over planted paired labels (60% forced
        # agreement + deterministic disagreement); oracle replays
        # the po/pe/kappa arithmetic. Exact gate.
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import cohens_kappa

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _mk(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            a = k % 4
            bb = np.where(k % 5 < 3, a, (k * 7) % 4)
            return pa.table({
                "label_a": pa.array([f"l{x}" for x in a],
                                    pa.string()),
                "label_b": pa.array([f"l{x}" for x in bb],
                                    pa.string())})

        ds = orders.map_batches(_mk, batch_format="pyarrow",
                                batch_size=None)
        return cohens_kappa(ds)

    def q_ab_test(sf):
        # two-proportion z-test: arms from orderkey % 3 with planted
        # arm-dependent conversion rates ((k*13)%100 < 10+5*arm);
        # oracle spells the pooled-z float expression identically.
        # Exact gate.
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import \
            ab_proportion_test

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _mk(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            arm = (k % 3).astype(np.int64)
            conv = ((k * 13) % 100 < 10 + 5 * arm).astype(np.int64)
            return pa.table({
                "arm": pa.array([f"arm{a}" for a in arm],
                                pa.string()),
                "converted": pa.array(conv, pa.int64())})

        ds = orders.map_batches(_mk, batch_format="pyarrow",
                                batch_size=None)
        return ab_proportion_test(ds)

    def q_dataset_diff(sf):
        # release-to-release row delta on (orderstatus, priority)
        # key pairs: old = odd orderkeys, new = keys % 3 != 0;
        # exact set-status gate
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import dataset_diff

        orders = rd.read_parquet(
            f"{sf}/orders.parquet",
            columns=["o_orderkey", "o_orderstatus",
                     "o_orderpriority"])
        import pyarrow as pa
        import pyarrow.compute as pc

        def _mod_filter(m):
            def fn(b: pa.Table) -> pa.Table:
                import numpy as np
                k = b["o_orderkey"].to_numpy(zero_copy_only=False)
                return b.filter(pa.array(k % m != 0))
            return fn

        old = orders.map_batches(_mod_filter(2),
                                 batch_format="pyarrow",
                                 batch_size=None)
        new = orders.map_batches(_mod_filter(3),
                                 batch_format="pyarrow",
                                 batch_size=None)
        return dataset_diff(old, new,
                            ["o_orderstatus", "o_orderpriority"])

    def q_profile_table(sf):
        # per-column audit profile over orders (int + varchar
        # columns — str casts agree between engines); exact
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import profile_table

        orders = rd.read_parquet(
            f"{sf}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderstatus"])
        return profile_table(
            orders, ["o_orderkey", "o_custkey", "o_orderstatus"])

    def q_bleu(sf):
        # BLEU-2 of each doc against its XOR-partner's text (real
        # cross-text overlap, varying brevity penalty); clipped
        # precisions + bp + geometric mean spelled identically in
        # both engines. Exact gate.
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.functions.shuffle import coarse_join
        from omop2obo_ray.pipelines.curate import bleu_score
        from omop2obo_ray.pipelines.textpipe import \
            _sanitize_join_output

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        probe = docs.map_batches(
            lambda b: pa.table({
                "doc_id": b["doc_id"],
                "pid": pa.array(
                    b["doc_id"].to_numpy(zero_copy_only=False) ^ 1,
                    pa.int64())}),
            batch_format="pyarrow", batch_size=None)
        rid = docs.map_batches(
            lambda b: pa.table({"rid": b["doc_id"],
                                "text": b["text"]}),
            batch_format="pyarrow", batch_size=None)
        refs = coarse_join(probe, rid, on="pid", right_on="rid",
                           how="inner").map_batches(
            lambda b: pa.table({"doc_id": b["doc_id"],
                                "text": b["text"]}),
            batch_format="pyarrow", batch_size=None)
        return bleu_score(docs, refs, max_n=2)

    def q_rouge(sf):
        # ROUGE-2 of each document against its own first-8-token
        # truncation (truncation rule shared with the oracle via the
        # pinned [a-z0-9]+ tokenizer); clipped bigram overlap, P/R
        # single IEEE divisions, F1 from the rounded P/R in both
        # engines. Exact gate.
        import re

        import pandas as pd
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import rouge_n

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        tok = re.compile(r"[a-z0-9]+")

        def _trunc(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": df["doc_id"],
                "text": [" ".join(tok.findall(str(t).lower())[:8])
                         for t in df["text"]]})

        refs = docs.map_batches(_trunc, batch_format="pandas",
                                batch_size=None)
        return rouge_n(docs, refs, n=2)

    def q_cocitation(sf):
        # co-citation pairs over the synthetic directed orderkey
        # graph (cap far above fixture degrees); oracle is the
        # distinct-edge self-join count. Exact gate.
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import directed_wedge_pairs

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _edges(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            u, v = k % 499, (k * 31 + 7) % 503
            m = u != v
            return pa.table({"src": pa.array(u[m], pa.int64()),
                             "dst": pa.array(v[m], pa.int64())})

        e = orders.map_batches(_edges, batch_format="pyarrow",
                               batch_size=None)
        return directed_wedge_pairs(e, mode="cocitation")

    def q_bib_coupling(sf):
        # bibliographic-coupling pairs, same graph, transposed
        # wedge direction. Exact gate.
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import directed_wedge_pairs

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _edges(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            u, v = k % 499, (k * 31 + 7) % 503
            m = u != v
            return pa.table({"src": pa.array(u[m], pa.int64()),
                             "dst": pa.array(v[m], pa.int64())})

        e = orders.map_batches(_edges, batch_format="pyarrow",
                               batch_size=None)
        return directed_wedge_pairs(e, mode="coupling")

    def q_hearst(sf):
        # Hearst hypernym mining, engine-vs-engine regex: plant
        # deterministic pattern sentences from doc ids; the engine
        # extracts with Python re, DuckDB with RE2
        # regexp_extract_all — both run the real scan. Exact gate.
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import hearst_patterns

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id"])

        def _mk(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            txt = []
            for i in ids:
                k = int(i)
                t = f"metal{k % 7} such as iron{k % 11}"
                if k % 2 == 0:
                    t += f" tool{k % 5} including hammer{k % 13}"
                if k % 3 == 0:
                    t += f" cat{k % 3} and other beast{k % 4}"
                txt.append(t)
            return pa.table({"doc_id": b["doc_id"],
                             "text": pa.array(txt, pa.string())})

        ds = docs.map_batches(_mk, batch_format="pyarrow",
                              batch_size=None)
        return hearst_patterns(ds)

    def q_katz(sf):
        # truncated Katz over the synthetic directed orderkey graph
        # (u = k%997 → v = (k·31+7)%997), beta = 1/8, rounds = 2:
        # katz_num = 64 + 8·walks_1 + walks_2 is exact int64; the
        # oracle unrolls both walk-count joins. Exact (one final
        # IEEE division shared by both engines).
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import katz_centrality

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _edges(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            u, v = k % 997, (k * 31 + 7) % 997
            m = u != v
            return pa.table({"src": pa.array(u[m], pa.int64()),
                             "dst": pa.array(v[m], pa.int64())})

        e = orders.map_batches(_edges, batch_format="pyarrow",
                               batch_size=None)
        return katz_centrality(e, beta_inv=8, rounds=2)

    def q_graph_diff(sf):
        # crawl-delta audit: old crawl = edges from odd orderkeys,
        # new crawl = edges from orderkeys % 3 != 0, same edge rule —
        # overlap gives all three statuses. Exact set gate.
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import graph_diff

        orders = rd.read_parquet(f"{sf}/orders.parquet",
                                 columns=["o_orderkey"])

        def _edges(keep_mod, keep_ne):
            def fn(b: pa.Table) -> pa.Table:
                k = b["o_orderkey"].to_numpy(zero_copy_only=False)
                k = k[k % keep_mod != keep_ne]
                u, v = k % 700, (k * 31 + 7) % 700
                m = u != v
                return pa.table({"src": pa.array(u[m], pa.int64()),
                                 "dst": pa.array(v[m], pa.int64())})
            return fn

        old = orders.map_batches(_edges(2, 0),
                                 batch_format="pyarrow",
                                 batch_size=None)
        new = orders.map_batches(_edges(3, 0),
                                 batch_format="pyarrow",
                                 batch_size=None)
        return graph_diff(old, new)

    def q_nfc_normalize(sf):
        # REAL Unicode normalization, engine-vs-engine: plant
        # denormalized text (combining acute 'e'+U+0301, combining
        # ring 'A'+U+030A, ligature U+FB01 — untouched by NFC) from
        # doc ids; the engine normalizes via unicodedata, DuckDB via
        # its own nfc_normalize. Exact string gate.
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.curate import normalize_unicode

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id"])

        def _mk(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            txt = [f"w{int(i)} e\u0301 A\u030a \ufb01x"
                   if i % 2 == 0 else f"w{int(i)} plain"
                   for i in ids]
            return pa.table({"doc_id": b["doc_id"],
                             "text": pa.array(txt, pa.string())})

        ds = docs.map_batches(_mk, batch_format="pyarrow",
                              batch_size=None)
        return normalize_unicode(ds, form="NFC", out_col="text_nfc")

    def q_alias_table(sf):
        # mention→entity prior over the REAL anchor-text parse of the
        # synth pages (text chr(96+k), target (doc_id·31+k·17)%500);
        # oracle recomputes counts + window total + one CAST-DOUBLE
        # division. Exact gate.
        import ray.data as rd

        from omop2obo_ray.pipelines.graph import (alias_table,
                                                  anchor_text_edges,
                                                  synth_anchor_pages)

        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id"])
        return alias_table(anchor_text_edges(synth_anchor_pages(docs)))

    def q_mode_per_key(sf):
        # dominant returnflag per supplier (3 values, ties common → the
        # lexicographic tie-break is load-bearing); exact gate
        import pyarrow as pa
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import mode_per_key

        li = rd.read_parquet(f"{sf}/lineitem.parquet",
                             columns=["l_suppkey", "l_returnflag"])
        ds = li.map_batches(
            lambda b: pa.table({"k": b["l_suppkey"],
                                "v": b["l_returnflag"]}),
            batch_format="pyarrow", batch_size=None)
        return mode_per_key(ds, "k", "v")

    def q_merge_intervals(sf):
        # per-supplier shipment-window coalescing: [shipday,
        # shipday + orderkey%20] closed intervals; oracle is the
        # window prefix-max island detection. Exact gate.
        import pandas as pd
        import ray.data as rd

        from omop2obo_ray.pipelines.relational import merge_intervals

        li = rd.read_parquet(
            f"{sf}/lineitem.parquet",
            columns=["l_suppkey", "l_orderkey", "l_shipdate"])

        def _iv(df: pd.DataFrame) -> pd.DataFrame:
            day = (df["l_shipdate"]
                   - pd.Timestamp("1970-01-01")).dt.days
            return pd.DataFrame({
                "k": df["l_suppkey"].astype("int64"),
                "s": day.astype("int64"),
                "e": (day + df["l_orderkey"] % 20).astype("int64")})

        ds = li.map_batches(_iv, batch_format="pandas",
                            batch_size=None)
        return merge_intervals(ds, key_col="k", start_col="s",
                               end_col="e")

    return {
        # SURVEY §2 operator families (SQL-checked)
        "normalize_codes": R.q_normalize_codes,          # M1
        "explode_tokens": R.q_explode_tokens,            # M2
        "row_expansion": R.q_row_expansion,              # M11
        "melt_customer": R.q_melt_customer,              # M3
        "pivot_orderstatus": R.q_pivot_orderstatus,      # M4/A2
        "aggregate_values": R.q_aggregate_values,        # A1
        "orders_customer_nation": R.q_orders_customer_nation,  # J1-J3 broadcast
        "orders_customer_join_native": R.q_orders_customer_join_native,  # native hash join
        "top_tokens": R.q_top_tokens,                    # combiner agg + topk
        "customers_without_orders": R.q_customers_without_orders,  # J9 anti
        "dedup_docs": R.q_dedup_docs,                    # A3 exact dedup
        "lineitem_agg": q_lineitem_agg,                  # A5/A6 partial agg
        "topk_orders_per_priority": R.q_topk_orders_per_priority,  # K1/K3
        "filter_threshold": q_filter_threshold,          # K2
        "sort_limit_docs": R.q_sort_limit_docs,          # K4
        "ancestor_closure": R.q_ancestor_closure,        # DAG closure
        "window_tumbling": q_window_tumbling,            # streaming-shaped
        "window_session": R.q_window_session,            # gap sessions
        "window_sliding": R.q_window_sliding,            # hopping windows
        "asof_join": R.q_asof_join,                      # temporal most-recent match
        "range_join": R.q_range_join,                    # keyed interval join
        "customer_orders_full_outer": R.q_customer_orders_full_outer,  # J7 outer-merge shape
        "source_lang_rollup": R.q_source_lang_rollup,    # GROUPING SETS rollup
        "exact_match_mentions": R.q_exact_match_mentions,  # J6 tier-1
        # training-data ops (SQL-checked)
        "clip_cells": q_clip_cells,        # M10 Excel-width truncation
        # corpus-curation family (SQL-checked; RE2 semantics shared with
        # the oracle so the checks are data-independent)
        "pii_redact": q_pii_redact,
        "repetition_stats": q_repetition_stats,
        "quality_filter": q_quality_filter,
        "hash_sample": q_hash_sample,
        "group_quantiles": q_group_quantiles,
        "source_stats": q_source_stats,
        "normalize_text": q_normalize_text,
        "histogram_quantile": q_histogram_quantile,  # mergeable sketch path
        "jaccard_pairs": q_jaccard_pairs,  # exact n-gram Jaccard (dedup family)
        "containment_pairs": q_containment_pairs,  # directed n-gram containment (SQL-checked)
        "dup_span_stats": q_dup_span_stats,  # duplicated-span signal (Lee'22)
        "canonical_urls": q_canonical_urls,  # CC url canonicalization
        "host_stats": q_host_stats,          # per-host crawl stats
        "blocked_hosts": q_blocked_hosts,    # domain-blocklist filter (SQL-checked)
        "mention_contexts": q_mention_contexts,  # KWIC evidence snippets (SQL-checked)
        "dedup_lines": q_dedup_lines,        # C4 global line dedup
        "tfidf_scores": q_tfidf_scores,      # corpus TF-IDF vectors
        "stratified_sample": q_stratified_sample,  # per-group exact-k sample
        "pagerank": q_pagerank,              # iterative join-based centrality
        "label_propagation": q_label_propagation,  # community detection (SQL-checked)
        "personalized_pagerank": q_personalized_pagerank,  # seeded teleport PPR (SQL-checked)
        "degree_stats": q_degree_stats,      # out-degree histogram
        "taxonomy_rollup": q_taxonomy_rollup,  # counts up the concept DAG (SQL-checked)
        "match_bgp": q_match_bgp,            # SPARQL-core BGP over a triple store (SQL-checked)
        "bgp_aggregate": q_bgp_aggregate,    # SPARQL GROUP BY aggregates over BGP bindings (SQL-checked)
        "bgp_select": q_bgp_select,          # SPARQL FILTER/ORDER BY/LIMIT solution modifiers (SQL-checked)
        "lag_lead": q_lag_lead,              # LAG/LEAD window per key (SQL-checked)
        "rollup": q_rollup,                  # GROUP BY ROLLUP, one combiner-first exchange (SQL-checked)
        "cube": q_cube,                      # GROUP BY CUBE, all 2^m sets one exchange (SQL-checked)
        "funnel": q_funnel,                  # ordered-step funnel per user (SQL-checked)
        "cohort_retention": q_cohort_retention,  # retention triangle over events (SQL-checked)
        "streaks": q_streaks,                # gaps-and-islands day runs per user (SQL-checked)
        "scd2_intervals": q_scd2_intervals,  # SCD2 validity intervals (temporal crawl refresh)
        "gap_fill": q_gap_fill,              # calendar densification + forward fill (SQL-checked)
        "weighted_sample": q_weighted_sample,  # A-Res weighted sampling w/o replacement (SQL-checked)
        "interval_join": q_interval_join,    # point-in-time join to SCD2 intervals (SQL-checked)
        "window_rank": q_window_rank,        # RANK/DENSE_RANK window family (SQL-checked)
        "window_pct": q_window_pct,          # PERCENT_RANK/CUME_DIST window family (SQL-checked)
        "ewma": q_ewma,                      # per-key exponentially weighted moving average (SQL-checked)
        "mmr_rerank": q_mmr_rerank,          # MMR diversified top-k (SQL-checked since r5: k chained greedy CTEs)
        "skipgram_pairs": q_skipgram_pairs,  # item2vec context-pair counts (SQL-checked)
        "cap_per_key": q_cap_per_key,        # deterministic per-key row cap (SQL-checked)
        "scalar_quantize": q_scalar_quantize,  # SQ8 embedding codes, exact gate (SQL-checked)
        "skyline": q_skyline,                # 2-D Pareto front, combiner-first (SQL-checked)
        "bgp_union": q_bgp_union,            # SPARQL UNION with unbound-var padding (SQL-checked)
        "random_walks": q_random_walks,      # DeepWalk corpus, pinned hash recurrence (SQL-checked)
        "sssp": q_sssp,                      # weighted shortest paths, frontier Bellman-Ford (SQL-checked)
        "weighted_pagerank": q_weighted_pagerank,  # edge-weight-proportional rank distribution (SQL-checked)
        "ntile": q_ntile,                    # NTILE(n) per key, one exchange (SQL-checked)
        "grouped_corr": q_grouped_corr,      # per-group corr/regression via sufficient stats (SQL-checked)
        "bgp_optional": q_bgp_optional,      # SPARQL OPTIONAL left-outer pattern (SQL-checked)
        "bgp_minus": q_bgp_minus,            # SPARQL MINUS anti-join pattern (SQL-checked)
        "construct": q_construct,            # SPARQL CONSTRUCT graph rewrite (SQL-checked)
        "void_stats": q_void_stats,          # VoID per-predicate KG descriptor (SQL-checked)
        "rolling_window": q_rolling_window,  # ROWS-frame rolling sum per key (SQL-checked)
        "robots_filter": q_robots_filter,    # robots.txt crawl-politeness gate (SQL-checked)
        "shacl_validate": q_shacl_validate,  # SHACL-lite cardinality gate (SQL-checked)
        "split_sentences": q_split_sentences,  # RE2 sentence splitting (SQL-checked)
        "ego_subgraph": q_ego_subgraph,      # DESCRIBE-style k-hop extraction (SQL-checked)
        "property_path": q_property_path,    # SPARQL pred* min-hop reachability (SQL-checked)
        "infer_types": q_infer_types,        # RDFS subclass entailment closure (SQL-checked)
        "token_stats": q_token_stats,
        "md5_fingerprint": q_md5_fingerprint,
        "embedding_topk": q_embedding_topk,
        "label_centroids": q_label_centroids,  # per-group mean-pool vectors
        "pack_sequences": q_pack_sequences,  # ordered prefix sum + concat-chunk packing
        "decontaminate": q_decontaminate,    # broadcast probe-automaton scan
        "table_profile": q_table_profile,    # per-column ingest audit stats
        "latest_per_key": q_latest_per_key,  # latest-snapshot-wins election
        # stateful / model-driven / sketch ops — the hash-dependent
        # ones run hash_mode='sql' and are SQL-checked (VERDICT r4 #1)
        "kmeans_centroids": q_kmeans_centroids,  # distributed Lloyd (iterative — pytest carries the value check)
        "kg_triples": q_kg_triples,
        "dedup_minhash": q_dedup_minhash,  # MinHash+LSH verify (SQL-checked, md5 replay)
        "near_dup_join": q_near_dup_join,  # cross-corpus contamination (SQL-checked, md5 replay)
        "dup_clusters": q_dup_clusters,  # CC over verified pairs (SQL-checked, recursive CTE)
        "remove_dup_spans": q_remove_dup_spans,  # Lee'22 substring-dedup transform (SQL-checked since r5)
        "dup_clusters_distributed": q_dup_clusters_distributed,  # (SQL-checked, recursive CTE)
        "near_dedup_corpus": q_near_dedup_corpus,  # keeper election (SQL-checked)
        "simhash": q_simhash,  # 64-bit bit voting (SQL-checked, md5 replay)
        "simhash_near_pairs": q_simhash_near_pairs,  # pigeonhole chunks + hamming (SQL-checked)
        "langid": q_langid,  # trigram-profile argmax + quality cols (SQL-checked)
        "ivf_buckets": q_ivf_buckets,  # nearest-centroid assignment (SQL-checked)
        "ann_ivf": q_ann_ivf,  # IVF probe top-k (SQL-checked since r5)
        "ann_pq": q_ann_pq,  # product-quantization ADC top-k (rows-only: iterative)
        "ann_ivfpq": q_ann_ivfpq,  # IVF-PQ residual ADC (rows-only: iterative)
        "embedding_near_pairs": q_embedding_near_pairs,
        "embedding_near_pairs_lsh": q_embedding_near_pairs_lsh,  # hyperplane LSH collide+verify (SQL-checked since r5)
        "semantic_dedup": q_semantic_dedup,  # SemDeDup (rows-only: iterative)
        "nb_classify": q_nb_classify,  # Naive Bayes train+score (SQL-checked)
        "lm_perplexity": q_lm_perplexity,  # char-bigram LM quality score (SQL-checked)
        "hll_distinct": q_hll_distinct,  # HyperLogLog distinct sketch (SQL-checked)
        "ccnet_buckets": q_ccnet_buckets,  # per-source perplexity terciles (SQL-checked)
        "boolean_search": q_boolean_search,  # conjunctive token retrieval (SQL-checked)
        "anchor_graph": q_anchor_graph,  # html anchor → web-graph edges (SQL-checked)
        "anchor_texts": q_anchor_texts,  # link-text alias evidence (SQL-checked)
        "bloom_membership": q_bloom_membership,  # Bloom sketch probe, FP-exact (SQL-checked)
        "triangle_count": q_triangle_count,  # degree-oriented triangles (SQL-checked)
        "train_test_split": q_train_test_split,  # content-addressed split (SQL-checked)
        "select_budget": q_select_budget,  # quality-budget selection (SQL-checked)
        "chunk_documents": q_chunk_documents,  # RAG sliding-window chunking (SQL-checked)
        "rep_ngrams": q_rep_ngrams,  # Gopher duplicated-ngram mass (SQL-checked)
        "similarity_join": q_similarity_join,  # token-Jaccard entity resolution (SQL-checked)
        "bigram_pmi": q_bigram_pmi,  # PMI collocations (SQL-checked)
        "hits": q_hits,  # integer-exact hubs/authorities (SQL-checked)
        "bm25": q_bm25,  # Okapi BM25 query scoring (SQL-checked)
        "hybrid_search": q_hybrid_search,  # BM25 ∪ dense-cosine RRF ensemble (SQL-checked)
        "rrf_fuse": q_rrf_fuse,  # reciprocal-rank fusion, exact-integer (SQL-checked)
        "ntriples_roundtrip": q_ntriples_roundtrip,  # N-Triples sink+source identity (SQL-checked)
        "warc_roundtrip": q_warc_roundtrip,  # WARC sink+source identity, CC container (SQL-checked)
        "jsonl_roundtrip": q_jsonl_roundtrip,  # sharded JSONL sink + native read_json (SQL-checked)
        "winnow": q_winnow,  # MOSS winnowing fingerprints (SQL-checked)
        "mixture_sample": q_mixture_sample,  # data-mixing quota sampler (SQL-checked)
        "n3c_mapping_table": q_n3c_mapping_table,
        "heavy_hitters": q_heavy_hitters,  # count-min sketch top-k (SQL-checked, md5 cell replay)
        "connected_components": q_connected_components,  # min-label propagation
        "connected_components_alt": q_connected_components_alt,  # large-star/small-star
        "sameas_resolve": q_sameas_resolve,  # owl:sameAs smushing (alias→canonical rewrite)
        "cooc_counts": q_cooc_counts,  # windowed skip-gram co-occurrence (SQL-checked)
        "c4_clean": q_c4_clean,  # C4 line/doc quality cleaning (SQL-checked)
        "gopher_stats": q_gopher_stats,  # full Gopher rule set, int-exact (SQL-checked)
        "compression_stats": q_compression_stats,  # zlib ratio signal (rows-only)
        "ngram_decontam": q_ngram_decontam,  # GPT-3 n-gram decontamination (SQL-checked)
        "resolve_hrefs": q_resolve_hrefs,    # RFC 3986 href resolution (SQL-checked)
        "embedding_covariance": q_embedding_covariance,  # moment-sketch covariance (SQL-checked)
        "pca_projection": q_pca_projection,  # PCA projection (rows-only: eigh)
        "clustering_coefficient": q_clustering_coefficient,  # per-node triangles (SQL-checked)
        "bfs_hops": q_bfs_hops,  # frontier BFS distance (SQL-checked vs recursive CTE)
        "kcore": q_kcore,  # k-core peeling (SQL-checked: unrolled-peel oracle)
        "neighborhood": q_neighborhood,  # HyperBall ball sizes, exact mode (SQL-checked)
        "harmonic_centrality": q_harmonic,  # bounded-radius harmonic centrality (SQL-checked)
        "dag_depth": q_dag_depth,        # longest-path DAG depth from roots (SQL-checked)
        "mis": q_mis,                    # Luby maximal independent set, 2 unrolled rounds (SQL-checked)
        "redirect_resolve": q_redirect_resolve,  # pointer-doubling redirect-chain resolution (SQL-checked)
        "k_truss": q_k_truss,            # 4-truss cohesive-subgraph peel, 2 unrolled rounds (SQL-checked)
        "betweenness": q_betweenness,    # sampled-pivot Brandes betweenness (rows-only; pytest oracle)
        "reciprocity": q_reciprocity,    # directed-edge reciprocity (SQL-checked)
        "assortativity": q_assortativity,  # degree assortativity, Newman r (SQL-checked)
        "sorted_neighborhood": q_sorted_neighborhood,  # sorted-neighborhood ER blocking pairs (SQL-checked)
        "er_cluster": q_er_cluster,      # end-to-end entity resolution: block+verify+CC (SQL-checked)
        "edge_embeddedness": q_edge_embeddedness,  # per-edge triangle support incl. bridges (SQL-checked)
        "powerlaw_alpha": q_powerlaw_alpha,  # Hill MLE degree-tail exponent (SQL-checked)
        "entity_pair_pmi": q_entity_pair_pmi,  # doc-level entity co-occurrence PMI (SQL-checked)
        "wu_palmer": q_wu_palmer,        # ontology Wu-Palmer similarity over a distributed ancestor closure (SQL-checked)
        "resnik_lin": q_resnik_lin,      # information-content (Resnik/Lin) ontology similarity (SQL-checked)
        "transitive_reduction": q_transitive_reduction,  # minimal equivalent DAG edge set (SQL-checked)
        "effective_diameter": q_effective_diameter,  # ANF interpolated effective diameter (SQL-checked)
        "kge_negatives": q_kge_negatives,  # deterministic KGE corrupted-triple sampling (SQL-checked)
        "dbscan": q_dbscan,              # DBSCAN density clustering over embeddings (SQL-checked)
        "neighbor_sample": q_neighbor_sample,  # deterministic GraphSAGE k-hop neighbor sampling (SQL-checked)
        "image_meta": q_image_meta,      # real PNG/JPEG header parsing over a binary column (SQL-checked)
        "audio_meta": q_audio_meta,      # real WAV RIFF/fmt header parsing over a binary column (SQL-checked)
        "bmp_decode": q_bmp_decode,      # REAL BMP pixel decode (flip/BGR/padding pinned) (SQL-checked)
        "png_decode": q_png_decode,      # REAL PNG pixel decode: zlib inflate + unfilter (SQL-checked)
        "jpeg_decode": q_jpeg_decode,  # REAL baseline JPEG pixel decode (SQL-checked, exact planted bytes)
        "mjpeg_frames": q_mjpeg_frames,  # REAL Motion-JPEG AVI frame sampling (SQL-checked, exact planted frames)
        "wav_decode": q_wav_decode,      # REAL WAV PCM sample extraction (SQL-checked)
        "closeness_centrality": q_closeness,  # bounded-radius closeness off HyperBall ball sizes (SQL-checked)
        "assoc_rules": q_assoc_rules,    # directed association rules (conf/lift) over entity co-occurrence (SQL-checked)
        "sniff_format": q_sniff_format,  # magic-byte content-type detection over a binary column (SQL-checked)
        "quotient_graph": q_quotient_graph,  # community supergraph rollup (SQL-checked)
        "scc": q_scc,                    # directed strongly connected components, FW-BW-MIN peeling (SQL-checked)
        "bgp_filter": q_bgp_filter,      # SPARQL FILTER (comparisons + RE2 regex) over BGP solutions (SQL-checked)
        "mask_tokens": q_mask_tokens,    # deterministic MLM-style token masking (SQL-checked)
        "regex_extract": q_regex_extract,  # vectorized RE2 named-group field extraction (SQL-checked)
        "json_flatten": q_json_flatten,  # JSON sidecar-metadata flattening to columns (SQL-checked)
        "grouped_outliers": q_grouped_outliers,  # per-group z-score outlier flags (SQL-checked)
        "kfold": q_kfold,                # balanced stratified k-fold assignment (SQL-checked)
        "token_label_mi": q_token_label_mi,  # token-vs-label mutual information feature selection (SQL-checked)
        "cusum": q_cusum,                # per-key CUSUM change-point alarms (SQL-checked)
        "er_eval": q_er_eval,            # pairwise ER clustering P/R/F1 without pair materialization (SQL-checked)
        "calibration": q_calibration,    # reliability-diagram ECE bins for model scores (SQL-checked)
        "readability": q_readability,    # Flesch-Kincaid readability scoring (SQL-checked)
        "classifier_eval": q_classifier_eval,  # per-class confusion precision/recall/F1 (SQL-checked)
        "ndcg": q_ndcg,                  # NDCG@5 ranking evaluation over run/qrel tables (SQL-checked)
        "mrr": q_mrr,                    # MRR@5 first-relevant reciprocal rank (SQL-checked)
        "recall_at_k": q_recall_at_k,    # recall@5 over all relevants incl. unretrieved (SQL-checked)
        "ap_at_k": q_ap_at_k,            # average precision@5 (MAP family, SQL-checked)
        "gini": q_gini,                  # per-key Gini concentration coefficient (SQL-checked)
        "bag_intersect": q_bag_intersect,  # INTERSECT ALL multiset semantics (SQL-checked)
        "bag_except": q_bag_except,      # EXCEPT ALL multiset semantics (SQL-checked)
        "mad_outliers": q_mad_outliers,  # robust MAD modified z-score outlier flags (SQL-checked)
        "ks_drift": q_ks_drift,          # two-sample KS distribution-drift statistic (SQL-checked)
        "psi_drift": q_psi_drift,        # Population Stability Index drift monitor (SQL-checked)
        "vocab_overlap": q_vocab_overlap,  # corpus vocabulary Jaccard/containment audit (SQL-checked)
        "js_divergence": q_js_divergence,  # Jensen-Shannon divergence drift monitor (SQL-checked)
        "cramers_v": q_cramers_v,        # Cramér's V categorical association (SQL-checked)
        "spearman": q_spearman,          # per-key Spearman rank correlation (SQL-checked)
        "entropy_per_key": q_entropy_per_key,  # per-key categorical Shannon entropy (SQL-checked)
        "label_spreading": q_label_spreading,  # seeded semi-supervised KG entity typing (SQL-checked)
        "triple_vote": q_triple_vote,    # source-vote knowledge fusion over conflicting triples (SQL-checked)
        "alias_table": q_alias_table,    # mention→entity prior from anchor texts (SQL-checked)
        "mode_per_key": q_mode_per_key,  # per-key modal value, deterministic tie-break (SQL-checked)
        "merge_intervals": q_merge_intervals,  # per-key interval coalescing (SQL-checked)
        "lift": q_lift,                  # decile lift/gains table (SQL-checked)
        "wl": q_wl,                      # Weisfeiler-Lehman color refinement, engine-vs-engine md5 (SQL-checked)
        "page_meta": q_page_meta,        # real head-metadata parse: title/description/canonical/lang (SQL-checked)
        "interarrival": q_interarrival,  # per-key inter-event gap stats (SQL-checked)
        "jl_projection": q_jl_projection,  # JL random projection, pinned Box-Muller matrix (SQL-checked)
        "gazetteer": q_gazetteer,        # real AC span tagging with char offsets (SQL-checked)
        "transitions": q_transitions,    # Markov next-event transition estimates (SQL-checked)
        "gunzip": q_gunzip,              # real gzip inflation of a binary column (SQL-checked)
        "kappa": q_kappa,                # Cohen's kappa inter-annotator agreement (SQL-checked)
        "ab_test": q_ab_test,            # two-proportion z-test per experiment arm (SQL-checked)
        "dataset_diff": q_dataset_diff,  # generic row-set delta between versions (SQL-checked)
        "profile_table": q_profile_table,  # per-column null/distinct/extrema audit (SQL-checked)
        "bleu": q_bleu,                  # BLEU-2 with brevity penalty, engine-vs-SQL exact (SQL-checked)
        "rouge": q_rouge,                # ROUGE-2 clipped n-gram overlap eval (SQL-checked)
        "cocitation": q_cocitation,      # co-citation related-pair counts (SQL-checked)
        "bib_coupling": q_bib_coupling,  # bibliographic-coupling pair counts (SQL-checked)
        "hearst": q_hearst,              # Hearst-pattern hypernym mining, engine-vs-engine regex (SQL-checked)
        "katz": q_katz,                  # truncated Katz centrality, exact-integer numerator (SQL-checked)
        "graph_diff": q_graph_diff,      # crawl-to-crawl edge delta statuses (SQL-checked)
        "nfc_normalize": q_nfc_normalize,  # real Unicode NFC normalization, engine-vs-engine (SQL-checked)
        "cc_incremental": q_cc_incremental,  # incremental connected components over new edges (SQL-checked)
        "partition_quality": q_partition_quality,  # modularity + conductance of a community assignment (SQL-checked)
        "link_prediction": q_link_prediction,  # CN/Adamic-Adar/Jaccard (SQL-checked)
        "char_entropy": q_char_entropy,  # printable-ASCII Shannon entropy (SQL-checked)
        "neighbor_mean": q_neighbor_mean,  # GraphSAGE-mean propagation round (SQL-checked)
        "dsir_weights": q_dsir_weights,  # DSIR target-domain importance weights (SQL-checked)
        "edit_join": q_edit_join,  # exact Levenshtein<=1 fuzzy join, SymSpell blocking (SQL-checked)
        "dedup_incremental": q_dedup_incremental,  # crawl-refresh dedup vs seen-hash store (SQL-checked)
        "snapshot_diff": q_snapshot_diff,  # added/removed/changed crawl diff, join-free (SQL-checked)
        "salted_join": q_salted_join,  # head-key-skew-safe join rewrite (SQL-checked)
        "bloom_semi_join": q_bloom_semi,  # Bloom-pushdown semi join (SQL-checked)
        "bloom_anti_join": q_bloom_anti,  # Bloom-pushdown anti join (SQL-checked)
        "bpe_merges": q_bpe_train,  # distributed BPE merge learning (rows-only: iterative)
        "bpe_token_counts": q_bpe_token_counts,  # BPE token counts (rows-only: iterative model)
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB; views pre-registered per table)
# ---------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    stop_list = "('the','a','of','and','to','in','is','it','for','on')"
    # --- minhash hash_mode='sql' replay (VERDICT r4 #1 promotions) ---
    # The engine's sql-mode hashes are md5_number_lower-based by
    # construction (functions/hashing.py::md5_u64 == DuckDB's
    # md5_number_lower, pinned by pytest), so the whole
    # shingle -> permutation -> band -> collide -> jaccard chain
    # replays value-for-value in pure SQL. Permutation constants come
    # from the SAME MinHasher instance the engine uses.
    from omop2obo_ray.pipelines.textpipe import MinHasher

    _mh = MinHasher(hash_mode="sql")
    _perm_vals = ", ".join(
        f"({i}, {int(a)}, {int(b)})"
        for i, (a, b) in enumerate(zip(_mh.a, _mh.b)))

    def _minhash_ctes(src: str, cross_side_only: bool = False) -> str:
        """CTE chain over ``src`` (must yield columns (k, text)) ending
        in ``vp(ka, kb, j)`` — verified near-dup pairs with exact
        shingle-set Jaccard >= 0.8, star-capped LSH buckets (cap 256),
        byte-for-byte the engine's hash_mode='sql' semantics."""
        side = ("AND substr(a.k, 1, 2) <> substr(b.k, 1, 2) "
                if cross_side_only else "")
        return (
            f"lists AS (SELECT k, regexp_extract_all(lower(text), "
            f"'[a-z0-9_]+') AS l FROM {src}), "
            # shingle strings: k = min(3, n_tokens) consecutive tokens
            "sh_str AS (SELECT k, l[i+1] || ' ' || l[i+2] || ' ' || "
            "l[i+3] AS s FROM (SELECT k, l, len(l) AS n, "
            "unnest(range(len(l))) AS i FROM lists WHERE len(l) >= 3) "
            "WHERE i + 3 <= n "
            "UNION ALL SELECT k, l[1] || ' ' || l[2] FROM lists "
            "WHERE len(l) = 2 "
            "UNION ALL SELECT k, l[1] FROM lists WHERE len(l) = 1), "
            # 31-bit shingle hash set (0-sentinel for token-less docs)
            "shs AS (SELECT DISTINCT k, CAST(md5_number_lower(s)"
            "::HUGEINT % 2147483648 AS BIGINT) AS x FROM sh_str "
            "UNION ALL SELECT k, 0 FROM lists WHERE len(l) = 0), "
            f"perm(i, a, b) AS (VALUES {_perm_vals}), "
            "sig AS (SELECT k, i, min((a * x + b) % 2147483647) AS v "
            "FROM shs CROSS JOIN perm GROUP BY k, i), "
            "band AS (SELECT k, (md5_number_lower(CAST(i // 4 AS "
            "VARCHAR) || ':' || string_agg(v::VARCHAR, ',' ORDER BY i))"
            " >> 1)::BIGINT AS bh FROM sig GROUP BY k, i // 4), "
            "bux AS (SELECT DISTINCT bh, k FROM band), "
            "bsz AS (SELECT bh, count(*) AS n, min(k) AS mn FROM bux "
            "GROUP BY bh), "
            "cand AS (SELECT DISTINCT a.k AS ka, b.k AS kb "
            "FROM bux a JOIN bux b ON a.bh = b.bh AND a.k < b.k "
            f"{side}"
            "JOIN bsz z ON z.bh = a.bh "
            "WHERE z.n <= 256 OR a.k = z.mn), "
            "ssz AS (SELECT k, count(*) AS ns FROM shs GROUP BY k), "
            "inter AS (SELECT c.ka, c.kb, count(*) AS ni FROM cand c "
            "JOIN shs a ON a.k = c.ka "
            "JOIN shs b ON b.k = c.kb AND b.x = a.x "
            "GROUP BY c.ka, c.kb), "
            "vp AS (SELECT i.ka, i.kb, "
            "i.ni::DOUBLE / (za.ns + zb.ns - i.ni) AS j "
            "FROM inter i JOIN ssz za ON za.k = i.ka "
            "JOIN ssz zb ON zb.k = i.kb "
            "WHERE i.ni::DOUBLE / (za.ns + zb.ns - i.ni) >= 0.8)")

    def _lsh_pairs_sql() -> str:
        """Random-hyperplane LSH replay: the (dim x 32) Gaussian plane
        matrix is a pinned CONSTANT (RandomState(424242) — same
        instance the engine builds), inlined as VALUES rows with
        full %.17g precision so DuckDB parses the identical doubles.
        Sign-band codes (8 bands x 4 bits), star-capped collide,
        round-6 cosine verify >= 0.3 on rounded values — the exact
        engine semantics."""
        import numpy as np

        rng = np.random.RandomState(424242)
        planes = rng.randn(64, 32)
        vals = ", ".join(
            f"({d}, {pl}, {v:.17g})"
            for d in range(64) for pl, v in enumerate(planes[d]))
        return (
            "WITH emb2 AS MATERIALIZED (SELECT vec_id, "
            "CAST(embedding AS DOUBLE[]) AS e FROM embeddings), "
            f"pl(d, p, v) AS (VALUES {vals}), "
            "proj AS MATERIALIZED (SELECT e.vec_id, pl.p, "
            "sum(e.e[pl.d + 1] * pl.v) AS x FROM emb2 e "
            "CROSS JOIN pl GROUP BY e.vec_id, pl.p), "
            # band code: 4 sign bits per band, bit j of band b is
            # plane 4b+j; engine folds band into bits 56+
            "code AS MATERIALIZED (SELECT vec_id, p // 4 AS band, "
            "CAST(sum(CASE WHEN x >= 0 THEN 1 << CAST(p % 4 AS "
            "INTEGER) ELSE 0 END) AS BIGINT) AS c "
            "FROM proj GROUP BY vec_id, p // 4), "
            "bux AS MATERIALIZED (SELECT DISTINCT band, c, vec_id "
            "FROM code), "
            "bsz AS (SELECT band, c, count(*) AS n, min(vec_id) AS mn "
            "FROM bux GROUP BY band, c), "
            "cand AS MATERIALIZED (SELECT DISTINCT a.vec_id AS doc_a, "
            "b.vec_id AS doc_b FROM bux a JOIN bux b "
            "ON a.band = b.band AND a.c = b.c "
            "AND a.vec_id < b.vec_id "
            "JOIN bsz z ON z.band = a.band AND z.c = a.c "
            "WHERE z.n <= 256 OR a.vec_id = z.mn), "
            "ver AS (SELECT c.doc_a, c.doc_b, "
            "round(list_cosine_similarity(ea.e, eb.e), 6) AS cos "
            "FROM cand c JOIN emb2 ea ON ea.vec_id = c.doc_a "
            "JOIN emb2 eb ON eb.vec_id = c.doc_b) "
            "SELECT doc_a, doc_b, cos FROM ver WHERE cos >= 0.3")

    def _mmr_sql(k: int = 10) -> str:
        """Greedy MMR replay as k chained CTEs: candidates = brute
        top-50 (rounded-4 cos, self excluded), per step pick argmax
        of lam*rel - (1-lam)*max-sim-to-selected with the engine's
        (mmr desc, rel desc, vec_id asc) tie order. The (1-lam)
        factor is forced through DOUBLE so it equals Python's
        1 - 0.7 = 0.30000000000000004 bit-for-bit."""
        head = (
            "WITH emb2 AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) "
            "AS e FROM embeddings), "
            "qq AS (SELECT vec_id AS qid, e AS qe FROM emb2 "
            "WHERE vec_id < 3), "
            "scx AS MATERIALIZED (SELECT qq.qid, e.vec_id, "
            "round(list_cosine_similarity(e.e, qq.qe), 4) AS rel "
            "FROM qq JOIN emb2 e ON e.vec_id <> qq.qid), "
            "cand AS MATERIALIZED (SELECT qid, vec_id, rel FROM (SELECT qid, "
            "vec_id, rel, row_number() OVER (PARTITION BY qid "
            "ORDER BY rel DESC, vec_id) AS r FROM scx) WHERE r <= 50), "
            "simx AS MATERIALIZED (SELECT c1.qid, c1.vec_id AS a, c2.vec_id AS b, "
            "list_cosine_similarity(e1.e, e2.e) AS s "
            "FROM cand c1 JOIN cand c2 ON c1.qid = c2.qid "
            "JOIN emb2 e1 ON e1.vec_id = c1.vec_id "
            "JOIN emb2 e2 ON e2.vec_id = c2.vec_id), "
            "p1 AS MATERIALIZED (SELECT qid, vec_id FROM (SELECT qid, vec_id, "
            "row_number() OVER (PARTITION BY qid ORDER BY rel DESC, "
            "vec_id) AS r FROM cand) WHERE r = 1), "
            "s1 AS MATERIALIZED (SELECT qid, vec_id FROM p1)")
        parts = [head]
        lam = "0.7::DOUBLE"
        one_m = "(1.0::DOUBLE - 0.7::DOUBLE)"
        for t in range(1, k):
            parts.append(
                f", mts{t} AS MATERIALIZED (SELECT c.qid, c.vec_id, max(si.s) AS m "
                f"FROM cand c JOIN s{t} sel ON sel.qid = c.qid "
                f"JOIN simx si ON si.qid = c.qid AND si.a = c.vec_id "
                f"AND si.b = sel.vec_id GROUP BY c.qid, c.vec_id)"
                f", p{t + 1} AS MATERIALIZED (SELECT qid, vec_id FROM ("
                f"SELECT c.qid, c.vec_id, row_number() OVER ("
                f"PARTITION BY c.qid ORDER BY ({lam} * c.rel - "
                f"{one_m} * m.m) DESC, c.rel DESC, c.vec_id) AS r "
                f"FROM cand c JOIN mts{t} m ON m.qid = c.qid "
                f"AND m.vec_id = c.vec_id WHERE NOT EXISTS ("
                f"SELECT 1 FROM s{t} s WHERE s.qid = c.qid "
                f"AND s.vec_id = c.vec_id)) WHERE r = 1)"
                f", s{t + 1} AS MATERIALIZED (SELECT * FROM s{t} "
                f"UNION ALL SELECT * FROM p{t + 1})")
        tail = " " + " UNION ALL ".join(
            f"SELECT qid, vec_id, CAST({t} AS BIGINT) AS mmr_rank "
            f"FROM p{t}" for t in range(1, k + 1))
        return "".join(parts) + tail

    _MINHASH_DOC = _minhash_ctes(
        "(SELECT doc_id AS k, text FROM documents)")
    # connected components over vp via transitive closure (dup-cluster
    # mass is tiny relative to the corpus, so the closure is bounded)
    _CC_TAIL = (
        "e AS (SELECT ka AS u, kb AS v FROM vp "
        "UNION SELECT kb, ka FROM vp), "
        "reach(u, v) AS (SELECT u, u FROM (SELECT DISTINCT u FROM e) "
        "UNION SELECT e.u, r.v FROM e JOIN reach r ON r.u = e.v)")
    # simhash sql-mode signatures: md5 token hashes, 64-bit bit voting
    _SIMHASH_CTES = (
        "lists AS (SELECT doc_id, regexp_extract_all(lower(text), "
        "'[a-z0-9_]+') AS l FROM documents), "
        "toks AS (SELECT doc_id, len(l) AS n, unnest(l) AS tok "
        "FROM lists WHERE len(l) > 0), "
        "th AS (SELECT doc_id, n, md5_number_lower(tok) AS h "
        "FROM toks), "
        "bitsums AS (SELECT doc_id, n, bb.b AS b, "
        "sum(CAST((h >> CAST(bb.b AS UTINYINT)) & 1 AS BIGINT)) "
        "AS ones FROM th CROSS JOIN "
        "(SELECT unnest(range(64)) AS b) bb GROUP BY doc_id, n, bb.b), "
        "sig AS (SELECT doc_id, CAST(sum(CASE WHEN 2 * ones > n THEN "
        "CAST(1 AS HUGEINT) << CAST(b AS INTEGER) ELSE "
        "CAST(0 AS HUGEINT) END) AS UBIGINT) AS simhash "
        "FROM bitsums GROUP BY doc_id "
        "UNION ALL SELECT doc_id, CAST(0 AS UBIGINT) FROM lists "
        "WHERE len(l) = 0)")

    # shared by lm_perplexity and ccnet_buckets: add-1 char-bigram LM
    # trained on the documents table (chars → positions → bigrams →
    # smoothed log-probs)
    _LM_CTES = (
        "chars AS (SELECT doc_id, unnest(string_split("
        "translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', "
        "'abcdefghijklmnopqrstuvwxyz'), '')) AS ch, "
        "unnest(range(length(text))) AS pos FROM documents), "
        "big AS (SELECT a.doc_id, a.ch AS c1, b.ch AS c2 "
        "FROM chars a JOIN chars b "
        "ON a.doc_id = b.doc_id AND b.pos = a.pos + 1), "
        "cnt AS (SELECT c1, c2, count(*)::DOUBLE AS n "
        "FROM big GROUP BY 1, 2), "
        "tot AS (SELECT c1, sum(n) AS t FROM cnt GROUP BY 1), "
        "vv AS (SELECT count(DISTINCT ch)::DOUBLE AS v FROM chars), "
        "lp AS (SELECT c1, c2, ln((n + 1.0) / (t + v)) AS lp "
        "FROM cnt JOIN tot USING (c1) CROSS JOIN vv)"
    )
    # shared by repetition_stats and quality_filter: lowercase word-token
    # counts per document (token-less docs drop, as in the engine).
    _REPETITION_SQL = (
        "WITH toks AS (SELECT doc_id, "
        "unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok "
        "FROM documents), "
        "tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2) "
        "SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, "
        "CAST(count(*) AS BIGINT) AS distinct_tokens, "
        "round(max(c)::DOUBLE / sum(c), 6) AS top_token_ratio, "
        "round(sum(c * len(tok))::DOUBLE / sum(c), 6) AS mean_token_len "
        "FROM tc GROUP BY doc_id"
    )
    # kcore: 4-round unrolled peel over the _synth_tri_edges fixture —
    # canonical undirected dedup (least/greatest ≡ the engine's
    # lexicographic pc.min/max_element_wise), per round drop nodes with
    # degree < 3 and their edges; fixpoint is ≤ 1 round on this graph
    # (fringe cycles peel, the dense core's min degree ≥ 6 at every sf)
    # so 4 rounds strictly over-unroll. Final (node, d) = degrees
    # within the surviving core — the engine's exact output.
    _kc = (
        "WITH pk AS (SELECT p_partkey AS k FROM part), "
        "raw AS (SELECT 'n' || (k % 23) AS s, 'n' || (k % 29) AS t "
        "FROM pk UNION ALL SELECT 'c' || (k % 509), "
        "'c' || ((k % 509) + 1) FROM pk), "
        "e0 AS (SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b "
        "FROM raw WHERE s <> t)")
    for _i in range(4):
        _kc += (
            f", d{_i} AS (SELECT node, count(*) AS d FROM "
            f"(SELECT a AS node FROM e{_i} UNION ALL "
            f"SELECT b FROM e{_i}) GROUP BY node)"
            f", g{_i} AS (SELECT node FROM d{_i} WHERE d >= 3)"
            f", e{_i + 1} AS (SELECT a, b FROM e{_i} "
            f"WHERE a IN (SELECT node FROM g{_i}) "
            f"AND b IN (SELECT node FROM g{_i}))")
    _kc += (
        " SELECT node, count(*) AS d FROM "
        "(SELECT a AS node FROM e4 UNION ALL SELECT b FROM e4) "
        "GROUP BY node")

    # funnel: greedy-earliest ordered-step recurrence, unrolled — step
    # k's completion time = min ts of a step-k event STRICTLY after
    # step k-1's; output covers users with ≥ 1 funnel-type event
    _funnel = (
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
        "LEFT JOIN s3 ON s3.user_id = u.user_id")

    # cohort retention: distinct (user, day) → first-day cohort →
    # per-(cohort, offset) distinct-user counts
    _cohort = (
        "WITH ud AS (SELECT DISTINCT user_id, "
        "date_trunc('day', ts) AS day FROM events), "
        "f AS (SELECT user_id, min(day) AS cohort FROM ud "
        "GROUP BY user_id) "
        "SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort, "
        "datediff('day', f.cohort, ud.day) AS day_offset, "
        "count(*) AS n_users FROM ud JOIN f USING (user_id) "
        "GROUP BY 1, 2")

    # SQ8 scalar quantization: per-dim global min/max range →
    # q = floor((x − mn)/(mx − mn)·255); float32→float64 widening is
    # exact and min/max stats involve no summation, so both sides
    # compute bit-identical doubles → the gate needs no quantizer
    _sq8 = (
        "WITH x AS (SELECT vec_id, "
        "unnest(embedding)::DOUBLE AS val, "
        "unnest(range(len(embedding))) AS dim FROM embeddings), "
        "s AS (SELECT dim, min(val) AS mn, max(val) AS mx "
        "FROM x GROUP BY dim) "
        "SELECT x.vec_id, x.dim, CASE WHEN s.mx = s.mn THEN 0 "
        "ELSE CAST(least(greatest(floor((x.val - s.mn) / "
        "(s.mx - s.mn) * 255), 0), 255) AS BIGINT) END AS q "
        "FROM x JOIN s USING (dim)")

    return {
        "kcore": _kc,
        # dag_depth: recursive CTE enumerates (node, d) pairs from the
        # roots (UNION dedup bounds rows by nodes x depth); depth =
        # max(d). Same synthetic parent rules as the engine query.
        "dag_depth": (
            "WITH RECURSIVE "
            "e0 AS (SELECT o_orderkey // 8 AS src, o_orderkey AS dst "
            "FROM orders WHERE o_orderkey >= 1 "
            "UNION ALL SELECT o_orderkey // 64, o_orderkey "
            "FROM orders WHERE o_orderkey >= 64 "
            "AND o_orderkey // 64 <> o_orderkey // 8), "
            "ed AS (SELECT DISTINCT src, dst FROM e0), "
            "roots AS (SELECT DISTINCT src AS node FROM ed "
            "WHERE src NOT IN (SELECT dst FROM ed)), "
            "p AS (SELECT node, 0 AS d FROM roots "
            "UNION "
            "SELECT ed.dst, p.d + 1 FROM p "
            "JOIN ed ON ed.src = p.node) "
            "SELECT node, max(d) AS depth FROM p GROUP BY node"
        ),
        # Luby MIS, 2 rounds unrolled: priority H(x,r) = (x*30011 +
        # r*1009 + 17) % 1000000007, lexicographic (H, node) tie-break;
        # winners' closed neighborhoods leave the live set after round 0
        "mis": (
            "WITH e0 AS (SELECT o_orderkey % 997 AS a, "
            "(o_orderkey * 31 + 7) % 997 AS b FROM orders "
            "WHERE o_orderkey % 997 <> (o_orderkey * 31 + 7) % 997), "
            "sym AS (SELECT DISTINCT a AS u, b AS v FROM e0 "
            "UNION SELECT DISTINCT b, a FROM e0), "
            "n0 AS (SELECT DISTINCT u AS node FROM sym), "
            "w0 AS (SELECT node FROM n0 t WHERE NOT EXISTS ("
            "SELECT 1 FROM sym e WHERE e.u = t.node AND "
            "((e.v * 30011 + 17) % 1000000007 "
            "< (t.node * 30011 + 17) % 1000000007 OR "
            "((e.v * 30011 + 17) % 1000000007 "
            "= (t.node * 30011 + 17) % 1000000007 AND e.v < t.node)))), "
            "dead0 AS (SELECT node FROM w0 UNION "
            "SELECT DISTINCT e.v FROM sym e "
            "JOIN w0 ON w0.node = e.u), "
            "n1 AS (SELECT node FROM n0 EXCEPT "
            "SELECT node FROM dead0), "
            "w1 AS (SELECT node FROM n1 t WHERE NOT EXISTS ("
            "SELECT 1 FROM sym e JOIN n1 a ON a.node = e.v "
            "WHERE e.u = t.node AND "
            "((e.v * 30011 + 1009 + 17) % 1000000007 "
            "< (t.node * 30011 + 1009 + 17) % 1000000007 OR "
            "((e.v * 30011 + 1009 + 17) % 1000000007 "
            "= (t.node * 30011 + 1009 + 17) % 1000000007 "
            "AND e.v < t.node)))) "
            "SELECT node, 0 AS sel_round FROM w0 "
            "UNION ALL SELECT node, 1 FROM w1"
        ),
        # k_truss: 2 peel rounds unrolled — per round enumerate each
        # triangle once (a<b<c lexicographic), fan it out to its 3
        # edges, keep edges with support >= k-2 = 2. Same synthetic
        # edge rules as the engine query; string ids compare binary-
        # lexicographic on both sides.
        "k_truss": (
            "WITH e0 AS (SELECT DISTINCT "
            "least('n' || (o_orderkey % 41), "
            "'n' || ((o_orderkey // 41) % 41)) AS a, "
            "greatest('n' || (o_orderkey % 41), "
            "'n' || ((o_orderkey // 41) % 41)) AS b "
            "FROM orders WHERE (o_orderkey % 41) <> "
            "((o_orderkey // 41) % 41)), "
            "t1 AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z "
            "FROM e0 e1 JOIN e0 e2 ON e2.a = e1.a AND e2.b > e1.b "
            "JOIN e0 e3 ON e3.a = e1.b AND e3.b = e2.b), "
            "s1 AS (SELECT a, b, count(*) AS c FROM ("
            "SELECT x AS a, y AS b FROM t1 "
            "UNION ALL SELECT x, z FROM t1 "
            "UNION ALL SELECT y, z FROM t1) GROUP BY a, b), "
            "r1 AS (SELECT a, b FROM s1 WHERE c >= 2), "
            "t2 AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z "
            "FROM r1 e1 JOIN r1 e2 ON e2.a = e1.a AND e2.b > e1.b "
            "JOIN r1 e3 ON e3.a = e1.b AND e3.b = e2.b), "
            "s2 AS (SELECT a, b, count(*) AS c FROM ("
            "SELECT x AS a, y AS b FROM t2 "
            "UNION ALL SELECT x, z FROM t2 "
            "UNION ALL SELECT y, z FROM t2) GROUP BY a, b) "
            "SELECT a, b FROM s2 WHERE c >= 2"
        ),
        # reciprocity / assortativity over the shared synthetic
        # 211-node graph (u = k%211, v = (k*13+5)%211)
        "reciprocity": (
            "WITH e AS (SELECT DISTINCT o_orderkey % 211 AS s, "
            "(o_orderkey * 13 + 5) % 211 AS d FROM orders "
            "WHERE o_orderkey % 211 <> (o_orderkey * 13 + 5) % 211), "
            "r AS (SELECT count(*) AS c FROM e e1 "
            "JOIN e e2 ON e1.s = e2.d AND e1.d = e2.s) "
            "SELECT (SELECT count(*) FROM e) AS n_edges, "
            "(SELECT c FROM r) AS n_recip, "
            "CAST((SELECT c FROM r) AS DOUBLE) "
            "/ (SELECT count(*) FROM e) AS ratio"
        ),
        "assortativity": (
            "WITH e0 AS (SELECT DISTINCT "
            "least(o_orderkey % 141, (o_orderkey // 141) % 141) AS a, "
            "greatest(o_orderkey % 141, (o_orderkey // 141) % 141) AS b "
            "FROM orders "
            "WHERE o_orderkey % 141 <> (o_orderkey // 141) % 141), "
            "deg AS (SELECT node, count(*) AS d FROM ("
            "SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0) "
            "GROUP BY node), "
            "j AS (SELECT da.d AS x, db.d AS y FROM e0 "
            "JOIN deg da ON da.node = e0.a "
            "JOIN deg db ON db.node = e0.b), "
            "bo AS (SELECT x, y FROM j UNION ALL SELECT y, x FROM j) "
            "SELECT count(*) AS n, "
            "CAST(floor(corr(x, y) * 1e6 + 1e-6) AS BIGINT) AS r_q "
            "FROM bo"
        ),
        # sorted_neighborhood: rank-difference self-join over the
        # global (p_name, p_partkey) order
        "sorted_neighborhood": (
            "WITH s AS (SELECT p_partkey AS id, row_number() "
            "OVER (ORDER BY p_name, p_partkey) AS rn FROM part) "
            "SELECT s1.id AS id_a, s2.id AS id_b FROM s s1 "
            "JOIN s s2 ON s2.rn - s1.rn BETWEEN 1 AND 3"
        ),
        # er_cluster: replay the full contract in SQL — distinct
        # entities, rank-diff<8 sorted-neighborhood candidates,
        # levenshtein<=1 verify, transitive closure from every node
        # (UNION dedups; closure mass is bounded by sum of component
        # sizes squared ~ 500 * 49), cluster = min reachable id
        "er_cluster": (
            "WITH RECURSIVE "
            "ent AS (SELECT DISTINCT o_orderkey % 500 AS g, "
            "(o_orderkey // 500) % 7 AS d FROM orders), "
            "e2 AS (SELECT g * 7 + d AS id, "
            "'e' || CAST((g * 7919) % 100003 AS VARCHAR) || 'x' || "
            "CAST(d AS VARCHAR) AS txt FROM ent), "
            "s AS (SELECT id, txt, row_number() OVER "
            "(ORDER BY txt, id) AS rn FROM e2), "
            "m AS (SELECT s1.id AS a, s2.id AS b FROM s s1 "
            "JOIN s s2 ON s2.rn - s1.rn BETWEEN 1 AND 7 "
            "WHERE levenshtein(s1.txt, s2.txt) <= 1), "
            "sym AS (SELECT a AS u, b AS v FROM m "
            "UNION SELECT b, a FROM m), "
            "reach AS (SELECT id AS r, id AS v FROM e2 "
            "UNION SELECT reach.r, sym.v FROM reach "
            "JOIN sym ON sym.u = reach.v) "
            "SELECT r AS id, min(v) AS cluster FROM reach GROUP BY r"
        ),
        # edge_embeddedness: one triangle pass fanned to 3 edge
        # records + LEFT JOIN for zero-support bridges
        "edge_embeddedness": (
            "WITH e0 AS (SELECT DISTINCT "
            "least('n' || (o_orderkey % 41), "
            "'n' || ((o_orderkey // 41) % 41)) AS a, "
            "greatest('n' || (o_orderkey % 41), "
            "'n' || ((o_orderkey // 41) % 41)) AS b "
            "FROM orders WHERE (o_orderkey % 41) <> "
            "((o_orderkey // 41) % 41)), "
            "t1 AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z "
            "FROM e0 e1 JOIN e0 e2 ON e2.a = e1.a AND e2.b > e1.b "
            "JOIN e0 e3 ON e3.a = e1.b AND e3.b = e2.b), "
            "s1 AS (SELECT a, b, count(*) AS c FROM ("
            "SELECT x AS a, y AS b FROM t1 "
            "UNION ALL SELECT x, z FROM t1 "
            "UNION ALL SELECT y, z FROM t1) GROUP BY a, b) "
            "SELECT e0.a, e0.b, coalesce(s1.c, 0) AS support "
            "FROM e0 LEFT JOIN s1 ON s1.a = e0.a AND s1.b = e0.b"
        ),
        # powerlaw_alpha: Hill MLE 1 + n/sum(ln(d/dmin)), dmin=2,
        # over the same deduped undirected degree table
        "powerlaw_alpha": (
            "WITH e0 AS (SELECT DISTINCT "
            "least(o_orderkey % 141, (o_orderkey // 141) % 141) AS a, "
            "greatest(o_orderkey % 141, (o_orderkey // 141) % 141) AS b "
            "FROM orders "
            "WHERE o_orderkey % 141 <> (o_orderkey // 141) % 141), "
            "deg AS (SELECT node, count(*) AS d FROM ("
            "SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0) "
            "GROUP BY node), "
            "t AS (SELECT CAST(d AS DOUBLE) AS d FROM deg "
            "WHERE d >= 2) "
            "SELECT count(*) AS n_tail, "
            "CAST(floor((1.0 + count(*) / (sum(ln(d)) "
            "- count(*) * ln(2.0))) * 1e6 + 1e-6) AS BIGINT) "
            "AS alpha_q FROM t"
        ),
        # entity_pair_pmi: distinct per-doc tokens >= 5 chars, pair
        # df via self-join, PMI = ln(cab*N/(ca*cb)) 1e6-quantized
        "entity_pair_pmi": (
            "WITH toks AS (SELECT DISTINCT doc_id, tok FROM ("
            "SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
            "FROM documents) WHERE length(tok) >= 5), "
            "n AS (SELECT count(*) AS nd FROM documents), "
            "dfr AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok), "
            "pc AS (SELECT t1.tok AS a, t2.tok AS b, count(*) AS cab "
            "FROM toks t1 JOIN toks t2 ON t1.doc_id = t2.doc_id "
            "AND t1.tok < t2.tok GROUP BY t1.tok, t2.tok "
            "HAVING count(*) >= 2) "
            "SELECT pc.a, pc.b, pc.cab, "
            "CAST(floor(ln(CAST(pc.cab AS DOUBLE) * n.nd "
            "/ (da.c * db.c)) * 1e6 + 1e-6) AS BIGINT) AS pmi_q "
            "FROM pc, n "
            "JOIN dfr da ON da.tok = pc.a "
            "JOIN dfr db ON db.tok = pc.b"
        ),
        # wu_palmer: recursive-CTE ancestor closure (UNION dedups DAG
        # rediscoveries) over the residue binary tree; depth = closure
        # count incl. self; LCA depth = max depth over common
        # ancestors; sim = 2.0*lca/(da+db) — same single-rounding IEEE
        # ops as the engine, exact. Pairs with an absent endpoint drop
        # on both sides (the closure only contains existing nodes).
        "wu_palmer": (
            "WITH RECURSIVE "
            "ed AS (SELECT DISTINCT o_orderkey % 1021 AS c, "
            "(o_orderkey % 1021) // 2 AS p FROM orders "
            "WHERE o_orderkey % 1021 >= 2), "
            "nodes AS (SELECT c AS node FROM ed "
            "UNION SELECT p FROM ed), "
            "cl AS (SELECT node, node AS anc FROM nodes "
            "UNION SELECT cl.node, ed.p FROM cl "
            "JOIN ed ON ed.c = cl.anc), "
            "d AS (SELECT node, count(*) AS dep FROM cl "
            "GROUP BY node), "
            "pr(qa, qb) AS (VALUES (40, 41), (13, 97), (96, 97), "
            "(5, 119), (2, 3), (500, 1019)), "
            "lca AS (SELECT pr.qa, pr.qb, max(dd.dep) AS lca_depth "
            "FROM pr JOIN cl a ON a.node = pr.qa "
            "JOIN cl b ON b.node = pr.qb AND b.anc = a.anc "
            "JOIN d dd ON dd.node = a.anc GROUP BY pr.qa, pr.qb) "
            "SELECT CAST(l.qa AS BIGINT) AS qa, "
            "CAST(l.qb AS BIGINT) AS qb, l.lca_depth, "
            "2.0 * l.lca_depth / (da.dep + db.dep) AS sim "
            "FROM lca l JOIN d da ON da.node = l.qa "
            "JOIN d db ON db.node = l.qb"
        ),
        # resnik_lin: freq_desc = closure-join rollup of residue
        # annotation counts (exact ints); most-informative common
        # ancestor = MIN freq (IC strictly decreasing in freq);
        # resnik = ln(N/min_freq), lin = 2·resnik/(IC(a)+IC(b)) —
        # identical single-rounding expressions, 1e6-quantized
        "resnik_lin": (
            "WITH RECURSIVE "
            "ed AS (SELECT DISTINCT o_orderkey % 1021 AS c, "
            "(o_orderkey % 1021) // 2 AS p FROM orders "
            "WHERE o_orderkey % 1021 >= 2), "
            "nodes AS (SELECT c AS node FROM ed "
            "UNION SELECT p FROM ed), "
            "cl AS (SELECT node, node AS anc FROM nodes "
            "UNION SELECT cl.node, ed.p FROM cl "
            "JOIN ed ON ed.c = cl.anc), "
            "cnt AS (SELECT o_orderkey % 1021 AS node, "
            "count(*) AS c FROM orders GROUP BY 1), "
            "f AS (SELECT cl.anc AS node, "
            "CAST(sum(cnt.c) AS BIGINT) AS f FROM cl "
            "JOIN cnt ON cnt.node = cl.node GROUP BY cl.anc), "
            "nt AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM cnt "
            "WHERE node IN (SELECT node FROM nodes)), "
            "pr(qa, qb) AS (VALUES (40, 41), (13, 97), (96, 97), "
            "(5, 119), (2, 3), (500, 1019)), "
            "mif AS (SELECT pr.qa, pr.qb, "
            "CAST(min(f.f) AS BIGINT) AS min_freq "
            "FROM pr JOIN cl a ON a.node = pr.qa "
            "JOIN cl b ON b.node = pr.qb AND b.anc = a.anc "
            "JOIN f ON f.node = a.anc GROUP BY pr.qa, pr.qb) "
            "SELECT CAST(m.qa AS BIGINT) AS qa, "
            "CAST(m.qb AS BIGINT) AS qb, m.min_freq, "
            "CAST(floor(ln(nt.n / m.min_freq) * 1e6 + 1e-6) "
            "AS BIGINT) AS resnik_q, "
            "CAST(floor(CASE WHEN ln(nt.n / fa.f) + ln(nt.n / fb.f) "
            "> 0 THEN 2.0 * ln(nt.n / m.min_freq) / "
            "(ln(nt.n / fa.f) + ln(nt.n / fb.f)) ELSE 1.0 END "
            "* 1e6 + 1e-6) AS BIGINT) AS lin_q "
            "FROM mif m "
            "JOIN f fa ON fa.node = m.qa "
            "JOIN f fb ON fb.node = m.qb "
            "CROSS JOIN nt"
        ),
        # bgp_filter: FILTER = WHERE over the BGP join; regex via
        # regexp_matches (RE2, same engine as pyarrow)
        "bgp_filter": (
            "WITH t AS ("
            "SELECT 'c' || c_custkey AS subj, 'in_nation' AS pred, "
            "'n' || c_nationkey AS obj FROM customer "
            "UNION ALL "
            "SELECT 'n' || n_nationkey, 'in_region', "
            "'r' || n_regionkey FROM nation) "
            "SELECT p1.subj AS c, p1.obj AS n, p2.obj AS r "
            "FROM t p1 "
            "JOIN t p2 ON p2.subj = p1.obj AND p2.pred = 'in_region' "
            "WHERE p1.pred = 'in_nation' AND p1.obj <> 'n3' "
            "AND regexp_matches(p1.subj, '^c[0-9]*[02468]$')"
        ),
        # scc: forward closure pairs; SCC(x) = min over mutually-
        # reachable partners (self included via cycles), singletons
        # via the left-join coalesce
        "scc": (
            "WITH RECURSIVE "
            "e AS (SELECT DISTINCT o_orderkey % 97 AS u, "
            "(o_orderkey * 31 + 7) % 97 AS v FROM orders "
            "WHERE o_orderkey % 97 <> (o_orderkey * 31 + 7) % 97), "
            "nd AS (SELECT DISTINCT node FROM ("
            "SELECT u AS node FROM e UNION ALL SELECT v FROM e)), "
            "r AS (SELECT u AS a, v AS b FROM e "
            "UNION SELECT r.a, e.v FROM r JOIN e ON e.u = r.b), "
            "m AS (SELECT r1.a AS node, min(r1.b) AS mm FROM r r1 "
            "JOIN r r2 ON r2.a = r1.b AND r2.b = r1.a "
            "GROUP BY r1.a) "
            "SELECT nd.node, least(nd.node, coalesce(m.mm, nd.node)) "
            "AS component FROM nd LEFT JOIN m ON m.node = nd.node"
        ),
        # quotient_graph: canonical undirected dedup → community map
        # (digits % 3) → unordered community-pair counts
        "quotient_graph": (
            "WITH pk AS (SELECT p_partkey AS k FROM part), "
            "raw AS (SELECT 'n' || (k % 23) AS s, 'n' || (k % 29) AS t "
            "FROM pk UNION ALL SELECT 'c' || (k % 509), "
            "'c' || ((k % 509) + 1) FROM pk), "
            "w AS (SELECT DISTINCT least(s, t) AS a, "
            "greatest(s, t) AS b FROM raw WHERE s <> t), "
            "nd AS (SELECT a AS node FROM w UNION SELECT b FROM w), "
            "asg AS (SELECT node, CAST(CAST(substr(node, 2) "
            "AS BIGINT) % 3 AS VARCHAR) AS cm FROM nd), "
            "wc AS (SELECT least(x.cm, y.cm) AS ca, "
            "greatest(x.cm, y.cm) AS cb FROM w "
            "JOIN asg x ON x.node = w.a "
            "JOIN asg y ON y.node = w.b) "
            "SELECT ca, cb, count(*) AS n_edges FROM wc "
            "GROUP BY ca, cb"
        ),
        # cc_incremental: oracle = min-reachable recursive CTE over
        # old ∪ new undirected edges (identical to full recompute,
        # which is exactly the operator's contract)
        "cc_incremental": (
            "WITH RECURSIVE "
            "m0 AS (SELECT o_orderkey % 1200 AS m FROM orders), "
            "olde AS (SELECT DISTINCT m AS u, m + 1 AS v FROM m0 "
            "WHERE m % 12 <> 11), "
            "newe AS (SELECT DISTINCT m AS u, m + 12 AS v FROM m0 "
            "WHERE m % 24 = 5 "
            "UNION SELECT DISTINCT m + 10000, m + 10001 FROM m0 "
            "WHERE m % 48 = 7), "
            "alle AS (SELECT u, v FROM olde "
            "UNION SELECT u, v FROM newe), "
            "und AS (SELECT u, v FROM alle "
            "UNION SELECT v, u FROM alle), "
            "nd AS (SELECT DISTINCT u AS node FROM und), "
            "r AS (SELECT node, node AS m FROM nd "
            "UNION "
            "SELECT r.node, und.v FROM r "
            "JOIN und ON und.u = r.m) "
            "SELECT node, min(m) AS component FROM r GROUP BY node"
        ),
        # sniff_format: oracle recomputes the planted magic label
        "sniff_format": (
            "SELECT o_orderkey AS doc_id, "
            "CASE o_orderkey % 4 WHEN 0 THEN 'png' "
            "WHEN 1 THEN 'jpeg' WHEN 2 THEN 'pdf' "
            "ELSE 'unknown' END AS format FROM orders"
        ),
        # audio_meta: engine parses REAL WAV bytes planted from
        # orderkeys; oracle recomputes the planted fields
        "audio_meta": (
            "SELECT o_orderkey AS doc_id, 'wav' AS format, "
            "o_orderkey % 8 + 1 AS channels, "
            "(o_orderkey % 4 + 1) * 8000 AS sample_rate, "
            "8 * (o_orderkey % 3 + 1) AS bits_per_sample FROM orders"
        ),
        # image_meta: the engine parses REAL PNG bytes it built from
        # orderkeys; the oracle recomputes the planted dims
        "image_meta": (
            "SELECT o_orderkey AS doc_id, 'png' AS format, "
            "o_orderkey % 1920 + 1 AS width, "
            "o_orderkey % 1080 + 1 AS height FROM orders"
        ),
        # bmp_decode: the engine DECODES real BMP pixel rasters
        # (bottom-up BGR + padding); the oracle recomputes the
        # planted per-pixel values arithmetically
        "bmp_decode": (
            "WITH px AS (SELECT o_orderkey AS k, i FROM orders "
            "CROSS JOIN generate_series(0, 35) AS t(i) "
            "WHERE i < 3 * (o_orderkey % 4 + 1) "
            "* (o_orderkey % 3 + 1)) "
            "SELECT k AS doc_id, 'bmp' AS format, "
            "k % 4 + 1 AS width, k % 3 + 1 AS height, "
            "CAST(sum((k + i) % 251) AS BIGINT) AS px_sum, "
            "k % 251 AS first_px FROM px GROUP BY k"
        ),
        # png_decode: engine inflates + unfilters REAL PNG bytes;
        # oracle recomputes the planted per-sample values
        "png_decode": (
            "WITH px AS (SELECT o_orderkey AS k, i FROM orders "
            "CROSS JOIN generate_series(0, 35) AS t(i) "
            "WHERE i < 3 * (o_orderkey % 4 + 1) "
            "* (o_orderkey % 3 + 1)) "
            "SELECT k AS doc_id, 'png' AS format, "
            "k % 4 + 1 AS width, k % 3 + 1 AS height, "
            "CAST(sum((k + i) % 251) AS BIGINT) AS px_sum, "
            "k % 251 AS first_px FROM px GROUP BY k"
        ),
        # Lee'22 duplicated-span removal replay: 5-grams per (doc,
        # pos), duplicated when in >=2 distinct docs, min-doc keeper
        # keeps its text, others mask the gram's 5 token positions;
        # unaffected docs pass through byte-identical, rewritten docs
        # join surviving ORIGINAL-CASE tokens with single spaces,
        # fully-masked docs drop
        "remove_dup_spans": (
            "WITH lists AS (SELECT doc_id, text, "
            "regexp_extract_all(lower(text), '[a-z0-9_]+') AS l, "
            "regexp_extract_all(text, '[a-zA-Z0-9_]+') AS lo "
            "FROM documents), "
            "gram AS (SELECT doc_id, i AS pos, l[i+1] || ' ' || "
            "l[i+2] || ' ' || l[i+3] || ' ' || l[i+4] || ' ' || "
            "l[i+5] AS g FROM (SELECT doc_id, l, len(l) AS nt, "
            "unnest(range(len(l))) AS i FROM lists) WHERE i + 5 <= nt), "
            "dup AS (SELECT g, min(doc_id) AS keeper FROM "
            "(SELECT DISTINCT doc_id, g FROM gram) GROUP BY g "
            "HAVING count(*) >= 2), "
            "maskpos AS (SELECT DISTINCT gr.doc_id, gr.pos + o.o "
            "AS tpos FROM gram gr JOIN dup d ON d.g = gr.g "
            "AND d.keeper <> gr.doc_id CROSS JOIN "
            "(SELECT unnest(range(5)) AS o) o), "
            "aff AS (SELECT DISTINCT doc_id FROM maskpos), "
            "surv AS (SELECT t.doc_id, t.i AS pos, t.lo[t.i+1] AS w "
            "FROM (SELECT doc_id, lo, len(lo) AS nt, "
            "unnest(range(len(lo))) AS i FROM lists) t "
            "JOIN aff USING (doc_id) WHERE NOT EXISTS "
            "(SELECT 1 FROM maskpos m WHERE m.doc_id = t.doc_id "
            "AND m.tpos = t.i)), "
            "rew AS (SELECT doc_id, string_agg(w, ' ' ORDER BY pos) "
            "AS text FROM surv GROUP BY doc_id) "
            "SELECT d.doc_id, coalesce(r.text, d.text) AS text "
            "FROM documents d "
            "LEFT JOIN aff a ON a.doc_id = d.doc_id "
            "LEFT JOIN rew r ON r.doc_id = d.doc_id "
            "WHERE a.doc_id IS NULL OR r.doc_id IS NOT NULL"
        ),
        "jpeg_decode": (
            "SELECT o_orderkey AS doc_id, 'jpeg' AS format, "
            "CASE WHEN o_orderkey % 2 = 0 THEN 8 ELSE 16 END AS width, "
            "CASE WHEN o_orderkey % 2 = 0 THEN 8 ELSE 16 END AS height, "
            "CAST(CASE WHEN o_orderkey % 2 = 0 "
            "THEN 64 * (o_orderkey % 251) "
            "ELSE 192 * ((o_orderkey % 251) + ((o_orderkey + 17) % 251)"
            " + ((o_orderkey + 34) % 251) + ((o_orderkey + 51) % 251)) "
            "END AS BIGINT) AS px_sum, "
            "o_orderkey % 251 AS first_px FROM orders"
        ),
        "mjpeg_frames": (
            "SELECT o_orderkey AS doc_id, CAST(j AS BIGINT) "
            "AS frame_idx, "
            "CAST((o_orderkey + 29 * ((j * 5) // 2)) % 251 "
            "AS DOUBLE) AS f_mean, 0.0::DOUBLE AS f_std "
            "FROM orders CROSS JOIN (SELECT unnest(range(3)) AS j)"
        ),
        # wav_decode: the engine extracts real 16-bit PCM samples via
        # the RIFF chunk walk; oracle replays the planted recurrence
        "wav_decode": (
            "WITH smp AS (SELECT o_orderkey AS k, i FROM orders "
            "CROSS JOIN generate_series(0, 11) AS t(i) "
            "WHERE i < (o_orderkey % 5 + 2) "
            "* (o_orderkey % 2 + 1)) "
            "SELECT k AS doc_id, 'wav' AS format, "
            "k % 5 + 2 AS n_frames, k % 2 + 1 AS channels, "
            "8000 * (k % 3 + 1) AS sample_rate, "
            "CAST(sum((k * 7 + i * 13 + 32768) % 65536 - 32768) "
            "AS BIGINT) AS sample_sum, "
            "(k * 7 + 32768) % 65536 - 32768 AS first_sample "
            "FROM smp GROUP BY k"
        ),
        # neighbor_sample: ROW_NUMBER over the pinned modular hash per
        # source replays the sampled adjacency; 2 unrolled hops with
        # DISTINCT frontiers; exact
        "neighbor_sample": (
            "WITH e AS (SELECT DISTINCT o_orderkey % 997 AS s, "
            "(o_orderkey * 31 + 7) % 997 AS d FROM orders "
            "WHERE o_orderkey % 997 <> (o_orderkey * 31 + 7) % 997), "
            "rk AS (SELECT s, d, ROW_NUMBER() OVER ("
            "PARTITION BY s ORDER BY ((d % 1000000007) * 48271 "
            "+ (s % 1000000007) * 30011) % 1000000007, d) - 1 AS rk "
            "FROM e), "
            "seeds AS (SELECT DISTINCT s AS seed FROM e), "
            "h1 AS (SELECT DISTINCT seeds.seed, rk.d AS node "
            "FROM seeds JOIN rk ON rk.s = seeds.seed AND rk.rk < 3), "
            "h2 AS (SELECT DISTINCT h1.seed, rk.d AS node FROM h1 "
            "JOIN rk ON rk.s = h1.node AND rk.rk < 2) "
            "SELECT seed, CAST(0 AS BIGINT) AS hop, seed AS node "
            "FROM seeds "
            "UNION ALL SELECT seed, 1, node FROM h1 "
            "UNION ALL SELECT seed, 2, node FROM h2"
        ),
        # dbscan: ε-pairs via list_cosine_similarity self-join, cores
        # by neighbor count (incl. self), recursive-CTE reachability
        # over core-core edges (component = min id), borders adopt
        # the MIN core-neighbor cluster, rest noise
        "dbscan": (
            "WITH RECURSIVE "
            "e AS (SELECT vec_id, embedding FROM embeddings), "
            "p AS (SELECT a.vec_id AS ia, b.vec_id AS ib FROM e a "
            "JOIN e b ON a.vec_id < b.vec_id "
            "AND list_cosine_similarity(a.embedding, b.embedding) "
            ">= 0.35), "
            "nb AS (SELECT node, count(*) AS nn FROM ("
            "SELECT ia AS node FROM p UNION ALL SELECT ib FROM p) "
            "GROUP BY node), "
            "core AS (SELECT node FROM nb WHERE nn + 1 >= 3), "
            "ce AS (SELECT ia, ib FROM p "
            "WHERE ia IN (SELECT node FROM core) "
            "AND ib IN (SELECT node FROM core)), "
            "r AS (SELECT node, node AS m FROM core "
            "UNION "
            "SELECT r.node, CASE WHEN ce.ia = r.m THEN ce.ib "
            "ELSE ce.ia END FROM r "
            "JOIN ce ON ce.ia = r.m OR ce.ib = r.m), "
            "comp AS (SELECT node, min(m) AS cluster FROM r "
            "GROUP BY node), "
            "fan AS (SELECT ia AS me, ib AS nb2 FROM p "
            "UNION ALL SELECT ib, ia FROM p), "
            "bc AS (SELECT f.me AS node, min(c.cluster) AS cluster "
            "FROM fan f JOIN comp c ON c.node = f.nb2 "
            "WHERE f.me NOT IN (SELECT node FROM core) "
            "GROUP BY f.me) "
            "SELECT e.vec_id, "
            "CASE WHEN comp.node IS NOT NULL THEN 'core' "
            "WHEN bc.node IS NOT NULL THEN 'border' "
            "ELSE 'noise' END AS role, "
            "coalesce(comp.cluster, bc.cluster) AS cluster "
            "FROM e LEFT JOIN comp ON comp.node = e.vec_id "
            "LEFT JOIN bc ON bc.node = e.vec_id"
        ),
        # kge_negatives: replay the pinned modular hash (M =
        # 1000000007) over each distinct triple × j, pick head/tail
        # and a uniform entity rank, join ROW_NUMBER ranks; exact
        "kge_negatives": (
            "WITH tri AS (SELECT DISTINCT o_orderkey % 211 AS s, "
            "o_orderkey % 7 AS p, (o_orderkey * 31 + 5) % 211 AS o "
            "FROM orders), "
            "ent AS (SELECT DISTINCT e FROM ("
            "SELECT s AS e FROM tri UNION SELECT o FROM tri)), "
            "rk AS (SELECT e AS ent, "
            "ROW_NUMBER() OVER (ORDER BY e) - 1 AS r FROM ent), "
            "cnt AS (SELECT count(*) AS ne FROM ent), "
            "fan AS (SELECT tri.s, tri.p, tri.o, j.j, "
            "(((((tri.s % 1000000007) * 1000003 "
            "+ tri.p % 1000000007) % 1000000007) * 1000003 "
            "+ tri.o % 1000000007) % 1000000007 "
            "+ j.j * 7919) % 1000000007 AS kj "
            "FROM tri CROSS JOIN (VALUES (0), (1)) AS j(j)), "
            "fx AS (SELECT s, p, o, CAST(j AS BIGINT) AS j, "
            "(kj * 30011 + 17) % 1000000007 % 2 AS head, "
            "(kj * 48271 + 11) % 1000000007 % cnt.ne AS want "
            "FROM fan CROSS JOIN cnt) "
            "SELECT fx.s, fx.p, fx.o, fx.j, "
            "CASE WHEN fx.head = 1 THEN 'head' ELSE 'tail' END "
            "AS side, "
            "CASE WHEN fx.head = 1 THEN rk.ent ELSE fx.s END "
            "AS neg_s, "
            "CASE WHEN fx.head = 1 THEN fx.o ELSE rk.ent END "
            "AS neg_o "
            "FROM fx JOIN rk ON rk.r = fx.want"
        ),
        # closeness: reached = c1+c2, Σd = c1 + 2·c2 (exact ints),
        # ONE division — same CTE skeleton as neighborhood
        "closeness_centrality": (
            "WITH RECURSIVE "
            "pk AS (SELECT p_partkey AS k FROM part), "
            "raw AS (SELECT 'n' || (k % 23) AS s, 'n' || (k % 29) AS t "
            "FROM pk UNION ALL SELECT 'c' || (k % 509), "
            "'c' || ((k % 509) + 1) FROM pk), "
            "e AS (SELECT DISTINCT s AS src, t AS dst FROM raw "
            "UNION SELECT DISTINCT t, s FROM raw), "
            "n AS (SELECT DISTINCT src AS node FROM e), "
            "r AS (SELECT node AS root, node AS node, 0 AS d FROM n "
            "UNION "
            "SELECT r.root, e.dst, r.d + 1 FROM r "
            "JOIN e ON e.src = r.node WHERE r.d < 2), "
            "md AS (SELECT root, node, min(d) AS d FROM r "
            "GROUP BY root, node), "
            "ct AS (SELECT root, "
            "count(*) FILTER (d = 1) AS c1, "
            "count(*) FILTER (d = 2) AS c2 FROM md GROUP BY root) "
            "SELECT root AS node, c1 + c2 AS reached, "
            "CASE WHEN c1 + 2 * c2 = 0 THEN 0.0 ELSE "
            "CAST(c1 + c2 AS DOUBLE) / (c1 + 2 * c2) END "
            "AS closeness FROM ct"
        ),
        # effective_diameter: P(t) = Σ ball sizes from the bounded-hop
        # CTE; t_hi = first t with P(t) ≥ 0.9·P(2); interpolate inside
        # the last hop — identical single-rounding IEEE expressions
        "effective_diameter": (
            "WITH RECURSIVE "
            "pk AS (SELECT p_partkey AS k FROM part), "
            "raw AS (SELECT 'n' || (k % 23) AS s, 'n' || (k % 29) AS t "
            "FROM pk UNION ALL SELECT 'c' || (k % 509), "
            "'c' || ((k % 509) + 1) FROM pk), "
            "e AS (SELECT DISTINCT s AS src, t AS dst FROM raw "
            "UNION SELECT DISTINCT t, s FROM raw), "
            "n AS (SELECT DISTINCT src AS node FROM e), "
            "r AS (SELECT node AS root, node AS node, 0 AS d FROM n "
            "UNION "
            "SELECT r.root, e.dst, r.d + 1 FROM r "
            "JOIN e ON e.src = r.node WHERE r.d < 2), "
            "md AS (SELECT root, node, min(d) AS d FROM r "
            "GROUP BY root, node), "
            "p AS (SELECT t.t AS t, CAST(count(*) AS DOUBLE) AS p "
            "FROM md JOIN (VALUES (0), (1), (2)) AS t(t) "
            "ON md.d <= t.t GROUP BY t.t), "
            "mx AS (SELECT p AS pmax FROM p WHERE t = 2), "
            "hi AS (SELECT min(p.t) AS thi FROM p CROSS JOIN mx "
            "WHERE p.p >= 0.9 * mx.pmax) "
            "SELECT 0.9 AS q, CAST(hi.thi AS BIGINT) AS t_hi, "
            "CASE WHEN hi.thi = 0 THEN 0.0 "
            "ELSE CAST(hi.thi - 1 AS DOUBLE) "
            "+ (0.9 * mx.pmax - pl.p) / (ph.p - pl.p) END "
            "AS eff_diameter "
            "FROM hi CROSS JOIN mx "
            "JOIN p ph ON ph.t = hi.thi "
            "LEFT JOIN p pl ON pl.t = hi.thi - 1"
        ),
        # partition_quality: canonical undirected dedup (self-loops
        # out) → 2-rows-per-edge fan with (deg, internal, cut)
        # markers → per-community sums; conductance + modularity term
        # replay the engine's float expressions
        "partition_quality": (
            "WITH "
            "pk AS (SELECT p_partkey AS k FROM part), "
            "raw AS (SELECT 'n' || (k % 23) AS s, 'n' || (k % 29) AS t "
            "FROM pk UNION ALL SELECT 'c' || (k % 509), "
            "'c' || ((k % 509) + 1) FROM pk), "
            "w AS (SELECT DISTINCT least(s, t) AS a, "
            "greatest(s, t) AS b FROM raw WHERE s <> t), "
            "nd AS (SELECT a AS node FROM w UNION SELECT b FROM w), "
            "asg AS (SELECT node, CAST(CAST(substr(node, 2) "
            "AS BIGINT) % 3 AS VARCHAR) AS cm FROM nd), "
            "wc AS (SELECT w.a, w.b, x.cm AS ca, y.cm AS cb FROM w "
            "JOIN asg x ON x.node = w.a "
            "JOIN asg y ON y.node = w.b), "
            "fan AS (SELECT ca AS community, 1 AS deg, "
            "CASE WHEN ca = cb THEN 1 ELSE 0 END AS internal, "
            "CASE WHEN ca <> cb THEN 1 ELSE 0 END AS cut FROM wc "
            "UNION ALL SELECT cb, 1, 0, "
            "CASE WHEN ca <> cb THEN 1 ELSE 0 END FROM wc), "
            "s AS (SELECT community, "
            "CAST(sum(internal) AS BIGINT) AS internal, "
            "CAST(sum(cut) AS BIGINT) AS cut, "
            "CAST(sum(deg) AS BIGINT) AS vol FROM fan "
            "GROUP BY community), "
            "m AS (SELECT CAST(count(*) AS DOUBLE) AS md FROM w) "
            "SELECT s.community, s.internal, s.cut, s.vol, "
            "CASE WHEN least(CAST(s.vol AS DOUBLE), "
            "2.0 * m.md - s.vol) > 0 THEN s.cut / "
            "least(CAST(s.vol AS DOUBLE), 2.0 * m.md - s.vol) "
            "ELSE NULL END AS conductance, "
            "CAST(s.internal AS DOUBLE) / m.md "
            "- (CAST(s.vol AS DOUBLE) / (2.0 * m.md)) "
            "* (CAST(s.vol AS DOUBLE) / (2.0 * m.md)) "
            "AS modularity_term "
            "FROM s CROSS JOIN m"
        ),
        # transitive_reduction: keep asserted (c, p) unless p is a
        # PROPER ancestor of another parent q of c (recursive-CTE
        # closure re-derives it); exact
        "transitive_reduction": (
            "WITH RECURSIVE "
            "ed AS (SELECT DISTINCT c, p FROM ("
            "SELECT o_orderkey % 1021 AS c, "
            "(o_orderkey % 1021) // 2 AS p FROM orders "
            "WHERE o_orderkey % 1021 >= 2 "
            "UNION ALL "
            "SELECT o_orderkey % 1021, (o_orderkey % 1021) // 4 "
            "FROM orders WHERE o_orderkey % 1021 >= 4 "
            "AND o_orderkey % 1021 % 5 = 0)), "
            "nodes AS (SELECT c AS node FROM ed "
            "UNION SELECT p FROM ed), "
            "cl AS (SELECT node, node AS anc FROM nodes "
            "UNION SELECT cl.node, ed.p FROM cl "
            "JOIN ed ON ed.c = cl.anc) "
            "SELECT e.c, e.p FROM ed e WHERE NOT EXISTS ("
            "SELECT 1 FROM ed e2 JOIN cl a ON a.node = e2.p "
            "AND a.anc = e.p WHERE e2.c = e.c AND e2.p <> e.p "
            "AND a.anc <> a.node)"
        ),
        # triple_vote: COUNT(DISTINCT source) per triple, group vote
        # mass, ROW_NUMBER plurality — exact
        "triple_vote": (
            "WITH t AS (SELECT DISTINCT "
            "'o' || (l_orderkey % 500) AS subj, 'has' AS pred, "
            "'p' || (l_partkey % 7) AS obj, "
            "'s' || (l_suppkey % 11) AS source FROM lineitem), "
            "c AS (SELECT subj, pred, obj, "
            "CAST(count(DISTINCT source) AS BIGINT) AS n_sources "
            "FROM t GROUP BY subj, pred, obj), "
            "g AS (SELECT subj, pred, "
            "CAST(sum(n_sources) AS BIGINT) AS n_total FROM c "
            "GROUP BY subj, pred), "
            "r AS (SELECT c.*, g.n_total, "
            "row_number() OVER (PARTITION BY c.subj, c.pred "
            "ORDER BY c.n_sources DESC, c.obj ASC) AS rn "
            "FROM c JOIN g ON g.subj = c.subj AND g.pred = c.pred) "
            "SELECT subj, pred, obj, n_sources, n_total, "
            "CAST(n_sources AS DOUBLE) / n_total AS confidence, "
            "CASE WHEN rn = 1 THEN 1 ELSE 0 END AS is_majority "
            "FROM r"
        ),
        # label_spreading: 2-round unrolled votes, seeds ride the
        # stream with an unreachable clamp weight — exact
        "label_spreading": (
            "WITH e0 AS (SELECT 'o' || l_orderkey AS src, "
            "'p' || l_partkey AS dst FROM lineitem), "
            "e AS (SELECT src, dst FROM e0 "
            "UNION ALL SELECT dst, src FROM e0), "
            "s0 AS (SELECT DISTINCT 'o' || l_orderkey AS node, "
            "'t' || (l_orderkey % 3) AS label FROM lineitem "
            "WHERE l_orderkey % 7 = 0), "
            "a1 AS (SELECT node, label, sum(w) AS w FROM ("
            "SELECT e.dst AS node, l.label, 1 AS w FROM e "
            "JOIN s0 l ON l.node = e.src "
            "UNION ALL SELECT node, label, 0 FROM s0 "
            "UNION ALL SELECT node, label, 1099511627776 FROM s0) "
            "GROUP BY node, label), "
            "l1 AS (SELECT node, label FROM ("
            "SELECT node, label, row_number() OVER ("
            "PARTITION BY node ORDER BY w DESC, label ASC) AS rn "
            "FROM a1) WHERE rn = 1), "
            "a2 AS (SELECT node, label, sum(w) AS w FROM ("
            "SELECT e.dst AS node, l.label, 1 AS w FROM e "
            "JOIN l1 l ON l.node = e.src "
            "UNION ALL SELECT node, label, 0 FROM l1 "
            "UNION ALL SELECT node, label, 1099511627776 FROM s0) "
            "GROUP BY node, label), "
            "l2 AS (SELECT node, label FROM ("
            "SELECT node, label, row_number() OVER ("
            "PARTITION BY node ORDER BY w DESC, label ASC) AS rn "
            "FROM a2) WHERE rn = 1) "
            "SELECT l2.node, l2.label, "
            "CASE WHEN s0.node IS NOT NULL THEN 1 ELSE 0 END "
            "AS is_seed FROM l2 "
            "LEFT JOIN s0 ON s0.node = l2.node"
        ),
        # entropy_per_key: -Σ p·ln p over per-key value counts; 1e6
        "entropy_per_key": (
            "WITH g AS (SELECT user_id AS k, event_type AS v, "
            "CAST(count(*) AS BIGINT) AS nn FROM events "
            "GROUP BY user_id, event_type), "
            "t AS (SELECT k, CAST(sum(nn) AS BIGINT) AS n, "
            "CAST(count(*) AS BIGINT) AS nd FROM g GROUP BY k) "
            "SELECT t.k, t.n, t.nd AS n_distinct, "
            "CAST(floor((SELECT -sum((CAST(g.nn AS DOUBLE) / t.n) "
            "* ln(CAST(g.nn AS DOUBLE) / t.n)) FROM g "
            "WHERE g.k = t.k) * 1e6 + 1e-6) AS BIGINT) "
            "AS entropy_q FROM t"
        ),
        # spearman: average ranks via RANK() + (ties-1)/2, then
        # corr() of the ranks; 1e6
        "spearman": (
            "WITH x AS (SELECT l_orderkey % 20 AS k, "
            "CAST(l_quantity AS BIGINT) AS xv, "
            "CAST(floor(l_extendedprice) AS BIGINT) AS yv "
            "FROM lineitem), "
            "r AS (SELECT k, "
            "RANK() OVER (PARTITION BY k ORDER BY xv) "
            "+ (COUNT(*) OVER (PARTITION BY k, xv) - 1) / 2.0 "
            "AS rx, "
            "RANK() OVER (PARTITION BY k ORDER BY yv) "
            "+ (COUNT(*) OVER (PARTITION BY k, yv) - 1) / 2.0 "
            "AS ry FROM x) "
            "SELECT k, CAST(count(*) AS BIGINT) AS n, "
            "CAST(floor(corr(rx, ry) * 1e6 + 1e-6) AS BIGINT) "
            "AS rho_q FROM r GROUP BY k"
        ),
        # cramers_v: chi2 over present cells + (n − ΣE_present) for
        # the absent ones; 1e6
        "cramers_v": (
            "WITH x AS (SELECT lang AS a, "
            "CAST(doc_id % 4 AS VARCHAR) AS b FROM documents), "
            "g AS (SELECT a, b, CAST(count(*) AS BIGINT) AS nn "
            "FROM x GROUP BY a, b), "
            "ra AS (SELECT a, CAST(sum(nn) AS BIGINT) AS s FROM g "
            "GROUP BY a), "
            "cb AS (SELECT b, CAST(sum(nn) AS BIGINT) AS s FROM g "
            "GROUP BY b), "
            "t AS (SELECT CAST(sum(nn) AS BIGINT) AS n, "
            "(SELECT CAST(count(*) AS BIGINT) FROM ra) AS r, "
            "(SELECT CAST(count(*) AS BIGINT) FROM cb) AS c "
            "FROM g), "
            "s AS (SELECT "
            "sum((g.nn - CAST(ra.s AS DOUBLE) * cb.s / t.n) "
            "* (g.nn - CAST(ra.s AS DOUBLE) * cb.s / t.n) "
            "/ (CAST(ra.s AS DOUBLE) * cb.s / t.n)) AS chip, "
            "sum(CAST(ra.s AS DOUBLE) * cb.s / t.n) AS ep "
            "FROM g JOIN ra ON ra.a = g.a JOIN cb ON cb.b = g.b "
            "CROSS JOIN t GROUP BY t.n) "
            "SELECT t.n, t.r, t.c, "
            "CAST(floor((s.chip + (t.n - s.ep)) * 1e6 + 1e-6) "
            "AS BIGINT) AS chi2_q, "
            "CAST(floor(sqrt((s.chip + (t.n - s.ep)) "
            "/ (t.n * least(t.r - 1, t.c - 1))) * 1e6 + 1e-6) "
            "AS BIGINT) AS v_q "
            "FROM t CROSS JOIN s"
        ),
        # js_divergence: p·ln(p/m) with 0-mass terms dropped; 1e6
        "js_divergence": (
            "WITH x AS (SELECT CAST(floor(value) AS BIGINT) // 10 "
            "AS v, CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END "
            "AS il FROM events), "
            "g AS (SELECT v, CAST(sum(il) AS BIGINT) AS c1, "
            "CAST(sum(1 - il) AS BIGINT) AS c2 FROM x GROUP BY v), "
            "t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, "
            "CAST(sum(c2) AS BIGINT) AS n2, "
            "CAST(count(*) AS BIGINT) AS nb FROM g) "
            "SELECT t.n1, t.n2, t.nb AS n_bins, "
            "CAST(floor((SELECT "
            "0.5 * sum(CASE WHEN g.c1 > 0 THEN "
            "(CAST(g.c1 AS DOUBLE) / t.n1) "
            "* ln((CAST(g.c1 AS DOUBLE) / t.n1) "
            "/ (0.5 * (CAST(g.c1 AS DOUBLE) / t.n1 "
            "+ CAST(g.c2 AS DOUBLE) / t.n2))) ELSE 0.0 END) "
            "+ 0.5 * sum(CASE WHEN g.c2 > 0 THEN "
            "(CAST(g.c2 AS DOUBLE) / t.n2) "
            "* ln((CAST(g.c2 AS DOUBLE) / t.n2) "
            "/ (0.5 * (CAST(g.c1 AS DOUBLE) / t.n1 "
            "+ CAST(g.c2 AS DOUBLE) / t.n2))) ELSE 0.0 END) "
            "FROM g) * 1e6 + 1e-6) AS BIGINT) AS jsd_q FROM t"
        ),
        # vocab_overlap: two DISTINCT token sets, set arithmetic
        "vocab_overlap": (
            "WITH t1 AS (SELECT DISTINCT unnest(string_split("
            "text, ' ')) AS tok FROM documents WHERE doc_id % 2 = 0), "
            "t2 AS (SELECT DISTINCT unnest(string_split(text, ' ')) "
            "AS tok FROM documents WHERE doc_id % 2 = 1), "
            "s AS (SELECT "
            "(SELECT count(*) FROM t1) AS v1, "
            "(SELECT count(*) FROM t2) AS v2, "
            "(SELECT count(*) FROM t1 WHERE tok IN "
            "(SELECT tok FROM t2)) AS sh) "
            "SELECT CAST(v1 AS BIGINT) AS vocab1, "
            "CAST(v2 AS BIGINT) AS vocab2, "
            "CAST(sh AS BIGINT) AS shared, "
            "CAST(sh AS DOUBLE) / (v1 + v2 - sh) AS jaccard, "
            "CAST(sh AS DOUBLE) / v1 AS containment_1in2, "
            "CAST(sh AS DOUBLE) / v2 AS containment_2in1 FROM s"
        ),
        # psi_drift: both-present bins only; (p1-p2)·ln(p1/p2) 1e6
        "psi_drift": (
            "WITH x AS (SELECT CAST(floor(value) AS BIGINT) // 10 "
            "AS v, CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END "
            "AS il FROM events), "
            "g AS (SELECT v, CAST(sum(il) AS BIGINT) AS c1, "
            "CAST(sum(1 - il) AS BIGINT) AS c2 FROM x GROUP BY v), "
            "t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, "
            "CAST(sum(c2) AS BIGINT) AS n2, "
            "CAST(count(*) AS BIGINT) AS nb, "
            "CAST(count(*) FILTER (c1 = 0 OR c2 = 0) AS BIGINT) "
            "AS ns FROM g) "
            "SELECT t.n1, t.n2, t.nb AS n_bins, t.ns AS n_skipped, "
            "CAST(floor((SELECT sum((CAST(g.c1 AS DOUBLE) / t.n1 "
            "- CAST(g.c2 AS DOUBLE) / t.n2) "
            "* ln((CAST(g.c1 AS DOUBLE) / t.n1) "
            "/ (CAST(g.c2 AS DOUBLE) / t.n2))) FROM g "
            "WHERE g.c1 > 0 AND g.c2 > 0) * 1e6 + 1e-6) AS BIGINT) "
            "AS psi_q FROM t"
        ),
        # ks_drift: windowed cumsum ECDFs, max abs step gap — exact
        "ks_drift": (
            "WITH x AS (SELECT CAST(floor(value) AS BIGINT) AS v, "
            "CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS il "
            "FROM events), "
            "g AS (SELECT v, CAST(sum(il) AS BIGINT) AS c1, "
            "CAST(sum(1 - il) AS BIGINT) AS c2 FROM x GROUP BY v), "
            "c AS (SELECT v, SUM(c1) OVER (ORDER BY v "
            "ROWS UNBOUNDED PRECEDING) AS a1, "
            "SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) "
            "AS a2 FROM g), "
            "t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, "
            "CAST(sum(c2) AS BIGINT) AS n2 FROM g) "
            "SELECT t.n1, t.n2, "
            "max(abs(CAST(c.a1 AS DOUBLE) / t.n1 "
            "- CAST(c.a2 AS DOUBLE) / t.n2)) AS d_stat "
            "FROM c CROSS JOIN t GROUP BY t.n1, t.n2"
        ),
        # mad_outliers: two median() aggregates + one modified-z
        # expression replaying the engine's ops — exact
        "mad_outliers": (
            "WITH x AS (SELECT l_orderkey * 10 + l_linenumber "
            "AS id, l_orderkey AS k, "
            "CAST(l_quantity AS BIGINT) AS v FROM lineitem), "
            "m1 AS (SELECT k, count(*) AS n, median(v) AS med "
            "FROM x GROUP BY k), "
            "m2 AS (SELECT x.k, median(abs(x.v - m1.med)) AS mad "
            "FROM x JOIN m1 ON m1.k = x.k GROUP BY x.k) "
            "SELECT x.id, x.k, x.v, "
            "CASE WHEN m1.n > 1 AND m2.mad > 0 THEN "
            "0.6745 * (x.v - m1.med) / m2.mad ELSE NULL END "
            "AS mad_z, "
            "CASE WHEN m1.n > 1 AND m2.mad > 0 AND "
            "abs(0.6745 * (x.v - m1.med) / m2.mad) > 1.0 "
            "THEN 1 ELSE 0 END AS is_outlier "
            "FROM x JOIN m1 ON m1.k = x.k JOIN m2 ON m2.k = x.k"
        ),
        # bag ops: native INTERSECT ALL / EXCEPT ALL — exact
        "bag_intersect": (
            "SELECT c_nationkey AS a, c_mktsegment AS b "
            "FROM customer "
            "INTERSECT ALL "
            "SELECT s_nationkey, CASE WHEN s_suppkey % 2 = 0 "
            "THEN 'BUILDING' ELSE 'MACHINERY' END FROM supplier"
        ),
        "bag_except": (
            "SELECT c_nationkey AS a, c_mktsegment AS b "
            "FROM customer "
            "EXCEPT ALL "
            "SELECT s_nationkey, CASE WHEN s_suppkey % 2 = 0 "
            "THEN 'BUILDING' ELSE 'MACHINERY' END FROM supplier"
        ),
        # gini: ROW_NUMBER ascending formula (tie order cancels);
        # exact integer num/denom, one division
        "gini": (
            "WITH x AS (SELECT l_orderkey % 50 AS key, "
            "CAST(l_quantity AS BIGINT) AS val FROM lineitem), "
            "g AS (SELECT key, val, ROW_NUMBER() OVER ("
            "PARTITION BY key ORDER BY val) AS i, "
            "COUNT(*) OVER (PARTITION BY key) AS n, "
            "SUM(val) OVER (PARTITION BY key) AS tot FROM x) "
            "SELECT key, CAST(max(n) AS BIGINT) AS n, "
            "CAST(max(tot) AS BIGINT) AS total, "
            "CASE WHEN max(n) > 1 AND max(tot) > 0 THEN "
            "CAST(sum((2 * i - n - 1) * val) AS DOUBLE) "
            "/ (max(n) * max(tot)) ELSE NULL END AS gini "
            "FROM g GROUP BY key"
        ),
        # ap_at_k: cumulative-precision window terms / n_rel; 1e6
        "ap_at_k": (
            "WITH r0 AS (SELECT DISTINCT o_orderkey % 50 AS qid, "
            "(o_orderkey * 7 + 1) % 400 AS doc FROM orders), "
            "r1 AS (SELECT qid, doc, CAST((qid * 131 + doc * 17) "
            "% 997 AS DOUBLE) AS score FROM r0), "
            "q0 AS (SELECT DISTINCT p_partkey % 50 AS qid, "
            "(p_partkey * 3) % 400 AS doc FROM part), "
            "q1 AS (SELECT qid, doc, (qid + doc) % 3 + 1 AS rel "
            "FROM q0), "
            "rk AS (SELECT r1.qid, coalesce(q1.rel, 0) AS rel, "
            "ROW_NUMBER() OVER (PARTITION BY r1.qid "
            "ORDER BY r1.score DESC, r1.doc) AS rnk FROM r1 "
            "LEFT JOIN q1 ON q1.qid = r1.qid AND q1.doc = r1.doc), "
            "cw AS (SELECT qid, rel, rnk, "
            "SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) OVER ("
            "PARTITION BY qid ORDER BY rnk "
            "ROWS UNBOUNDED PRECEDING) AS ch FROM rk), "
            "nr AS (SELECT qid, CAST(count(*) FILTER (rel > 0) "
            "AS BIGINT) AS n_rel FROM q1 GROUP BY qid), "
            "a AS (SELECT qid, sum(CASE WHEN rel > 0 THEN "
            "CAST(ch AS DOUBLE) / rnk ELSE 0.0 END) AS s FROM cw "
            "WHERE rnk <= 5 GROUP BY qid), "
            "qs AS (SELECT qid FROM r0 UNION SELECT qid FROM q0) "
            "SELECT qs.qid, coalesce(nr.n_rel, 0) AS n_rel, "
            "CAST(floor(CASE WHEN coalesce(nr.n_rel, 0) = 0 "
            "THEN 0.0 ELSE coalesce(a.s, 0.0) / nr.n_rel END "
            "* 1e6 + 1e-6) AS BIGINT) AS ap_q "
            "FROM qs LEFT JOIN a ON a.qid = qs.qid "
            "LEFT JOIN nr ON nr.qid = qs.qid"
        ),
        # recall_at_k: hits in window / all relevants (union of
        # qids from runs and qrels — qrel rows ride along); exact
        "recall_at_k": (
            "WITH r0 AS (SELECT DISTINCT o_orderkey % 50 AS qid, "
            "(o_orderkey * 7 + 1) % 400 AS doc FROM orders), "
            "r1 AS (SELECT qid, doc, CAST((qid * 131 + doc * 17) "
            "% 997 AS DOUBLE) AS score FROM r0), "
            "q0 AS (SELECT DISTINCT p_partkey % 50 AS qid, "
            "(p_partkey * 3) % 400 AS doc FROM part), "
            "q1 AS (SELECT qid, doc, (qid + doc) % 3 + 1 AS rel "
            "FROM q0), "
            "rk AS (SELECT r1.qid, coalesce(q1.rel, 0) AS rel, "
            "ROW_NUMBER() OVER (PARTITION BY r1.qid "
            "ORDER BY r1.score DESC, r1.doc) AS rnk FROM r1 "
            "LEFT JOIN q1 ON q1.qid = r1.qid AND q1.doc = r1.doc), "
            "h AS (SELECT qid, CAST(count(*) FILTER (rel > 0) "
            "AS BIGINT) AS hits FROM rk WHERE rnk <= 5 "
            "GROUP BY qid), "
            "nr AS (SELECT qid, CAST(count(*) FILTER (rel > 0) "
            "AS BIGINT) AS n_rel FROM q1 GROUP BY qid), "
            "qs AS (SELECT qid FROM r0 UNION SELECT qid FROM q0) "
            "SELECT qs.qid, coalesce(h.hits, 0) AS hits, "
            "coalesce(nr.n_rel, 0) AS n_rel, "
            "CASE WHEN coalesce(nr.n_rel, 0) = 0 THEN 0.0 ELSE "
            "CAST(coalesce(h.hits, 0) AS DOUBLE) / nr.n_rel END "
            "AS recall "
            "FROM qs LEFT JOIN h ON h.qid = qs.qid "
            "LEFT JOIN nr ON nr.qid = qs.qid"
        ),
        # mrr: min qualifying ROW_NUMBER per query; exact
        "mrr": (
            "WITH r0 AS (SELECT DISTINCT o_orderkey % 50 AS qid, "
            "(o_orderkey * 7 + 1) % 400 AS doc FROM orders), "
            "r1 AS (SELECT qid, doc, CAST((qid * 131 + doc * 17) "
            "% 997 AS DOUBLE) AS score FROM r0), "
            "q0 AS (SELECT DISTINCT p_partkey % 50 AS qid, "
            "(p_partkey * 3) % 400 AS doc FROM part), "
            "q1 AS (SELECT qid, doc, (qid + doc) % 3 + 1 AS rel "
            "FROM q0), "
            "rk AS (SELECT r1.qid, coalesce(q1.rel, 0) AS rel, "
            "ROW_NUMBER() OVER (PARTITION BY r1.qid "
            "ORDER BY r1.score DESC, r1.doc) AS rnk FROM r1 "
            "LEFT JOIN q1 ON q1.qid = r1.qid AND q1.doc = r1.doc), "
            "fr AS (SELECT qid, CAST(min(rnk) AS BIGINT) AS frr "
            "FROM rk WHERE rnk <= 5 AND rel > 0 GROUP BY qid) "
            "SELECT qs.qid, fr.frr AS first_rel_rank, "
            "CASE WHEN fr.frr IS NULL THEN 0.0 "
            "ELSE 1.0 / fr.frr END AS rr "
            "FROM (SELECT DISTINCT qid FROM r0) qs "
            "LEFT JOIN fr ON fr.qid = qs.qid"
        ),
        # ndcg: ROW_NUMBER rankings both sides; union of qids from
        # runs and qrels; log2 sums 1e6-quantized
        "ndcg": (
            "WITH r0 AS (SELECT DISTINCT o_orderkey % 50 AS qid, "
            "(o_orderkey * 7 + 1) % 400 AS doc FROM orders), "
            "r1 AS (SELECT qid, doc, CAST((qid * 131 + doc * 17) "
            "% 997 AS DOUBLE) AS score FROM r0), "
            "q0 AS (SELECT DISTINCT p_partkey % 50 AS qid, "
            "(p_partkey * 3) % 400 AS doc FROM part), "
            "q1 AS (SELECT qid, doc, (qid + doc) % 3 + 1 AS rel "
            "FROM q0), "
            "rk AS (SELECT r1.qid, coalesce(q1.rel, 0) AS rel, "
            "ROW_NUMBER() OVER (PARTITION BY r1.qid "
            "ORDER BY r1.score DESC, r1.doc) AS rnk FROM r1 "
            "LEFT JOIN q1 ON q1.qid = r1.qid AND q1.doc = r1.doc), "
            "d AS (SELECT qid, sum(rel / log2(rnk + 1)) AS dcg "
            "FROM rk WHERE rnk <= 5 GROUP BY qid), "
            "ik AS (SELECT qid, rel, ROW_NUMBER() OVER ("
            "PARTITION BY qid ORDER BY rel DESC, doc) AS rnk "
            "FROM q1), "
            "i AS (SELECT qid, sum(rel / log2(rnk + 1)) AS idcg "
            "FROM ik WHERE rnk <= 5 GROUP BY qid), "
            "qs AS (SELECT qid FROM r0 UNION SELECT qid FROM q0) "
            "SELECT qs.qid, "
            "CAST(floor(coalesce(d.dcg, 0.0) * 1e6 + 1e-6) "
            "AS BIGINT) AS dcg_q, "
            "CAST(floor(coalesce(i.idcg, 0.0) * 1e6 + 1e-6) "
            "AS BIGINT) AS idcg_q, "
            "CAST(floor(CASE WHEN coalesce(i.idcg, 0.0) > 0 THEN "
            "coalesce(d.dcg, 0.0) / i.idcg ELSE 0.0 END "
            "* 1e6 + 1e-6) AS BIGINT) AS ndcg_q "
            "FROM qs LEFT JOIN d ON d.qid = qs.qid "
            "LEFT JOIN i ON i.qid = qs.qid"
        ),
        # classifier_eval: confusion from the same noisy predictor;
        # ratios single-rounding, zero-division → 0.0 — exact
        "classifier_eval": (
            "WITH x AS (SELECT CASE WHEN doc_id % 5 = 0 THEN 'xx' "
            "ELSE lang END AS pred, lang AS gold FROM documents), "
            "lbl AS (SELECT DISTINCT pred AS label FROM x "
            "UNION SELECT DISTINCT gold FROM x), "
            "m AS (SELECT lbl.label, "
            "CAST(count(*) FILTER (x.pred = lbl.label "
            "AND x.gold = lbl.label) AS BIGINT) AS tp, "
            "CAST(count(*) FILTER (x.pred = lbl.label "
            "AND x.gold <> lbl.label) AS BIGINT) AS fp, "
            "CAST(count(*) FILTER (x.pred <> lbl.label "
            "AND x.gold = lbl.label) AS BIGINT) AS fn "
            "FROM lbl CROSS JOIN x GROUP BY lbl.label) "
            "SELECT label, tp, fp, fn, tp + fn AS support, "
            "CASE WHEN tp + fp = 0 THEN 0.0 ELSE "
            "CAST(tp AS DOUBLE) / (tp + fp) END AS precision, "
            "CASE WHEN tp + fn = 0 THEN 0.0 ELSE "
            "CAST(tp AS DOUBLE) / (tp + fn) END AS recall, "
            "CASE WHEN (CASE WHEN tp + fp = 0 THEN 0.0 ELSE "
            "CAST(tp AS DOUBLE) / (tp + fp) END) + "
            "(CASE WHEN tp + fn = 0 THEN 0.0 ELSE "
            "CAST(tp AS DOUBLE) / (tp + fn) END) = 0 THEN 0.0 ELSE "
            "2.0 * (CASE WHEN tp + fp = 0 THEN 0.0 ELSE "
            "CAST(tp AS DOUBLE) / (tp + fp) END) "
            "* (CASE WHEN tp + fn = 0 THEN 0.0 ELSE "
            "CAST(tp AS DOUBLE) / (tp + fn) END) "
            "/ ((CASE WHEN tp + fp = 0 THEN 0.0 ELSE "
            "CAST(tp AS DOUBLE) / (tp + fp) END) + "
            "(CASE WHEN tp + fn = 0 THEN 0.0 ELSE "
            "CAST(tp AS DOUBLE) / (tp + fn) END)) END AS f1 "
            "FROM m"
        ),
        # readability: RE2 counts via regexp_extract_all lengths;
        # identical single-rounding grade expression — exact
        "readability": (
            "SELECT doc_id, "
            "len(regexp_extract_all(text, '\\S+')) AS n_words, "
            "len(regexp_extract_all(text, '[.!?]+')) "
            "AS n_sentences, "
            "len(regexp_extract_all(lower(text), '[aeiouy]+')) "
            "AS n_syllables, "
            "CASE WHEN len(regexp_extract_all(text, '\\S+')) = 0 "
            "THEN NULL ELSE "
            "0.39 * (CAST(len(regexp_extract_all(text, '\\S+')) "
            "AS DOUBLE) / greatest(len(regexp_extract_all(text, "
            "'[.!?]+')), 1)) + 11.8 * (CAST(len("
            "regexp_extract_all(lower(text), '[aeiouy]+')) "
            "AS DOUBLE) / len(regexp_extract_all(text, '\\S+'))) "
            "- 15.59 END AS fk_grade FROM documents"
        ),
        # calibration: same planted score/label construction; float
        # bin-sums 1e6-quantized, frac_pos = exact int ratio
        "calibration": (
            "WITH x AS (SELECT "
            "CAST(floor(value) AS BIGINT) % 100 / 100.0 AS s, "
            "CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END AS y "
            "FROM events), "
            "b AS (SELECT least(CAST(floor(s * 10) AS BIGINT), 9) "
            "AS bin, s, y FROM x) "
            "SELECT bin, count(*) AS n, "
            "CAST(floor(sum(s) / count(*) * 1e6 + 1e-6) AS BIGINT) "
            "AS mean_score_q, "
            "CAST(sum(y) AS DOUBLE) / count(*) AS frac_pos, "
            "CAST(floor(abs(CAST(sum(y) AS DOUBLE) / count(*) "
            "- sum(s) / count(*)) * 1e6 + 1e-6) AS BIGINT) "
            "AS gap_q FROM b GROUP BY bin"
        ),
        # er_eval: pp from cluster sizes, tp via two cluster-attach
        # joins on the gold pairs; ratios single-rounding — exact
        "er_eval": (
            "WITH RECURSIVE "
            "m0 AS (SELECT o_orderkey % 1200 AS m FROM orders), "
            "olde AS (SELECT DISTINCT m AS u, m + 1 AS v FROM m0 "
            "WHERE m % 12 <> 11), "
            "und AS (SELECT u, v FROM olde "
            "UNION SELECT v, u FROM olde), "
            "nd AS (SELECT DISTINCT u AS node FROM und), "
            "r AS (SELECT node, node AS mm FROM nd "
            "UNION SELECT r.node, und.v FROM r "
            "JOIN und ON und.u = r.mm), "
            "comp AS (SELECT node, min(mm) AS cl FROM r "
            "GROUP BY node), "
            "sizes AS (SELECT cl, count(*) AS k FROM comp "
            "GROUP BY cl), "
            "ppx AS (SELECT CAST(sum(k * (k - 1) / 2) AS BIGINT) "
            "AS pp FROM sizes), "
            "gold AS (SELECT DISTINCT m AS a, m + 1 AS b FROM m0 "
            "WHERE m % 12 <> 11 AND m % 3 = 0 "
            "UNION SELECT DISTINCT m, m + 12 FROM m0 "
            "WHERE m % 24 = 5), "
            "ng AS (SELECT count(*) AS n FROM gold), "
            "tpx AS (SELECT count(*) AS tp FROM gold "
            "JOIN comp x ON x.node = gold.a "
            "JOIN comp y ON y.node = gold.b AND y.cl = x.cl) "
            "SELECT tpx.tp, ppx.pp AS predicted_pairs, "
            "ng.n AS gold_pairs, "
            "CAST(tpx.tp AS DOUBLE) / ppx.pp AS precision, "
            "CAST(tpx.tp AS DOUBLE) / ng.n AS recall, "
            "2.0 * (CAST(tpx.tp AS DOUBLE) / ppx.pp) "
            "* (CAST(tpx.tp AS DOUBLE) / ng.n) "
            "/ ((CAST(tpx.tp AS DOUBLE) / ppx.pp) "
            "+ (CAST(tpx.tp AS DOUBLE) / ng.n)) AS f1 "
            "FROM tpx CROSS JOIN ppx CROSS JOIN ng"
        ),
        # cusum: prefix-extrema identity as window functions —
        # s+ = c − least(min(c) over prefix, 0), s− symmetric; exact
        "cusum": (
            "WITH x AS (SELECT event_id AS id, user_id AS k, "
            "epoch_us(ts) AS t, "
            "CAST(floor(value) AS BIGINT) AS v FROM events), "
            "c1 AS (SELECT *, SUM(v - 5) OVER (PARTITION BY k "
            "ORDER BY t, id ROWS UNBOUNDED PRECEDING) AS c FROM x), "
            "c2 AS (SELECT *, "
            "MIN(c) OVER (PARTITION BY k ORDER BY t, id "
            "ROWS UNBOUNDED PRECEDING) AS mn, "
            "MAX(c) OVER (PARTITION BY k ORDER BY t, id "
            "ROWS UNBOUNDED PRECEDING) AS mx FROM c1) "
            "SELECT id, k, t, v, "
            "CAST(c - least(mn, 0) AS DOUBLE) AS cusum_pos, "
            "CAST(c - greatest(mx, 0) AS DOUBLE) AS cusum_neg, "
            "CASE WHEN c - least(mn, 0) > 20.0 "
            "OR c - greatest(mx, 0) < -20.0 THEN 1 ELSE 0 END "
            "AS flag FROM c2"
        ),
        # token_label_mi: distinct per-doc (token, lang) events;
        # marginals from the same counts + docs-per-label; ln 1e6
        "token_label_mi": (
            "WITH toks AS (SELECT DISTINCT doc_id, lang, tok FROM ("
            "SELECT doc_id, lang, unnest(string_split(text, ' ')) "
            "AS tok FROM documents) WHERE length(tok) >= 5), "
            "n AS (SELECT count(*) AS nd FROM documents), "
            "tc AS (SELECT tok AS token, lang AS label, "
            "count(*) AS n_tc FROM toks GROUP BY 1, 2), "
            "nt AS (SELECT token, CAST(sum(n_tc) AS BIGINT) AS n_t "
            "FROM tc GROUP BY token), "
            "nc AS (SELECT lang AS label, count(*) AS n_c "
            "FROM documents GROUP BY lang) "
            "SELECT tc.token, tc.label, tc.n_tc, "
            "CAST(floor(ln(CAST(tc.n_tc AS DOUBLE) * n.nd "
            "/ (CAST(nt.n_t AS DOUBLE) * nc.n_c)) * 1e6 + 1e-6) "
            "AS BIGINT) AS mi_q "
            "FROM tc CROSS JOIN n "
            "JOIN nt ON nt.token = tc.token "
            "JOIN nc ON nc.label = tc.label WHERE tc.n_tc >= 2"
        ),
        # kfold: ROW_NUMBER over the pinned multiplicative hash per
        # stratum, % k — exact
        "kfold": (
            "SELECT c_custkey AS id, c_mktsegment AS seg, "
            "(ROW_NUMBER() OVER (PARTITION BY c_mktsegment "
            "ORDER BY ((c_custkey % 2147483648) * 2654435761) "
            "% 4294967296, "
            "c_custkey) - 1) % 4 AS fold FROM customer"
        ),
        # grouped_outliers: exact int sufficient stats; mean/var/
        # sqrt/z replay the engine's single-rounding expressions
        "grouped_outliers": (
            "WITH x AS (SELECT l_orderkey * 10 + l_linenumber AS id, "
            "l_orderkey AS k, CAST(l_quantity AS BIGINT) AS v "
            "FROM lineitem), "
            "st AS (SELECT k, count(*) AS n, "
            "CAST(sum(v) AS BIGINT) AS s, "
            "CAST(sum(v * v) AS BIGINT) AS sq FROM x GROUP BY k) "
            "SELECT x.id, x.k, x.v, "
            "CASE WHEN st.n > 1 AND CAST(st.sq AS DOUBLE) / st.n "
            "- (CAST(st.s AS DOUBLE) / st.n) "
            "* (CAST(st.s AS DOUBLE) / st.n) > 0 THEN "
            "(CAST(x.v AS DOUBLE) - CAST(st.s AS DOUBLE) / st.n) "
            "/ sqrt(CAST(st.sq AS DOUBLE) / st.n "
            "- (CAST(st.s AS DOUBLE) / st.n) "
            "* (CAST(st.s AS DOUBLE) / st.n)) ELSE NULL END AS z, "
            "CASE WHEN st.n > 1 AND CAST(st.sq AS DOUBLE) / st.n "
            "- (CAST(st.s AS DOUBLE) / st.n) "
            "* (CAST(st.s AS DOUBLE) / st.n) > 0 AND "
            "abs((CAST(x.v AS DOUBLE) - CAST(st.s AS DOUBLE) / st.n) "
            "/ sqrt(CAST(st.sq AS DOUBLE) / st.n "
            "- (CAST(st.s AS DOUBLE) / st.n) "
            "* (CAST(st.s AS DOUBLE) / st.n))) > 1.2 "
            "THEN 1 ELSE 0 END AS is_outlier "
            "FROM x JOIN st ON st.k = x.k"
        ),
        # json_flatten: engine parses planted JSON; oracle recomputes
        # the planted fields (k%11==0 rows malformed → nulls)
        "json_flatten": (
            "SELECT o_orderkey AS doc_id, "
            "CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE "
            "CAST(o_orderkey AS VARCHAR) END AS id, "
            "CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE "
            "CASE o_orderkey % 3 WHEN 0 THEN 'en' WHEN 1 THEN 'de' "
            "ELSE 'fr' END END AS meta_lang, "
            "CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE "
            "CAST(o_orderkey % 5 AS VARCHAR) END AS meta_depth, "
            "CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE "
            "CASE WHEN o_orderkey % 2 = 0 THEN 'true' ELSE 'false' "
            "END END AS ok FROM orders"
        ),
        # regex_extract: engine parses planted log lines; oracle
        # recomputes the fields (malformed rows null out)
        "regex_extract": (
            "SELECT o_orderkey AS doc_id, "
            "CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE "
            "CASE o_orderkey % 3 WHEN 0 THEN 'GET' WHEN 1 THEN "
            "'POST' ELSE 'PUT' END END AS verb, "
            "CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE "
            "'/p/' || o_orderkey END AS path, "
            "CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE "
            "CAST(200 + (o_orderkey % 4) * 100 AS VARCHAR) END "
            "AS code FROM orders"
        ),
        # mask_tokens: parallel unnest(token, range) + pinned-hash
        # CASE — exact
        "mask_tokens": (
            "WITH t AS (SELECT doc_id, "
            "unnest(string_split(text, ' ')) AS token, "
            "unnest(range(len(string_split(text, ' ')))) AS pos "
            "FROM documents) "
            "SELECT doc_id, pos, token, "
            "CASE WHEN ((doc_id % 1000000007) * 30011 "
            "+ pos * 48271 + 17) % 1000000007 % 100 < 15 "
            "THEN '[MASK]' ELSE token END AS masked_text FROM t"
        ),
        # assoc_rules: both directions per surviving pair; conf =
        # cab/ca, lift = cab·N/(ca·cb); exact IEEE, no quantizer
        "assoc_rules": (
            "WITH toks AS (SELECT DISTINCT doc_id, tok FROM ("
            "SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
            "FROM documents) WHERE length(tok) >= 5), "
            "n AS (SELECT count(*) AS nd FROM documents), "
            "dfr AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok), "
            "pc AS (SELECT t1.tok AS a, t2.tok AS b, count(*) AS cab "
            "FROM toks t1 JOIN toks t2 ON t1.doc_id = t2.doc_id "
            "AND t1.tok < t2.tok GROUP BY t1.tok, t2.tok "
            "HAVING count(*) >= 2), "
            "j AS (SELECT pc.a, pc.b, pc.cab, da.c AS ca, db.c AS cb, "
            "CAST(pc.cab AS DOUBLE) * n.nd "
            "/ (CAST(da.c AS DOUBLE) * db.c) AS lift "
            "FROM pc CROSS JOIN n "
            "JOIN dfr da ON da.tok = pc.a "
            "JOIN dfr db ON db.tok = pc.b), "
            "r AS (SELECT a AS antecedent, b AS consequent, cab, "
            "CAST(cab AS DOUBLE) / ca AS conf, lift FROM j "
            "UNION ALL SELECT b, a, cab, "
            "CAST(cab AS DOUBLE) / cb, lift FROM j) "
            "SELECT * FROM r WHERE conf >= 0.5"
        ),
        # redirect_resolve: the synthetic redirect map k → k//2 (k ≥ 2,
        # k % 3 ≠ 0) is acyclic, so the recursive walk from each source
        # terminates at its first non-redirecting ancestor; each source
        # contributes exactly ONE terminal row (functional graph ⇒ the
        # walk is a simple path)
        "redirect_resolve": (
            "WITH RECURSIVE "
            "ed AS (SELECT o_orderkey AS src, o_orderkey // 2 AS dst "
            "FROM orders WHERE o_orderkey >= 2 AND o_orderkey % 3 <> 0), "
            "walk AS (SELECT src AS node, dst AS ptr FROM ed "
            "UNION ALL "
            "SELECT w.node, ed.dst FROM walk w "
            "JOIN ed ON ed.src = w.ptr) "
            "SELECT node, ptr AS final, CAST(1 AS TINYINT) AS resolved "
            "FROM walk WHERE ptr NOT IN (SELECT src FROM ed)"
        ),
        # neighborhood: bounded-hop recursive CTE (UNION dedups visited
        # rows; min(d) collapses longer rediscoveries), then ball(node,
        # t) = #nodes with min-distance ≤ t for each radius in 0..2
        "neighborhood": (
            "WITH RECURSIVE "
            "pk AS (SELECT p_partkey AS k FROM part), "
            "raw AS (SELECT 'n' || (k % 23) AS s, 'n' || (k % 29) AS t "
            "FROM pk UNION ALL SELECT 'c' || (k % 509), "
            "'c' || ((k % 509) + 1) FROM pk), "
            "e AS (SELECT DISTINCT s AS src, t AS dst FROM raw "
            "UNION SELECT DISTINCT t, s FROM raw), "
            "n AS (SELECT DISTINCT src AS node FROM e), "
            "r AS (SELECT node AS root, node AS node, 0 AS d FROM n "
            "UNION "
            "SELECT r.root, e.dst, r.d + 1 FROM r "
            "JOIN e ON e.src = r.node WHERE r.d < 2), "
            "md AS (SELECT root, node, min(d) AS d FROM r "
            "GROUP BY root, node) "
            "SELECT md.root AS node, t.t, count(*) AS ball "
            "FROM md JOIN (VALUES (0), (1), (2)) AS t(t) "
            "ON md.d <= t.t GROUP BY md.root, t.t"
        ),
        # harmonic centrality over the same synthetic graph: count
        # nodes at min-distance exactly 1 and 2, fold c1/1.0 + c2/2.0
        # (left-assoc, the engine's ascending-t order)
        "harmonic_centrality": (
            "WITH RECURSIVE "
            "pk AS (SELECT p_partkey AS k FROM part), "
            "raw AS (SELECT 'n' || (k % 23) AS s, 'n' || (k % 29) AS t "
            "FROM pk UNION ALL SELECT 'c' || (k % 509), "
            "'c' || ((k % 509) + 1) FROM pk), "
            "e AS (SELECT DISTINCT s AS src, t AS dst FROM raw "
            "UNION SELECT DISTINCT t, s FROM raw), "
            "n AS (SELECT DISTINCT src AS node FROM e), "
            "r AS (SELECT node AS root, node AS node, 0 AS d FROM n "
            "UNION "
            "SELECT r.root, e.dst, r.d + 1 FROM r "
            "JOIN e ON e.src = r.node WHERE r.d < 2), "
            "md AS (SELECT root, node, min(d) AS d FROM r "
            "GROUP BY root, node), "
            "c AS (SELECT root, "
            "sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS c1, "
            "sum(CASE WHEN d = 2 THEN 1 ELSE 0 END) AS c2 "
            "FROM md GROUP BY root) "
            "SELECT root AS node, "
            "c1::DOUBLE / 1.0 + c2::DOUBLE / 2.0 AS harmonic FROM c"
        ),
        "funnel": _funnel,
        "cohort_retention": _cohort,
        "scalar_quantize": _sq8,
        # skyline: classic NOT EXISTS dominance formulation
        "skyline": (
            "SELECT p_partkey, p_retailprice, p_size FROM part p "
            "WHERE NOT EXISTS (SELECT 1 FROM part q "
            "WHERE q.p_retailprice <= p.p_retailprice "
            "AND q.p_size >= p.p_size "
            "AND (q.p_retailprice < p.p_retailprice "
            "OR q.p_size > p.p_size))"
        ),
        # bgp_union: UNION ALL with NULL padding for the unbound ?r
        "bgp_union": (
            "SELECT 'c' || c_custkey AS x, 'n' || c_nationkey AS n, "
            "'r' || n_regionkey AS r "
            "FROM customer JOIN nation ON n_nationkey = c_nationkey "
            "UNION ALL "
            "SELECT 's' || s_suppkey, 'n' || s_nationkey, NULL "
            "FROM supplier"
        ),
        # random_walks: ROW_NUMBER neighbor ranks + the pinned modular
        # hash recurrence unrolled for walk_len=2, walks_per_node=2,
        # seed=17 — all-integer, EXACT
        "random_walks": (
            "WITH le AS (SELECT DISTINCT l_orderkey AS src, "
            "l_partkey + 100000000 AS dst FROM lineitem), "
            "e AS (SELECT src, dst FROM le "
            "UNION ALL SELECT dst, src FROM le), "
            "nbr AS (SELECT src, dst, ROW_NUMBER() OVER "
            "(PARTITION BY src ORDER BY dst) - 1 AS r FROM e), "
            "deg AS (SELECT src AS node, COUNT(*) AS deg FROM e "
            "GROUP BY src), "
            "s0 AS (SELECT d.node AS start, w.w, d.node AS cur, d.deg "
            "FROM deg d CROSS JOIN (SELECT 0 AS w UNION ALL SELECT 1) w), "
            "s1 AS (SELECT s0.start, s0.w, n.dst AS cur, "
            "COALESCE(d2.deg, 0) AS deg "
            "FROM s0 JOIN nbr n ON n.src = s0.cur "
            "AND n.r = ((s0.start*100003 + s0.w*2971 + s0.cur*30011 "
            "+ 1*1009 + 17) % 1000000007) % s0.deg "
            "LEFT JOIN deg d2 ON d2.node = n.dst), "
            "s2 AS (SELECT s1.start, s1.w, n.dst AS cur, "
            "COALESCE(d2.deg, 0) AS deg "
            "FROM s1 JOIN nbr n ON n.src = s1.cur "
            "AND n.r = ((s1.start*100003 + s1.w*2971 + s1.cur*30011 "
            "+ 2*1009 + 17) % 1000000007) % s1.deg "
            "LEFT JOIN deg d2 ON d2.node = n.dst WHERE s1.deg > 0) "
            "SELECT start, w, 0 AS step, cur AS node FROM s0 "
            "UNION ALL SELECT start, w, 1, cur FROM s1 "
            "UNION ALL SELECT start, w, 2, cur FROM s2"
        ),
        # weighted_pagerank: 2-iteration unrolled recurrence with
        # edge-weight-proportional distribution (w = q / Σq per src)
        "weighted_pagerank": (
            "WITH e AS (SELECT 'o' || l_orderkey AS src, "
            "'p' || l_partkey AS dst, l_quantity::DOUBLE AS q "
            "FROM lineitem), "
            "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e), "
            "p AS (SELECT count(*)::DOUBLE AS n FROM nodes), "
            "ws AS (SELECT src, sum(q) AS t FROM e GROUP BY src), "
            "r0 AS (SELECT node, 1.0 / (SELECT n FROM p) AS r FROM nodes), "
            "s1 AS (SELECT e.dst, sum(r0.r * e.q / ws.t) AS c FROM e "
            "JOIN ws USING (src) JOIN r0 ON r0.node = e.src "
            "GROUP BY e.dst), "
            "r1 AS (SELECT nodes.node, 0.15 / (SELECT n FROM p) + "
            "0.85 * coalesce(s1.c, 0) AS r FROM nodes "
            "LEFT JOIN s1 ON s1.dst = nodes.node), "
            "s2 AS (SELECT e.dst, sum(r1.r * e.q / ws.t) AS c FROM e "
            "JOIN ws USING (src) JOIN r1 ON r1.node = e.src "
            "GROUP BY e.dst), "
            "r2 AS (SELECT nodes.node, 0.15 / (SELECT n FROM p) + "
            "0.85 * coalesce(s2.c, 0) AS r FROM nodes "
            "LEFT JOIN s2 ON s2.dst = nodes.node) "
            "SELECT node, CAST(floor(r * (SELECT n FROM p) * 10000 "
            "+ 0.000001) AS BIGINT) AS rank_q FROM r2"
        ),
        # sssp: 2-round Bellman-Ford recurrence unrolled — all-integer,
        # EXACT (multi-edges fold under MIN on both sides)
        "sssp": (
            "WITH e AS (SELECT l_orderkey AS src, "
            "l_partkey + 100000000 AS dst, "
            "CAST(l_quantity AS BIGINT) AS w FROM lineitem "
            "UNION ALL SELECT l_partkey + 100000000, l_orderkey, "
            "CAST(l_quantity AS BIGINT) FROM lineitem), "
            "d0 AS (SELECT CAST(1 AS BIGINT) AS node, "
            "CAST(0 AS BIGINT) AS dist), "
            "r1 AS (SELECT node, dist FROM d0 UNION ALL "
            "SELECT e.dst, d0.dist + e.w FROM d0 "
            "JOIN e ON e.src = d0.node), "
            "d1 AS (SELECT node, MIN(dist) AS dist FROM r1 "
            "GROUP BY node), "
            "r2 AS (SELECT node, dist FROM d1 UNION ALL "
            "SELECT e.dst, d1.dist + e.w FROM d1 "
            "JOIN e ON e.src = d1.node), "
            "d2 AS (SELECT node, MIN(dist) AS dist FROM r2 "
            "GROUP BY node) "
            "SELECT node, dist FROM d2"
        ),
        "ntile": (
            "SELECT user_id, value, event_id, "
            "NTILE(4) OVER (PARTITION BY user_id "
            "ORDER BY value, event_id) AS tile FROM events"
        ),
        # cap_per_key: Knuth multiplicative-hash order cap — exact
        "cap_per_key": (
            "SELECT user_id, event_id, event_type FROM ("
            "SELECT user_id, event_id, event_type, "
            "ROW_NUMBER() OVER (PARTITION BY user_id "
            "ORDER BY (event_id * 2654435761) % 4294967296, event_id) "
            "AS rn FROM events) WHERE rn <= 3"
        ),
        # skipgram_pairs: ordered self-join within the window — exact
        "skipgram_pairs": (
            "WITH seq AS (SELECT user_id, event_type, "
            "ROW_NUMBER() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS pos FROM events) "
            "SELECT a.event_type AS center, b.event_type AS context, "
            "COUNT(*) AS n "
            "FROM seq a JOIN seq b ON a.user_id = b.user_id "
            "AND a.pos <> b.pos AND abs(a.pos - b.pos) <= 2 "
            "GROUP BY 1, 2"
        ),
        # streaks: DENSE_RANK gaps-and-islands — exact
        "streaks": (
            "WITH days AS (SELECT DISTINCT user_id, "
            "CAST(date_trunc('day', ts) AS DATE) AS day FROM events), "
            "ranked AS (SELECT user_id, day, "
            "day - CAST(DENSE_RANK() OVER (PARTITION BY user_id "
            "ORDER BY day) AS INTEGER) AS island FROM days) "
            "SELECT user_id, strftime(MIN(day), '%Y-%m-%d') AS "
            "start_day, COUNT(*) AS n_days "
            "FROM ranked GROUP BY user_id, island"
        ),
        # SCD2 runs via lag-change flags + run numbering; effective_to
        # = next run's start within the key (half-open), null for the
        # key's current value — exact (timestamps, no floats)
        "scd2_intervals": (
            "WITH o AS (SELECT user_id, ts, event_id, event_type, "
            "lag(event_type) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS prev FROM events), "
            "r AS (SELECT user_id, ts, event_type, "
            "sum(CASE WHEN prev IS NULL OR prev <> event_type "
            "THEN 1 ELSE 0 END) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS run "
            "FROM o), "
            "runs AS (SELECT user_id, run, min(event_type) AS "
            "event_type, min(ts) AS effective_from "
            "FROM r GROUP BY user_id, run) "
            "SELECT user_id, event_type, effective_from, "
            "lead(effective_from) OVER (PARTITION BY user_id "
            "ORDER BY run) AS effective_to FROM runs"
        ),
        "window_rank": (
            "SELECT l_orderkey, l_linenumber, l_quantity, "
            "rank() OVER (PARTITION BY l_orderkey "
            "ORDER BY l_quantity) AS rnk, "
            "dense_rank() OVER (PARTITION BY l_orderkey "
            "ORDER BY l_quantity) AS drnk FROM lineitem"
        ),
        # window_pct: PERCENT_RANK / CUME_DIST are single IEEE
        # divisions of exact integers — engine and oracle perform the
        # identical float64 op, gate exact without quantization
        # ewma: the engine's cython ewm kernel and this recursive CTE
        # replay the SAME recurrence y = 0.5*y_prev + 0.5*x; both
        # sides quantize floor(y*1e6 + 1e-6)
        "ewma": (
            "WITH RECURSIVE "
            "base AS (SELECT user_id, event_id, value AS x, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS rn FROM events), "
            "r AS (SELECT user_id, event_id, rn, x AS y FROM base "
            "WHERE rn = 1 "
            "UNION ALL "
            "SELECT b.user_id, b.event_id, b.rn, 0.5 * r.y + 0.5 * b.x "
            "FROM r JOIN base b ON b.user_id = r.user_id "
            "AND b.rn = r.rn + 1) "
            "SELECT user_id, event_id, "
            "CAST(floor(y * 1e6 + 1e-6) AS BIGINT) AS y_q FROM r"
        ),
        "window_pct": (
            "SELECT l_orderkey, l_linenumber, l_quantity, "
            "percent_rank() OVER (PARTITION BY l_orderkey "
            "ORDER BY l_quantity) AS pct_rank, "
            "cume_dist() OVER (PARTITION BY l_orderkey "
            "ORDER BY l_quantity) AS cume FROM lineitem"
        ),
        # interval_join: SCD2 intervals (same CTE as scd2_intervals)
        # range-joined to the 90-min-shifted event stream
        "interval_join": (
            "WITH o AS (SELECT user_id, ts, event_id, event_type, "
            "lag(event_type) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS prev FROM events), "
            "r AS (SELECT user_id, ts, event_type, "
            "sum(CASE WHEN prev IS NULL OR prev <> event_type "
            "THEN 1 ELSE 0 END) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS run "
            "FROM o), "
            "runs AS (SELECT user_id, run, min(event_type) AS "
            "event_type, min(ts) AS effective_from "
            "FROM r GROUP BY user_id, run), "
            "iv AS (SELECT user_id, event_type, effective_from, "
            "lead(effective_from) OVER (PARTITION BY user_id "
            "ORDER BY run) AS effective_to FROM runs), "
            "facts AS (SELECT user_id, "
            "ts - INTERVAL 90 MINUTE AS ts, event_id AS fact_id "
            "FROM events) "
            "SELECT f.user_id, f.ts, f.fact_id, i.event_type, "
            "i.effective_from, i.effective_to "
            "FROM facts f JOIN iv i ON f.user_id = i.user_id "
            "AND f.ts >= i.effective_from "
            "AND (i.effective_to IS NULL OR f.ts < i.effective_to)"
        ),
        # weighted_sample: shared A-Res key — pinned multiplicative
        # hash uniform, ln(u)/w order, id tiebreak
        "weighted_sample": (
            "SELECT o_orderkey, o_totalprice FROM orders "
            "ORDER BY ln((((o_orderkey * 2654435761) % 4294967296) "
            "+ 0.5) / 4294967296.0) / o_totalprice DESC, o_orderkey "
            "LIMIT 100"
        ),
        # gap_fill: generate_series day grid per user + IGNORE-NULLS
        # last_value forward fill; epoch-day ints, exact
        "gap_fill": (
            "WITH ranked AS (SELECT user_id, "
            "date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) "
            "AS day_num, event_type, "
            "row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE) "
            "ORDER BY ts DESC, event_id DESC) AS rn FROM events), "
            "obs AS (SELECT user_id, day_num, event_type "
            "FROM ranked WHERE rn = 1), "
            "span AS (SELECT user_id, min(day_num) AS d0, "
            "max(day_num) AS d1 FROM obs GROUP BY user_id), "
            "grid AS (SELECT user_id, unnest(generate_series(d0, d1)) "
            "AS day_num FROM span), "
            "j AS (SELECT g.user_id, g.day_num, o.event_type, "
            "CASE WHEN o.user_id IS NULL THEN 0 ELSE 1 END AS observed "
            "FROM grid g LEFT JOIN obs o "
            "ON g.user_id = o.user_id AND g.day_num = o.day_num) "
            "SELECT user_id, day_num, "
            "last_value(event_type IGNORE NULLS) OVER ("
            "PARTITION BY user_id ORDER BY day_num) AS event_type, "
            "observed FROM j"
        ),
        # grouped_corr: epsilon-floor quantized (sum reassociation)
        "grouped_corr": (
            "SELECT l_returnflag, count(*) AS n, "
            "CAST(floor(corr(l_extendedprice, l_quantity) * 1e6 + 1e-6) "
            "AS BIGINT) AS corr_q, "
            "CAST(floor(regr_slope(l_extendedprice, l_quantity) * 1e4 "
            "+ 1e-6) AS BIGINT) AS slope_q, "
            "CAST(floor(regr_intercept(l_extendedprice, l_quantity) "
            "* 1e2 + 1e-6) AS BIGINT) AS icept_q "
            "FROM lineitem GROUP BY l_returnflag"
        ),
        "normalize_codes": (
            "SELECT p_partkey, 'brand:' || lower(split_part(p_brand, '#', 2)) AS norm_code "
            "FROM part"
        ),
        "explode_tokens": (
            "SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents"
        ),
        "row_expansion": (
            "SELECT p_partkey, unnest(CASE WHEN p_size > 30 "
            "THEN string_split(p_name, ' ') ELSE [p_name] END) AS part_token FROM part"
        ),
        "melt_customer": (
            "SELECT c_custkey, c_name AS CODE, 'c_name' AS CODE_COLUMN FROM customer "
            "UNION ALL "
            "SELECT c_custkey, c_mktsegment AS CODE, 'c_mktsegment' AS CODE_COLUMN FROM customer"
        ),
        "pivot_orderstatus": (
            "SELECT o_orderpriority, "
            "CAST(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f, "
            "CAST(sum(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o, "
            "CAST(sum(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p "
            "FROM orders GROUP BY o_orderpriority"
        ),
        "aggregate_values": (
            "SELECT lang, array_to_string(list_sort(list(DISTINCT source)), ' | ') "
            "AS agg_sources, count(*) AS n_docs FROM documents GROUP BY lang"
        ),
        "orders_customer_nation": (
            "SELECT o_orderkey, o_totalprice, c_name, n_name FROM orders "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey"
        ),
        "orders_customer_join_native": (
            "SELECT o_orderkey, o_totalprice, c_name, n_name FROM orders "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey"
        ),
        "top_tokens": (
            "SELECT token, count(*) AS n FROM "
            "(SELECT unnest(string_split(text, ' ')) AS token FROM documents) "
            "GROUP BY token ORDER BY n DESC, token LIMIT 20"
        ),
        "customers_without_orders": (
            "SELECT c_custkey, c_name FROM customer WHERE c_custkey NOT IN "
            "(SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')"
        ),
        "dedup_docs": (
            "SELECT min(doc_id) AS keep_id FROM documents GROUP BY text"
        ),
        "lineitem_agg": (
            "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, "
            "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
            "count(*) AS n FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "topk_orders_per_priority": (
            "SELECT o_orderpriority, o_orderkey, o_totalprice FROM ("
            "SELECT o_orderpriority, o_orderkey, o_totalprice, "
            "row_number() OVER (PARTITION BY o_orderpriority "
            "ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) WHERE rn <= 3"
        ),
        "filter_threshold": (
            "SELECT event_type, count(*) AS n, round(avg(value), 6) AS avg_value "
            "FROM events WHERE value >= 150.0 GROUP BY event_type"
        ),
        "sort_limit_docs": (
            "SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id LIMIT 10"
        ),
        # counts rolled up the concept DAG: self + every descendant
        "taxonomy_rollup": (
            "WITH RECURSIVE edges AS ("
            "SELECT p_partkey AS child, p_partkey // 2 AS parent FROM part "
            "WHERE p_partkey // 2 >= 1 AND p_partkey // 2 <> p_partkey), "
            "closure(child, anc) AS ("
            "SELECT child, parent FROM edges "
            "UNION "
            "SELECT c.child, e.parent FROM closure c JOIN edges e ON c.anc = e.child), "
            "cnt AS (SELECT l_partkey AS concept, count(*) AS n "
            "FROM lineitem GROUP BY l_partkey), "
            "contrib AS (SELECT concept, n FROM cnt "
            "UNION ALL "
            "SELECT cl.anc AS concept, c.n FROM closure cl "
            "JOIN cnt c ON c.concept = cl.child) "
            "SELECT concept, CAST(sum(n) AS BIGINT) AS total "
            "FROM contrib GROUP BY concept"
        ),
        # the same BGP as three self-joins over the synthesized triple
        # store (bag semantics both sides; constant r1 pushed into p2)
        "match_bgp": (
            "WITH t AS ("
            "SELECT 'c' || c_custkey AS subj, 'in_nation' AS pred, "
            "'n' || c_nationkey AS obj FROM customer "
            "UNION ALL "
            "SELECT 'n' || n_nationkey, 'in_region', 'r' || n_regionkey "
            "FROM nation "
            "UNION ALL "
            "SELECT 's' || s_suppkey, 'in_nation', 'n' || s_nationkey "
            "FROM supplier) "
            "SELECT p1.subj AS c, p1.obj AS n, p3.subj AS s "
            "FROM t p1 "
            "JOIN t p2 ON p2.subj = p1.obj AND p2.pred = 'in_region' "
            "AND p2.obj = 'r1' "
            "JOIN t p3 ON p3.obj = p1.obj AND p3.pred = 'in_nation' "
            "WHERE p1.pred = 'in_nation'"
        ),
        # GROUP BY over BGP bindings: member count / distinct nations /
        # min-max nation term per region
        "bgp_aggregate": (
            "WITH t AS ("
            "SELECT 'c' || c_custkey AS subj, 'in_nation' AS pred, "
            "'n' || c_nationkey AS obj FROM customer "
            "UNION ALL "
            "SELECT 'n' || n_nationkey, 'in_region', 'r' || n_regionkey "
            "FROM nation "
            "UNION ALL "
            "SELECT 's' || s_suppkey, 'in_nation', 'n' || s_nationkey "
            "FROM supplier), "
            "m AS (SELECT p1.subj AS m, p1.obj AS n, p2.obj AS r "
            "FROM t p1 JOIN t p2 ON p2.subj = p1.obj "
            "AND p2.pred = 'in_region' WHERE p1.pred = 'in_nation') "
            "SELECT r, count(*) AS n, count(DISTINCT n) AS n_distinct, "
            "min(n) AS min_v, max(n) AS max_v FROM m GROUP BY r"
        ),
        # FILTER → ORDER BY (total key) → LIMIT over the same BGP
        "bgp_select": (
            "WITH t AS ("
            "SELECT 'c' || c_custkey AS subj, 'in_nation' AS pred, "
            "'n' || c_nationkey AS obj FROM customer "
            "UNION ALL "
            "SELECT 'n' || n_nationkey, 'in_region', 'r' || n_regionkey "
            "FROM nation "
            "UNION ALL "
            "SELECT 's' || s_suppkey, 'in_nation', 'n' || s_nationkey "
            "FROM supplier), "
            "m AS (SELECT p1.subj AS c, p1.obj AS n, p2.obj AS r "
            "FROM t p1 JOIN t p2 ON p2.subj = p1.obj "
            "AND p2.pred = 'in_region' WHERE p1.pred = 'in_nation') "
            "SELECT c, n, r FROM m WHERE r <> 'r0' AND c > 'c2' "
            "ORDER BY c LIMIT 500"
        ),
        # LAG/LEAD per user; nulls at partition edges sentineled, same
        # epsilon-floor quantizer as the engine wrapper
        "lag_lead": (
            "SELECT user_id, event_id, "
            "coalesce(CAST(floor(LAG(value) OVER w * 1e4 + 1e-6) "
            "AS BIGINT), -1000000000000000) AS lag_q, "
            "coalesce(CAST(floor(LEAD(value) OVER w * 1e4 + 1e-6) "
            "AS BIGINT), -1000000000000000) AS lead_q "
            "FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
        ),
        # ROLLUP levels disambiguated by GROUPING(); rolled-up slots
        # coalesced to the engine's 'ALL' sentinel
        "rollup": (
            "SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag, "
            "coalesce(l_linestatus, 'ALL') AS l_linestatus, "
            "2 - GROUPING(l_returnflag) - GROUPING(l_linestatus) AS lvl, "
            "CAST(floor(sum(l_quantity) * 1e2 + 1e-4) AS BIGINT) "
            "AS sum_q, count(*) AS n_rows "
            "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"
        ),
        "cube": (
            "SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag, "
            "coalesce(l_linestatus, 'ALL') AS l_linestatus, "
            "GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid, "
            "CAST(floor(sum(l_quantity) * 1e2 + 1e-4) AS BIGINT) "
            "AS sum_q, count(*) AS n_rows "
            "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)"
        ),
        # OPTIONAL = LEFT JOIN over the same triple construction;
        # unmatched optional var coalesced to 'none' on both sides
        "bgp_optional": (
            "WITH sn AS (SELECT 's' || s_suppkey AS s, "
            "'n' || s_nationkey AS n FROM supplier), "
            "nr AS (SELECT 'n' || n_nationkey AS n, "
            "'r' || n_regionkey AS r FROM nation WHERE n_regionkey <> 0) "
            "SELECT sn.s, sn.n, coalesce(nr.r, 'none') AS r "
            "FROM sn LEFT JOIN nr ON nr.n = sn.n"
        ),
        # robots gate: keep iff NOT (d%10 = (d%20)%7 AND d%20 odd) —
        # the synth_robots arithmetic (even hosts Allow the full path
        # back via longest-match)
        "robots_filter": (
            "SELECT doc_id, 'https://h' || (doc_id % 20) || '.test/p' "
            "|| (doc_id % 10) || '/x' AS url FROM documents "
            "WHERE NOT (doc_id % 10 = (doc_id % 20) % 7 "
            "AND (doc_id % 20) % 2 = 1)"
        ),
        # frame-based rolling sum; same epsilon-floor quantizer
        "rolling_window": (
            "SELECT user_id, event_id, CAST(floor(SUM(value) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) * 1e4 + 1e-6) "
            "AS BIGINT) AS roll_q FROM events"
        ),
        # VoID: per-predicate counts + exact distinct subj/obj
        "void_stats": (
            "WITH t AS ("
            "SELECT 'c' || c_custkey AS subj, 'in_nation' AS pred, "
            "'n' || c_nationkey AS obj FROM customer "
            "UNION ALL "
            "SELECT 'n' || n_nationkey, 'in_region', 'r' || n_regionkey "
            "FROM nation "
            "UNION ALL "
            "SELECT 's' || s_suppkey, 'in_nation', 'n' || s_nationkey "
            "FROM supplier) "
            "SELECT pred, count(*) AS n_triples, "
            "count(DISTINCT subj) AS n_subj, "
            "count(DISTINCT obj) AS n_obj FROM t GROUP BY pred"
        ),
        # SHACL-lite: targets = subjects with in_nation; violations =
        # cardinality outside [min, max] per shape
        "shacl_validate": (
            "WITH t AS ("
            "SELECT 'c' || c_custkey AS subj, 'in_nation' AS pred "
            "FROM customer "
            "UNION ALL "
            "SELECT 'c' || c_custkey, 'in_nation' FROM customer "
            "WHERE c_custkey % 7 = 0 "
            "UNION ALL "
            "SELECT 'c' || c_custkey, 'email' FROM customer "
            "WHERE c_custkey % 3 = 0), "
            "counts AS (SELECT subj, pred, count(*) AS n FROM t "
            "GROUP BY subj, pred), "
            "targets AS (SELECT DISTINCT subj FROM t "
            "WHERE pred = 'in_nation') "
            "SELECT g.subj, 'one_nation' AS shape_id, "
            "CAST(coalesce(c.n, 0) AS BIGINT) AS n_found "
            "FROM targets g LEFT JOIN counts c "
            "ON c.subj = g.subj AND c.pred = 'in_nation' "
            "WHERE coalesce(c.n, 0) < 1 OR coalesce(c.n, 0) > 1 "
            "UNION ALL "
            "SELECT g.subj, 'has_email', "
            "CAST(coalesce(c.n, 0) AS BIGINT) "
            "FROM targets g LEFT JOIN counts c "
            "ON c.subj = g.subj AND c.pred = 'email' "
            "WHERE coalesce(c.n, 0) < 1 OR coalesce(c.n, 0) > 99"
        ),
        # sentence split: same RE2 rule, zipped-unnest positions,
        # same '\\S' keep rule
        "split_sentences": (
            "WITH s AS (SELECT doc_id, string_split_regex("
            "'First bit ' || doc_id || '. Second bit! Third ' "
            "|| (doc_id % 5) || '? ', '[.!?]+\\s+') AS parts "
            "FROM documents), "
            "ex AS (SELECT doc_id, unnest(parts) AS sentence, "
            "unnest(range(len(parts))) AS sent_idx FROM s) "
            "SELECT doc_id, CAST(sent_idx AS BIGINT) AS sent_idx, "
            "sentence FROM ex WHERE regexp_matches(sentence, '\\S')"
        ),
        # CONSTRUCT = template SELECTs over the binding join; the
        # optional-unbound template rows vanish via the INNER join
        "construct": (
            "WITH cn AS (SELECT 'c' || c_custkey AS c, "
            "'n' || c_nationkey AS n FROM customer), "
            "nr AS (SELECT 'n' || n_nationkey AS n, "
            "'r' || n_regionkey AS r FROM nation WHERE n_regionkey <> 0) "
            "SELECT cn.n AS subj, 'has_member' AS pred, cn.c AS obj "
            "FROM cn "
            "UNION ALL "
            "SELECT cn.c, 'in_region', nr.r FROM cn "
            "JOIN nr ON nr.n = cn.n"
        ),
        # MINUS = NOT EXISTS over the same triple construction
        "bgp_minus": (
            "WITH cn AS (SELECT 'c' || c_custkey AS c, "
            "'n' || c_nationkey AS n FROM customer), "
            "nr AS (SELECT 'n' || n_nationkey AS n, "
            "'r' || n_regionkey AS r FROM nation) "
            "SELECT cn.c, cn.n FROM cn WHERE NOT EXISTS ("
            "SELECT 1 FROM nr WHERE nr.n = cn.n AND nr.r = 'r0')"
        ),
        # 1-hop undirected ball around n3: reachable node set (seed ∪
        # in/out neighbors) joined back onto triple subjects
        "ego_subgraph": (
            "WITH t AS ("
            "SELECT 'c' || c_custkey AS subj, 'in_nation' AS pred, "
            "'n' || c_nationkey AS obj FROM customer "
            "UNION ALL "
            "SELECT 'n' || n_nationkey, 'in_region', 'r' || n_regionkey "
            "FROM nation), "
            "reach AS (SELECT 'n3' AS node "
            "UNION SELECT subj FROM t WHERE obj = 'n3' "
            "UNION SELECT obj FROM t WHERE subj = 'n3') "
            "SELECT t.subj, t.pred, t.obj "
            "FROM t JOIN reach ON t.subj = reach.node"
        ),
        # pred* reachability with MIN hops from the seed set over the
        # halving-chain subclass edges (recursive CTE + group min)
        "property_path": (
            "WITH RECURSIVE e AS ("
            "SELECT DISTINCT 'c' || (1 + p_partkey % 60) AS src, "
            "'c' || ((1 + p_partkey % 60) // 2) AS dst FROM part "
            "WHERE (1 + p_partkey % 60) // 2 >= 1), "
            "r(node, hops) AS ("
            "SELECT * FROM (VALUES ('c47', 0), ('c58', 0)) t(node, hops) "
            "UNION "
            "SELECT e.dst, r.hops + 1 FROM r JOIN e ON e.src = r.node "
            "WHERE r.hops < 8) "
            "SELECT node, CAST(min(hops) AS BIGINT) AS hops "
            "FROM r GROUP BY node"
        ),
        # subclass entailment: asserted class + every halving-chain
        # ancestor, UNION-distinct per entity (closure semantics)
        "infer_types": (
            "WITH RECURSIVE m AS ("
            "SELECT p_partkey, 1 + p_partkey % 60 AS mid FROM part), "
            "edges AS (SELECT DISTINCT mid AS child, mid // 2 AS parent "
            "FROM m WHERE mid // 2 >= 1), "
            "closure(child, anc) AS ("
            "SELECT child, parent FROM edges "
            "UNION "
            "SELECT c.child, e.parent FROM closure c "
            "JOIN edges e ON c.anc = e.child) "
            "SELECT 'p' || p_partkey AS entity, 'c' || mid AS cls FROM m "
            "UNION "
            "SELECT 'p' || m.p_partkey, 'c' || cl.anc "
            "FROM m JOIN closure cl ON cl.child = m.mid"
        ),
        "ancestor_closure": (
            "WITH RECURSIVE edges AS ("
            "SELECT p_partkey AS child, p_partkey // 2 AS parent FROM part "
            "WHERE p_partkey // 2 >= 1 AND p_partkey // 2 <> p_partkey), "
            "closure(child, anc) AS ("
            "SELECT child, parent FROM edges "
            "UNION "
            "SELECT c.child, e.parent FROM closure c JOIN edges e ON c.anc = e.child) "
            "SELECT child, anc FROM closure"
        ),
        "window_tumbling": (
            "SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n, "
            "round(sum(value), 2) AS sum_value FROM events GROUP BY event_type, "
            "date_trunc('hour', ts)"
        ),
        "window_session": (
            "WITH t AS (SELECT user_id, event_id, ts, "
            "CASE WHEN ts - lag(ts) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE "
            "THEN 1 ELSE 0 END AS brk FROM events), "
            "s AS (SELECT user_id, event_id, ts, "
            "CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM t) "
            "SELECT user_id, session_id, count(*) AS n, "
            "min(ts) AS t_start, max(ts) AS t_end "
            "FROM s GROUP BY user_id, session_id"
        ),
        "asof_join": (
            "WITH o AS (SELECT o_custkey, o_orderdate, "
            "max(o_orderkey) AS o_orderkey, "
            "arg_max(o_totalprice, o_orderkey) AS o_totalprice "
            "FROM orders GROUP BY o_custkey, o_orderdate) "
            "SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice "
            "FROM events e ASOF JOIN o "
            "ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate"
        ),
        "range_join": (
            "SELECT e1.event_id, e2.event_id AS prior_event_id "
            "FROM events e1 JOIN events e2 ON e1.user_id = e2.user_id "
            "AND e2.ts < e1.ts AND e2.ts >= e1.ts - INTERVAL 1 HOUR"
        ),
        "exact_match_mentions": (
            "WITH pw AS (SELECT DISTINCT word FROM "
            "(SELECT unnest(string_split(p_name, ' ')) AS word FROM part)), "
            "dw AS (SELECT DISTINCT doc_id, word FROM "
            "(SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)) "
            "SELECT doc_id, word FROM dw JOIN pw USING (word)"
        ),
        "token_stats": (
            # whitespace tokens = \S+ runs (matches Python str.split on any
            # whitespace); stop_ratio over ASCII word tokens, numerator AND
            # denominator — byte-identical to TextAnalyzer on any input
            "SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens_ws, "
            "CAST(len(regexp_extract_all(text, "
            "'[a-zA-Z0-9_]+|[^a-zA-Z0-9_ \\t\\r\\n\\f\\v]')) AS BIGINT) "
            "AS n_tokens_bpe, "
            f"round(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9_]+'), "
            f"x -> x IN {stop_list})) "
            "/ greatest(len(regexp_extract_all(lower(text), '[a-z0-9_]+')), 1), 6) "
            "AS stop_ratio FROM documents"
        ),
        "md5_fingerprint": "SELECT doc_id, md5(text) AS fp FROM documents",
        # corpus-curation family. All regexes are RE2 (Arrow compute and
        # DuckDB share the engine), so engine/oracle agree on ANY input.
        "pii_redact": (
            "SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(text,"
            "'[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}','<EMAIL>','g'),"
            "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b','<IP>','g'),"
            "'\\+?\\d[\\d\\- ]{7,}\\d','<PHONE>','g') AS text FROM documents"
        ),
        "repetition_stats": _REPETITION_SQL,
        "quality_filter": (
            f"SELECT * FROM ({_REPETITION_SQL}) WHERE n_tokens >= 8 "
            "AND top_token_ratio <= 0.2 "
            "AND distinct_tokens::DOUBLE / greatest(n_tokens, 1) >= 0.3 "
            "AND mean_token_len BETWEEN 2.0 AND 12.0"
        ),
        "hash_sample": (
            "SELECT doc_id, text FROM documents WHERE "
            "(((doc_id % 2147483648) * 2654435761 + 17) % 4294967296) % 100 < 30"
        ),
        "group_quantiles": (
            "SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.5), 4) "
            "AS q50, round(quantile_cont(l_extendedprice, 0.95), 4) AS q95 "
            "FROM lineitem GROUP BY l_returnflag"
        ),
        "source_stats": (
            "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(count(DISTINCT text) AS BIGINT) AS distinct_texts, "
            "round(sum(length(text))::DOUBLE / count(*), 4) AS avg_chars "
            "FROM documents GROUP BY source"
        ),
        "normalize_text": (
            "SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) "
            "AS text FROM documents"
        ),
        # identical deterministic rule: q = lower edge (bin*width) of the
        # first bin whose cumulative count reaches q*n, bin=floor(v/20)
        "histogram_quantile": (
            "WITH b AS (SELECT user_id, CAST(floor(value / 20.0) AS BIGINT) "
            "AS bin, count(*) AS c FROM events GROUP BY 1, 2), "
            "t AS (SELECT user_id, bin, "
            "sum(c) OVER (PARTITION BY user_id ORDER BY bin) AS cum, "
            "sum(c) OVER (PARTITION BY user_id) AS n FROM b) "
            "SELECT user_id, "
            "round(min(CASE WHEN cum >= 0.5 * n THEN bin END) * 20.0, 6) AS q50, "
            "round(min(CASE WHEN cum >= 0.95 * n THEN bin END) * 20.0, 6) AS q95 "
            "FROM t GROUP BY user_id"
        ),
        # exact word-3-gram Jaccard with the engine's stop-gram contract
        # (df in [2, 50] grams only count toward the intersection)
        "jaccard_pairs": (
            "WITH toks AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts FROM documents), "
            "tg AS (SELECT doc_id, ts, "
            "unnest(generate_series(1, len(ts) - 2)) AS i FROM toks), "
            "d AS (SELECT DISTINCT doc_id, "
            "ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS sh FROM tg), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM d GROUP BY 1), "
            "df AS (SELECT sh FROM d GROUP BY sh HAVING count(*) BETWEEN 2 AND 50), "
            "p AS (SELECT * FROM d SEMI JOIN df USING (sh)), "
            "co AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS co "
            "FROM p a JOIN p b USING (sh) WHERE a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT co.doc_a, co.doc_b, "
            "round(co.co::DOUBLE / (sa.n + sb.n - co.co), 6) AS jaccard "
            "FROM co JOIN sizes sa ON sa.doc_id = co.doc_a "
            "JOIN sizes sb ON sb.doc_id = co.doc_b "
            "WHERE co.co::DOUBLE / (sa.n + sb.n - co.co) >= 0.8"
        ),
        # directed containment |A∩B|/|A| over the same shingle + df
        # contract; both directions of a pair score independently
        "containment_pairs": (
            "WITH toks AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts FROM documents), "
            "tg AS (SELECT doc_id, ts, "
            "unnest(generate_series(1, len(ts) - 2)) AS i FROM toks), "
            "d AS (SELECT DISTINCT doc_id, "
            "ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS sh FROM tg), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM d GROUP BY 1), "
            "df AS (SELECT sh FROM d GROUP BY sh HAVING count(*) BETWEEN 2 AND 50), "
            "p AS (SELECT * FROM d SEMI JOIN df USING (sh)), "
            "co AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS co "
            "FROM p a JOIN p b USING (sh) WHERE a.doc_id <> b.doc_id GROUP BY 1, 2) "
            "SELECT co.doc_a, co.doc_b, "
            "round(co.co::DOUBLE / sa.n, 6) AS containment "
            "FROM co JOIN sizes sa ON sa.doc_id = co.doc_a "
            "WHERE co.co::DOUBLE / sa.n >= 0.6"
        ),
        # duplicated word-5-gram spans per doc (df >= 2 corpus-wide);
        # docs with < 5 tokens emit no row on both sides
        "dup_span_stats": (
            "WITH toks AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts FROM documents), "
            "tg AS (SELECT doc_id, ts, "
            "unnest(generate_series(1, len(ts) - 4)) AS i FROM toks), "
            "d AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || "
            "ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4] AS sh FROM tg), "
            "df AS (SELECT sh, count(*) AS df FROM d GROUP BY sh) "
            "SELECT doc_id, count(*) AS total_ngrams, "
            "CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS dup_ngrams, "
            "round(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END)::DOUBLE "
            "/ count(*), 6) AS dup_fraction "
            "FROM d JOIN df USING (sh) GROUP BY doc_id"
        ),
        # url canonicalization: the synthesis expression and every RE2
        # pattern are shared verbatim with the engine (curate.py), so
        # the check is data-independent (both sides are RE2-backed)
        "canonical_urls": (
            "WITH u0 AS (SELECT doc_id, "
            "'HTTPS://WWW.' || source || '.Example.com/' || lang || '/p' || "
            "(doc_id % 50) || '/?utm_source=feed&utm_campaign=c' || "
            "(doc_id % 7) || '&id=' || doc_id || '&ref=tw#sec-' || "
            "(doc_id % 5) AS url FROM documents), "
            "u1 AS (SELECT doc_id, regexp_replace(regexp_replace(url, "
            r"'#.*$', ''), '^[A-Za-z][A-Za-z0-9+.\-]*://', '') AS u FROM u0), "
            "u2 AS (SELECT doc_id, "
            "regexp_replace(lower(regexp_replace(u, '[/?].*$', '')), "
            r"'^www\.', '') AS host, "
            "regexp_replace(u, '^[^/?]*', '') AS rest FROM u1), "
            "u3 AS (SELECT doc_id, host, regexp_replace(regexp_replace("
            "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
            "rest, '([?&])(utm_[a-z0-9_]*|ref|fbclid|gclid)=[^&#]*', "
            r"'\1', 'g'), '&&+', '&', 'g'), '\?&', '?'), '[?&]+$', ''), "
            r"'/\?', '?'), '/$', '') AS rest FROM u2) "
            "SELECT doc_id, host || rest AS url FROM u3"
        ),
        # KWIC: first occurrence per (doc, probe) via strpos; window
        # arithmetic (1-based, greatest(1, pos-20), clip at end)
        # shared verbatim with the engine's slice rule
        "mention_contexts": (
            "WITH p AS (SELECT * FROM (VALUES ('data'), ('web'), "
            "('market')) AS t(probe)), "
            "m AS (SELECT d.doc_id, p.probe, "
            "strpos(d.text, p.probe) AS pos, d.text "
            "FROM documents d CROSS JOIN p) "
            "SELECT doc_id, probe, pos, "
            "substr(text, greatest(1, pos - 20), "
            "pos + length(probe) + 20 - greatest(1, pos - 20)) "
            "AS snippet FROM m WHERE pos > 0"
        ),
        # blocklist: host = blocked OR host endswith '.' || blocked
        # (label-suffix, same rule as the engine's strip-and-probe)
        "blocked_hosts": (
            "WITH u0 AS (SELECT doc_id, "
            "'HTTPS://WWW.' || source || '.Example.com/' || lang || '/p' || "
            "(doc_id % 50) || '/?utm_source=feed&utm_campaign=c' || "
            "(doc_id % 7) || '&id=' || doc_id || '&ref=tw#sec-' || "
            "(doc_id % 5) AS url FROM documents), "
            "h AS (SELECT doc_id, lower(regexp_extract(url, "
            r"'^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)', 1)) AS host "
            "FROM u0), "
            "b AS (SELECT * FROM (VALUES ('src3.example.com'), "
            "('src7.example.com'), ('www.src11.example.com')) AS t(d)) "
            "SELECT doc_id FROM h WHERE NOT EXISTS ("
            "SELECT 1 FROM b WHERE h.host = b.d "
            "OR suffix(h.host, '.' || b.d))"
        ),
        "host_stats": (
            "WITH u0 AS (SELECT doc_id, "
            "'HTTPS://WWW.' || source || '.Example.com/' || lang || '/p' || "
            "(doc_id % 50) || '/?utm_source=feed&utm_campaign=c' || "
            "(doc_id % 7) || '&id=' || doc_id || '&ref=tw#sec-' || "
            "(doc_id % 5) AS url FROM documents), "
            "u1 AS (SELECT doc_id, regexp_replace(regexp_replace(url, "
            r"'#.*$', ''), '^[A-Za-z][A-Za-z0-9+.\-]*://', '') AS u FROM u0), "
            "u2 AS (SELECT doc_id, "
            "regexp_replace(lower(regexp_replace(u, '[/?].*$', '')), "
            r"'^www\.', '') AS host, "
            "regexp_replace(u, '^[^/?]*', '') AS rest FROM u1), "
            "u3 AS (SELECT doc_id, host, regexp_replace(regexp_replace("
            "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
            "rest, '([?&])(utm_[a-z0-9_]*|ref|fbclid|gclid)=[^&#]*', "
            r"'\1', 'g'), '&&+', '&', 'g'), '\?&', '?'), '[?&]+$', ''), "
            r"'/\?', '?'), '/$', '') AS rest FROM u2) "
            "SELECT host, count(*) AS n_pages, "
            r"count(DISTINCT regexp_replace(rest, '\?.*$', '')) AS n_paths "
            "FROM u3 GROUP BY host"
        ),
        # GROUPING SETS rollup with '' sentinels for rolled-up dims
        "source_lang_rollup": (
            "SELECT coalesce(source, '') AS source, "
            "coalesce(lang, '') AS lang, count(*) AS n_docs "
            "FROM documents "
            "GROUP BY GROUPING SETS ((source, lang), (source), ())"
        ),
        # J7 outer-merge shape: full outer join, null-free via the
        # shared coalesce contract
        "customer_orders_full_outer": (
            "SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey, "
            "coalesce(c.c_name, '') AS c_name, "
            "coalesce(o.n, 0) AS n_orders "
            "FROM customer c FULL OUTER JOIN "
            "(SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1) o "
            "ON c.c_custkey = o.o_custkey"
        ),
        # per-group exact-k deterministic sample (same multiplicative
        # hash as hash_sample, shared verbatim)
        "stratified_sample": (
            "SELECT source, doc_id FROM (SELECT source, doc_id, "
            "row_number() OVER (PARTITION BY source ORDER BY "
            "(((doc_id % 2147483648) * 2654435761 + 17) % 4294967296), "
            "doc_id) AS rn FROM documents) WHERE rn <= 5"
        ),
        # corpus TF-IDF (sklearn smooth idf, L2 per doc), epsilon-floor
        # quantized gate
        "tfidf_scores": (
            "WITH toks AS (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS token "
            "FROM documents), "
            "tf AS (SELECT doc_id, token, count(*) AS tf FROM toks "
            "GROUP BY 1, 2), "
            "df AS (SELECT token, count(*) AS df FROM tf GROUP BY token), "
            "p AS (SELECT count(*)::DOUBLE AS n FROM documents), "
            "s AS (SELECT tf.doc_id, tf.token, tf.tf * "
            "(ln((1 + (SELECT n FROM p)) / (1 + df.df)) + 1) AS w "
            "FROM tf JOIN df USING (token)), "
            "nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS z FROM s "
            "GROUP BY doc_id) "
            "SELECT s.doc_id, s.token, CAST(floor(s.w / nrm.z * 10000 "
            "+ 0.000001) AS BIGINT) AS score_q FROM s JOIN nrm "
            "USING (doc_id)"
        ),
        # C4 global line dedup: first occurrence = lexicographic min
        # (doc_id, line index); docs reassembled from surviving lines,
        # emptied docs dropped (both sides)
        "dedup_lines": (
            "WITH ls AS (SELECT doc_id, string_split(text, chr(10)) AS a "
            "FROM documents), "
            "lx AS (SELECT doc_id, a, "
            "unnest(generate_series(1, len(a))) AS i FROM ls), "
            "lines AS (SELECT doc_id, i, a[i] AS line FROM lx), "
            "k1 AS (SELECT line, min(doc_id) AS kd FROM lines GROUP BY line), "
            "k2 AS (SELECT l.line, min(l.i) AS ki FROM lines l "
            "JOIN k1 ON l.line = k1.line AND l.doc_id = k1.kd "
            "GROUP BY l.line), "
            "kept AS (SELECT l.doc_id, l.i, l.line FROM lines l "
            "JOIN k1 ON l.line = k1.line AND l.doc_id = k1.kd "
            "JOIN k2 ON l.line = k2.line AND l.i = k2.ki) "
            "SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS text "
            "FROM kept GROUP BY doc_id"
        ),
        # 3-iteration damped PageRank over the order→part edge list,
        # unrolled to the exact recurrence the engine executes
        # (r0 = 1/N; r_{k+1} = 0.15/N + 0.85 * sum(r_k(src)/outdeg);
        # dangling mass leaks on both sides; rank reported ×N)
        "pagerank": (
            "WITH e AS (SELECT 'o' || l_orderkey AS src, "
            "'p' || l_partkey AS dst FROM lineitem), "
            "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e), "
            "p AS (SELECT count(*)::DOUBLE AS n FROM nodes), "
            "deg AS (SELECT src, count(*)::DOUBLE AS d FROM e GROUP BY src), "
            "r0 AS (SELECT node, 1.0 / (SELECT n FROM p) AS r FROM nodes), "
            "s1 AS (SELECT e.dst, sum(r0.r / deg.d) AS c FROM e "
            "JOIN deg USING (src) JOIN r0 ON r0.node = e.src GROUP BY e.dst), "
            "r1 AS (SELECT nodes.node, 0.15 / (SELECT n FROM p) + "
            "0.85 * coalesce(s1.c, 0) AS r FROM nodes "
            "LEFT JOIN s1 ON s1.dst = nodes.node), "
            "s2 AS (SELECT e.dst, sum(r1.r / deg.d) AS c FROM e "
            "JOIN deg USING (src) JOIN r1 ON r1.node = e.src GROUP BY e.dst), "
            "r2 AS (SELECT nodes.node, 0.15 / (SELECT n FROM p) + "
            "0.85 * coalesce(s2.c, 0) AS r FROM nodes "
            "LEFT JOIN s2 ON s2.dst = nodes.node), "
            "s3 AS (SELECT e.dst, sum(r2.r / deg.d) AS c FROM e "
            "JOIN deg USING (src) JOIN r2 ON r2.node = e.src GROUP BY e.dst), "
            "r3 AS (SELECT nodes.node, 0.15 / (SELECT n FROM p) + "
            "0.85 * coalesce(s3.c, 0) AS r FROM nodes "
            "LEFT JOIN s3 ON s3.dst = nodes.node) "
            "SELECT node, CAST(floor(r * (SELECT n FROM p) * 10000 "
            "+ 0.000001) AS BIGINT) AS rank_q FROM r3"
        ),
        # 2-iteration personalized PageRank, unrolled: symmetrized
        # edge list, teleport restricted to the 3-order seed set
        # (r0 = 1[seed]/3; r_{k+1} = 0.15·1[seed]/3 + 0.85·Σ r_k/deg;
        # dangling mass leaks on both sides); epsilon-floor quantizer
        # to 1e-6 — float noise ≪ the 1e-6 quantum shift
        "personalized_pagerank": (
            "WITH e0 AS (SELECT 'o' || l_orderkey AS src, "
            "'p' || l_partkey AS dst FROM lineitem), "
            "e AS (SELECT src, dst FROM e0 "
            "UNION ALL SELECT dst, src FROM e0), "
            "nodes AS (SELECT DISTINCT src AS node FROM e), "
            "deg AS (SELECT src, count(*)::DOUBLE AS d "
            "FROM e GROUP BY src), "
            "r0 AS (SELECT node, CASE WHEN node IN ('o1','o2','o3') "
            "THEN 1.0 / 3 ELSE 0.0 END AS r FROM nodes), "
            "s1 AS (SELECT e.dst, sum(r0.r / deg.d) AS c FROM e "
            "JOIN deg USING (src) JOIN r0 ON r0.node = e.src "
            "WHERE r0.r <> 0 GROUP BY e.dst), "
            "r1 AS (SELECT nodes.node, (1.0 - 0.85) / 3 * "
            "(CASE WHEN nodes.node IN ('o1','o2','o3') THEN 1.0 "
            "ELSE 0.0 END) + 0.85 * coalesce(s1.c, 0) AS r FROM nodes "
            "LEFT JOIN s1 ON s1.dst = nodes.node), "
            "s2 AS (SELECT e.dst, sum(r1.r / deg.d) AS c FROM e "
            "JOIN deg USING (src) JOIN r1 ON r1.node = e.src "
            "GROUP BY e.dst), "
            "r2 AS (SELECT nodes.node, (1.0 - 0.85) / 3 * "
            "(CASE WHEN nodes.node IN ('o1','o2','o3') THEN 1.0 "
            "ELSE 0.0 END) + 0.85 * coalesce(s2.c, 0) AS r FROM nodes "
            "LEFT JOIN s2 ON s2.dst = nodes.node) "
            "SELECT node, CAST(floor(r * 1000000 + 0.000001) "
            "AS BIGINT) AS rank_q FROM r2"
        ),
        # 2-round synchronous label propagation, unrolled: per round,
        # votes = neighbor labels over the SYMMETRIZED edge list (edge
        # multiplicity counts), plus a weight-0 keep-own marker; winner
        # = max weight, ties to the lexicographically smallest label —
        # the exact recurrence the engine executes
        "label_propagation": (
            "WITH e0 AS (SELECT 'o' || l_orderkey AS src, "
            "'p' || l_partkey AS dst FROM lineitem), "
            "e AS (SELECT src, dst FROM e0 "
            "UNION ALL SELECT dst, src FROM e0), "
            "l0 AS (SELECT DISTINCT src AS node, src AS label FROM e), "
            "a1 AS (SELECT node, label, sum(w) AS w FROM ("
            "SELECT e.dst AS node, l.label, 1 AS w FROM e "
            "JOIN l0 l ON l.node = e.src "
            "UNION ALL SELECT node, label, 0 FROM l0) "
            "GROUP BY node, label), "
            "l1 AS (SELECT node, label FROM ("
            "SELECT node, label, row_number() OVER (PARTITION BY node "
            "ORDER BY w DESC, label ASC) AS rn FROM a1) WHERE rn = 1), "
            "a2 AS (SELECT node, label, sum(w) AS w FROM ("
            "SELECT e.dst AS node, l.label, 1 AS w FROM e "
            "JOIN l1 l ON l.node = e.src "
            "UNION ALL SELECT node, label, 0 FROM l1) "
            "GROUP BY node, label) "
            "SELECT node, label FROM ("
            "SELECT node, label, row_number() OVER (PARTITION BY node "
            "ORDER BY w DESC, label ASC) AS rn FROM a2) WHERE rn = 1"
        ),
        "degree_stats": (
            "WITH e AS (SELECT 'o' || l_orderkey AS src, "
            "'p' || l_partkey AS dst FROM lineitem), "
            "deg AS (SELECT src, count(*) AS d FROM e GROUP BY src) "
            "SELECT d AS degree, count(*) AS n_nodes FROM deg GROUP BY d"
        ),
        # the customer→order graph is a disjoint union of stars, and
        # 'c...' < 'o...' lexicographically, so min-label propagation's
        # fixed point is component = 'c' || custkey for every node —
        # SQL-expressible even though the engine runs iterative
        # propagation (oracle checks the fixed point, not the path)
        "connected_components": (
            "WITH e AS (SELECT 'c' || o_custkey AS src, "
            "'o' || o_orderkey AS dst FROM orders) "
            "SELECT DISTINCT src AS node, src AS component FROM e "
            "UNION ALL SELECT dst AS node, src AS component FROM e"
        ),
        # mixture sampling: integer threshold arithmetic (HUGEINT) and
        # the hash_sample multiplicative hash at ppm resolution, shared
        # verbatim with the engine — no float boundary can flip a doc
        "mixture_sample": (
            "WITH w(source, wt) AS (VALUES ('src0', 3::HUGEINT), "
            "('src1', 1::HUGEINT), ('src2', 1::HUGEINT)), "
            "ts AS (SELECT source, "
            "sum(len(regexp_extract_all(lower(text), '[a-z0-9]+')))"
            "::HUGEINT AS t FROM documents GROUP BY source), "
            "ww AS (SELECT sum(wt) AS tot FROM w), "
            "cap AS (SELECT min(t * (SELECT tot FROM ww) // wt) AS m "
            "FROM ts JOIN w USING (source)), "
            "thr AS (SELECT source, ((SELECT m FROM cap) * wt * 1000000) "
            "// ((SELECT tot FROM ww) * t) AS th "
            "FROM ts JOIN w USING (source)) "
            "SELECT d.doc_id, d.source FROM documents d "
            "JOIN thr ON thr.source = d.source "
            "WHERE ((d.doc_id % 2147483648) * 2654435761 + 17) "
            "% 4294967296 % 1000000 < thr.th"
        ),
        # winnowing (k=5, w=4): md5-hex gram hashes (byte-identical to
        # the engine's hashlib hex), min over full w-windows only, plus
        # the global min for docs with fewer than w grams
        "winnow": (
            "WITH base AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9]+') AS l "
            "FROM documents), "
            "pos AS (SELECT doc_id, l, "
            "unnest(range(1, len(l) - 5 + 2)) AS p "
            "FROM base WHERE len(l) >= 5), "
            "gh AS (SELECT doc_id, p, "
            "md5(array_to_string(list_slice(l, p, p + 4), ' ')) AS h, "
            "len(l) - 4 AS n FROM pos), "
            "mins AS (SELECT doc_id, p, n, "
            "min(h) OVER (PARTITION BY doc_id ORDER BY p "
            "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mfp "
            "FROM gh) "
            "SELECT DISTINCT doc_id, mfp AS fp FROM mins "
            "WHERE p >= 4 OR p = n"
        ),
        # JSONL round trip: oracle computes the rows directly
        "jsonl_roundtrip": (
            "SELECT doc_id, text || ' \"q' || '\\' || chr(10) || 'end' "
            "AS text FROM documents"
        ),
        # WARC round trip: oracle computes the records directly; the
        # engine writes+parses them back (Content-Length framing is
        # what the CRLFCRLF+banner salt exercises)
        "warc_roundtrip": (
            "SELECT 'https://ex.org/' || doc_id AS url, "
            "'2024-01-01T00:00:00Z' AS warc_ts, "
            "text || chr(13) || chr(10) || chr(13) || chr(10) || "
            "'WARC/1.0 fake' AS body FROM documents"
        ),
        # N-Triples round trip: the oracle computes the triples
        # directly; the engine must write+parse them back identically
        # (literal salt exercises quote/backslash/newline/tab escapes)
        "ntriples_roundtrip": (
            "SELECT 'urn:part/' || p_partkey AS subject, "
            "'urn:rel/hasName' AS predicate, "
            "p_name || ' \"q' || '\\' || chr(10) || chr(9) || 'end' "
            "AS object FROM part"
        ),
        # RRF: rank rules (score DESC, doc_id ASC) and the integer
        # contribution scale // (k + rank) shared verbatim
        "rrf_fuse": (
            "WITH a AS (SELECT doc_id, row_number() OVER "
            "(ORDER BY strlen(text) DESC, doc_id) AS r FROM documents), "
            "b AS (SELECT doc_id, row_number() OVER "
            "(ORDER BY (doc_id * 2654435761) % 1000000007 DESC, doc_id) "
            "AS r FROM documents), "
            "c AS (SELECT doc_id, 1000000 // (60 + r) AS w FROM a "
            "UNION ALL "
            "SELECT doc_id, 1000000 // (60 + r) AS w FROM b) "
            "SELECT doc_id, CAST(sum(w) AS BIGINT) AS fused_q "
            "FROM c GROUP BY doc_id"
        ),
        # hybrid retrieval: the bm25 CTEs + dense cosine, both
        # epsilon-floor quantized (shift 1e-3 of a quantum, shared
        # verbatim with the engine) before row_number ranking, fused
        # with the exact-integer RRF combiner
        "hybrid_search": (
            "WITH toks AS (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token "
            "FROM documents), "
            "dl AS (SELECT doc_id, count(*)::DOUBLE AS len FROM toks "
            "GROUP BY doc_id), "
            "st AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, "
            "(SELECT coalesce(sum(len), 0) FROM dl) AS total), "
            "q(term) AS (VALUES ('the'), ('data'), ('web')), "
            "df AS (SELECT token, count(DISTINCT doc_id)::DOUBLE AS df "
            "FROM toks WHERE token IN (SELECT term FROM q) GROUP BY token), "
            "tf AS (SELECT doc_id, token, count(*)::DOUBLE AS tf FROM toks "
            "WHERE token IN (SELECT term FROM q) GROUP BY doc_id, token), "
            "bm AS (SELECT tf.doc_id, CAST(floor(sum("
            "ln((st.n - df.df + 0.5) / (df.df + 0.5) + 1.0) * "
            "(tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.len / "
            "(st.total / st.n)))) * 1e6 + 1e-3) AS BIGINT) AS s "
            "FROM tf JOIN df ON df.token = tf.token "
            "JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN st "
            "GROUP BY tf.doc_id), "
            "qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v "
            "FROM embeddings WHERE vec_id = 0), "
            "dn AS (SELECT vec_id AS doc_id, CAST(floor("
            "list_cosine_similarity(CAST(embedding AS DOUBLE[]), "
            "(SELECT v FROM qv)) * 1e6 + 1e-3) AS BIGINT) AS s "
            "FROM embeddings), "
            "ra AS (SELECT doc_id, row_number() OVER "
            "(ORDER BY s DESC, doc_id) AS r FROM bm), "
            "rb AS (SELECT doc_id, row_number() OVER "
            "(ORDER BY s DESC, doc_id) AS r FROM dn), "
            "c AS (SELECT doc_id, 1000000 // (60 + r) AS w FROM ra "
            "UNION ALL "
            "SELECT doc_id, 1000000 // (60 + r) AS w FROM rb) "
            "SELECT doc_id, CAST(sum(w) AS BIGINT) AS fused_q "
            "FROM c GROUP BY doc_id"
        ),
        # Okapi BM25 (Lucene idf variant), token rule + constants
        # shared verbatim with the engine; N counts ALL docs
        "bm25": (
            "WITH toks AS (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token "
            "FROM documents), "
            "dl AS (SELECT doc_id, count(*)::DOUBLE AS len FROM toks "
            "GROUP BY doc_id), "
            "st AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, "
            "(SELECT coalesce(sum(len), 0) FROM dl) AS total), "
            "q(term) AS (VALUES ('the'), ('data'), ('web')), "
            "df AS (SELECT token, count(DISTINCT doc_id)::DOUBLE AS df "
            "FROM toks WHERE token IN (SELECT term FROM q) GROUP BY token), "
            "tf AS (SELECT doc_id, token, count(*)::DOUBLE AS tf FROM toks "
            "WHERE token IN (SELECT term FROM q) GROUP BY doc_id, token) "
            "SELECT tf.doc_id, CAST(floor(sum("
            "ln((st.n - df.df + 0.5) / (df.df + 0.5) + 1.0) * "
            "(tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.len / "
            "(st.total / st.n)))) * 1e6 + 1e-9) AS BIGINT) AS score_q "
            "FROM tf JOIN df ON df.token = tf.token "
            "JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN st "
            "GROUP BY tf.doc_id"
        ),
        # multinomial NB with add-1 smoothing, token rule and
        # quantizer shared verbatim with the engine; tie-break =
        # smallest class (engine argmax-first over ascending classes)
        "nb_classify": (
            "WITH toks AS (SELECT doc_id, lang, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token "
            "FROM documents), "
            "counts AS (SELECT lang, token, count(*)::DOUBLE AS n "
            "FROM toks GROUP BY lang, token), "
            "classes AS (SELECT lang, count(*)::DOUBLE AS n_docs "
            "FROM documents GROUP BY lang), "
            "vv AS (SELECT count(DISTINCT token)::DOUBLE AS v FROM toks), "
            "tot AS (SELECT lang, sum(n) AS total FROM counts GROUP BY lang), "
            "priors AS (SELECT lang, ln(n_docs / "
            "(SELECT sum(n_docs) FROM classes)) AS lp FROM classes), "
            "tokscore AS (SELECT t.doc_id, c.lang AS cls, "
            "sum(ln((coalesce(cn.n, 0) + 1.0) / "
            "(tt.total + (SELECT v FROM vv)))) AS s "
            "FROM toks t CROSS JOIN classes c "
            "JOIN tot tt ON tt.lang = c.lang "
            "LEFT JOIN counts cn ON cn.lang = c.lang AND cn.token = t.token "
            "GROUP BY t.doc_id, c.lang), "
            "allsc AS (SELECT d.doc_id, c.lang AS cls, "
            "p.lp + coalesce(ts.s, 0) AS score "
            "FROM documents d CROSS JOIN classes c "
            "JOIN priors p ON p.lang = c.lang "
            "LEFT JOIN tokscore ts ON ts.doc_id = d.doc_id "
            "AND ts.cls = c.lang) "
            "SELECT doc_id, cls AS label_pred, "
            "CAST(floor(score * 1e4 + 1e-6) AS BIGINT) AS score_q "
            "FROM (SELECT *, row_number() OVER (PARTITION BY doc_id "
            "ORDER BY score DESC, cls ASC) AS rn FROM allsc) WHERE rn = 1"
        ),
        # add-1 char-bigram LM; ASCII-only case folding via translate
        # (matches the engine's code-point+32 rule on ANY input —
        # Unicode lower() rules never enter), zipped unnest aligns
        # chars with positions, self-join on pos+1 forms bigrams.
        # Scoring set == training set, so the unseen-bigram branches
        # never fire here (pytest covers them on held-out docs).
        "lm_perplexity": (
            "WITH " + _LM_CTES +
            " SELECT b.doc_id, count(*) AS n_bigrams, "
            "CAST(floor((-sum(l.lp) / count(*)) * 1e4 + 1e-6) AS BIGINT) "
            "AS nll_q FROM big b JOIN lp l "
            "ON l.c1 = b.c1 AND l.c2 = b.c2 GROUP BY b.doc_id"
        ),
        # CCNet terciles: LM scores + per-source integer order
        # statistics (k = (n+2)//3 — no float thresholds; the value at
        # rank k is tie-order independent)
        "ccnet_buckets": (
            "WITH " + _LM_CTES + ", "
            "scores AS (SELECT b.doc_id, "
            "CAST(floor((-sum(l.lp) / count(*)) * 1e4 + 1e-6) AS BIGINT) "
            "AS nll_q FROM big b JOIN lp l "
            "ON l.c1 = b.c1 AND l.c2 = b.c2 GROUP BY b.doc_id), "
            "ranked AS (SELECT s.doc_id, d.source, s.nll_q, "
            "row_number() OVER (PARTITION BY d.source ORDER BY s.nll_q) "
            "AS rn, count(*) OVER (PARTITION BY d.source) AS n "
            "FROM scores s JOIN documents d ON d.doc_id = s.doc_id), "
            "thr AS (SELECT source, "
            "max(CASE WHEN rn = (n + 2) // 3 THEN nll_q END) AS t1, "
            "max(CASE WHEN rn = (2 * n + 2) // 3 THEN nll_q END) AS t2 "
            "FROM ranked GROUP BY source) "
            "SELECT r.doc_id, r.source, r.nll_q, "
            "CASE WHEN r.nll_q <= t.t1 THEN 'head' "
            "WHEN r.nll_q <= t.t2 THEN 'middle' ELSE 'tail' END AS bucket "
            "FROM ranked r JOIN thr t ON t.source = r.source"
        ),
        "boolean_search": (
            "SELECT doc_id FROM (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok "
            "FROM documents) WHERE tok IN ('the', 'data') "
            "GROUP BY doc_id HAVING count(DISTINCT tok) = 2"
        ),
        # Bloom with md5 double hashing (h1 + i·h2 mod 4096, k=3):
        # identical bits light on both sides, so membership — false
        # positives included — hash-matches exactly
        "bloom_membership": (
            "WITH ref AS (SELECT DISTINCT tok FROM (SELECT "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok "
            "FROM documents)), "
            "probe AS (SELECT DISTINCT tok FROM (SELECT "
            "unnest(regexp_extract_all(lower(p_name), '[a-z0-9]+')) AS tok "
            "FROM part)), "
            "rh AS (SELECT tok, CAST(concat('0x', substr(md5(tok), 1, 16)) "
            "AS UBIGINT) AS hv FROM ref), "
            "ph AS (SELECT tok, CAST(concat('0x', substr(md5(tok), 1, 16)) "
            "AS UBIGINT) AS hv FROM probe), "
            "rp AS (SELECT DISTINCT CAST((hv % 4294967296 + "
            "i * ((hv // 4294967296) | 1)) % 128 AS BIGINT) AS p "
            "FROM rh, generate_series(0, 2) AS g(i)), "
            "pp AS (SELECT tok, CAST((hv % 4294967296 + "
            "i * ((hv // 4294967296) | 1)) % 128 AS BIGINT) AS p "
            "FROM ph, generate_series(0, 2) AS g(i)) "
            "SELECT pp.tok AS token, bool_and(rp.p IS NOT NULL) AS member "
            "FROM pp LEFT JOIN rp ON rp.p = pp.p GROUP BY pp.tok"
        ),
        # zipped-unnest positions → pos+1 self-join pairs; formula
        # literals shared verbatim with bigram_pmi
        "bigram_pmi": (
            "WITH toks AS (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok, "
            "unnest(range(len(regexp_extract_all(lower(text), "
            "'[a-z0-9]+')))) AS pos FROM documents), "
            "uni AS (SELECT tok, count(*)::DOUBLE AS n FROM toks GROUP BY 1), "
            "pairs AS (SELECT a.tok AS ta, b.tok AS tb "
            "FROM toks a JOIN toks b "
            "ON b.doc_id = a.doc_id AND b.pos = a.pos + 1), "
            "bi AS (SELECT ta, tb, count(*)::DOUBLE AS n "
            "FROM pairs GROUP BY 1, 2), "
            "nn AS (SELECT sum(n) AS n_total FROM uni), "
            "mm AS (SELECT sum(n) AS m_total FROM bi) "
            "SELECT bi.ta AS tok_a, bi.tb AS tok_b, "
            "CAST(bi.n AS BIGINT) AS n_ab, "
            "CAST(floor(ln((bi.n / m_total) / "
            "((ua.n / n_total) * (ub.n / n_total))) * 1e4 + 1e-6) "
            "AS BIGINT) AS pmi_q "
            "FROM bi JOIN uni ua ON ua.tok = bi.ta "
            "JOIN uni ub ON ub.tok = bi.tb "
            "CROSS JOIN nn CROSS JOIN mm WHERE bi.n >= 5"
        ),
        "rep_ngrams": (
            "WITH toks AS (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok, "
            "unnest(range(len(regexp_extract_all(lower(text), "
            "'[a-z0-9]+')))) AS pos FROM documents), "
            "g AS (SELECT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok "
            "AS gram FROM toks a "
            "JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 "
            "JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2), "
            "gc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2) "
            "SELECT doc_id, CAST(sum(c) AS BIGINT) AS total_ngrams, "
            "CAST(coalesce(sum(c) FILTER (c > 1), 0) AS BIGINT) "
            "AS dup_ngrams, CAST(max(c) AS BIGINT) AS top_ngram_count "
            "FROM gc GROUP BY doc_id"
        ),
        "similarity_join": (
            "WITH l AS (SELECT p_partkey AS lk, p_name FROM part "
            "WHERE p_partkey % 2 = 0), "
            "r AS (SELECT p_partkey AS rk, p_name FROM part "
            "WHERE p_partkey % 2 = 1), "
            "lt AS (SELECT DISTINCT lk, unnest(regexp_extract_all("
            "lower(p_name), '[a-z0-9]+')) AS tok FROM l), "
            "rt AS (SELECT DISTINCT rk, unnest(regexp_extract_all("
            "lower(p_name), '[a-z0-9]+')) AS tok FROM r), "
            "ls AS (SELECT lk, count(*) AS l_size FROM lt GROUP BY 1), "
            "rs AS (SELECT rk, count(*) AS r_size FROM rt GROUP BY 1), "
            "inter AS (SELECT lk, rk, count(*) AS n_shared "
            "FROM lt JOIN rt USING (tok) GROUP BY 1, 2) "
            "SELECT lk, rk, n_shared, l_size, r_size "
            "FROM inter JOIN ls USING (lk) JOIN rs USING (rk) "
            "WHERE n_shared * 1000 >= 500 * (l_size + r_size - n_shared)"
        ),
        # chunk k covers tokens [k·48, k·48+64); list_slice is
        # 1-based inclusive, python slices 0-based exclusive — both
        # yield 64 tokens and clamp at the end
        "chunk_documents": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks "
            "FROM documents) "
            "SELECT doc_id, k AS chunk_id, "
            "len(list_slice(toks, k * 48 + 1, k * 48 + 64)) AS n_tokens, "
            "array_to_string(list_slice(toks, k * 48 + 1, k * 48 + 64), ' ') "
            "AS chunk FROM t, generate_series(0, 1000) AS g(k) "
            "WHERE k * 48 < len(toks)"
        ),
        "train_test_split": __import__(
            "omop2obo_ray.pipelines.curate",
            fromlist=["train_test_split_sql"]).train_test_split_sql(
            columns="doc_id"),
        "select_budget": (
            "WITH s AS (SELECT doc_id, n_chars AS score, "
            "n_chars AS weight FROM documents), "
            "c AS (SELECT doc_id, score, weight, sum(weight) OVER ("
            "ORDER BY score DESC, doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum "
            "FROM s) SELECT doc_id, score, weight, cum FROM c "
            "WHERE cum <= 100000"
        ),
        # unnormalized 2-iteration HITS: a1=indeg, h1=Σa1, a2=Σh1,
        # h2=Σa2 — exact int64 path counts, no quantizer
        "hits": (
            "WITH raw AS (SELECT 'n' || (p_partkey % 97) AS src, "
            "'n' || ((p_partkey * 3 + 1) % 97) AS dst FROM part), "
            "e AS (SELECT DISTINCT src, dst FROM raw), "
            "nodes AS (SELECT src AS node FROM e "
            "UNION SELECT dst FROM e), "
            "a1 AS (SELECT dst, count(*) AS a FROM e GROUP BY 1), "
            "h1 AS (SELECT e.src, sum(a1.a) AS h FROM e "
            "JOIN a1 ON a1.dst = e.dst GROUP BY 1), "
            "a2 AS (SELECT e.dst, sum(h1.h) AS a FROM e "
            "JOIN h1 ON h1.src = e.src GROUP BY 1), "
            "h2 AS (SELECT e.src, sum(a2.a) AS h FROM e "
            "JOIN a2 ON a2.dst = e.dst GROUP BY 1) "
            "SELECT n.node, CAST(coalesce(h2.h, 0) AS BIGINT) AS hub, "
            "CAST(coalesce(a2.a, 0) AS BIGINT) AS auth FROM nodes n "
            "LEFT JOIN h2 ON h2.src = n.node "
            "LEFT JOIN a2 ON a2.dst = n.node"
        ),
        # canonical a<b edges; triangle = (a,b),(a,c),(b,c) with b<c —
        # each counted once by the ordered 3-way self-join
        "triangle_count": (
            "WITH raw AS (SELECT 'n' || (p_partkey % 23) AS x, "
            "'n' || (p_partkey % 29) AS y FROM part "
            "UNION ALL SELECT 'c' || (p_partkey % 509), "
            "'c' || ((p_partkey % 509) + 1) FROM part), "
            "e AS (SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b "
            "FROM raw WHERE x <> y) "
            "SELECT count(*) AS n_triangles FROM e e1 "
            "JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b "
            "JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b"
        ),
        # anchor-target rule shared with synth_anchor_pages; the k=3
        # anchor carries an &amp; entity the parser must unescape
        "anchor_graph": (
            "SELECT 'https://host-' || doc_id || '.test/index' AS src, "
            "'https://site-' || ((doc_id * 31 + k * 17) % 500) || "
            "'.example.com/page' || "
            "CASE WHEN k = 3 THEN '?x=1&y=2' ELSE '' END AS dst "
            "FROM documents, generate_series(1, 3) AS g(k)"
        ),
        "anchor_texts": (
            "SELECT 'https://host-' || doc_id || '.test/index' AS src, "
            "'https://site-' || ((doc_id * 31 + k * 17) % 500) || "
            "'.example.com/page' || "
            "CASE WHEN k = 3 THEN '?x=1&y=2' ELSE '' END AS dst, "
            "chr(CAST(96 + k AS INTEGER)) AS anchor_text "
            "FROM documents, generate_series(1, 3) AS g(k)"
        ),
        # alias_table: mention→entity prior replayed from the planted
        # anchor contract; one CAST-DOUBLE division (exact IEEE)
        "alias_table": (
            "WITH e AS (SELECT chr(CAST(96 + k AS INTEGER)) "
            "AS mention, "
            "'https://site-' || ((doc_id * 31 + k * 17) % 500) || "
            "'.example.com/page' || "
            "CASE WHEN k = 3 THEN '?x=1&y=2' ELSE '' END AS dst "
            "FROM documents, generate_series(1, 3) AS g(k)), "
            "c AS (SELECT mention, dst, count(*) AS n FROM e "
            "GROUP BY 1, 2), "
            "t AS (SELECT mention, CAST(sum(n) AS BIGINT) AS total "
            "FROM c GROUP BY 1) "
            "SELECT c.mention, c.dst, CAST(c.n AS BIGINT) AS n, "
            "t.total, CAST(c.n AS DOUBLE) / t.total AS p "
            "FROM c JOIN t USING (mention)"
        ),
        # mode_per_key: ROW_NUMBER over (count DESC, value) replays
        # the deterministic tie-break; exact
        "mode_per_key": (
            "WITH c AS (SELECT l_suppkey AS k, l_returnflag AS v, "
            "count(*) AS n FROM lineitem GROUP BY 1, 2), "
            "r AS (SELECT k, v, n, ROW_NUMBER() OVER ("
            "PARTITION BY k ORDER BY n DESC, v) AS rn FROM c) "
            "SELECT k, v AS mode, CAST(n AS BIGINT) AS n FROM r "
            "WHERE rn = 1"
        ),
        # lift: NTILE(10) over score DESC (distinct scores by
        # construction) + per-bin rates; exact ints, shared divisions
        "lift": (
            "WITH s AS (SELECT (o_orderkey * 37) % 1009 "
            "+ o_orderkey / 1e9 AS score, "
            "CASE WHEN (o_orderkey * 13) % 100 < "
            "((o_orderkey * 37) % 1009) // 17 THEN 1 ELSE 0 END "
            "AS y FROM orders), "
            "b AS (SELECT y, NTILE(10) OVER (ORDER BY score DESC) "
            "AS bin FROM s), "
            "t AS (SELECT CAST(sum(y) AS BIGINT) AS tp, "
            "count(*) AS tn FROM s), "
            "a AS (SELECT bin, count(*) AS n, "
            "CAST(sum(y) AS BIGINT) AS n_pos FROM b GROUP BY bin) "
            "SELECT a.bin, a.n, a.n_pos, "
            "a.n_pos / CAST(a.n AS DOUBLE) AS rate, "
            "t.tp / CAST(t.tn AS DOUBLE) AS base_rate, "
            "(a.n_pos / CAST(a.n AS DOUBLE)) "
            "/ (t.tp / CAST(t.tn AS DOUBLE)) AS lift "
            "FROM a CROSS JOIN t"
        ),
        # wl: 2 unrolled refinement rounds; DuckDB computes ITS OWN
        # md5 over the same ordered neighbor multisets — exact
        "wl": (
            "WITH e0 AS (SELECT o_orderkey % 499 AS u, "
            "(o_orderkey * 31 + 7) % 503 AS v FROM orders "
            "WHERE o_orderkey % 499 <> (o_orderkey * 31 + 7) % 503), "
            "e AS (SELECT DISTINCT u, v FROM "
            "(SELECT u, v FROM e0 UNION SELECT v, u FROM e0) "
            "WHERE u <> v), "
            "d0 AS (SELECT u AS node, CAST(count(*) AS VARCHAR) "
            "AS wl FROM e GROUP BY u), "
            "r1 AS (SELECT n.node, md5(n.wl || '|' || "
            "string_agg(m.wl, ',' ORDER BY m.wl)) AS wl "
            "FROM d0 n JOIN e ON e.u = n.node "
            "JOIN d0 m ON m.node = e.v GROUP BY n.node, n.wl), "
            "r2 AS (SELECT n.node, md5(n.wl || '|' || "
            "string_agg(m.wl, ',' ORDER BY m.wl)) AS wl "
            "FROM r1 n JOIN e ON e.u = n.node "
            "JOIN r1 m ON m.node = e.v GROUP BY n.node, n.wl) "
            "SELECT node, wl FROM r2"
        ),
        # page_meta: planted-field arithmetic replay of the REAL
        # html head parse; exact
        "page_meta": (
            "SELECT 'https://host-' || doc_id || '.test/index' "
            "AS url, "
            "'Doc & ' || doc_id AS title, "
            "'about topic ' || (doc_id % 50) AS meta_description, "
            "'https://canon-' || (doc_id % 97) || '.test/' "
            "AS canonical, "
            "CASE doc_id % 3 WHEN 0 THEN 'en' WHEN 1 THEN 'de' "
            "ELSE 'fr' END AS html_lang FROM documents"
        ),
        # interarrival: LEAD gaps -> exact int sufficient stats +
        # identical float mean/std expressions; exact
        "interarrival": (
            "WITH seq AS (SELECT user_id, "
            "CAST(floor(epoch(ts)) AS BIGINT) AS s, "
            "lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS nxt "
            "FROM events), "
            "g AS (SELECT user_id, nxt - s AS gap FROM seq "
            "WHERE nxt IS NOT NULL), "
            "a AS (SELECT user_id, count(*) AS n_gaps, "
            "CAST(sum(gap) AS BIGINT) AS sum_s, "
            "CAST(sum(gap * gap) AS BIGINT) AS sumsq_s "
            "FROM g GROUP BY user_id) "
            "SELECT user_id, n_gaps, sum_s, sumsq_s, "
            "CAST(sum_s AS DOUBLE) / n_gaps AS mean_s, "
            "sqrt(greatest(CAST(sumsq_s AS DOUBLE) / n_gaps "
            "- (CAST(sum_s AS DOUBLE) / n_gaps) "
            "* (CAST(sum_s AS DOUBLE) / n_gaps), 0.0)) AS std_s "
            "FROM a"
        ),
        # jl_projection: SQL rebuilds the pinned Box-Muller matrix
        # and sums v_i * m_ij per (vec, j); 1e6 quantized
        "jl_projection": (
            "WITH dims AS (SELECT i, j, "
            "(i - 1) * 8 + (j - 1) AS idx FROM "
            "generate_series(1, 64) AS a(i), "
            "generate_series(1, 8) AS b(j)), "
            "m AS (SELECT i, j, "
            "sqrt(-2 * ln(((idx * 2654435761 + 17) % 2147483648 "
            "+ 1) / 2147483648.0)) "
            "* cos(2 * pi() * ((idx * 48271 + 119) % 2147483648) "
            "/ 2147483648.0) / sqrt(8.0) AS g FROM dims), "
            "v AS (SELECT vec_id, i, "
            "CAST(embedding[i] AS DOUBLE) AS val "
            "FROM embeddings, generate_series(1, 64) AS s(i)), "
            "p AS (SELECT v.vec_id, m.j, sum(v.val * m.g) AS pr "
            "FROM v JOIN m ON m.i = v.i GROUP BY 1, 2) "
            "SELECT vec_id, j, CAST(floor(pr * 1000000 + 0.5) "
            "AS BIGINT) AS pq FROM p"
        ),
        # gazetteer: arithmetic replay of the planted span offsets
        "gazetteer": (
            "SELECT o_orderkey AS doc_id, "
            "o_orderkey % 5 + 1 AS start, "
            "o_orderkey % 5 + 8 AS \"end\", "
            "'aspirin' AS surface FROM orders "
            "UNION ALL "
            "SELECT o_orderkey, "
            "o_orderkey % 5 + 10 + o_orderkey % 3, "
            "o_orderkey % 5 + 17 + o_orderkey % 3, 'insulin' "
            "FROM orders WHERE o_orderkey % 2 = 0"
        ),
        # transitions: LEAD window consecutive pairs + window total;
        # exact ints, one shared division
        "transitions": (
            "WITH seq AS (SELECT user_id, event_type AS cur, "
            "lead(event_type) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS nxt FROM events), "
            "c AS (SELECT cur, nxt, count(*) AS n FROM seq "
            "WHERE nxt IS NOT NULL GROUP BY 1, 2), "
            "t AS (SELECT cur, CAST(sum(n) AS BIGINT) AS total "
            "FROM c GROUP BY cur) "
            "SELECT c.cur, c.nxt, CAST(c.n AS BIGINT) AS n, "
            "t.total, CAST(c.n AS DOUBLE) / t.total AS p "
            "FROM c JOIN t USING (cur)"
        ),
        # gunzip: engine inflates REAL gzip bytes; identity oracle
        "gunzip": (
            "SELECT doc_id, text FROM documents"
        ),
        # kappa: po/pe/kappa arithmetic replay; exact
        "kappa": (
            "WITH e AS (SELECT 'l' || (o_orderkey % 4) AS a, "
            "CASE WHEN o_orderkey % 5 < 3 "
            "THEN 'l' || (o_orderkey % 4) "
            "ELSE 'l' || ((o_orderkey * 7) % 4) END AS b "
            "FROM orders), "
            "n AS (SELECT count(*) AS n, "
            "CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) "
            "AS agree FROM e), "
            "pe AS (SELECT CAST(sum(na * nb) AS BIGINT) AS pen FROM "
            "(SELECT l, CAST(sum(ca) AS BIGINT) AS na, "
            "CAST(sum(cb) AS BIGINT) AS nb FROM ("
            "SELECT a AS l, count(*) AS ca, 0 AS cb FROM e GROUP BY a "
            "UNION ALL "
            "SELECT b, 0, count(*) FROM e GROUP BY b) GROUP BY l)) "
            "SELECT n.n, n.agree, "
            "n.agree / CAST(n.n AS DOUBLE) AS po, "
            "pe.pen / CAST(n.n * n.n AS DOUBLE) AS pe, "
            "(n.agree / CAST(n.n AS DOUBLE) "
            "- pe.pen / CAST(n.n * n.n AS DOUBLE)) "
            "/ (1.0 - pe.pen / CAST(n.n * n.n AS DOUBLE)) AS kappa "
            "FROM n CROSS JOIN pe"
        ),
        # ab_test: pooled two-proportion z vs the lexicographic
        # control arm; exact ints + identical float expression
        "ab_test": (
            "WITH e AS (SELECT 'arm' || (o_orderkey % 3) AS arm, "
            "CASE WHEN (o_orderkey * 13) % 100 < "
            "10 + 5 * (o_orderkey % 3) THEN 1 ELSE 0 END AS c "
            "FROM orders), "
            "g AS (SELECT arm, count(*) AS n, "
            "CAST(sum(c) AS BIGINT) AS conv FROM e GROUP BY arm), "
            "ctrl AS (SELECT n AS cn, conv AS cc FROM g "
            "ORDER BY arm LIMIT 1) "
            "SELECT g.arm, g.n, g.conv, "
            "g.conv / CAST(g.n AS DOUBLE) AS rate, "
            "ctrl.cn AS control_n, ctrl.cc AS control_conv, "
            "CASE WHEN g.arm = (SELECT min(arm) FROM g) THEN 0.0 "
            "ELSE (g.conv / CAST(g.n AS DOUBLE) "
            "- ctrl.cc / CAST(ctrl.cn AS DOUBLE)) "
            "/ sqrt((g.conv + ctrl.cc) / CAST(g.n + ctrl.cn "
            "AS DOUBLE) * (1 - (g.conv + ctrl.cc) / "
            "CAST(g.n + ctrl.cn AS DOUBLE)) * (1 / CAST(g.n "
            "AS DOUBLE) + 1 / CAST(ctrl.cn AS DOUBLE))) END AS z "
            "FROM g CROSS JOIN ctrl"
        ),
        # dataset_diff: per-side DISTINCT key sets full-outer folded
        # into statuses; exact
        "dataset_diff": (
            "WITH o AS (SELECT DISTINCT o_orderstatus, "
            "o_orderpriority FROM orders WHERE o_orderkey % 2 <> 0), "
            "n AS (SELECT DISTINCT o_orderstatus, o_orderpriority "
            "FROM orders WHERE o_orderkey % 3 <> 0) "
            "SELECT coalesce(o.o_orderstatus, n.o_orderstatus) "
            "AS o_orderstatus, "
            "coalesce(o.o_orderpriority, n.o_orderpriority) "
            "AS o_orderpriority, "
            "CASE WHEN o.o_orderstatus IS NOT NULL AND "
            "n.o_orderstatus IS NOT NULL THEN 'kept' "
            "WHEN n.o_orderstatus IS NOT NULL THEN 'added' "
            "ELSE 'removed' END AS status "
            "FROM o FULL OUTER JOIN n "
            "ON o.o_orderstatus = n.o_orderstatus "
            "AND o.o_orderpriority = n.o_orderpriority"
        ),
        # profile_table: count / count-distinct / varchar extrema
        # per column; exact
        "profile_table": (
            "SELECT 'o_orderkey' AS \"column\", count(*) AS n, "
            "count(*) - count(o_orderkey) AS n_null, "
            "count(DISTINCT o_orderkey) AS n_distinct, "
            "min(CAST(o_orderkey AS VARCHAR)) AS min_val, "
            "max(CAST(o_orderkey AS VARCHAR)) AS max_val "
            "FROM orders "
            "UNION ALL SELECT 'o_custkey', count(*), "
            "count(*) - count(o_custkey), "
            "count(DISTINCT o_custkey), "
            "min(CAST(o_custkey AS VARCHAR)), "
            "max(CAST(o_custkey AS VARCHAR)) FROM orders "
            "UNION ALL SELECT 'o_orderstatus', count(*), "
            "count(*) - count(o_orderstatus), "
            "count(DISTINCT o_orderstatus), "
            "min(CAST(o_orderstatus AS VARCHAR)), "
            "max(CAST(o_orderstatus AS VARCHAR)) FROM orders"
        ),
        # bleu: XOR-partner refs; clipped per-order precisions,
        # brevity penalty and geometric mean spelled identically
        "bleu": (
            "WITH tk AS (SELECT doc_id, regexp_extract_all("
            "lower(text), '[a-z0-9]+') AS t FROM documents), "
            "pairt AS (SELECT a.doc_id, a.t AS ct, b.t AS rt "
            "FROM tk a LEFT JOIN tk b ON b.doc_id = "
            "xor(a.doc_id, 1)), "
            "c1 AS (SELECT doc_id, unnest(ct) AS g FROM pairt), "
            "c1c AS (SELECT doc_id, g, count(*) AS c FROM c1 "
            "GROUP BY 1, 2), "
            "r1 AS (SELECT doc_id, unnest(rt) AS g FROM pairt "
            "WHERE rt IS NOT NULL), "
            "r1c AS (SELECT doc_id, g, count(*) AS c FROM r1 "
            "GROUP BY 1, 2), "
            "o1 AS (SELECT c1c.doc_id, CAST(sum(least(c1c.c, "
            "coalesce(r1c.c, 0))) AS BIGINT) AS ov, "
            "CAST(sum(c1c.c) AS BIGINT) AS nc FROM c1c "
            "LEFT JOIN r1c ON r1c.doc_id = c1c.doc_id "
            "AND r1c.g = c1c.g GROUP BY 1), "
            "c2 AS (SELECT doc_id, unnest(list_transform("
            "generate_series(1, greatest(len(ct) - 1, 0)), "
            "i -> ct[i] || ' ' || ct[i + 1])) AS g FROM pairt), "
            "c2c AS (SELECT doc_id, g, count(*) AS c FROM c2 "
            "GROUP BY 1, 2), "
            "r2 AS (SELECT doc_id, unnest(list_transform("
            "generate_series(1, greatest(len(rt) - 1, 0)), "
            "i -> rt[i] || ' ' || rt[i + 1])) AS g FROM pairt "
            "WHERE rt IS NOT NULL), "
            "r2c AS (SELECT doc_id, g, count(*) AS c FROM r2 "
            "GROUP BY 1, 2), "
            "o2 AS (SELECT c2c.doc_id, CAST(sum(least(c2c.c, "
            "coalesce(r2c.c, 0))) AS BIGINT) AS ov, "
            "CAST(sum(c2c.c) AS BIGINT) AS nc FROM c2c "
            "LEFT JOIN r2c ON r2c.doc_id = c2c.doc_id "
            "AND r2c.g = c2c.g GROUP BY 1), "
            "base AS (SELECT pairt.doc_id, "
            "CAST(len(ct) AS BIGINT) AS cl, "
            "CAST(coalesce(len(rt), 0) AS BIGINT) AS rl, "
            "CASE WHEN o1.nc > 0 THEN CAST(o1.ov AS DOUBLE) / o1.nc "
            "ELSE 0.0 END AS p1, "
            "CASE WHEN o2.nc > 0 THEN CAST(o2.ov AS DOUBLE) / o2.nc "
            "ELSE 0.0 END AS p2 "
            "FROM pairt LEFT JOIN o1 ON o1.doc_id = pairt.doc_id "
            "LEFT JOIN o2 ON o2.doc_id = pairt.doc_id), "
            "wb AS (SELECT doc_id, p1, p2, "
            "CASE WHEN cl >= rl THEN 1.0 WHEN cl > 0 THEN "
            "exp(1 - CAST(rl AS DOUBLE) / cl) ELSE 0.0 END AS bp, "
            "cl FROM base) "
            "SELECT doc_id, bp, p1, p2, "
            "CASE WHEN p1 > 0 AND p2 > 0 AND cl > 0 THEN "
            "bp * exp((ln(p1) + ln(p2)) / 2) ELSE 0.0 END AS bleu "
            "FROM wb"
        ),
        # rouge: clipped bigram multiset overlap vs the first-8-token
        # truncation; exact ints, P/R single divisions, F1 from the
        # rounded P/R
        "rouge": (
            "WITH tk AS (SELECT doc_id, regexp_extract_all("
            "lower(text), '[a-z0-9]+') AS t FROM documents), "
            "cg AS (SELECT doc_id, unnest(list_transform("
            "generate_series(1, greatest(len(t) - 1, 0)), "
            "i -> t[i] || ' ' || t[i + 1])) AS gram FROM tk), "
            "rt AS (SELECT doc_id, t[1:8] AS t FROM tk), "
            "rg AS (SELECT doc_id, unnest(list_transform("
            "generate_series(1, greatest(len(t) - 1, 0)), "
            "i -> t[i] || ' ' || t[i + 1])) AS gram FROM rt), "
            "cc AS (SELECT doc_id, gram, count(*) AS c FROM cg "
            "GROUP BY 1, 2), "
            "rc AS (SELECT doc_id, gram, count(*) AS c FROM rg "
            "GROUP BY 1, 2), "
            "j AS (SELECT coalesce(cc.doc_id, rc.doc_id) AS doc_id, "
            "coalesce(cc.c, 0) AS c, coalesce(rc.c, 0) AS r "
            "FROM cc FULL OUTER JOIN rc ON cc.doc_id = rc.doc_id "
            "AND cc.gram = rc.gram), "
            "agg AS (SELECT tk.doc_id, "
            "CAST(coalesce(sum(j.c), 0) AS BIGINT) AS n_cand, "
            "CAST(coalesce(sum(j.r), 0) AS BIGINT) AS n_ref, "
            "CAST(coalesce(sum(least(j.c, j.r)), 0) AS BIGINT) "
            "AS n_overlap FROM tk LEFT JOIN j ON j.doc_id = "
            "tk.doc_id GROUP BY tk.doc_id), "
            "pr AS (SELECT doc_id, n_cand, n_ref, n_overlap, "
            "CASE WHEN n_cand > 0 THEN CAST(n_overlap AS DOUBLE) "
            "/ n_cand ELSE 0.0 END AS \"precision\", "
            "CASE WHEN n_ref > 0 THEN CAST(n_overlap AS DOUBLE) "
            "/ n_ref ELSE 0.0 END AS recall FROM agg) "
            "SELECT doc_id, n_cand, n_ref, n_overlap, \"precision\", "
            "recall, CASE WHEN \"precision\" + recall > 0 THEN "
            "2 * \"precision\" * recall / (\"precision\" + recall) "
            "ELSE 0.0 END AS f1 FROM pr"
        ),
        # cocitation / bib_coupling: distinct-edge self-join pair
        # counts; exact
        "cocitation": (
            "WITH e AS (SELECT DISTINCT o_orderkey % 499 AS u, "
            "(o_orderkey * 31 + 7) % 503 AS v FROM orders "
            "WHERE o_orderkey % 499 <> (o_orderkey * 31 + 7) % 503) "
            "SELECT x.v AS a, y.v AS b, count(*) AS n FROM e x "
            "JOIN e y ON x.u = y.u AND x.v < y.v GROUP BY 1, 2"
        ),
        "bib_coupling": (
            "WITH e AS (SELECT DISTINCT o_orderkey % 499 AS u, "
            "(o_orderkey * 31 + 7) % 503 AS v FROM orders "
            "WHERE o_orderkey % 499 <> (o_orderkey * 31 + 7) % 503) "
            "SELECT x.u AS a, y.u AS b, count(*) AS n FROM e x "
            "JOIN e y ON x.v = y.v AND x.u < y.u GROUP BY 1, 2"
        ),
        # hearst: DuckDB runs ITS OWN RE2 extraction over the same
        # planted sentences — engine-vs-engine, exact
        "hearst": (
            "WITH t AS (SELECT doc_id, "
            "'metal' || (doc_id % 7) || ' such as iron' || "
            "(doc_id % 11) || "
            "CASE WHEN doc_id % 2 = 0 THEN ' tool' || (doc_id % 5) "
            "|| ' including hammer' || (doc_id % 13) ELSE '' END || "
            "CASE WHEN doc_id % 3 = 0 THEN ' cat' || (doc_id % 3) "
            "|| ' and other beast' || (doc_id % 4) ELSE '' END "
            "AS text FROM documents), "
            "m1 AS (SELECT unnest(regexp_extract_all(lower(text), "
            "'(\\w+) such as (\\w+)', 1)) AS hypernym, "
            "unnest(regexp_extract_all(lower(text), "
            "'(\\w+) such as (\\w+)', 2)) AS hyponym, "
            "'such_as' AS pattern FROM t), "
            "m2 AS (SELECT unnest(regexp_extract_all(lower(text), "
            "'(\\w+) including (\\w+)', 1)), "
            "unnest(regexp_extract_all(lower(text), "
            "'(\\w+) including (\\w+)', 2)), 'including' FROM t), "
            "m3 AS (SELECT unnest(regexp_extract_all(lower(text), "
            "'(\\w+) and other (\\w+)', 2)), "
            "unnest(regexp_extract_all(lower(text), "
            "'(\\w+) and other (\\w+)', 1)), 'and_other' FROM t) "
            "SELECT hypernym, hyponym, pattern, count(*) AS n "
            "FROM (SELECT * FROM m1 UNION ALL SELECT * FROM m2 "
            "UNION ALL SELECT * FROM m3) GROUP BY 1, 2, 3"
        ),
        # katz: unrolled walk-count joins; exact ints + one shared
        # IEEE division
        "katz": (
            "WITH e AS (SELECT DISTINCT o_orderkey % 997 AS u, "
            "(o_orderkey * 31 + 7) % 997 AS v FROM orders "
            "WHERE o_orderkey % 997 <> (o_orderkey * 31 + 7) % 997), "
            "nd AS (SELECT u AS node FROM e "
            "UNION SELECT v FROM e), "
            "p1 AS (SELECT v AS node, count(*) AS p FROM e "
            "GROUP BY v), "
            "p2 AS (SELECT e.v AS node, CAST(sum(p1.p) AS BIGINT) "
            "AS p FROM e JOIN p1 ON p1.node = e.u GROUP BY e.v) "
            "SELECT nd.node, CAST(64 + 8 * coalesce(p1.p, 0) "
            "+ coalesce(p2.p, 0) AS BIGINT) AS katz_num, "
            "CAST(64 + 8 * coalesce(p1.p, 0) + coalesce(p2.p, 0) "
            "AS DOUBLE) / 64 AS katz "
            "FROM nd LEFT JOIN p1 ON p1.node = nd.node "
            "LEFT JOIN p2 ON p2.node = nd.node"
        ),
        # graph_diff: per-side DISTINCT edge sets full-outer folded
        # into statuses; exact
        "graph_diff": (
            "WITH olde AS (SELECT DISTINCT o_orderkey % 700 AS src, "
            "(o_orderkey * 31 + 7) % 700 AS dst FROM orders "
            "WHERE o_orderkey % 2 <> 0 "
            "AND o_orderkey % 700 <> (o_orderkey * 31 + 7) % 700), "
            "newe AS (SELECT DISTINCT o_orderkey % 700 AS src, "
            "(o_orderkey * 31 + 7) % 700 AS dst FROM orders "
            "WHERE o_orderkey % 3 <> 0 "
            "AND o_orderkey % 700 <> (o_orderkey * 31 + 7) % 700) "
            "SELECT coalesce(o.src, n.src) AS src, "
            "coalesce(o.dst, n.dst) AS dst, "
            "CASE WHEN o.src IS NOT NULL AND n.src IS NOT NULL "
            "THEN 'kept' WHEN n.src IS NOT NULL THEN 'added' "
            "ELSE 'removed' END AS status "
            "FROM olde o FULL OUTER JOIN newe n "
            "ON o.src = n.src AND o.dst = n.dst"
        ),
        # nfc_normalize: DuckDB normalizes the SAME planted
        # denormalized text with ITS OWN nfc_normalize — a true
        # engine-vs-engine check, not a replay
        "nfc_normalize": (
            "SELECT doc_id, "
            "CASE WHEN doc_id % 2 = 0 THEN 'w' || doc_id || ' e' || "
            "chr(769) || ' A' || chr(778) || ' ' || chr(64257) || "
            "'x' ELSE 'w' || doc_id || ' plain' END AS text, "
            "CASE WHEN doc_id % 2 = 0 THEN nfc_normalize("
            "'w' || doc_id || ' e' || chr(769) || ' A' || chr(778) "
            "|| ' ' || chr(64257) || 'x') "
            "ELSE 'w' || doc_id || ' plain' END AS text_nfc "
            "FROM documents"
        ),
        # merge_intervals: window prefix-max island detection over
        # the same (s, e) sort the engine uses; exact ints
        "merge_intervals": (
            "WITH iv AS (SELECT l_suppkey AS k, "
            "datediff('day', DATE '1970-01-01', l_shipdate) AS s, "
            "datediff('day', DATE '1970-01-01', l_shipdate) "
            "+ l_orderkey % 20 AS e FROM lineitem), "
            "o AS (SELECT k, s, e, max(e) OVER (PARTITION BY k "
            "ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "1 PRECEDING) AS pmax FROM iv), "
            "g AS (SELECT k, s, e, sum(CASE WHEN pmax IS NULL "
            "OR s > pmax THEN 1 ELSE 0 END) OVER (PARTITION BY k "
            "ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS grp FROM o) "
            "SELECT k, min(s) AS start, max(e) AS \"end\", "
            "count(*) AS n_merged FROM g GROUP BY k, grp"
        ),
        # HyperLogLog p=12: hash = first 16 md5-hex chars as UBIGINT,
        # reg = h % 4096, rho = trailing zeros of (h >> 12) + 1 (all
        # exact integer ops); estimator literals shared verbatim with
        # hll_distinct (only float reassociation differs → floor-quant)
        "hll_distinct": (
            "WITH toks AS (SELECT lang, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok "
            "FROM documents), "
            "d AS (SELECT DISTINCT lang, tok FROM toks), "
            "h AS (SELECT lang, CAST(concat('0x', substr(md5(tok), 1, 16)) "
            "AS UBIGINT) AS hv FROM d), "
            "r AS (SELECT lang, CAST(hv % 4096 AS BIGINT) AS reg, "
            "CAST(hv >> 12 AS BIGINT) AS w FROM h), "
            "rr AS (SELECT lang, reg, max(CASE WHEN w = 0 THEN 53 "
            "ELSE bit_count((w & -w) - 1) + 1 END) AS rho "
            "FROM r GROUP BY 1, 2), "
            "agg AS (SELECT lang, count(*) AS nz, "
            "sum(power(2.0, -rho)) + (4096 - count(*)) * 1.0 AS s "
            "FROM rr GROUP BY 1), "
            "est AS (SELECT lang, nz, "
            "(CAST(0.7213 AS DOUBLE) / (1.0 + CAST(1.079 AS DOUBLE) / 4096.0))"
            " * 4096 * 4096 / s AS raw FROM agg) "
            "SELECT lang, nz, CAST(floor((CASE WHEN raw <= 2.5 * 4096 "
            "AND nz < 4096 THEN 4096 * ln(4096.0 / (4096 - nz)) "
            "ELSE raw END) * 1e3 + 1e-6) AS BIGINT) AS est_q FROM est"
        ),
        # chain components: each (priority, orderkey%8) partition is one
        # connected chain by construction, so the fixed point is the
        # LEXICOGRAPHIC min of the 'o'||orderkey labels per partition
        # (the engine's min-label is a string min — 'o10' < 'o9')
        "connected_components_alt": (
            "SELECT 'o' || o_orderkey AS node, "
            "min('o' || o_orderkey) OVER "
            "(PARTITION BY o_orderpriority, o_orderkey % 8) AS component "
            "FROM orders"
        ),
        # owl:sameAs smushing: each (nationkey, custkey%4) partition is
        # one alias chain, so canonical id = lexicographic min of
        # 'c'||custkey per partition; subject side collapses memberOf
        # triples, object side collapses the hub's cites triples
        "sameas_resolve": (
            "WITH canon AS (SELECT c_custkey, c_nationkey, "
            "min('c' || c_custkey) OVER "
            "(PARTITION BY c_nationkey, c_custkey % 4) AS cid "
            "FROM customer) "
            "SELECT DISTINCT cid AS subj, 'memberOf' AS pred, "
            "'n' || c_nationkey AS obj FROM canon "
            "UNION "
            "SELECT DISTINCT 'hub' AS subj, 'cites' AS pred, cid AS obj "
            "FROM canon"
        ),
        "window_sliding": (
            "SELECT event_type, "
            "(CAST(floor(epoch(ts) / 1200) AS BIGINT) - g.k) * 1200 "
            "AS window_start, count(*) AS n, round(sum(value), 2) AS sum_value "
            "FROM events, generate_series(0, 2) AS g(k) GROUP BY 1, 2"
        ),
        "clip_cells": "SELECT doc_id, left(text, 100) AS text FROM documents",
        "embedding_near_pairs": (
            "SELECT a.vec_id AS doc_a, b.vec_id AS doc_b, "
            "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])), 6) AS cos "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.3"
        ),
        "embedding_topk": (
            "SELECT vec_id, round(list_cosine_similarity("
            "CAST(embedding AS DOUBLE[]), "
            "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 4) "
            "AS cos FROM embeddings WHERE vec_id <> 0 ORDER BY cos DESC, vec_id LIMIT 10"
        ),
        # global exclusive prefix sum over doc_id order + GPT-style
        # concat-and-chunk packing arithmetic; n = ASCII word-token
        # count (same RE2 class as the engine's split — data-independent)
        "pack_sequences": (
            "WITH t AS (SELECT doc_id, CAST(len(regexp_extract_all("
            "lower(text), '[a-z0-9_]+')) AS BIGINT) AS n FROM documents), "
            "o AS (SELECT doc_id, n, coalesce(sum(n) OVER (ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "AS \"offset\" FROM t) "
            "SELECT doc_id, n, \"offset\", \"offset\" // 256 AS bin_first, "
            "CASE WHEN n > 0 THEN (\"offset\" + n - 1) // 256 "
            "ELSE \"offset\" // 256 END AS bin_last FROM o"
        ),
        # latest event per user, (ts, event_id) argmax — the
        # latest-crawl-wins election
        "latest_per_key": (
            "SELECT event_id, ts, user_id, event_type, value FROM ("
            "SELECT *, row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts DESC, event_id DESC) AS rn "
            "FROM (SELECT event_id, ts, user_id, event_type, value "
            "FROM events)) WHERE rn = 1"
        ),
        # per-column audit stats; min/max round-trip via VARCHAR cast
        # (int/string columns only — exact on both sides)
        "table_profile": " UNION ALL ".join(
            f"SELECT '{c}' AS \"column\", count(*) AS n_rows, "
            f"count(*) - count({c}) AS n_nulls, "
            f"count(DISTINCT {c}) AS n_distinct, "
            f"CAST(min({c}) AS VARCHAR) AS min_str, "
            f"CAST(max({c}) AS VARCHAR) AS max_str FROM orders"
            for c in ("o_orderkey", "o_custkey", "o_orderstatus",
                      "o_orderpriority")),
        # token-boundary probe presence, same RE2 boundary rule as the
        # Aho-Corasick scanner ((^|[^a-z0-9_]) … ([^a-z0-9_]|$))
        "decontaminate": (
            "SELECT doc_id, "
            "CAST(regexp_matches(lower(text), "
            "'(^|[^a-z0-9_])hash value([^a-z0-9_]|$)') AS BIGINT) + "
            "CAST(regexp_matches(lower(text), "
            "'(^|[^a-z0-9_])data query([^a-z0-9_]|$)') AS BIGINT) + "
            "CAST(regexp_matches(lower(text), "
            "'(^|[^a-z0-9_])slow filter([^a-z0-9_]|$)') AS BIGINT) "
            "AS n_probes_matched, "
            "(regexp_matches(lower(text), "
            "'(^|[^a-z0-9_])hash value([^a-z0-9_]|$)') OR "
            "regexp_matches(lower(text), "
            "'(^|[^a-z0-9_])data query([^a-z0-9_]|$)') OR "
            "regexp_matches(lower(text), "
            "'(^|[^a-z0-9_])slow filter([^a-z0-9_]|$)')) AS contaminated "
            "FROM documents"
        ),
        # element-wise mean per label via DuckDB's zipped unnest
        # (parallel unnests of equal-length lists align positionally;
        # range(len) yields the 0-based dim to match the engine);
        # epsilon-floor quantization shared verbatim with the query
        # wrapper (float association differs between the coarse-partial
        # merge and DuckDB's fold)
        "label_centroids": (
            "WITH x AS (SELECT label, unnest(embedding) AS e, "
            "unnest(range(len(embedding))) AS i FROM embeddings) "
            "SELECT label, i AS dim, "
            "CAST(floor(sum(e::DOUBLE) / count(*) * 10000 "
            "+ 0.000001) AS BIGINT) AS avg_q FROM x GROUP BY label, i"
        ),
        # windowed skip-gram pairs: zipped token/position unnest +
        # positional self-join bounded by the window (shared token rule)
        "cooc_counts": __import__(
            "omop2obo_ray.pipelines.curate",
            fromlist=["cooc_counts_sql"]).cooc_counts_sql(
            window=3, min_count=2),
        # C4 line/doc rules over the synthesized-paragraph contract
        # (rebuilds the lines by pure arithmetic, then the same RE2
        # rules — the gate round-trips the real kernels)
        "c4_clean": __import__(
            "omop2obo_ray.pipelines.curate",
            fromlist=["c4_clean_sql"]).c4_clean_sql(),
        # Gopher rules over the synth_gopher_docs contract — same
        # RE2 regexes, same integer cross-multiplied thresholds
        "gopher_stats": __import__(
            "omop2obo_ray.pipelines.curate",
            fromlist=["gopher_stats_sql"]).gopher_stats_sql(
            min_words=20, symbol_ratio_x10=1, bullet_ratio_x10=4,
            ellipsis_ratio_x10=4, alpha_ratio_x5=2),
        # n-gram collision decontamination: same token rule, same
        # distinct-gram counting, benchmark = doc_id % 97 subset
        "ngram_decontam": __import__(
            "omop2obo_ray.pipelines.curate",
            fromlist=["ngram_decontaminate_sql"]).ngram_decontaminate_sql(),
        # href resolution over the synth_href_edges contract: the
        # oracle rebuilds src/dst AND the resolved URL per class by
        # the shared doc_id arithmetic ('../up/D' against base path
        # /a/b/index.html resolves to /a/up/D)
        "resolve_hrefs": (
            "SELECT doc_id, "
            "'https://host-' || doc_id || '.test/a/b/index.html' AS src, "
            "CASE doc_id % 4 "
            "WHEN 0 THEN 'https://abs-' || doc_id || '.example.com/p' "
            "WHEN 1 THEN '//cdn-' || doc_id || '.example.com/lib.js' "
            "WHEN 2 THEN '/section/' || doc_id || '/page' "
            "ELSE '../up/' || doc_id END AS dst, "
            "CASE doc_id % 4 "
            "WHEN 0 THEN 'https://abs-' || doc_id || '.example.com/p' "
            "WHEN 1 THEN 'https://cdn-' || doc_id || '.example.com/lib.js' "
            "WHEN 2 THEN 'https://host-' || doc_id || '.test/section/' "
            "|| doc_id || '/page' "
            "ELSE 'https://host-' || doc_id || '.test/a/up/' || doc_id "
            "END AS resolved "
            "FROM documents"
        ),
        # moment-formula covariance (Σxy/n − mean·mean) with the shared
        # epsilon-floor quantizer (only float reassociation differs)
        "embedding_covariance": (
            "WITH e AS (SELECT vec_id, "
            "unnest(range(0, len(embedding))) AS dim, "
            "unnest(embedding)::DOUBLE AS x FROM embeddings), "
            "n AS (SELECT count(*)::DOUBLE AS n FROM embeddings) "
            "SELECT e1.dim AS i, e2.dim AS j, "
            "CAST(floor((sum(e1.x * e2.x) / any_value(n.n) "
            "- (sum(e1.x) / any_value(n.n)) "
            "* (sum(e2.x) / any_value(n.n))) * 1000000 + 0.000000001) "
            "AS BIGINT) AS cov_q "
            "FROM e e1 JOIN e e2 "
            "ON e1.vec_id = e2.vec_id AND e1.dim <= e2.dim "
            "CROSS JOIN n GROUP BY 1, 2"
        ),
        # per-node triangles via the ordered self-join over the
        # symmetric closure; coeff = the SAME double expression
        # 2.0·t/(d·(d−1)) then the shared epsilon-floor
        "clustering_coefficient": (
            "WITH raw AS (SELECT 'n' || (p_partkey % 23) AS x, "
            "'n' || (p_partkey % 29) AS y FROM part "
            "UNION ALL SELECT 'c' || (p_partkey % 509), "
            "'c' || ((p_partkey % 509) + 1) FROM part), "
            "und AS (SELECT DISTINCT least(x, y) AS a, "
            "greatest(x, y) AS b FROM raw WHERE x <> y), "
            "sym AS (SELECT a AS u, b AS v FROM und "
            "UNION ALL SELECT b, a FROM und), "
            "deg AS (SELECT u AS node, count(*)::BIGINT AS d "
            "FROM sym GROUP BY 1), "
            "tri AS (SELECT s1.u AS node, count(*)::BIGINT AS t "
            "FROM sym s1 JOIN sym s2 ON s1.u = s2.u AND s1.v < s2.v "
            "JOIN und e ON e.a = s1.v AND e.b = s2.v GROUP BY 1) "
            "SELECT deg.node, deg.d, "
            "coalesce(tri.t, 0)::BIGINT AS tri, "
            "CAST(CASE WHEN deg.d >= 2 THEN floor(2.0 * coalesce(tri.t, 0) "
            "/ (deg.d * (deg.d - 1)) * 1000000 + 0.000000001) "
            "ELSE 0 END AS BIGINT) AS coeff_q "
            "FROM deg LEFT JOIN tri ON tri.node = deg.node"
        ),
        # frontier BFS = recursive CTE with UNION dedup over (node, d)
        # pairs (d capped, so the walk terminates on cyclic graphs);
        # min(d) per node is the hop distance
        "bfs_hops": (
            "WITH RECURSIVE eraw AS (SELECT 'o' || l_orderkey AS src, "
            "'p' || l_partkey AS dst FROM lineitem), "
            "sym AS (SELECT src, dst FROM eraw "
            "UNION SELECT dst, src FROM eraw), "
            "seeds AS (SELECT DISTINCT 'p' || p_partkey AS node "
            "FROM part WHERE p_partkey % 97 = 0), "
            "walk(node, d) AS ("
            "SELECT node, 0 FROM seeds "
            "UNION "
            "SELECT sym.dst, walk.d + 1 FROM walk "
            "JOIN sym ON sym.src = walk.node WHERE walk.d < 3) "
            "SELECT node, min(d)::BIGINT AS hops FROM walk GROUP BY node"
        ),
        # common-neighbor wedge self-join over the symmetric closure of
        # the shared triangle graph; Adamic-Adar = Σ 1/ln(deg(center)),
        # Jaccard denominator uses FULL endpoint degrees (cap unhit at
        # default 10k); existing edges anti-joined away; the same
        # epsilon-floor quantizer as the query wrapper
        "link_prediction": (
            "WITH raw AS (SELECT 'n' || (p_partkey % 23) AS x, "
            "'n' || (p_partkey % 29) AS y FROM part "
            "UNION ALL SELECT 'c' || (p_partkey % 509), "
            "'c' || ((p_partkey % 509) + 1) FROM part), "
            "und AS (SELECT DISTINCT least(x, y) AS a, "
            "greatest(x, y) AS b FROM raw WHERE x <> y), "
            "sym AS (SELECT a AS u, b AS v FROM und "
            "UNION ALL SELECT b, a FROM und), "
            "deg AS (SELECT u AS node, count(*)::BIGINT AS d "
            "FROM sym GROUP BY 1), "
            "cen AS (SELECT s.u, s.v, deg.d FROM sym s "
            "JOIN deg ON deg.node = s.u WHERE deg.d >= 2), "
            "pr AS (SELECT s1.v AS a, s2.v AS b, "
            "count(*)::BIGINT AS cn, sum(1.0 / ln(s1.d)) AS aa "
            "FROM cen s1 JOIN cen s2 "
            "ON s1.u = s2.u AND s1.v < s2.v GROUP BY 1, 2), "
            "ne AS (SELECT pr.* FROM pr LEFT JOIN und "
            "ON und.a = pr.a AND und.b = pr.b WHERE und.a IS NULL) "
            "SELECT ne.a, ne.b, ne.cn, "
            "CAST(floor(ne.aa * 1000000 + 0.000000001) AS BIGINT) "
            "AS aa_q, "
            "CAST(floor(ne.cn::DOUBLE / (d1.d + d2.d - ne.cn) "
            "* 1000000 + 0.000000001) AS BIGINT) AS jacc_q "
            "FROM ne JOIN deg d1 ON d1.node = ne.a "
            "JOIN deg d2 ON d2.node = ne.b"
        ),
        # Shannon entropy over the shared printable-ASCII char rule
        "char_entropy": __import__(
            "omop2obo_ray.pipelines.curate",
            fromlist=["char_entropy_sql"]).char_entropy_sql(),
        # per-dst mean of src embeddings over the shared synthetic link
        # rule; zipped unnest aligns (value, dim) positionally
        "neighbor_mean": (
            "WITH e AS (SELECT vec_id AS src, "
            "(vec_id * 7 + 3) % 499 AS dst FROM embeddings), "
            "x AS (SELECT vec_id, unnest(embedding)::DOUBLE AS v, "
            "unnest(range(0, len(embedding))) AS dim FROM embeddings) "
            "SELECT e.dst AS node, x.dim, "
            "CAST(floor(sum(x.v) / count(*) * 1000000 + 0.000000001) "
            "AS BIGINT) AS avg_q "
            "FROM e JOIN x ON x.vec_id = e.src GROUP BY 1, 2"
        ),
        # DSIR: the char-bigram LM recurrence twice (raw + target-
        # filtered training sets) with the scorer's exact backoff
        # ladder; weights are exact integer differences
        "dsir_weights": __import__(
            "omop2obo_ray.pipelines.curate",
            fromlist=["dsir_weights_sql"]).dsir_weights_sql(
            target_col="source", target_value="src0"),
        # crawl-refresh dedup: store = md5 of doc_id%3==0 texts;
        # survivors = min-doc_id representative of texts outside it
        "dedup_incremental": (
            "WITH store AS (SELECT DISTINCT md5(text) AS h "
            "FROM documents WHERE doc_id % 3 = 0), "
            "keep AS (SELECT md5(text) AS h, min(doc_id) AS doc_id "
            "FROM documents GROUP BY 1) "
            "SELECT k.doc_id FROM keep k "
            "LEFT JOIN store s ON s.h = k.h WHERE s.h IS NULL"
        ),
        # salted-join result == the plain join
        "salted_join": (
            "SELECT o.o_orderkey, o.o_custkey, c.c_name "
            "FROM orders o JOIN customer c "
            "ON c.c_custkey = o.o_custkey"
        ),
        # bloom pushdown must be semantically invisible: gates are the
        # plain IN / NOT IN subquery semi/anti joins
        "bloom_semi_join": (
            "SELECT o_orderkey, o_custkey FROM orders "
            "WHERE o_custkey IN (SELECT c_custkey FROM customer "
            "WHERE c_mktsegment = 'BUILDING')"
        ),
        "bloom_anti_join": (
            "SELECT o_orderkey, o_custkey FROM orders "
            "WHERE o_custkey NOT IN (SELECT c_custkey FROM customer "
            "WHERE c_mktsegment = 'BUILDING')"
        ),
        # crawl diff: full-outer md5 compare over the two synthetic
        # snapshots (rules shared with the engine wrapper)
        "snapshot_diff": (
            "WITH o AS (SELECT doc_id, md5(text) AS h FROM documents "
            "WHERE doc_id % 2 = 0), "
            "n AS (SELECT doc_id, md5(CASE WHEN doc_id % 5 = 0 "
            "THEN text || 'x' ELSE text END) AS h FROM documents "
            "WHERE doc_id % 3 != 1), "
            "d AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, "
            "CASE WHEN o.h IS NULL THEN 'added' "
            "WHEN n.h IS NULL THEN 'removed' "
            "WHEN o.h != n.h THEN 'changed' END AS status "
            "FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id) "
            "SELECT doc_id, status FROM d WHERE status IS NOT NULL"
        ),
        # exact fuzzy join: the oracle brute-forces every pair with
        # DuckDB's native levenshtein; the engine's SymSpell blocking
        # must lose nothing
        "edit_join": (
            "WITH q AS (SELECT p_partkey AS q_id, "
            "substr(p_name, 1, (p_partkey % length(p_name))) || "
            "substr(p_name, (p_partkey % length(p_name)) + 2) AS q_name "
            "FROM part) "
            "SELECT q.q_id, p.p_partkey, "
            "levenshtein(q.q_name, p.p_name)::BIGINT AS dist "
            "FROM q CROSS JOIN part p "
            "WHERE levenshtein(q.q_name, p.p_name) <= 1"
        ),
        # ---- VERDICT r4 #1: rows-only tail promoted to hash-checked
        # gates via the engine's hash_mode='sql' md5 arithmetic ----
        "dedup_minhash": (
            "WITH " + _MINHASH_DOC + " "
            "SELECT ka AS doc_a, kb AS doc_b, round(j, 6) AS jaccard "
            "FROM vp"
        ),
        "near_dup_join": (
            "WITH " + _minhash_ctes(
                "(SELECT (CASE WHEN doc_id % 2 = 0 THEN 'a:' "
                "ELSE 'b:' END) || CAST(doc_id AS VARCHAR) AS k, "
                "text FROM documents)", cross_side_only=True) + " "
            "SELECT CASE WHEN substr(ka, 1, 2) = 'a:' "
            "THEN substr(ka, 3) ELSE substr(kb, 3) END AS key_a, "
            "CASE WHEN substr(ka, 1, 2) = 'a:' "
            "THEN substr(kb, 3) ELSE substr(ka, 3) END AS key_b, "
            "round(j, 6) AS jaccard FROM vp"
        ),
        "dup_clusters": (
            "WITH RECURSIVE " + _MINHASH_DOC + ", " + _CC_TAIL + " "
            "SELECT u AS doc_id, min(v) AS cluster_id FROM reach "
            "GROUP BY u"
        ),
        "dup_clusters_distributed": (
            "WITH RECURSIVE " + _MINHASH_DOC + ", " + _CC_TAIL + " "
            "SELECT u AS doc_id, min(v) AS cluster_id FROM reach "
            "GROUP BY u"
        ),
        "near_dedup_corpus": (
            "WITH RECURSIVE " + _MINHASH_DOC + ", " + _CC_TAIL + " "
            "SELECT d.doc_id FROM documents d WHERE d.doc_id NOT IN "
            "(SELECT u FROM reach GROUP BY u HAVING min(v) < u)"
        ),
        "simhash": (
            "WITH " + _SIMHASH_CTES + " "
            "SELECT doc_id, simhash FROM sig"
        ),
        "simhash_near_pairs": (
            "WITH " + _SIMHASH_CTES + ", "
            "ch AS (SELECT doc_id, bd.band AS band, "
            "CAST((simhash >> CAST(16 * bd.band AS UTINYINT)) & 65535 "
            "AS BIGINT) AS chunk, simhash FROM sig CROSS JOIN "
            "(SELECT unnest(range(4)) AS band) bd), "
            "bsz AS (SELECT band, chunk, count(*) AS n, "
            "min(doc_id) AS mn FROM ch GROUP BY band, chunk), "
            "praw AS (SELECT DISTINCT a.doc_id AS doc_a, "
            "b.doc_id AS doc_b, CAST(bit_count(xor(a.simhash, "
            "b.simhash)) AS BIGINT) AS hamming "
            "FROM ch a JOIN ch b ON a.band = b.band "
            "AND a.chunk = b.chunk AND a.doc_id < b.doc_id "
            "JOIN bsz z ON z.band = a.band AND z.chunk = a.chunk "
            "WHERE z.n <= 256 OR a.doc_id = z.mn) "
            "SELECT doc_a, doc_b, min(hamming) AS hamming FROM praw "
            "WHERE hamming <= 3 GROUP BY doc_a, doc_b"
        ),
        # langid: trigram-profile argmax (strict >, sorted-lang order)
        # + the RE2-safe quality columns; fingerprint stays blake2b /
        # pytest-covered and is no longer projected by the gate query
        "langid": (
            "WITH t AS (SELECT doc_id, text AS raw, lower(text) AS t "
            "FROM documents), "
            "tri AS (SELECT DISTINCT doc_id, "
            "substr(t, CAST(i AS BIGINT) + 1, 3) AS g FROM "
            "(SELECT doc_id, t, unnest(range(greatest("
            "length(t) - 2, 0))) AS i FROM t)), "
            "prof(lang, g) AS (VALUES ('en', 'the'), ('en', 'he '), ('en', ' th'), ('en', 'ing'), ('en', 'and'), ('en', 'ion'), ('de', 'der'), ('de', 'ein'), ('de', 'sch'), ('de', 'ich'), ('de', 'und'), ('de', 'en '), ('es', 'de '), ('es', 'la '), ('es', 'os '), ('es', 'el '), ('es', 'ión'), ('es', 'que'), ('fr', 'le '), ('fr', 'es '), ('fr', 'de '), ('fr', 'ent'), ('fr', 'que'), ('fr', 'ion')), "
            "m AS (SELECT doc_id, lang, count(*) AS n FROM tri "
            "JOIN prof USING (g) GROUP BY doc_id, lang), "
            "bl AS (SELECT doc_id, lang, row_number() OVER "
            "(PARTITION BY doc_id ORDER BY n DESC, lang) AS r FROM m), "
            "tok AS (SELECT doc_id, regexp_extract_all(t, "
            "'[a-z0-9_]+') AS l FROM t), "
            "st AS (SELECT doc_id, len(list_filter(l, x -> "
            "list_contains(['the','a','of','and','to','in','is','it',"
            "'for','on'], x))) AS ns, len(l) AS n FROM tok) "
            "SELECT d.doc_id, coalesce(bl.lang, 'unknown') "
            "AS lang_pred, "
            "round(st.ns::DOUBLE / greatest(st.n, 1), 6) "
            "AS stop_ratio, "
            "round(length(regexp_replace(d.text, "
            "'[a-zA-Z0-9\\s\\x0b]', '', 'g'))::DOUBLE "
            "/ greatest(length(d.text), 1), 6) AS punct_ratio, "
            "len(regexp_extract_all(d.text, '[^\\s\\x0b]+'))"
            "::BIGINT AS n_tokens_ws, "
            "len(regexp_extract_all(d.text, "
            "'[a-zA-Z0-9_]+|[^a-zA-Z0-9_ \\t\\r\\n\\f\\v]'))"
            "::BIGINT AS n_tokens_bpe "
            "FROM documents d "
            "LEFT JOIN (SELECT doc_id, lang FROM bl WHERE r = 1) bl "
            "ON bl.doc_id = d.doc_id "
            "JOIN st ON st.doc_id = d.doc_id"
        ),
        # count-min sketch replay: global cell sums (the sketch is
        # linear, so per-block partial sums equal these), est = min
        # over depth rows, same (est desc, token asc) top-k tie-break
        "heavy_hitters": (
            "WITH toks AS (SELECT unnest(regexp_extract_all("
            "lower(text), '[a-z0-9_]+')) AS tok FROM documents), "
            "cnt AS (SELECT tok, count(*) AS c FROM toks "
            "GROUP BY tok), "
            "pos AS (SELECT tok, c, dd.d AS d, "
            "CAST(md5_number_lower(tok || '#' || CAST(dd.d AS VARCHAR))"
            "::HUGEINT % 4096 AS BIGINT) AS p FROM cnt CROSS JOIN "
            "(SELECT unnest(range(4)) AS d) dd), "
            "cell AS (SELECT d, p, sum(c) AS s FROM pos "
            "GROUP BY d, p), "
            "est AS (SELECT tok AS token, CAST(min(s) AS BIGINT) "
            "AS est FROM pos JOIN cell USING (d, p) GROUP BY tok) "
            "SELECT token, est FROM est "
            "ORDER BY est DESC, token LIMIT 20"
        ),
        # IVF bucket replay: centroids are the first 8 dataset-order
        # rows (= 8 smallest vec_ids in the sorted parquet), argmax
        # cosine with first-index tie-break
        "ivf_buckets": (
            "WITH c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 "
            "AS cidx, embedding FROM (SELECT vec_id, embedding "
            "FROM embeddings ORDER BY vec_id LIMIT 8)), "
            "sc AS (SELECT e.vec_id, c.cidx, list_cosine_similarity("
            "CAST(e.embedding AS DOUBLE[]), CAST(c.embedding "
            "AS DOUBLE[])) AS cos FROM embeddings e CROSS JOIN c), "
            "b AS (SELECT vec_id, cidx, row_number() OVER "
            "(PARTITION BY vec_id ORDER BY cos DESC, cidx) AS r "
            "FROM sc) "
            "SELECT vec_id, CAST(cidx AS INTEGER) AS ivf_bucket "
            "FROM b WHERE r = 1"
        ),
        # IVF probe search replay: same centroid rule as ivf_buckets,
        # per-query top-3 probe buckets, candidates from probed
        # buckets only (self excluded), cos rounded to 4 decimals
        # BEFORE ranking (the engine's CosineTopK contract), top-5 by
        # (cos desc, vec_id asc)
        "ann_ivf": (
            "WITH c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 "
            "AS cidx, embedding FROM (SELECT vec_id, embedding "
            "FROM embeddings ORDER BY vec_id LIMIT 8)), "
            "q AS (SELECT vec_id AS qid, embedding AS qe "
            "FROM embeddings WHERE vec_id < 3), "
            "probe AS (SELECT qid, cidx FROM ("
            "SELECT q.qid, c.cidx, row_number() OVER "
            "(PARTITION BY q.qid ORDER BY list_cosine_similarity("
            "CAST(c.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[])) "
            "DESC, c.cidx) AS r FROM q CROSS JOIN c) WHERE r <= 3), "
            "assign AS (SELECT vec_id, cidx AS bucket FROM ("
            "SELECT e.vec_id, c.cidx, row_number() OVER "
            "(PARTITION BY e.vec_id ORDER BY list_cosine_similarity("
            "CAST(e.embedding AS DOUBLE[]), CAST(c.embedding "
            "AS DOUBLE[])) DESC, c.cidx) AS r "
            "FROM embeddings e CROSS JOIN c) WHERE r = 1), "
            "cand AS (SELECT q.qid, e.vec_id, "
            "round(list_cosine_similarity(CAST(e.embedding "
            "AS DOUBLE[]), CAST(q.qe AS DOUBLE[])), 4) AS cos "
            "FROM q JOIN assign a ON TRUE "
            "JOIN probe p ON p.qid = q.qid AND p.cidx = a.bucket "
            "JOIN embeddings e ON e.vec_id = a.vec_id "
            "WHERE e.vec_id <> q.qid) "
            "SELECT qid, vec_id, cos FROM (SELECT qid, vec_id, cos, "
            "row_number() OVER (PARTITION BY qid ORDER BY cos DESC, "
            "vec_id) AS r FROM cand) WHERE r <= 5"
        ),
        "mmr_rerank": _mmr_sql(10),
        "embedding_near_pairs_lsh": _lsh_pairs_sql(),
    }
