"""omop2obo_ray — a Ray-Data-native knowledge-graph construction engine.

Brand-new engine (NOT a port) with the query and data-processing
capabilities of ``callahantiff/OMOP2OBO``'s multi-tier lexical mapping
algorithm, re-hosted as streaming ``ray.data.Dataset`` pipelines over
Common-Crawl-style Parquet pages ``(url, warc_ts, html, text, lang)``.

Tiers (reference semantics, re-expressed Ray-Data-first):
  1. exact label/synonym string match   (clinical_concept_annotator.py:310-328)
  2. dbxref / cross-vocabulary (UMLS-style) alias joins
                                        (clinical_concept_annotator.py:205-277)
  3. TF-IDF cosine similarity scoring   (string_similarity.py:230-289)
  4. ancestor-closure expansion         (clinical_concept_annotator.py:348-363)
followed by per-subject evidence aggregation + category assignment
(data_utils.py:551-622, :518-548) and (subj, pred, obj) triple
materialization sorted/partitioned by subject hash.
"""

from omop2obo_ray.config import PipelineConfig

__version__ = "0.1.0"

__all__ = ["PipelineConfig", "__version__"]
