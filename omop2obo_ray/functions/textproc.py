"""Text preprocessing for the TF-IDF similarity tier.

Faithful to the reference's ``text_preprocessor``
(string_similarity.py:116-147): ascii-fold, collapse whitespace,
stopword-regex removal (the hardcoded NLTK-english list at
string_similarity.py:29-43), lowercase, ``\\w+`` tokenization, optional
lemmatization, and the ``md5(joined tokens)`` key. NLTK is not available
in this environment, so the WordNet lemmatizer is gated behind an
import-try and falls back to identity (the engine-vs-oracle comparison
uses the same fallback on both sides, so parity is preserved).
"""

from __future__ import annotations

import re

from omop2obo_ray.functions.hashing import md5_hex

# hardcoded NLTK english stopword list, as in string_similarity.py:29-43
STOPWORDS = [
    'i', 'me', 'my', 'myself', 'we', 'our', 'ours', 'ourselves', 'you', "you're", "you've",
    "you'll", "you'd", 'your', 'yours', 'yourself', 'yourselves', 'he', 'him', 'his', 'himself',
    'she', "she's", 'her', 'hers', 'herself', 'it', "it's", 'its', 'itself', 'they', 'them',
    'their', 'theirs', 'themselves', 'what', 'which', 'who', 'whom', 'this', 'that', "that'll",
    'these', 'those', 'am', 'is', 'are', 'was', 'were', 'be', 'been', 'being', 'have', 'has',
    'had', 'having', 'do', 'does', 'did', 'doing', 'a', 'an', 'the', 'and', 'but', 'if', 'or',
    'because', 'as', 'until', 'while', 'of', 'at', 'by', 'for', 'with', 'about', 'against',
    'between', 'into', 'through', 'during', 'before', 'after', 'above', 'below', 'to', 'from',
    'up', 'down', 'in', 'out', 'on', 'off', 'over', 'under', 'again', 'further', 'then', 'once',
    'here', 'there', 'when', 'where', 'why', 'how', 'all', 'any', 'both', 'each', 'few', 'more',
    'most', 'other', 'some', 'such', 'no', 'nor', 'not', 'only', 'own', 'same', 'so', 'than',
    'too', 'very', 's', 't', 'can', 'will', 'just', 'don', "don't", 'should', "should've", 'now',
    'd', 'll', 'm', 'o', 're', 've', 'y', 'ain', 'aren', "aren't", 'couldn', "couldn't", 'didn',
    "didn't", 'doesn', "doesn't", 'hadn', "hadn't", 'hasn', "hasn't", 'haven', "haven't", 'isn',
    "isn't", 'ma', 'mightn', "mightn't", 'mustn', "mustn't", 'needn', "needn't", 'shan', "shan't",
    'shouldn', "shouldn't", 'wasn', "wasn't", 'weren', "weren't", 'won', "won't", 'wouldn',
    "wouldn't",
]

_STOP_RE = re.compile(r"\b(" + r"|".join(STOPWORDS) + r")\b\s*")
_WS_RE = re.compile(r"\s+")
_TOKEN_RE = re.compile(r"\w+")


def _get_lemmatizer():
    try:  # pragma: no cover - nltk absent in this environment
        from nltk.stem import WordNetLemmatizer

        lem = WordNetLemmatizer()
        return lem.lemmatize
    except Exception:
        return lambda w: w


_LEMMATIZE = _get_lemmatizer()


def preprocess_tokens(text: str) -> list[str]:
    """ascii-fold → collapse ws → stopword removal → lower → \\w+ tokens
    → lemmatize. Order matches string_similarity.py:134-138 exactly
    (stopword removal runs on the original-case text, then lowercases)."""
    s = _WS_RE.sub(" ", text.encode("ascii", "ignore").decode())
    s = _STOP_RE.sub("", s).lower()
    return [_LEMMATIZE(t) for t in _TOKEN_RE.findall(s)]


def corpus_key(primary_key: str, tokens: list[str]) -> str:
    """``primary_key + '_' + md5(' '.join(tokens))``
    (string_similarity.py:140-143)."""
    return primary_key + "_" + md5_hex(" ".join(tokens))


def sentences(text: str) -> list[str]:
    """Deterministic sentence segmentation used for tier-3 candidate
    generation over page text (the web analogue of the reference scoring
    each clinical string; SURVEY §7.1 step 5)."""
    out = []
    for line in text.split("\n"):
        for seg in re.split(r"(?<=[.!?])\s+", line):
            seg = seg.strip().rstrip(".!?").strip()
            if seg:
                out.append(seg)
    return out
