"""SEO / corpus-analysis operators — reference parity for
``/root/reference/kryptone/contrib/seo.py``: the ``TFIDFProcessor``
(:56-203), word frequency (:407-421), stemming (:423-429) and email
extraction (:587-643), each with its reference-exact small-scale form
plus the distributed shape used by ``pipelines/textops.py``.
"""

from __future__ import annotations

import re
from collections import Counter
from math import log

from kryptone_ray.text import ops


class TFIDFProcessor:
    """seo.py:56-203 — reference-exact semantics: per-document
    ``tf = count/len(doc)``, ``idf = ln(n_docs / (1 + df))``, per-doc
    tf-idf dicts, threshold/top-n filtering.

    This is the oracle-grade single-process form; the distributed
    two-pass (partial term counts + df, broadcast idf) lives in
    ``pipelines/textops.q_tfidf_top_terms``.
    """

    def __init__(self, documents=None):
        self.documents = list(documents) if documents else []
        self.vocabulary: set[str] = set()
        self.idf_values: dict[str, float] = {}

    def add_documents(self, documents):
        if isinstance(documents, str):
            self.documents.append(documents)
        else:
            self.documents.extend(documents)

    @staticmethod
    def _tokens(document):
        if isinstance(document, str):
            return document.lower().split()
        return [t.lower() for t in document]

    def _calculate_tf(self, document) -> dict[str, float]:
        tokens = self._tokens(document)
        counts = Counter(tokens)
        total = len(tokens)
        return {term: count / total for term, count in counts.items()}

    def _calculate_idf(self) -> dict[str, float]:
        n_docs = len(self.documents)
        df = Counter()
        for document in self.documents:
            for term in set(self._tokens(document)):
                df[term] += 1
                self.vocabulary.add(term)
        self.idf_values = {t: log(n_docs / (1 + f)) for t, f in df.items()}
        return self.idf_values

    def compute_tfidf(self) -> list[dict[str, float]]:
        if not self.idf_values:
            self._calculate_idf()
        out = []
        for document in self.documents:
            tf = self._calculate_tf(document)
            out.append({t: v * self.idf_values.get(t, 0) for t, v in tf.items()})
        return out

    def filter_tokens_by_tfidf(self, document_idx: int, top_n: int | None = None,
                               threshold: float | None = None) -> list[str]:
        """seo.py:130-203 — keep a document's tokens by score threshold
        or the top-n highest-scoring."""
        scores = self.compute_tfidf()[document_idx]
        items = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        if threshold is not None:
            items = [(t, s) for t, s in items if s >= threshold]
        if top_n is not None:
            items = items[:top_n]
        return [t for t, _ in items]

    def get_top_terms(self, top_n: int = 10) -> list[str]:
        totals: Counter = Counter()
        for doc_scores in self.compute_tfidf():
            totals.update(doc_scores)
        return [t for t, _ in sorted(totals.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]]


def calculate_word_frequency(tokens) -> list[tuple[str, int]]:
    """seo.py:407-421 — frequency distribution → top-10 sorted desc
    (FreqDist replaced by Counter; identical outcome)."""
    freq = Counter(tokens)
    return sorted(freq.items(), key=lambda kv: kv[1], reverse=True)[:10]


# --- stemming (seo.py:423-429 used Snowball-French via nltk, absent
# here) — a pinned lightweight suffix-stripper for both languages; the
# mechanism (stateful stemmer applied per token batch) is the parity
# point, the exact stem table is pluggable.
_FR_SUFFIXES = ("issements", "issement", "atrices", "ations", "ateurs", "ements",
                "atrice", "ation", "ateur", "ement", "euses", "ances", "iques",
                "ables", "istes", "ance", "ique", "able", "iste", "euse",
                "ives", "ment", "ives", "ité", "ifs", "ive", "es", "s", "e")
_EN_SUFFIXES = ("ational", "fulness", "ousness", "iveness", "tional", "biliti",
                "ization", "ations", "ingly", "ation", "ness", "ment", "ing",
                "edly", "tion", "ies", "ful", "ed", "ly", "es", "s")


def stem(word: str, language: str = "french") -> str:
    table = _FR_SUFFIXES if language == "french" else _EN_SUFFIXES
    for suf in table:
        if word.endswith(suf) and len(word) - len(suf) >= 3:
            return word[: -len(suf)]
    return word


def create_stemmed_words(tokens, language: str = "french") -> list[str]:
    return [stem(t, language) for t in tokens]


class StemmerActor:
    """Stateful ``map_batches`` stage (suffix tables bound at init)."""

    def __init__(self, language: str = "french", column: str = "text"):
        self.language = language
        self.column = column

    def __call__(self, df):
        df["stemmed"] = df[self.column].map(
            lambda t: " ".join(create_stemmed_words(t.lower().split(), self.language))
        )
        return df


def extract_page_emails(text: str) -> set[str]:
    """seo.py:587-643 ``EmailMixin`` — regex + set-union dedup."""
    return set(ops.extract_emails(text))
