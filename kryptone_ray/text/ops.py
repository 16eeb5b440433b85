"""Scalar + vectorized text operators — reference parity for
``/root/reference/kryptone/utils/text.py`` and the caption/SEO text
pipeline (``contrib/seo.py:256-318``).

Each scalar has a batch variant suitable for a ``map_batches`` body
(pandas ``str`` methods or a tight per-batch loop). The stopword lists
replace the reference's nltk downloads (``contrib/seo.py:265-275``) with
pinned in-repo sets (no network in a worker, ever — loading happens at
import / actor-init time).
"""

from __future__ import annotations

import re
import string
import unicodedata

import numpy as np

PRICE = re.compile(r"(\d+\,?\d+)")
PRICE_EURO = re.compile(r"\d+\€\d+")
EMAIL_REGEX = re.compile(r"\S+\@\S+")  # contrib/seo.py:28
PAREN = re.compile(r"\([^)]*\)")
BRACKET = re.compile(r"\[[^]]*\]")
NON_WORD = re.compile(r"[^\w\s]")
TOKEN = re.compile(r"[a-z0-9]+(?:'[a-z]+)?", re.IGNORECASE)  # BPE-ish word split

# Compact pinned stopword sets standing in for nltk's french ∪ english
# lists (contrib/seo.py:279-285). Coverage of the most frequent function
# words is what matters for the ratio features, not list completeness.
STOP_EN = frozenset(
    "the a an and or of to in is are was were be been being on for with as at by "
    "it its this that these those from but not no so if then than too very can "
    "will just do does did done have has had he she they we you i me my your "
    "his her their our us them what which who whom where when why how all any "
    "both each few more most other some such only own same s t don should now".split()
)
STOP_FR = frozenset(
    "le la les un une des du de d l au aux et ou où mais donc or ni car ne pas "
    "plus moins très peu je tu il elle on nous vous ils elles me te se y en ce "
    "cet cette ces mon ton son ma ta sa mes tes ses notre votre leur nos vos "
    "leurs que qui quoi dont est sont était étaient être avoir a ont avait "
    "pour dans par sur sous avec sans chez entre vers comme si alors aussi "
    "bien mal tout tous toute toutes autre autres même aujourd hui".split()
)
STOPWORDS = STOP_EN | STOP_FR


def parse_price(text):
    """utils/text.py:20-45 — '4,4 €' → 4.4; '4€4' → 4.4."""
    if isinstance(text, (int, float)):
        return text
    if text is None:
        return None
    if PRICE_EURO.match(text):
        price = text.replace("€", ".")
    else:
        m = PRICE.search(text)
        price = m.group(0) if m else text
    return float(price.replace(",", "."))


def normalize_spaces(text_or_tokens) -> str:
    """utils/text.py:145-152 — collapse whitespace runs."""
    tokens = text_or_tokens.split(" ") if isinstance(text_or_tokens, str) else text_or_tokens
    return " ".join(t for t in tokens if t)


def clean_text(text, encoding: str = "utf-8"):
    """utils/text.py:48-56 — newline/tab→space, NFKD, space squeeze."""
    if not isinstance(text, str):
        return text
    text = text.replace("\n", " ").replace("\t", " ")
    text = unicodedata.normalize("NFKD", text)
    return normalize_spaces(text)


class Text:
    """utils/text.py:59-93 — normalized text wrapper: str() lowers the
    cleaned text, optionally stripping punctuation and accents; iterates
    whitespace tokens."""

    def __init__(self, text, punctuation: bool = False, accents: bool = False):
        self.raw_text = text
        self.punctuation = punctuation
        self.accents = accents

    def __str__(self) -> str:
        out = clean_text(self.raw_text).lower()
        if self.punctuation:
            out = remove_punctuation(out)
        if self.accents:
            out = remove_accents(out)
        return out

    def __add__(self, obj) -> str:
        return " ".join([str(self), str(obj)])

    def __len__(self) -> int:
        return len(str(self))

    @property
    def tokens(self) -> list[str]:
        return str(self).split(" ")

    def __iter__(self):
        return iter(self.tokens)


def remove_punctuation(text: str, keep=(), email_exception: bool = False) -> str:
    """utils/text.py:96-108 — str.translate drop of punctuation with a
    keep-list and an '@' exception for emails."""
    punct = string.punctuation
    for v in keep:
        punct = punct.replace(v, "")
    if email_exception:
        punct = punct.replace("@", "")
    return text.translate(str.maketrans("", "", punct))


def remove_accents(text: str) -> str:
    """utils/text.py:111-113 used unidecode; NFKD-strip is the pinned
    dependency-free equivalent for latin scripts."""
    return unicodedata.normalize("NFKD", text).encode("ascii", "ignore").decode("ascii")


def slugify(text: str) -> str:
    """utils/text.py:155-163."""
    if not isinstance(text, str):
        raise ValueError(f"Value should be a text. Got: {type(text)}")
    return remove_accents(text.replace(" ", "-").lower())


def clean_dictionary(item, accents: bool = False, punctuation: bool = False):
    """utils/text.py:116-142 — recursive cleaning of dict/list string
    values (reference name: clean_dictionnary)."""
    if item is None:
        return {}
    if isinstance(item, list):
        return [clean_dictionary(x, accents, punctuation) for x in item]
    if not isinstance(item, dict):
        raise ValueError("Object to clean should a dictionnary")
    out = {}
    for key, value in item.items():
        if isinstance(value, str):
            if accents:
                value = remove_accents(value)
            if punctuation:
                value = remove_punctuation(value)
            out[key] = clean_text(value)
        else:
            out[key] = value
    return out


def fit(raw_text, keep_emails: bool = False):
    """contrib/seo.py:293-318 ``TextMixin.fit`` — strip (…)/[…] spans,
    NFKD→ASCII, punctuation (keeping '@' per the email exception), then
    non-word chars → space."""
    if raw_text is None:
        return None
    t = PAREN.sub("", raw_text)
    t = BRACKET.sub("", t)
    t = unicodedata.normalize("NFKD", t).encode("ascii", "ignore").decode("utf-8")
    t = remove_punctuation(t, keep=["@"], email_exception=keep_emails)
    return NON_WORD.sub(" ", t)


def long_text_processor(token: str) -> bool:
    """contrib/seo.py:31-36 — the default text processor: keep tokens of
    at most 30 characters."""
    return len(token) <= 30


def run_processors(tokens, processors=(long_text_processor,)) -> list[str]:
    """contrib/seo.py:245-254 ``TextMixin.run_processors`` — each
    processor is a FILTER PREDICATE applied sequentially to the
    surviving tokens; non-callables are skipped. This is the pluggable
    ``text_processors`` protocol: subclass/pipeline code passes its own
    predicate list and the tokenize chain applies them verbatim."""
    result = list(tokens)
    for proc in processors:
        if not callable(proc):
            continue
        result = [t for t in result if proc(t)]
    return result


def tokenize(text: str, drop_stopwords: bool = True,
             text_processors=None) -> list[str]:
    """contrib/seo.py:256-291 ``fit_transform`` equivalent: normalize via
    ``fit``, lowercase, regex word-split (replacing nltk word_tokenize),
    drop fr∪en stopwords, then run the ``text_processors`` predicate
    chain (default: ``long_text_processor`` — drop tokens > 30 chars,
    contrib/seo.py:31-36,230)."""
    t = fit(text)
    if t is None:
        return []
    toks = TOKEN.findall(t.lower())
    if drop_stopwords:
        toks = [t for t in toks if t not in STOPWORDS]
    return run_processors(
        toks,
        (long_text_processor,) if text_processors is None else text_processors,
    )


def extract_emails(text: str) -> list[str]:
    """contrib/seo.py:587-643 ``EmailMixin`` — regex extraction."""
    if not text:
        return []
    return EMAIL_REGEX.findall(text)


# --- analysis scalars (training-data ops) -----------------------------


def quality_stats(text: str) -> dict:
    """Length / punctuation / stopword-ratio quality features."""
    n = len(text)
    if n == 0:
        return {"n_chars": 0, "punct_ratio": 0.0, "stop_ratio": 0.0, "n_tokens": 0}
    punct = sum(1 for c in text if c in string.punctuation)
    toks = TOKEN.findall(text.lower())
    stops = sum(1 for t in toks if t in STOPWORDS)
    return {
        "n_chars": n,
        "punct_ratio": punct / n,
        "stop_ratio": stops / len(toks) if toks else 0.0,
        "n_tokens": len(toks),
    }


def rolling_fingerprint(text: str, window: int = 8, mod: int = 1 << 61) -> int:
    """Deterministic document fingerprint: min-of-rolling-polynomial-hash
    over byte windows (Rabin-Karp style, public technique)."""
    data = text.encode("utf-8")
    if len(data) < window:
        data = data + b"\x00" * (window - len(data))
    B = 257
    BW = pow(B, window - 1, mod)
    h = 0
    for c in data[:window]:
        h = (h * B + c) % mod
    best = h
    for i in range(window, len(data)):
        h = ((h - data[i - window] * BW) * B + data[i]) % mod
        if h < best:
            best = h
    return best


_LANG_MARKERS = {
    # tiny n-gram/function-word heuristic — deterministic, SQL-mirrorable
    "fr": ("le ", " la ", " les ", " et ", " une ", " des ", " que "),
    "es": (" el ", " los ", " y ", " una ", " que ", " por ", " con "),
    "de": (" der ", " die ", " das ", " und ", " ein ", " nicht ", " ist "),
    "en": (" the ", " and ", " of ", " to ", " is ", " that ", " it "),
}


def lang_id(text: str) -> str:
    """Heuristic language ID by function-word hit counts; 'und' when no
    marker fires."""
    padded = " " + text.lower() + " "
    best_lang, best_hits = "und", 0
    for lang, markers in _LANG_MARKERS.items():
        hits = sum(padded.count(m) for m in markers)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang
