"""Text operators vs reference semantics (utils/text.py; contrib/seo.py)."""

import math

import pytest

from kryptone_ray.text import ops, seo


def test_parse_price():
    # utils/text.py:20-45 doctest cases
    assert ops.parse_price("4,4 €") == 4.4
    assert ops.parse_price("4€4") == 4.4
    assert ops.parse_price(10) == 10
    assert ops.parse_price(None) is None
    assert ops.parse_price("12,99") == 12.99


def test_clean_text_and_spaces():
    assert ops.clean_text("a\nb\tc") == "a b c"
    assert ops.normalize_spaces("a   b  c") == "a b c"
    assert ops.clean_text(5) == 5  # non-str passthrough


def test_text_class():
    t = ops.Text(" Hello,  World! ", punctuation=True)
    assert str(t) == "hello world"
    assert t.tokens == ["hello", "world"]
    t2 = ops.Text("Café", accents=True)
    assert str(t2) == "cafe"


def test_remove_punctuation_email_exception():
    assert ops.remove_punctuation("a.b@c.d!", email_exception=True) == "ab@cd"
    assert ops.remove_punctuation("a.b@c.d!") == "abcd"
    assert ops.remove_punctuation("a-b", keep=["-"]) == "a-b"


def test_slugify():
    assert ops.slugify("My Téxt") == "my-text"
    with pytest.raises(ValueError):
        ops.slugify(123)


def test_clean_dictionary():
    assert ops.clean_dictionary(None) == {}
    assert ops.clean_dictionary({"name": " Kendall\n"}) == {"name": "Kendall"}
    assert ops.clean_dictionary([{"a": "x "}]) == [{"a": "x"}]
    with pytest.raises(ValueError):
        ops.clean_dictionary("nope")


def test_fit_strips_parens_brackets_accents():
    # contrib/seo.py:293-318
    out = ops.fit("Crème (en) [ref] brûlée!")
    assert "(" not in out and "[" not in out
    assert "Creme" in out and "brulee" in out


def test_tokenize_drops_stopwords_and_long_tokens():
    toks = ops.tokenize("the quick café and le chat " + "x" * 40)
    assert "the" not in toks and "le" not in toks
    assert "quick" in toks and "cafe" in toks
    assert all(len(t) <= 30 for t in toks)


def test_extract_emails():
    assert ops.extract_emails("contact contact@example.fr now") == ["contact@example.fr"]
    assert seo.extract_page_emails("a@b.c a@b.c") == {"a@b.c"}


def test_quality_stats():
    q = ops.quality_stats("The quick fox! And the dog.")
    assert q["n_tokens"] == 6
    assert 0 < q["punct_ratio"] < 0.2
    assert q["stop_ratio"] > 0.2
    assert ops.quality_stats("")["n_chars"] == 0


def test_lang_id():
    assert ops.lang_id("the cat and the dog is that it") == "en"
    assert ops.lang_id("le chat et la maison que je vois") == "fr"
    assert ops.lang_id("der hund und die katze ist nicht da") == "de"
    assert ops.lang_id("zzz qqq") == "und"


def test_rolling_fingerprint_deterministic():
    a = ops.rolling_fingerprint("hello world document")
    assert a == ops.rolling_fingerprint("hello world document")
    # distinct inputs give distinct min-hashes (different content windows)
    assert a != ops.rolling_fingerprint("completely different text here")
    assert ops.rolling_fingerprint("ab") >= 0  # shorter than window


def test_tfidf_reference_semantics():
    # seo.py:56-121 — tf = count/len; idf = ln(n/(1+df))
    docs = ["a b a", "b c", "a c c"]
    p = seo.TFIDFProcessor(docs)
    tf = p._calculate_tf("a b a")
    assert tf == {"a": 2 / 3, "b": 1 / 3}
    idf = p._calculate_idf()
    assert idf["a"] == pytest.approx(math.log(3 / (1 + 2)))
    assert idf["b"] == pytest.approx(math.log(3 / (1 + 2)))
    scores = p.compute_tfidf()
    assert scores[0]["a"] == pytest.approx(tf["a"] * idf["a"])
    top = p.filter_tokens_by_tfidf(0, top_n=1)
    assert len(top) == 1


def test_word_frequency_top10():
    tokens = ["a"] * 5 + ["b"] * 3 + ["c"]
    out = seo.calculate_word_frequency(tokens)
    assert out[0] == ("a", 5)
    assert out[1] == ("b", 3)


def test_stemmer():
    assert seo.stem("programmation", "french") == "programm"
    assert seo.stem("jumping", "english") == "jump"
    assert seo.create_stemmed_words(["nations"], "english") == ["nation"]
    assert seo.stem("le", "french") == "le"  # too short to strip


def test_pluggable_text_processors_protocol():
    """run_processors (contrib/seo.py:245-254): predicate chain filters
    sequentially, skips non-callables; tokenize accepts a custom chain."""
    from kryptone_ray.text import ops

    toks = ["alpha", "beta", "x" * 40, "gamma"]
    assert ops.run_processors(toks) == ["alpha", "beta", "gamma"]
    # custom chain: drop vowel-starting, then len>4
    chain = [lambda t: not t[0] in "aeiou", "not-callable", lambda t: len(t) > 4]
    assert ops.run_processors(toks, chain) == ["x" * 40, "gamma"]

    out = ops.tokenize("alpha beta gamma delta",
                       text_processors=[lambda t: t.startswith("g")])
    assert out == ["gamma"]
    # default chain still applies the 30-char cap
    assert ops.tokenize("word " + "y" * 35) == ["word"]
