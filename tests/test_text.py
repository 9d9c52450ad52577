from gooselite.text import get_stopword_count, inner_trim, resolve_language


def test_inner_trim_collapses_all_whitespace():
    assert inner_trim("  a \t b\n\nc\xa0d  ") == "a b c d"
    assert inner_trim("") == ""
    assert inner_trim("\n \t") == ""


def test_stopword_count_en():
    ws = get_stopword_count("the quick brown fox is in the barn", "en")
    assert ws.stop_word_count == 4  # the, is, in, the
    assert ws.word_count == 8
    assert ws.stop_words == ["the", "is", "in", "the"]


def test_stopword_count_punctuation_stripped():
    ws = get_stopword_count("The, quick. fox! is: here?", "en")
    assert "the" in [w.lower() for w in ws.stop_words]
    assert ws.stop_word_count == 3  # the, is, here... 'here' is in table


def test_stopword_count_lang_tables_differ():
    de = get_stopword_count("und der die das hund", "de")
    en = get_stopword_count("und der die das hund", "en")
    assert de.stop_word_count == 4
    assert en.stop_word_count == 0


def test_resolve_language():
    assert resolve_language("en") == "en"
    assert resolve_language("de-DE") == "de"
    assert resolve_language("zh") == "en"  # no CJK table → fallback
    assert resolve_language(None) == "en"
    assert resolve_language("") == "en"


def test_empty_text():
    ws = get_stopword_count("", "en")
    assert ws.word_count == 0 and ws.stop_word_count == 0
