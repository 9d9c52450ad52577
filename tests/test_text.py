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
    assert resolve_language("zh") == "zh"  # segmentation variant (r3)
    assert resolve_language("ja") == "ja"  # segmentation variant (r3)
    assert resolve_language("th") == "th"  # segmentation variant (r3)
    assert resolve_language("vi") == "vi"  # space-delimited table (r4)
    assert resolve_language("he") == "he"  # space-delimited table (r4)
    assert resolve_language("yi") == "en"  # no table → fallback
    assert resolve_language(None) == "en"
    assert resolve_language("") == "en"


def test_empty_text():
    ws = get_stopword_count("", "en")
    assert ws.word_count == 0 and ws.stop_word_count == 0


# --- Segmentation variants (A8: zh / ko / ar, r3) -----------------------

def test_zh_greedy_max_match():
    # 没有 is one table entry — greedy max-match counts it once, not 没+有
    ws = get_stopword_count("没有人知道这个故事的结局", "zh")
    assert ws.stop_words == ["没有", "人", "知道", "这个", "的"]
    assert ws.stop_word_count == 5
    # word_count = CJK chars (12) for a pure-CJK run
    assert ws.word_count == 12


def test_zh_mixed_script():
    # latin spans tokenize by whitespace; CJK runs segment independently
    ws = get_stopword_count("spark 是一个 engine 的框架", "zh")
    assert "是" in ws.stop_words and "一个" in ws.stop_words and "的" in ws.stop_words
    assert ws.stop_word_count == 3


def test_ko_substring_particles():
    # particles agglutinate: 에서/를 occur INSIDE the tokens
    ws = get_stopword_count("학교에서 공부를 했다", "ko")
    assert ws.stop_word_count == 3


def test_ar_diacritics_stripped():
    # هَذَا matches table entry هذا after harakat strip; مِنْ matches من
    ws = get_stopword_count("هَذَا كتاب مِنْ المكتبة", "ar")
    assert ws.stop_word_count == 2


def test_ja_kana_kanji_max_match():
    # particles ride inside one kana+kanji run; これ/は/の/です are table
    # entries, greedy max-match finds them without a lexicon
    ws = get_stopword_count("これは日本語のテストです", "ja")
    assert "これ" in ws.stop_words and "は" in ws.stop_words
    assert "の" in ws.stop_words and "です" in ws.stop_words
    assert ws.stop_word_count >= 4
    # word_count = run chars for a pure-Japanese run
    assert ws.word_count == 12


def test_ja_mixed_script():
    ws = get_stopword_count("spark は高速な engine です", "ja")
    assert "は" in ws.stop_words and "です" in ws.stop_words
    assert ws.stop_word_count >= 3  # は + な + です


def test_th_max_match():
    # ที่/การ/ใน/เรา/ใช้ are table entries inside unspaced Thai runs
    ws = get_stopword_count("นี่คือการทดสอบที่เราใช้ในงาน", "th")
    assert "การ" in ws.stop_words and "ที่" in ws.stop_words
    assert "ใน" in ws.stop_words
    assert ws.stop_word_count >= 4


def test_variant_fast_path_agrees():
    from gooselite.text import stopword_count_fast
    for lang, text in (("zh", "没有人知道这个故事的结局"),
                       ("ko", "학교에서 공부를 했다"),
                       ("ar", "هَذَا كتاب مِنْ المكتبة"),
                       ("ja", "これは日本語のテストです"),
                       ("th", "นี่คือการทดสอบที่เราใช้ในงาน")):
        assert (stopword_count_fast(text, lang)
                == get_stopword_count(text, lang).stop_word_count)


def test_fewwords_additive_equals_concat_counts():
    """The formatter's additive fast path must make the same decisions
    as the canonical concatenate-then-count form: differential check on
    the fixture corpus (non-segmenting langs route additive, zh/ja/th/
    ko/ar route concat — both paths must emit identical bytes)."""
    import pyarrow.parquet as pq

    from gooselite import extract_one
    from gooselite import formatter as FM
    from goose_spark.fixtures import ensure_pages

    pages_path, _ = ensure_pages("/root/testdata/sf0.001")
    rows = pq.read_table(pages_path).to_pylist()[:120]

    baseline = [extract_one(r["html"], r["lang"], r["url"])["cleaned_text"]
                for r in rows]

    orig = FM.count_is_additive
    FM.count_is_additive = lambda lang: False  # force the concat path
    try:
        concat = [extract_one(r["html"], r["lang"], r["url"])["cleaned_text"]
                  for r in rows]
    finally:
        FM.count_is_additive = orig
    assert baseline == concat
