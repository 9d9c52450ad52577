from gooselite import extract_one
from gooselite.encoding import decode_html, sniff_declared_charset


PAGE = """<!DOCTYPE html>
<html lang="{lang}"><head><meta charset="utf-8">
<title>{title} | s3</title>
<meta name="description" content="desc here">
<meta name="keywords" content="k1, k2">
<link rel="canonical" href="/canon/1">
</head><body>
<div id="navbar"><a href="/">home</a> <a href="/x">x</a> <a href="/y">y</a></div>
<div class="prelude"><p>{sibling}</p></div>
<div class="article-body">
{paras}
</div>
<ul class="related"><li><a href="/1">more stories here now</a></li></ul>
<div id="footer">copyright</div>
</body></html>"""

SIB = "And so it was that the fox and the hound would not be able to agree about it at all."
P1 = "Once upon a time there was a quick brown fox that would not jump over the lazy dog because it was far too dignified for such games."
P2 = "The dog, for his part, did not mind this at all and was happy to sleep in the sun while the fox went about its business."
P3 = "In the end they both agreed that it was better to be friends than to quarrel about who should jump over whom."


def _page(lang="en", title="The quick brown fox story"):
    paras = "\n".join(f"<p>{p}</p>" for p in (P1, P2, P3))
    return PAGE.format(lang=lang, title=title, sibling=SIB, paras=paras)


def test_golden_extraction():
    r = extract_one(_page().encode(), "en", "https://site3.example/en/article/1")
    assert r["status"] == "ok"
    assert r["cleaned_text"] == "\n\n".join([SIB, P1, P2, P3])
    assert r["title"] == "The quick brown fox story"
    assert r["meta_description"] == "desc here"
    assert r["meta_keywords"] == "k1, k2"
    assert r["canonical_link"] == "https://site3.example/canon/1"
    assert r["domain"] == "site3.example"
    assert r["lang"] == "en"


def test_null_html_is_empty_status():
    r = extract_one(None, "en", "https://x.example/1")
    assert r["status"] == "empty"
    assert r["cleaned_text"] == ""
    assert r["bytes_in"] == 0


def test_lang_column_primary_meta_fallback():
    # lang column unsupported (zh) + html lang=de → meta fallback applies
    r = extract_one(_page(lang="de").encode(), "zh", "https://x.example/1")
    assert r["lang"] == "de"
    # lang column present and supported → wins over meta
    r = extract_one(_page(lang="de").encode(), "en", "https://x.example/1")
    assert r["lang"] == "en"
    # neither → 'en'
    r = extract_one(_page(lang="xx").encode(), None, "https://x.example/1")
    assert r["lang"] == "en"


def test_latin1_with_meta_charset():
    html = _page().replace('charset="utf-8"', 'charset="iso-8859-1"')
    html = html.replace("lazy dog", "lazy caf\xe9 dog")
    raw = html.encode("iso-8859-1")
    assert sniff_declared_charset(raw) == "iso-8859-1"
    r = extract_one(raw, "en", "https://x.example/1")
    assert r["status"] == "ok"
    assert "caf\xe9" in r["cleaned_text"]


def test_decode_utf8_bom():
    text, enc = decode_html(b"\xef\xbb\xbf<p>hi</p>")
    assert enc == "utf-8-sig" and text == "<p>hi</p>"


def test_truncated_html_yields_empty_not_crash():
    raw = _page().encode()[:180]  # head only, article lost
    r = extract_one(raw, "en", "https://x.example/1")
    assert r["status"] == "empty"
    assert r["cleaned_text"] == ""


def test_idempotence_reextract_stable():
    """Re-extracting the <p>-wrapped output is stable (SURVEY.md §5.2)."""
    first = extract_one(_page().encode(), "en", "https://x.example/1")
    rewrapped = "<html><body><div class='b'>%s</div></body></html>" % "".join(
        f"<p>{p}</p>" for p in first["cleaned_text"].split("\n\n")
    )
    second = extract_one(rewrapped.encode(), "en", "https://x.example/1")
    assert second["cleaned_text"] == first["cleaned_text"]


def test_german_page_uses_de_table():
    sib = "und der die das ist nicht eine von dem auch so wie wir hier sind"
    p1 = "und der die das ist nicht eine von dem auch so haben wir alles gesehen was hier steht"
    p2 = "das ist auch nicht so schlecht denn wir haben eine menge zeit und viel geduld mitgebracht"
    p3 = "am ende sind wir alle nur menschen und das ist auch gut so denn anders geht es nicht"
    page = PAGE.format(lang="de", title="Die schnelle braune katze", sibling=sib,
                       paras="\n".join(f"<p>{p}</p>" for p in (p1, p2, p3)))
    r = extract_one(page.encode(), "de", "https://x.example/de/1")
    assert r["status"] == "ok"
    assert r["lang"] == "de"
    assert r["cleaned_text"] == "\n\n".join([sib, p1, p2, p3])
