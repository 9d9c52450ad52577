"""Deterministic `pages` + `expected` fixture synthesis (FIXTURES.md §1–§2).

Derives a Common-Crawl-style ``pages`` table (BASELINE.json:15 shape) from
the driver's ``documents.parquet`` seed corpus — no external data, no RNG
(all variation is doc_id arithmetic, seed-42 convention TESTDATA.md:5).

The template is built so the correct extraction is derivable BY
CONSTRUCTION (SURVEY.md §5.2): article paragraphs carry a per-language
stopword prefix clearing every scoring threshold with margin; boilerplate
wrappers use ids/classes from the cleaner blacklist AND are link-dense;
the prelude sibling paragraph clears the absorption baseline. The golden
``expected_text`` is therefore the prelude + paragraphs joined '\n\n'.

Provenance rule (FIXTURES.md §2): these goldens prove pipeline correctness
by construction; TRUE byte-identity to node-goose needs the reference's
own fixture pairs, absent at build time (/root/reference empty,
SURVEY.md §0.1).
"""

from __future__ import annotations

import html as html_mod
import os
from datetime import datetime, timedelta, timezone

from urllib.parse import urljoin

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from gooselite.stopwords_data import STOPWORDS

EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)

# Bump when the template or stopword tables change: the /tmp cache key
# includes it, so stale fixtures regenerate instead of mismatching code.
FIXTURE_VERSION = 14  # v14: attribute-scored body-image pages (A17 offline)

# Languages cycled onto a deterministic share of docs so fixtures exercise
# every shipped stopword table (VERDICT r1 item 3), beyond the seed
# corpus's en/fr/es/de/zh. 'nb'/'no' share one table; both codes appear.
# ko/ar/ja/th exercise the segmentation variants (r3); zh rides the seed
# corpus; vi/he (and late-r4 hi/bn/tr/el) are space-delimited additions.
_SPREAD_LANGS = ("da", "fi", "hu", "id", "it", "nb", "nl", "no", "pl",
                 "pt", "ru", "sv", "ko", "ar", "ja", "th", "vi", "he",
                 "hi", "bn", "tr", "el", "fa", "uk", "cs", "ro")

# first 8 purely-alphabetic stopwords per language (sorted order) — the
# paragraph prefix guaranteeing stopword_count >= 6 in every paragraph
_PREFIX: dict[str, list[str]] = {
    lang: sorted(w for w in table if w.isalpha())[:8]
    for lang, table in STOPWORDS.items()
}

_LINKY = (
    '<a href="/h">home page</a> <a href="/n">news now</a> '
    '<a href="/t">top list</a> <a href="/m">more links</a>'
)

_HEAD = (
    "<!DOCTYPE html>\n"
    '<html lang="{lang}"><head><meta charset="{charset}">\n'
    "<title>{title_tag} | s{site}</title>\n"
    "{og_title}"
    "{publish_meta}"
    "{author_meta}"
    "{image_meta}"
    '<meta name="description" content="{desc}">\n'
    '<meta name="keywords" content="{keywords}">\n'
    '<link rel="canonical" href="{canonical}">\n'
    "</head><body>\n"
)

_BOILER = (
    '<div id="navbar">{linky}</div>\n'
    '<div class="sidebar">{linky}</div>\n'
    "<script>var tracker = 1; function f(a,b) {{ return a<b; }}</script>\n"
    "<style>.x {{ color: red; }}</style>\n"
    "<!-- rendered by generator -->\n"
)

_TAIL = (
    '<ul class="read-next"><li><a href="/r1">more stories</a></li>'
    '<li><a href="/r2">other tales</a></li></ul>\n'
    '<div id="footer">{linky} copyright</div>\n'
    "</body></html>\n"
)


def _effective_lang(doc_lang: str | None) -> str:
    if doc_lang and doc_lang.strip().lower()[:2] in STOPWORDS:
        return doc_lang.strip().lower()[:2]
    return "en"


def _sentences(words: list[str]):
    """Endless deterministic sentence stream from the doc's word pool."""
    i = 0
    n = len(words)
    while True:
        chunk = [words[(i + j) % n] for j in range(8)]
        i += 8
        yield " ".join(chunk) + "."


def _build_doc(doc_id: int, text: str, lang: str | None) -> dict:
    eff = _effective_lang(lang)
    prefix_words = _PREFIX[eff]
    words = text.split() or ["word"]
    title = " ".join(words[:6])

    # deterministic log-uniform target size 2KB..200KB, plus skew tail
    r = ((doc_id * 2654435761) % 1000) / 1000.0
    target = int(2048 * (100.0 ** r))
    if doc_id % 250 == 0:
        target = (5 + (doc_id // 250) % 16) * 1024 * 1024  # 5..20 MB

    sent = _sentences(words)
    paras: list[str] = []
    total = 0
    n_sent = 3 + (doc_id % 5)  # 3..7 sentences per para
    while total < target or len(paras) < 3:
        prefix = " ".join(prefix_words[(len(paras) + k) % 8] for k in range(6))
        body = " ".join(next(sent) for _ in range(n_sent))
        para = f"{prefix} {body}"
        if doc_id % 50 == 29 and not paras:  # latin-1 row: accented word
            para = "caf\xe9 " + para
        paras.append(para)
        total += len(para) + 7  # + <p></p>\n overhead

    sibling = " ".join(prefix_words[k % 8] for k in range(12)) + " " + next(sent)
    return {"title": title, "paras": paras, "sibling": sibling, "eff": eff}


def _render(doc_id: int, built: dict, page_lang_attr: str, charset: str,
            og_title: bool = False, publish_date: str | None = None,
            movies: list[str] | None = None,
            image: str | None = None,
            authors: list[str] | None = None,
            body_images: str = "") -> str:
    site = doc_id % 40
    # og:title pages carry a boilerplate <title> the extractor must NOT
    # pick (A4: og:title wins)
    title_tag = "untitled document page" if og_title else built["title"]
    # html.escape(quote=True) on every attribute interpolation: a corpus
    # word containing `"` or `&` would otherwise truncate the attribute
    # and silently shift the golden expectations (ADVICE r2). The parser
    # entity-decodes attribute values, so goldens are unaffected for
    # quote-free corpora and now CORRECT for quote-bearing ones.
    esc = lambda s: html_mod.escape(str(s), quote=True)
    # Element-text interpolation needs the same care (quote=False is
    # enough outside attributes): a title token containing '&' or '<'
    # would otherwise desync the rendered page from expected_title.
    # The parser entity-decodes text nodes, so goldens round-trip.
    title_tag = html_mod.escape(title_tag, quote=False)
    og = (f'<meta property="og:title" content="{esc(built["title"])}">\n'
          if og_title else "")
    pub = (f'<meta property="article:published_time" content="{esc(publish_date)}">\n'
           if publish_date else "")
    auth = "".join(f'<meta name="author" content="{esc(a)}">\n'
                   for a in (authors or []))
    # ~half of image pages declare og:image, the rest twitter:image —
    # exercises both meta schemas; relative path exercises urljoin
    if image is None:
        img = ""
    elif doc_id % 2 == 0:
        img = f'<meta property="og:image" content="{esc(image)}">\n'
    else:
        img = f'<meta name="twitter:image" content="{esc(image)}">\n'
    head = _HEAD.format(
        lang=page_lang_attr, charset=charset, title_tag=title_tag,
        og_title=og, publish_meta=pub, author_meta=auth, image_meta=img,
        site=site,
        desc=esc(f"summary of article {doc_id}"),
        keywords=esc(f"k{doc_id % 7}, k{doc_id % 11}"),
        canonical=f"/canon/{doc_id}",
    )
    # Paragraph/sibling bodies are element text too — same escaping
    # contract as title_tag above (a corpus word containing '&' or '<'
    # must not desync the rendered page from the expected_text golden).
    esc_text = lambda s: html_mod.escape(str(s), quote=False)
    paras_html = "\n".join(f"<p>{esc_text(p)}</p>" for p in built["paras"])
    movies_html = "".join(f'<iframe src="{m}"></iframe>\n' for m in (movies or []))
    body = (
        _BOILER.format(linky=_LINKY)
        + f'<div class="prelude"><p>{esc_text(built["sibling"])}</p></div>\n'
        + f'<div class="article-body">\n{paras_html}\n{movies_html}{body_images}</div>\n'
        + _TAIL.format(linky=_LINKY)
    )
    return head + body


def generate(documents_parquet: str, out_dir: str, copies: int = 1) -> tuple[str, str]:
    """Synthesize pages.parquet + expected.parquet into out_dir.

    Returns (pages_path, expected_path). Idempotent: skips if both exist.
    """
    os.makedirs(out_dir, exist_ok=True)
    pages_path = os.path.join(out_dir, "pages.parquet")
    expected_path = os.path.join(out_dir, "expected.parquet")
    if os.path.exists(pages_path) and os.path.exists(expected_path):
        return pages_path, expected_path

    docs = pq.read_table(documents_parquet).to_pandas()
    rows: list[dict] = []
    goldens: list[dict] = []

    for _, d in docs.iterrows():
        doc_id = int(d.doc_id)
        doc_lang = d.lang
        # spread a third of docs across every shipped stopword table so
        # every code in _SPREAD_LANGS (22 by late r4; 27 tabled incl.
        # the seed corpus's 5) appears in fixtures
        if doc_id % 3 == 2:
            # index by doc_id//3 (coprime stride) — doc_id % N would
            # alias with the %3 gate and skip 2/3 of _SPREAD_LANGS
            doc_lang = _SPREAD_LANGS[(doc_id // 3) % len(_SPREAD_LANGS)]
        built = _build_doc(doc_id, d.text or "", doc_lang)

        null_lang = doc_id % 50 == 9          # ~2%: lang column NULL
        latin1 = doc_id % 50 == 29            # ~2%: latin-1 + meta charset
        null_html = doc_id % 100 == 7         # ~1%: NULL html
        truncated = doc_id % 100 == 17        # ~1%: head-only truncation
        dup = doc_id % 20 == 3                # ~5%: second (url, warc_ts+1h) row
        og_title = doc_id % 25 == 21          # ~4%: boilerplate <title>, og:title real
        with_movie = doc_id % 25 == 11        # ~4%: embedded video iframe
        with_image = doc_id % 4 != 3          # 75%: og:image / twitter:image

        publish_date = None
        if doc_id % 5 != 0:                   # 80%: article:published_time meta
            pd_ts = EPOCH + timedelta(hours=(doc_id * 7919) % 8760)
            publish_date = pd_ts.strftime("%Y-%m-%dT%H:%M:%S+00:00")
        movies = ([f"https://www.youtube.com/embed/v{doc_id}"] if with_movie else [])
        # 2/3 of pages carry an author byline meta (A4-ext goldens)
        authors = ([f"writer {doc_id % 7}"] if doc_id % 3 != 2 else [])
        # relative for a third of image pages (urljoin against page url)
        image = None
        if with_image:
            image = (f"/img/lead_{doc_id}.jpg" if doc_id % 3 == 0
                     else f"https://cdn{doc_id % 5}.example/lead_{doc_id}.jpg")

        # A17 offline goldens (v14): half the meta-image-less pages carry
        # attribute-scored body <img>s — decoys the scorer must reject
        # (.gif/spacer name, /ads/ path + banner aspect, sub-50px icon)
        # plus an area-ranked winner and a smaller runner-up; the
        # extractor must pick the winner with NO meta schema present.
        body_images = ""
        body_img_src = None
        if not with_image and doc_id % 8 == 3:
            win_w = 400 + (doc_id % 5) * 60
            body_img_src = f"/img/body_lead_{doc_id}.jpg"
            body_images = (
                '<img src="/img/spacer.gif" width="600" height="400">\n'
                f'<img src="/ads/banner_{doc_id}.jpg" width="728" height="90">\n'
                f'<img src="/img/icon_{doc_id}.png" width="32" height="32">\n'
                f'<img src="{body_img_src}" width="{win_w}" height="300">\n'
                f'<img src="/img/runner_{doc_id}.jpg" width="200" height="150">\n')

        charset = "iso-8859-1" if latin1 else "utf-8"
        html_text = _render(doc_id, built, doc_lang or built["eff"], charset,
                            og_title=og_title, publish_date=publish_date,
                            movies=movies, image=image, authors=authors,
                            body_images=body_images)
        html_bytes: bytes | None
        try:
            html_bytes = html_text.encode(charset)
        except UnicodeEncodeError:
            # language prefix not representable in latin-1 (pl/ru/hu…):
            # deterministically fall back to a utf-8 page
            charset = "utf-8"
            html_text = _render(doc_id, built, doc_lang or built["eff"], charset,
                                og_title=og_title, publish_date=publish_date,
                                movies=movies, image=image, authors=authors,
                                body_images=body_images)
            html_bytes = html_text.encode(charset)

        status = "ok"
        expected_text = "\n\n".join([built["sibling"]] + built["paras"])
        expected_title = built["title"]
        expected_publish = publish_date
        expected_movies = list(movies)
        # meta image wins when declared; otherwise the attribute-scored
        # body winner; resolved per-copy url below (urljoin)
        expected_image = image if image is not None else body_img_src
        expected_authors = list(authors)
        if null_html:
            html_bytes = None
            status, expected_text, expected_title = "empty", "", ""
            expected_publish, expected_movies = None, []
            expected_image, expected_authors = None, []
        elif truncated:
            cut = html_text.encode("utf-8").find(b"<title")
            html_bytes = html_text.encode("utf-8")[:cut]
            status, expected_text, expected_title = "empty", "", ""
            expected_publish, expected_movies = None, []
            expected_image, expected_authors = None, []

        for c in range(copies):
            suffix = "" if c == 0 else f"-{c}"
            url = f"https://site{doc_id % 40}.example/{built['eff']}/article/{doc_id}{suffix}"
            ts = EPOCH + timedelta(seconds=(doc_id * 9973) % 31536000 + c * 60)
            lang_col = None if null_lang else doc_lang
            rows.append({"url": url, "warc_ts": ts, "html": html_bytes,
                         "text": d.text, "lang": lang_col})
            if dup:
                rows.append({"url": url, "warc_ts": ts + timedelta(hours=1),
                             "html": html_bytes, "text": d.text, "lang": lang_col})
            goldens.append({"url": url, "expected_text": expected_text,
                            "expected_title": expected_title,
                            "expected_status": status, "lang": built["eff"],
                            "expected_publish_date": expected_publish,
                            "expected_movies": expected_movies,
                            "expected_top_image": (
                                urljoin(url, expected_image)
                                if expected_image else None),
                            "expected_authors": expected_authors})

    pages_schema = pa.schema([
        ("url", pa.string()), ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()), ("text", pa.string()), ("lang", pa.string()),
    ])
    pages_tbl = pa.Table.from_pandas(pd.DataFrame(rows), schema=pages_schema,
                                     preserve_index=False)
    pq.write_table(pages_tbl, pages_path)
    exp_tbl = pa.Table.from_pandas(pd.DataFrame(goldens), preserve_index=False)
    pq.write_table(exp_tbl, expected_path)
    return pages_path, expected_path


def fixture_dir_for(sf_dir: str, copies: int = 1) -> str:
    """Deterministic cache location under /tmp for a given sf dir; keyed
    by FIXTURE_VERSION so template/stopword changes regenerate."""
    tag = (os.path.basename(os.path.normpath(sf_dir))
           + (f"x{copies}" if copies > 1 else "")
           + f"_v{FIXTURE_VERSION}")
    return os.path.join("/tmp", "goose_fixtures", tag)


def ensure_pages(sf_dir: str, copies: int = 1) -> tuple[str, str]:
    """Generate (cached) fixtures for a testdata sf dir; returns paths."""
    out = fixture_dir_for(sf_dir, copies)
    return generate(os.path.join(sf_dir, "documents.parquet"), out, copies)
