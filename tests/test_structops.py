"""Structured-data harvesting (goose_spark/structops.py) + the minidom
keep_raw_text opt-in it relies on. Cross-engine value identity is
covered by the parameterized L3 test; here: the flag's default is
unchanged (extraction pipeline semantics), the opt-in actually retains
script payloads, and the JSON-LD dispatch skips decoy scripts."""

from gooselite.minidom import parse_html

from goose_spark import structops as ST

SF = "/root/testdata/sf0.01"

_PAGE = ('<html><head><script type="application/ld+json">'
         '{"headline": "h"}</script><style>.x{color:red}</style>'
         "</head><body><p>body text</p></body></html>")


def test_minidom_default_still_drops_raw_text():
    root = parse_html(_PAGE)
    script = root.get_elements_by_tag("script")[0]
    assert script.raw_text() == ""
    style = root.get_elements_by_tag("style")[0]
    assert style.raw_text() == ""
    # body text unaffected either way
    assert "body text" in root.get_text()


def test_minidom_keep_raw_text_opt_in():
    root = parse_html(_PAGE, keep_raw_text=True)
    script = root.get_elements_by_tag("script")[0]
    assert '"headline"' in script.raw_text()
    # the opt-in must not leak script text into article-text getters
    # beyond the raw node itself — the cleaner drops these subtrees,
    # but the PARSER-level get_text does include them; harvesting code
    # reads raw_text on the matched script node only
    assert "body text" in root.get_text()


def test_jsonld_dispatch_skips_decoy_and_ties_to_corpus(spark):
    rows = {r["doc_id"]: r for r in
            ST.q_jsonld_extract(spark, SF).collect()}
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").collect()}
    for doc_id, r in rows.items():
        assert r["headline"] == f"headline {doc_id}", "decoy not skipped?"
        assert r["word_count"] == len(docs[doc_id].split())
        assert r["date_published"].startswith("2026-01-")


def test_table_extract_walks_rows_exactly(spark):
    rows = ST.q_table_extract(spark, SF).collect()
    for r in rows:
        assert r["n_rows"] == ST._TBL_ROWS
        d = r["doc_id"]
        assert r["col_sum"] == sum(d * i % 97 for i in range(1, 4))
