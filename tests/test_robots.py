"""RFC 9309 evaluator (gooselite.robots).  Cross-engine equality of the
q_robots_gate probe vs its DuckDB truth table is covered by
test_relational_probes."""

from hypothesis import given, settings
from hypothesis import strategies as st

from gooselite.robots import allowed, parse_robots

R = "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"


def test_prefix_disallow_and_longest_allow_override():
    assert not allowed(R, "bot", "/private/x")
    assert allowed(R, "bot", "/private/ok/deep")
    assert allowed(R, "bot", "/public")


def test_wildcard_and_end_anchor():
    r = "User-agent: *\nDisallow: /*.pdf$\n"
    assert not allowed(r, "bot", "/a/b/c.pdf")
    assert allowed(r, "bot", "/a/b/c.pdfx")  # $ anchors the end
    r2 = "User-agent: *\nDisallow: /a*b\n"
    assert not allowed(r2, "bot", "/a-anything-b/tail")
    assert allowed(r2, "bot", "/a-anything-c")


def test_specific_agent_group_beats_star():
    r = ("User-agent: goosebot\nDisallow: /\n"
         "User-agent: *\nAllow: /\n")
    assert not allowed(r, "GooseBot/1.0", "/x")  # case-insensitive prefix
    assert allowed(r, "otherbot", "/x")


def test_tie_allow_wins_and_default_allow():
    r = "User-agent: *\nDisallow: /dir/\nAllow: /dir*\n"
    assert allowed(r, "bot", "/dir/a")  # equal length 5 vs 5 → Allow
    assert allowed("User-agent: *\nDisallow: /private/", "bot", "/pub")
    assert allowed("", "bot", "/anything")  # no groups at all


def test_comments_unknown_fields_and_multi_agent_groups():
    r = ("# hello\nCrawl-delay: 10\nSitemap: /s.xml\n"
         "User-agent: a\nUser-agent: b\nDisallow: /x # trailing comment\n")
    assert not allowed(r, "b-bot", "/x/1")
    assert allowed(r, "c", "/x/1")  # no * group, no agent match → allow
    groups = parse_robots(r)
    assert groups[0][0] == ["a", "b"]


def test_empty_disallow_means_no_rule():
    r = "User-agent: *\nDisallow:\n"
    assert allowed(r, "bot", "/anything")


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300), st.text(max_size=30), st.text(max_size=60))
def test_allowed_total_over_garbage(text, agent, path):
    assert allowed(text, agent, path) in (True, False)  # never raises


def test_duplicate_groups_merge_per_rfc():
    """RFC 9309 §2.2.1: all groups matching the chosen agent merge —
    repeated User-agent lines must not shadow each other."""
    r = "User-agent: *\nDisallow: /a\nUser-agent: *\nDisallow: /b\n"
    assert not allowed(r, "bot", "/a/x")
    assert not allowed(r, "bot", "/b/x")  # second * group must apply too
    r2 = ("User-agent: goosebot\nDisallow: /a\n"
          "User-agent: goosebot\nDisallow: /b\n")
    assert not allowed(r2, "goosebot/2", "/a/x")
    assert not allowed(r2, "goosebot/2", "/b/x")


def test_compiled_fast_path_matches_allowed():
    from gooselite.robots import allowed_compiled, compile_rules

    r = "User-agent: *\nDisallow: /p\nAllow: /p/ok\n"
    c = compile_rules(r, "bot")
    for p in ("/p/x", "/p/ok/y", "/q"):
        assert allowed_compiled(c, p) == allowed(r, "bot", p)


def test_sitemap_parse_order_and_totality(spark):
    """Entry order in the parsed output equals document order in the
    XML (pos is contiguous from 0 per host), and a malformed sitemap
    yields zero entries instead of failing the task."""
    from goose_spark.robotsops import _sitemap_batches, q_sitemap_parse

    import pandas as pd

    rows = q_sitemap_parse(spark, "/root/testdata/sf0.001").collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r.pos)
    for src, poss in by_src.items():
        assert sorted(poss) == list(range(len(poss))), src
    # loc entries are sorted by doc_id within a host (array_sort synth)
    one = sorted((r.pos, r.loc) for r in rows if r.source == rows[0].source)
    ids = [int(loc.rsplit("/", 1)[1]) for _, loc in one]
    assert ids == sorted(ids)
    # totality: garbage XML parses to no rows, no exception
    garbage = pd.DataFrame({"source": ["h"], "xml": ["<urlset><url><loc>"]})
    out = pd.concat(list(_sitemap_batches(iter([garbage]))))
    assert len(out) <= 1  # salvage parser may recover the open <url>
