from gooselite.minidom import parse_html


def test_basic_tree_and_text():
    root = parse_html("<html><body><p>hello <b>world</b></p></body></html>")
    ps = root.get_elements_by_tag("p")
    assert len(ps) == 1
    assert ps[0].get_text() == "hello world"


def test_entities_decoded():
    root = parse_html("<p>fish &amp; chips &lt;3</p>")
    assert root.get_elements_by_tag("p")[0].get_text() == "fish & chips <3"


def test_void_elements_do_not_swallow():
    root = parse_html("<p>a<br>b<img src=x>c</p>")
    p = root.get_elements_by_tag("p")[0]
    assert p.get_text() == "a b c"
    assert len(root.get_elements_by_tag("br")) == 1
    assert len(root.get_elements_by_tag("img")) == 1


def test_implied_p_close():
    root = parse_html("<body><p>one<p>two<div>three</div></body>")
    ps = root.get_elements_by_tag("p")
    assert [p.get_text() for p in ps] == ["one", "two"]
    divs = root.get_elements_by_tag("div")
    # div must be a sibling of the p's, not nested inside
    assert divs[0].parent.tag == "body"


def test_implied_li_td_close():
    root = parse_html("<ul><li>a<li>b</ul><table><tr><td>x<td>y<tr><td>z</table>")
    assert [li.get_text() for li in root.get_elements_by_tag("li")] == ["a", "b"]
    assert [td.get_text() for td in root.get_elements_by_tag("td")] == ["x", "y", "z"]
    assert len(root.get_elements_by_tag("tr")) == 2


def test_script_style_raw_text():
    # raw-text mode: script content must not be parsed as markup, and it
    # is deliberately NOT materialized as text nodes (the cleaner drops
    # script/style subtrees before any text is read — skipping at parse
    # time avoids copying the JS/CSS payload of real pages at all)
    root = parse_html("<script>if (a < b) { x(); }</script><p>t</p>")
    scripts = root.get_elements_by_tag("script")
    assert len(scripts) == 1
    assert scripts[0].itertext() == []          # content skipped, not parsed
    assert root.get_elements_by_tag("b") == []  # "a < b" never became a tag
    assert root.get_elements_by_tag("p")[0].get_text() == "t"


def test_mismatched_end_tags_ignored():
    root = parse_html("<div><p>a</span></p></div></article>")
    assert root.get_elements_by_tag("p")[0].get_text() == "a"


def test_comment_nodes():
    root = parse_html("<div><!-- hidden -->shown</div>")
    div = root.get_elements_by_tag("div")[0]
    assert div.get_text() == "shown"
    assert any(n.tag == "#comment" for n in div.children)


def test_previous_siblings_nearest_first():
    root = parse_html("<body><div id=a></div><div id=b></div><p id=c></p></body>")
    p = root.get_elements_by_tag("p")[0]
    sibs = p.previous_siblings()
    assert [s.attrib["id"] for s in sibs] == ["b", "a"]


def test_drop_tag_splices_children():
    root = parse_html("<p>x <a href=u>link text</a> y</p>")
    a = root.get_elements_by_tag("a")[0]
    a.drop_tag()
    p = root.get_elements_by_tag("p")[0]
    assert p.get_text() == "x link text y"
    assert not root.get_elements_by_tag("a")


def test_candidate_order_per_tag_group():
    root = parse_html("<td>t</td><p>p1</p><pre>r</pre><p>p2</p>")
    nodes = root.get_elements_by_tag("p", "pre", "td")
    assert [n.tag for n in nodes] == ["p", "p", "pre", "td"]


def test_attrs_first_wins_and_none_value():
    root = parse_html("<div class='a' class='b' hidden>x</div>")
    d = root.get_elements_by_tag("div")[0]
    assert d.attrib["class"] == "a"
    assert d.attrib["hidden"] == ""


def test_deep_nesting_no_recursion_error():
    html = "<div>" * 5000 + "deep" + "</div>" * 5000
    root = parse_html(html)
    assert "deep" in " ".join(root.itertext())


def test_xml_mode_void_elements_nest():
    from gooselite.minidom import parse_html

    xml = ("<channel><item><link>https://e/d/1</link>"
           "<guid>g1</guid></item></channel>")
    # HTML rules: <link> is void, its text escapes the node
    html_link = parse_html(xml).get_elements_by_tag("link")[0]
    assert html_link.get_text() == ""
    # XML rules: the text nests and the end tag closes the element
    root = parse_html(xml, xml_mode=True)
    item = root.get_elements_by_tag("item")[0]
    assert item.get_elements_by_tag("link")[0].get_text() == "https://e/d/1"
    assert item.get_elements_by_tag("guid")[0].get_text() == "g1"
    # no implied-close recovery in xml_mode: <p> inside <p> nests
    nested = parse_html("<p>a<p>b</p></p>", xml_mode=True)
    outer = nested.get_elements_by_tag("p")[0]
    assert outer.get_text().replace(" ", "") == "ab"
