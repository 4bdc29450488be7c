"""HTML main-content extraction (core/html.py): boilerplate strip, DOM
heuristics, link-density pruning, node-pipeline integration.

The north-star pipeline ingests HTML turns alongside the JSON layout
payloads; the reference (Filimoa/open-parse) has no HTML path, so these are
behavior-defining tests, not ported goldens."""

from open_parse_spark.core.html import (
    extract_main_blocks,
    html_to_elements,
    looks_like_html,
)
from open_parse_spark.core.parse import parse_turn

CHROME_PAGE = (
    '<html><head><title>T</title><style>p{color:red}</style>'
    '<script>if(1<2){document.write("<p>fake</p>")}</script></head><body>'
    '<nav><a href="/">Home</a><a href="/x">X</a></nav>'
    '<header><h1>Site name</h1></header>'
    '<div class="sidebar"><ul><li><a href="/a">A</a></li></ul></div>'
    '<article><h2>Real title</h2><p>Real content paragraph.</p></article>'
    '<aside>Related stories</aside>'
    '<footer>Copyright</footer></body></html>'
)


def test_chrome_is_dropped_content_kept():
    blocks = extract_main_blocks(CHROME_PAGE)
    assert [(b["kind"], b["text"]) for b in blocks] == [
        ("heading", "Real title"),
        ("text", "Real content paragraph."),
    ]


def test_script_content_never_leaks():
    # the classic trap: markup inside a script string
    blocks = extract_main_blocks(CHROME_PAGE)
    assert all("fake" not in b["text"] for b in blocks)


def test_boilerplate_class_tokens_prune_subtree():
    html = (
        '<div class="content-ad banner"><p>Buy now!</p></div>'
        '<div id="main-menu"><p>Products</p></div>'
        "<p>Kept paragraph here.</p>"
    )
    blocks = extract_main_blocks(html)
    assert [b["text"] for b in blocks] == ["Kept paragraph here."]


def test_link_density_prunes_short_link_blocks():
    nav = (
        '<div><a href="/1">One</a> <a href="/2">Two</a> <a href="/3">Three</a></div>'
        "<p>" + "genuine article words " * 12 + "</p>"
    )
    blocks = extract_main_blocks(nav)
    assert len(blocks) == 1 and blocks[0]["text"].startswith("genuine")


def test_link_density_spares_long_link_rich_paragraphs():
    words = "see the reference documentation for details " * 10  # >=40 words
    html = f'<p><a href="/ref">{words}</a></p>'
    blocks = extract_main_blocks(html)
    assert len(blocks) == 1


def test_entities_unescaped_and_whitespace_normalized():
    html = "<p>a &amp; b &lt;tag&gt;\n\t  c</p>"
    blocks = extract_main_blocks(html)
    assert blocks[0]["text"] == "a & b <tag> c"


def test_table_headers_rows_and_nested_table_flattened():
    html = (
        "<table><tr><th>h1</th><th>h2</th></tr>"
        "<tr><td>a</td><td><table><tr><td>inner</td></tr></table></td></tr>"
        "</table>"
    )
    (b,) = extract_main_blocks(html)
    assert b["kind"] == "table"
    assert b["headers"] == ["h1", "h2"]
    assert b["rows"] == [["a", "inner"]]


def test_list_items_become_bullet_lines():
    html = "<ol><li>first</li><li>second <b>bold</b></li></ol>"
    (b,) = extract_main_blocks(html)
    assert b["text"] == "- first\n- second bold"


def test_malformed_html_never_raises():
    for junk in (
        "<",
        "<x",
        "<<<>>>",
        "<p><b>unclosed everywhere",
        "<table><tr><td>eof-in-cell",
        "<ul><li>eof-in-item",
        "</div></p></html>",
        "<!-- only a comment -->",
        "<p>" + "x" * 100000,
    ):
        extract_main_blocks(junk)  # must not raise


def test_looks_like_html_dispatch():
    assert looks_like_html("<html>")
    assert looks_like_html("<!doctype html>")
    assert looks_like_html("<p>hi")
    assert not looks_like_html("{json}")
    assert not looks_like_html("plain prose")
    assert not looks_like_html("< 5 and > 3")  # math, not markup


def test_headings_map_to_pipeline_heading_elements():
    els = html_to_elements("<h1>Big</h1><h5>Small</h5><p>body text</p>")
    assert els[0].text == "**Big**" and els[0].is_heading
    assert els[1].text == "**Small**" and not els[1].is_heading  # 14pt < 16
    assert not els[2].is_heading


def test_parse_turn_html_end_to_end():
    html = (
        "<html><body><nav><a href='/'>Home</a></nav>"
        "<article><h1>Quarterly Report</h1>"
        "<p>" + "Revenue grew steadily across all segments this quarter. " * 5
        + "</p>"
        "<table><tr><th>Segment</th><th>Growth</th></tr>"
        "<tr><td>Cloud</td><td>12%</td></tr></table>"
        "<ul><li>cloud up</li><li>ads down</li></ul></article>"
        "<footer>contact</footer></body></html>"
    )
    nodes = parse_turn(html)
    assert len(nodes) == 1
    text = nodes[0].text
    assert text.startswith("**Quarterly Report**")
    assert '<table border="1">' in text
    assert "- cloud up\n- ads down" in text
    assert "Home" not in text and "contact" not in text


def test_parse_turn_html_deterministic():
    html = "<article><h1>t</h1><p>" + "stable content words " * 30 + "</p></article>"
    a = [n.text for n in parse_turn(html)]
    b = [n.text for n in parse_turn(html)]
    assert a == b


def test_non_html_payloads_unaffected():
    # prose starting with '<' but not tag-like stays on the prose path
    prose = "< 5% of the corpus is affected. " * 20
    nodes = parse_turn(prose)
    assert nodes and nodes[0].text.startswith("< 5%")


def test_parse_transcripts_html_turns_distributed(spark):
    """HTML turns flow through the distributed Arrow parse exactly like the
    single-threaded parse_turn path (same code, but this pins the Spark
    plumbing: schema, batching, ordering)."""
    import datetime

    import pandas as pd

    from open_parse_spark.spark.pipeline import parse_transcripts

    html_a = (
        "<html><body><nav><a href='/'>Home</a></nav><article>"
        "<h1>Doc A</h1><p>" + "alpha content words here. " * 20
        + "</p></article><footer>foot</footer></body></html>"
    )
    html_b = (
        "<div class='sidebar'><a href='/x'>X</a></div>"
        "<h2>Doc B</h2><p>" + "beta content words here. " * 20 + "</p>"
    )
    rows = [
        ("c1", 0, "user", html_a, "", datetime.datetime(2026, 1, 1)),
        ("c1", 1, "assistant", html_b, "", datetime.datetime(2026, 1, 1)),
        ("c2", 0, "user", "plain prose turn. " * 30, "", datetime.datetime(2026, 1, 1)),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
    )
    nodes = (
        parse_transcripts(df, repartition_for_skew=False)
        .orderBy("conv_id", "turn_idx", "node_idx")
        .toPandas()
    )
    by_turn = {
        (r.conv_id, r.turn_idx): r.text for r in nodes.itertuples()
    }
    expected_a = [n.text for n in parse_turn(html_a)]
    assert by_turn[("c1", 0)] == expected_a[0]
    assert by_turn[("c1", 0)].startswith("**Doc A**")
    assert "Home" not in by_turn[("c1", 0)]
    assert by_turn[("c1", 1)].startswith("**Doc B**")
    assert "X" not in by_turn[("c1", 1)]
    assert ("c2", 0) in by_turn  # prose path untouched


def test_inline_style_runs_extracted():
    blocks = extract_main_blocks("<p>a <b>bold</b> word and <em>ital</em>s</p>")
    assert blocks[0]["text"] == "a bold word and itals"  # plain text: clean spaces
    assert blocks[0]["runs"] == [
        ("a ", False, False),
        ("bold", True, False),
        (" word and ", False, False),
        ("ital", False, True),
        ("s", False, False),
    ]
    # unstyled paragraphs carry no runs (fast path)
    assert "runs" not in extract_main_blocks("<p>plain</p>")[0]


def test_inline_styles_render_with_reference_markdown_cleanup():
    """Mid-line markers swallow adjacent spaces — the reference's own
    cleanup semantics (schemas.py:160-187; its goldens show
    'dated**1/12/2003 12:36:16 PM**')."""
    els = html_to_elements("<p>a <b>bold</b> word and <em>ital</em>s</p>")
    assert els[0].text == "a**bold**word and*ital*s"
    els2 = html_to_elements("<p><strong><em>both</em></strong> rest</p>")
    assert els2[0].text == "***both***rest"


def test_styled_paragraph_through_full_pipeline():
    node = parse_turn(
        "<article><h1>T</h1><p>" + "word " * 60
        + "really <b>important</b> point</p></article>"
    )
    assert "**important**" in node[0].text


def test_main_container_scopes_out_unmarked_junk():
    """Readability-style scoping: once <main>/<article>/role=main exists,
    text-dense junk outside it (comments, unmarked footers) is chrome."""
    html = (
        "<div><p>" + "text dense comment junk words " * 10 + "</p></div>"
        "<article><h1>T</h1><p>real body content here</p></article>"
        "<div><p>trailing junk paragraph with plenty of words</p></div>"
    )
    assert [b["text"] for b in extract_main_blocks(html)] == [
        "T",
        "real body content here",
    ]
    # without a declared container everything non-boilerplate stays
    assert [b["text"] for b in extract_main_blocks("<p>standalone</p>")] == [
        "standalone"
    ]
    # role=main is case-insensitive and works on any tag
    assert [
        b["text"]
        for b in extract_main_blocks(
            '<p>outside</p><div role="MAIN"><p>inside</p></div>'
        )
    ] == ["inside"]


def test_pre_blocks_preserved_verbatim():
    bs = extract_main_blocks(
        "<p>before</p><pre>\ndef f(x):\n    return  x\n</pre><p>after</p>"
    )
    assert bs[1]["text"] == "def f(x):\n    return  x"
    assert bs[1].get("preformatted")
    # structure tags inside pre are content separators, not layout
    bs2 = extract_main_blocks("<pre>a<br>b</pre>")
    assert bs2[0]["text"] == "a\nb"
    # unclosed pre at EOF flushes
    assert extract_main_blocks("<pre>code at eof")[0]["text"] == "code at eof"


def test_pre_lines_survive_the_node_pipeline():
    node = parse_turn(
        "<article><h1>Code</h1><p>" + "prose words here. " * 30 + "</p>"
        "<pre>line_one = 1\nline_two  = 2</pre></article>"
    )
    text = node[0].text
    assert "line_one = 1\nline_two  = 2" in text


def test_extractor_fuzz_never_raises_and_deterministic():
    """Random tag soup: the extractor must never raise, always return the
    same blocks for the same input, and never leak dropped-container text."""
    from hypothesis import given, settings, strategies as st

    tags = ["p", "div", "b", "i", "ul", "li", "table", "tr", "td", "pre",
            "h1", "h3", "a", "nav", "footer", "script", "article", "br",
            "main", "span", "x-unknown"]
    piece = st.one_of(
        st.sampled_from([f"<{t}>" for t in tags]),
        st.sampled_from([f"</{t}>" for t in tags]),
        st.sampled_from(['<div class="sidebar">', '<a href="/x">',
                         "<!-- c -->", "<![zz", "&amp;", "&#65;", "&bogus;"]),
        st.text(alphabet="abc <>&/='\"\n\t", max_size=12),
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(piece, max_size=40))
    def run(pieces):
        html = "".join(pieces)
        a = extract_main_blocks(html)
        b = extract_main_blocks(html)
        assert a == b

    run()


# -- review-fix regressions (code-review findings, each verified failing
# before its fix) --


def test_unclosed_tags_inside_dropped_container_do_not_swallow_doc():
    bs = extract_main_blocks(
        "<nav><p>Home<p>About</nav><main><p>Real content here</p></main>"
    )
    assert [b["text"] for b in bs] == ["Real content here"]
    # stray extra closes inside the drop don't end it early either
    bs2 = extract_main_blocks(
        '<nav><a href="/">x</a></p></div>boiler</nav><p>kept content</p>'
    )
    assert [b["text"] for b in bs2] == ["kept content"]
    # nested same container tag balances
    bs3 = extract_main_blocks("<nav>a<nav>b</nav>c</nav><p>kept here</p>")
    assert [b["text"] for b in bs3] == ["kept here"]


def test_role_main_scope_survives_nested_divs():
    bs = extract_main_blocks(
        '<div role="main"><div>first part</div><p>second part</p></div>'
    )
    assert [b["text"] for b in bs] == ["first part", "second part"]


def test_style_and_anchor_end_tags_inside_pre_do_not_leak():
    bs = extract_main_blocks("<p><b>A <pre><b>code</b></pre> B</b></p>")
    bolds = [b for b in bs if b.get("runs")]
    assert any("B" in b["text"] and b["runs"][0][1] for b in bolds)


def test_xhtml_self_closed_br_inside_pre():
    assert (
        extract_main_blocks("<pre>line1<br/>line2</pre>")[0]["text"]
        == "line1\nline2"
    )


def test_tables_render_into_joined_body_text(spark):
    import pandas as pd

    from open_parse_spark.operators.html import extract_main_content

    html = (
        "<article><p>para1</p>"
        "<table><tr><th>h1</th><th>h2</th></tr><tr><td>a</td><td>b</td></tr></table>"
        "<p>para2</p></article>"
    )
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "html": [html]}))
    row = extract_main_content(df).collect()[0]
    assert "| h1 | h2 |" in row.body_text
    assert "para1" in row.body_text and "para2" in row.body_text
    assert "\n\n\n" not in row.body_text  # no empty-block join artifacts


def test_html_paragraph_layout_matches_prose_layout():
    """The html layout re-derives the prose constants; this pins the two
    paths equal so a tweak to one can't silently diverge the other."""
    from open_parse_spark.core.payload import _prose_to_elements

    text = "one paragraph of words " * 12
    html_el = html_to_elements(f"<p>{text.strip()}</p>")[0]
    prose_el = _prose_to_elements(text.strip())[0]
    assert html_el.text == prose_el.text
    assert (html_el.bbox.x0, html_el.bbox.y0, html_el.bbox.x1, html_el.bbox.y1) == (
        prose_el.bbox.x0,
        prose_el.bbox.y0,
        prose_el.bbox.x1,
        prose_el.bbox.y1,
    )


def test_unclosed_list_inside_main_keeps_in_main():
    # malformed: </main> arrives while the <ul> is still open — the list
    # must flush inside the main scope, not later with in_main=False
    # (where the main-scope filter would drop it) — ADVICE r2 fix
    html = (
        "<main><p>intro words here</p><ul><li>alpha</li><li>beta</li>"
        "</main><footer><p>chrome text</p></footer>"
    )
    blocks = extract_main_blocks(html)
    kinds = [(b["kind"], b["text"]) for b in blocks]
    assert ("list", "- alpha\n- beta") in kinds
    assert all("chrome" not in b["text"] for b in blocks)


def test_unclosed_table_inside_main_keeps_in_main():
    html = (
        "<article><table><tr><th>h</th></tr><tr><td>cell text</td>"
        "</article><div><p>outside junk</p></div>"
    )
    blocks = extract_main_blocks(html)
    tables = [b for b in blocks if b["kind"] == "table"]
    assert len(tables) == 1
    assert tables[0]["headers"] == ["h"] and tables[0]["rows"] == [["cell text"]]
    assert all("junk" not in b["text"] for b in blocks)
