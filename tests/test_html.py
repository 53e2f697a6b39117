"""HTML extraction / boilerplate signals (pure-Catalyst pipeline)."""

import pytest

from grafink_spark.llm.html import boilerplate_filter, html_text_signals


@pytest.fixture()
def pages(spark):
    rows = [
        (
            1,
            "<html><head><title>T &amp; A</title>"
            "<script>var x = '<p>not text</p>';</script></head>"
            "<body><p>Hello   world</p><a href='/x'>a link</a>"
            "<style>p { color: red }</style></body></html>",
        ),
        (
            2,
            "<body><p>&lt;tag&gt; &quot;quoted&quot; &#39;q&apos;"
            " &nbsp;spaced &amp;lt;double</p></body>",
        ),
        (3, "<body><a>one</a><a>two <b>bold</b></a>no links here</body>"),
        (4, "plain text, no markup at all"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, html string")


def test_visible_text_and_title(spark, pages):
    out = {r.doc_id: r for r in html_text_signals(pages).collect()}
    # script/style subtrees vanish WITH contents; tags become spaces;
    # whitespace collapses; title is extracted and unescaped
    assert out[1].title == "T & A"
    assert out[1].text == "T & A Hello world a link"
    assert out[1].n_links == 1 and out[1].link_chars == len("a link")
    # entity unescaping, one level only (&amp;lt; -> &lt;)
    assert out[2].text == "<tag> \"quoted\" 'q' spaced &lt;double"  # &#39;/&apos; both unescape
    # nested tags inside anchors stripped for link_chars
    assert out[3].n_links == 2
    assert out[3].link_chars == len("one") + len("two bold")
    # markup-free and empty inputs pass through safely
    assert out[4].text == "plain text, no markup at all"
    assert out[4].n_links == 0 and out[4].link_density == 0.0
    assert out[5].text == "" and out[5].text_chars == 0


def test_link_density_and_filter(spark):
    body = "<p>" + "word " * 40 + "</p>"
    nav = "<a href='#'>navigation item </a>" * 10
    rows = [
        (1, f"<body>{body}</body>"),  # clean article
        (2, f"<body>{nav}</body>"),  # pure link chrome
        (3, "<body><p>tiny</p></body>"),  # too short
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    out = {
        r.doc_id: r
        for r in boilerplate_filter(
            df, max_link_density=0.3, min_text_chars=50
        ).collect()
    }
    assert out[1].keep is True and out[1].link_density == 0.0
    assert out[2].keep is False and out[2].link_density > 0.9
    assert out[3].keep is False  # short-circuit on length


def test_plan_is_pure_codegen(spark, pages):
    """The whole pipeline must stay JVM-side: no BatchEvalPython /
    ArrowEvalPython node anywhere in the executed plan."""
    plan = html_text_signals(pages)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
