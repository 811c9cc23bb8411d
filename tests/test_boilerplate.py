"""HTML boilerplate strip + DOM-heuristic main-content extraction.

North-rule text-tier capability (HTML boilerplate strip / DOM heuristics);
no reference analog (the reference consumes images), so semantics are
pinned here and cross-checked against DuckDB running the identical regex
chain (dialect parity) and against authored generation-time truth.
"""

import duckdb

from ppocr_spark.corpus import ensure_html_corpus, generate_html_page
from ppocr_spark.functions.boilerplate import (
    extract_main_content,
    strip_tags_sql,
)


PAGE = (
    "<html><head><title>t</title><style>p{}</style>"
    "<script>if(1<2){x('<p>')}</script></head>"
    "<body><!-- c --><nav><ul><li><a href='/a'>nav one</a></li></ul></nav>"
    "<main><h1>big title here</h1>"
    "<p>alpha beta &amp; gamma <a href='/x'>delta</a> epsilon zeta</p>"
    "<div>Share</div>"
    "<div><a href='/1'>all link</a> <a href='/2'>other link</a></div>"
    "</main><footer><div>site footer links</div></footer></body></html>"
)


class TestExtractMainContent:
    def test_keeps_main_drops_boilerplate(self):
        out = extract_main_content(PAGE)
        assert out == "big title here alpha beta & gamma delta epsilon zeta"

    def test_ancestor_rule_nav_header_footer_aside(self):
        for tag in ("nav", "header", "footer", "aside", "form"):
            html = f"<body><{tag}><p>dropped words here</p></{tag}>" \
                   "<p>kept words here</p></body>"
            assert extract_main_content(html) == "kept words here"

    def test_link_density_rule(self):
        dense = ("<p><a href='/'>one two</a> three</p>")  # 2/3 link chars
        assert extract_main_content(dense) == ""
        sparse = "<p><a href='/'>one</a> two three four five six</p>"
        assert extract_main_content(sparse) == "one two three four five six"

    def test_min_words_rule(self):
        assert extract_main_content("<p>single</p>") == ""
        assert extract_main_content("<p>two words</p>") == "two words"

    def test_entities_and_comments(self):
        html = "<p>a &lt;tag&gt; &amp;amp; &quot;q&quot;</p><!-- <p>x y</p> -->"
        assert extract_main_content(html) == 'a <tag> &amp; "q"'

    def test_misnested_close_tolerated(self):
        html = "<div><p>first block text</p></div></section><p>second block</p>"
        assert extract_main_content(html) == "first block text second block"

    def test_empty_and_none(self):
        assert extract_main_content("") == ""
        assert extract_main_content("plain no tags at all") == \
            "plain no tags at all"


class TestGeneratedCorpus:
    def test_extractor_recovers_authored_truth(self):
        for i in range(40):
            html, truth = generate_html_page(i)
            assert extract_main_content(html) == truth, i

    def test_deterministic(self):
        assert generate_html_page(7) == generate_html_page(7)

    def test_strip_tags_duckdb_is_superset_of_main(self, tmp_path):
        # tier-1 strip keeps boilerplate text too; every main-content word
        # must still be present in the stripped text
        d = ensure_html_corpus(12, base_dir=str(tmp_path))
        con = duckdb.connect()
        q = (
            f"SELECT doc_id, {strip_tags_sql('html', 'duckdb')} AS s "
            f"FROM read_parquet('{d}/html_docs.parquet')"
        )
        stripped = dict(con.execute(q).fetchall())
        truth = dict(
            con.execute(
                f"SELECT doc_id, main_text FROM "
                f"read_parquet('{d}/html_truth.parquet')"
            ).fetchall()
        )
        for k, main in truth.items():
            for w in main.split():
                assert w in stripped[k]

    def test_strip_tags_drops_script_style_comment_content(self, tmp_path):
        d = ensure_html_corpus(6, base_dir=str(tmp_path))
        con = duckdb.connect()
        q = (
            f"SELECT {strip_tags_sql('html', 'duckdb')} AS s "
            f"FROM read_parquet('{d}/html_docs.parquet')"
        )
        for (s,) in con.execute(q).fetchall():
            assert "track(" not in s
            assert "margin:0" not in s
            assert "not content" not in s
            assert "<div>" not in s


class TestSparkParity:
    def test_strip_and_main_on_spark(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from ppocr_spark.functions.boilerplate import (
            main_content,
            strip_tags_col,
        )

        d = ensure_html_corpus(10, base_dir=str(tmp_path))
        df = spark.read.parquet(f"{d}/html_docs.parquet")
        sp = {
            r["doc_id"]: r["s"]
            for r in df.select(
                "doc_id", strip_tags_col(F.col("html")).alias("s")
            ).collect()
        }
        con = duckdb.connect()
        du = dict(
            con.execute(
                f"SELECT doc_id, {strip_tags_sql('html', 'duckdb')} AS s "
                f"FROM read_parquet('{d}/html_docs.parquet')"
            ).fetchall()
        )
        assert sp == du
        mc = {
            r["doc_id"]: r["main_text"]
            for r in main_content(df).select("doc_id", "main_text").collect()
        }
        truth = dict(
            con.execute(
                f"SELECT doc_id, main_text FROM "
                f"read_parquet('{d}/html_truth.parquet')"
            ).fetchall()
        )
        assert mc == truth


class TestPipelineHtmlModes:
    def test_normalize_text_spans_modes(self, spark):
        from ppocr_spark.pipeline import explode_spans, normalize_text_spans

        html = ("<nav><a href='/'>menu here</a></nav>"
                "<p>kept body words</p>")
        docs = spark.createDataFrame(
            [("d1", [{"kind": "text", "text": html, "media_ref": None,
                      "offset": 0}])],
            "doc_id string, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>",
        )
        spans = explode_spans(docs)
        off = normalize_text_spans(spans, "off").collect()[0]["text"]
        stripped = normalize_text_spans(spans, "strip").collect()[0]["text"]
        main = normalize_text_spans(spans, "main").collect()[0]["text"]
        assert "<p>" in off
        assert stripped == "menu here kept body words"
        assert main == "kept body words"
