

def test_strip_markup_drops_scripts_tags_entities(spark):
    from pyspark.sql import functions as F

    from ophidia_server_spark.pipeline.text import strip_markup

    rows = [
        (1, '<p>Hello <b>world</b></p><script>if (1 < 2) alert("x");</script>'),
        (2, 'A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;end'),
        (3, '<style type="text/css">body { x: 1; }</style>plain'),
        (4, 'no markup at all'),
        (5, 'multi\n\nline\t text  here'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in strip_markup(df).collect()}
    assert out[1]["clean_text"] == "Hello world"
    assert out[2]["clean_text"] == 'A & B <tag> "q" \'s\' end'
    assert out[3]["clean_text"] == "plain"
    assert out[4]["clean_text"] == "no markup at all"
    assert out[4]["chars_removed"] == 0
    assert out[5]["clean_text"] == "multi line text here"
    for r in out.values():
        assert r["chars_removed"] >= 0
