"""Goldens for stats sampling, interwiki links, page-signals merge, sinks."""

from __future__ import annotations

import glob
import gzip
import json

from wikidata_qrank_spark.operators.sinks import write_item_signals_csv, write_qrank_csv
from wikidata_qrank_spark.operators.stats import (
    build_stats,
    build_stats_from_rows,
    write_stats_json,
)
from wikidata_qrank_spark.operators.wiki import (
    interwiki_links,
    page_signals_merge,
    qviews_monthly,
)


def test_stats_golden(tmp_path):
    """stats_test.go:15-55 — 9-row qrank, topN=2, samples=8."""
    rows = [
        ("Q1", 4721864130),
        ("Q2", 107330319),
        ("Q3", 69160330),
        ("Q4", 5111172),
        ("Q5", 51123),
        ("Q6", 156),
        ("Q7", 1),
        ("Q8", 1),
        ("Q9", 1),
    ]
    stats = build_stats_from_rows(rows, num_ranks=9, top_n=2, num_samples=8)
    path = str(tmp_path / "stats.json")
    write_stats_json(stats, path)
    got = open(path).read()
    want = '{"Median":2,"Samples":[["Q1",1,4721864130],["Q2",2,107330319],["Q5",5,51123],["Q9",9,1]]}'
    assert got == want


def test_stats_from_dataframe(spark):
    qrank = spark.createDataFrame(
        [("Q1", 4721864130, 1), ("Q2", 107330319, 2), ("Q3", 69160330, 3),
         ("Q4", 5111172, 4), ("Q5", 51123, 5), ("Q6", 156, 6),
         ("Q7", 1, 7), ("Q8", 1, 8), ("Q9", 1, 9)],
        "item string, views long, rank long",
    )
    stats = build_stats(qrank, top_n=2, num_samples=8)
    assert stats["Median"] == 2
    assert stats["Samples"][0] == ["Q1", 1, 4721864130]
    assert stats["Samples"][-1] == ["Q9", 9, 1]


def test_stats_distributed_matches_driver_path(spark):
    """A8 fallback: the single-task mapInPandas form over the
    range-sorted table must produce the byte-identical stats JSON."""
    import json

    from wikidata_qrank_spark.operators.stats import build_stats_distributed

    qrank = spark.createDataFrame(
        [("Q1", 4721864130, 1), ("Q2", 107330319, 2), ("Q3", 69160330, 3),
         ("Q4", 5111172, 4), ("Q5", 51123, 5), ("Q6", 156, 6),
         ("Q7", 1, 7), ("Q8", 1, 8), ("Q9", 1, 9)],
        "item string, views long, rank long",
    )
    a = build_stats(qrank, top_n=2, num_samples=8)
    b = build_stats_distributed(qrank, top_n=2, num_samples=8)
    sep = (",", ":")
    assert json.dumps(a, separators=sep) == json.dumps(b, separators=sep)


def test_stats_distributed_empty(spark):
    from wikidata_qrank_spark.operators.stats import build_stats_distributed

    empty = spark.createDataFrame([], "item string, views long, rank long")
    assert build_stats_distributed(empty) == {"Median": 0, "Samples": []}


# interwiki fixture mirroring the reference's rmwiki testdata
# (interwikilinks_test.go:16-52 + testdata/interwikimap.php.txt)
IW_MAP = {
    ("rmwiki", "b"): "rmwikibooks",
    ("rmwiki", "s"): "rmwikisource",
    ("_wikibooks", "it"): "itwikibooks",
    ("_wikibooks", "rm"): "rmwikibooks",
    ("__global", "d"): "wikidatawiki",
}
SITE_META = {
    "rmwiki": ("rm.wikipedia.org", "wiki"),
    "rmwikibooks": ("rm.wikibooks.org", "wikibooks"),
    "itwikibooks": ("it.wikibooks.org", "wikibooks"),
    "wikidatawiki": ("www.wikidata.org", "wikidata"),
}


def test_interwiki_links_golden(spark):
    page_items = spark.createDataFrame(
        [(1, "Q5296"), (799, "Q72")], "page_id long, item string"
    )
    iwlinks = spark.createDataFrame(
        [
            (1, "d", "Wikidata:Accueil_principal"),
            (1, "m", "Hauptseite"),                      # unresolvable prefix
            (1, "meta", "Lista_di_Wikipedie"),           # unresolvable
            (1, "b", "Main_Page/Rumantsch"),
            (1, "b", "it:Categoria:Testi_in_romancio"),  # chain: b → it
            (1, "translatewiki", "Portal:rm"),           # unresolvable
            (799, "de", "gsw:User:Test"),                # unresolvable
        ],
        "from_page long, prefix string, title string",
    )
    rows = interwiki_links(page_items, iwlinks, IW_MAP, SITE_META, "rmwiki")
    got = sorted((r.target_domain, r.title, r.item) for r in rows.collect())
    assert got == [
        ("it.wikibooks.org", "Categoria:Testi_in_romancio", "Q5296"),
        ("rm.wikibooks.org", "Main_Page/Rumantsch", "Q5296"),
        ("www.wikidata.org", "Wikidata:Accueil_principal", "Q5296"),
    ]


def test_page_signals_merge_golden(spark):
    """pagesignals_test.go:116-148: 11,s=1111111 | 22,Q72 | 22,s=830167 |
    333,Q3 → pages without an entity dropped."""
    tagged = spark.createDataFrame(
        [
            (11, None, 1111111, None, None, None),
            (22, "Q72", None, None, None, None),
            (22, None, 830167, None, None, None),
            (333, "Q3", None, None, None, None),
        ],
        "page_id long, item string, wikitext_bytes long, claims long, "
        "identifiers long, sitelinks long",
    )
    got = {
        r.page_id: (r.item, r.wikitext_bytes)
        for r in page_signals_merge(tagged).collect()
    }
    assert got == {22: ("Q72", 830167), 333: ("Q3", None)}


def test_qviews_monthly_golden(spark):
    sitelinks = spark.createDataFrame(
        [("am.wikipedia/ዙሪክ", "Q72"), ("az.wikipedia/sürix", "Q72")],
        "page_key string, item string",
    )
    pv = spark.createDataFrame(
        [("am.wikipedia/ዙሪክ", 8), ("az.wikipedia/sürix", 5), ("xx.wikipedia/y", 3)],
        "page_key string, views long",
    )
    got = {r.item_id: r.views for r in qviews_monthly(sitelinks, pv).collect()}
    assert got == {72: 13}


def test_qrank_csv_sink(spark, tmp_path):
    qrank = spark.createDataFrame(
        [("Q4", 77, 1), ("Q2", 42, 2), ("Q5", 42, 3), ("Q1", 1, 4), ("Q3", 1, 5)],
        "item string, views long, rank long",
    )
    out = str(tmp_path / "qrank_csv")
    write_qrank_csv(qrank, out)
    (csv_file,) = glob.glob(out + "/part-*.csv.gz")
    lines = gzip.open(csv_file, "rt").read().splitlines()
    assert lines == ["Entity,QRank", "Q4,77", "Q2,42", "Q5,42", "Q1,1", "Q3,1"]


def test_item_signals_csv_sink(spark, tmp_path):
    sig = spark.createDataFrame(
        [(72, "Q72", 5585, 3142, 550, 85, 186), (5296, "Q5296", 314159267, 2872, 0, 0, 0)],
        "item_id long, item string, pageviews_52w long, wikitext_bytes long, "
        "claims long, identifiers long, sitelinks long",
    )
    out = str(tmp_path / "sig_csv")
    write_item_signals_csv(sig, out)
    (csv_file,) = glob.glob(out + "/part-*.csv.gz")
    lines = gzip.open(csv_file, "rt").read().splitlines()
    assert lines[0] == "item,pageviews_52w,wikitext_bytes,claims,identifiers,sitelinks"
    assert lines[1] == "Q72,5585,3142,550,85,186"
    assert lines[2] == "Q5296,314159267,2872,0,0,0"


def test_links_schema_a_golden(spark):
    """pagelinks_test.go:17-77 (rmwiki, pl_title schema) incl. namespace
    prefixing of (1,4,'Bainvegni') → 'Wikipedia:Bainvegni'."""
    page_items = spark.createDataFrame(
        [(1, 5296), (3824, 662541), (799, 72)], "page_id long, item_id long"
    )
    titles = spark.createDataFrame(
        [("Chantun_Turitg", 11943), ("Flum", 4022), ("Lai_da_Turitg", 14407),
         ("Turitg", 72), ("Wikipedia:Bainvegni", 17596642)],
        "title string, item_id long",
    )
    redirects = spark.createDataFrame([("Zürich", 72)], "title string, item_id long")
    namespaces = spark.createDataFrame(
        [(0, ""), (4, "Wikipedia")], "ns_id int, localized string"
    )
    pagelinks = spark.createDataFrame(
        [(1, 4, "Bainvegni"), (3824, 0, "Zürich"), (4689, 0, "1._avuost"),
         (799, 0, "Chantun_Turitg"), (799, 0, "Flum"), (799, 0, "Lai_da_Turitg"),
         (799, 0, "Turitg")],
        "from_page long, namespace int, title string",
    )
    from wikidata_qrank_spark.operators.wiki import links_from_pagelinks

    got = sorted(
        (r.src_id, r.dst_id)
        for r in links_from_pagelinks(
            page_items, titles.unionByName(redirects), namespaces, pagelinks_a=pagelinks
        ).collect()
    )
    assert got == [(72, 4022), (72, 11943), (72, 14407), (5296, 17596642), (662541, 72)]


def test_links_schema_b_golden(spark):
    """pagelinks_test.go:81-138 (itwikibooks, pl_target_id + linktarget)."""
    page_items = spark.createDataFrame(
        [(54321, 54321), (54322, 54322), (123456, 8681970)],
        "page_id long, item_id long",
    )
    titles = spark.createDataFrame(
        [("Allegra,_allegra", 54321), ("Categoria:Testi_in_romancio", 8681970)],
        "title string, item_id long",
    )
    redirects = spark.createDataFrame(
        [("In_chaschiel_ed_ina_nursa", 54322)], "title string, item_id long"
    )
    pagelinks_b = spark.createDataFrame(
        [(1768, 301), (123456, 374), (123456, 375)], "from_page long, target_id long"
    )
    linktarget = spark.createDataFrame(
        [(374, 0, "Allegra,_allegra"), (375, 0, "In_chaschiel_ed_ina_nursa")],
        "lt_id long, namespace int, title string",
    )
    namespaces = spark.createDataFrame([(0, "")], "ns_id int, localized string")
    from wikidata_qrank_spark.operators.wiki import links_from_pagelinks

    got = sorted(
        (r.src_id, r.dst_id)
        for r in links_from_pagelinks(
            page_items, titles.unionByName(redirects), namespaces,
            pagelinks_b=pagelinks_b, linktarget=linktarget
        ).collect()
    )
    assert got == [(8681970, 54321), (8681970, 54322)]


def test_plot_points_golden_hand_computed():
    """Data parity with cmd/plot-qrank-distribution/main.go:44-208
    (logX=false, logY=true): hand-computed pixel vertices for a 5-row
    curve. numRanks=5 → numRanksInMillions=0 → scaleX = 1000/1e6;
    maxValue=100 → scaleY = 1000/ceil(log10(100)) = 500."""
    import math

    from wikidata_qrank_spark.operators.stats import plot_points_from_rows

    rows = [("Q1", 100), ("Q2", 50), ("Q3", 10), ("Q4", 5), ("Q5", 1)]
    pts = plot_points_from_rows(rows, num_ranks=5)
    assert [(p[0], p[1]) for p in pts] == [
        (1, 100), (2, 50), (3, 10), (4, 5), (5, 1)
    ]
    sx = 1000.0 / 1e6
    for i, (rank, value, x, y) in enumerate(pts, start=1):
        assert abs(x - (rank * sx + 35.0)) < 1e-9
        assert abs(y - (1000.0 - math.log10(value) * 500.0)) < 1e-9
    # last point sits on the x axis (value 1 → log10 = 0 → y = 1000)
    assert pts[-1][3] == 1000.0


def test_plot_points_downsamples_flat_curve():
    """A flat curve never moves ≥ 4px between consecutive ranks
    (Δx = 0.001 px), so only the unconditional rank-1 vertex is kept —
    the reference's distance filter, exactly."""
    from wikidata_qrank_spark.operators.stats import plot_points_from_rows

    pts = plot_points_from_rows([("Q%d" % i, 100) for i in range(50)], num_ranks=50)
    assert [(p[0], p[1]) for p in pts] == [(1, 100)]


def test_plot_points_maxvalue_one_go_float_semantics():
    """maxValue=1 → ceil(log10)=0 → Go computes plotWidth/0 = +Inf;
    NaN distances keep only rank 1."""
    from wikidata_qrank_spark.operators.stats import plot_points_from_rows

    pts = plot_points_from_rows([("Q1", 1), ("Q2", 1), ("Q3", 1)], num_ranks=3)
    assert [(p[0], p[1]) for p in pts] == [(1, 1)]


def test_plot_distribution_points_distributed_matches_kernel(spark):
    """The single-task mapInPandas form returns the identical vertex
    list as the pure kernel over the same rank-ordered rows."""
    from wikidata_qrank_spark.operators.stats import (
        plot_distribution_points,
        plot_points_from_rows,
    )

    data = [("Q%d" % i, 2 ** max(1, 20 - i), i) for i in range(1, 40)]
    qrank = spark.createDataFrame(data, "item string, views long, rank long")
    want = plot_points_from_rows(
        [(d[0], d[1]) for d in sorted(data, key=lambda d: d[2])], num_ranks=len(data)
    )
    got = plot_distribution_points(qrank)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1]
        assert abs(g[2] - w[2]) < 1e-9 and abs(g[3] - w[3]) < 1e-9


def test_render_distribution_png_gated(tmp_path):
    """PNG rendering is PIL-gated: returns False (and writes nothing)
    when PIL is absent, True + a file when present."""
    from wikidata_qrank_spark.operators.stats import (
        plot_points_from_rows,
        render_distribution_png,
    )

    pts = plot_points_from_rows([("Q1", 100), ("Q2", 10)], num_ranks=2)
    out = str(tmp_path / "dist.png")
    import importlib.util

    has_pil = importlib.util.find_spec("PIL") is not None
    ok = render_distribution_png(pts, out)
    assert ok == has_pil
    import os

    assert os.path.exists(out) == has_pil
