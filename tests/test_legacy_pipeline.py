"""Old pipeline end-to-end: raw entity JSON + raw log lines → qrank + stats."""

from __future__ import annotations

import json

from wikidata_qrank_spark.plans.legacy import build_qrank_legacy


def _entity(qid: str, links: dict[str, str]) -> str:
    return json.dumps(
        {
            "id": qid,
            "sitelinks": {
                site: {"site": site, "title": title} for site, title in links.items()
            },
        },
        ensure_ascii=False,
    )


def test_legacy_end_to_end(spark):
    entities = spark.createDataFrame(
        [
            (_entity("Q72", {"amwiki": "ዙሪክ", "azwiki": "Sürix"}),),
            (_entity("Q7197", {"azwiki": "Simona_de_Bovuar"}),),
            (_entity("Q7969215", {"afwiki": "Wards-eiland"}),),
        ],
        "value string",
    )
    month1 = spark.createDataFrame(
        [
            ("am.wikipedia ዙሪክ 1 desktop 7 A1",),
            ("az.wikipedia Simona_de_Bovuar 2 desktop 2 B1",),
        ],
        "value string",
    )
    month2 = spark.createDataFrame(
        [
            ("am.wikipedia ዙሪክ 1 desktop 1 A1",),
            ("az.wikipedia Simona_de_Bovuar 2 desktop 58 B1",),
            ("az.wikipedia Sürix 3 desktop 5 C1",),
            ("ca.wikipedia Winterthur 4 desktop 11 D1",),  # no sitelink
        ],
        "value string",
    )
    out = build_qrank_legacy(entities, [month1, month2], stats_top_n=1, stats_samples=2)
    qv = {f"Q{r.item_id}": r.views for r in out["qviews"].collect()}
    assert qv == {"Q72": 13, "Q7197": 60}
    qr = [(r.item, r.views) for r in out["qrank"].orderBy("rank").collect()]
    assert qr == [("Q7197", 60), ("Q72", 13)]
    assert out["stats"]["Samples"][0][0] == "Q7197"
    assert out["stats"]["Samples"][-1] == ["Q72", 2, 13]
