"""Deterministic OSM-XML fixture generator covering FIXTURES.md §2-§3:
dirty tag values for every cleaner, the tag-key split corpus (plain /
lower-colon / double-colon / problem-char / uppercase-colon keys), ways
with ordered nd refs, and relations that must be dropped.

Lives in the package (not tests/) because the driver-facing OSM pipeline
queries also materialize it — the driver's testdata has no OSM XML."""

from __future__ import annotations

from xml.sax.saxutils import quoteattr

NODE_TAG_CASES: list[tuple[str, str]] = [
    # (k, v) — one tag per node, node id = 1000 + index
    ("addr:street", "Main St"),
    ("addr:street", "Main St."),
    ("addr:street", "FM 1100 Rd"),
    ("addr:street", "Basket Flower Bend"),
    ("addr:street", "Foo Xyzzy"),
    ("phone", "(512) 281-5566"),
    ("phone", "+1 512 281 5566"),
    ("phone", "5122815566"),
    ("addr:postcode", "78621-1234"),
    ("addr:postcode", "TX 78621"),
    ("addr:postcode", "Elgin"),
    ("addr:state", "TX"),
    ("addr:state", "Texas"),
    ("addr:city", "Elgin, TX"),
    ("addr:city", "Round Rock"),
    ("addr:city", "Cedar-Park"),
    ("addr:housenumber", "100-102"),
    ("addr:housenumber", "101B"),
    ("highway", "residential"),          # plain key
    ("name", "Elgin Memorial Park"),     # plain key
    ("tiger:name_base:1", "County Line"),  # double colon: key 'name_base' (:1 dropped)
    ("gnis:feature_id", "1378056"),      # lower colon
    ("FIXME:de", "pruefen"),             # uppercase prefix: stays whole, regular
    ("odd key", "dropped"),              # problem char (space)
    ("a.b", "dropped"),                  # problem char (dot)
    ("x&y", "dropped"),                  # problem char (&)
]

#: ways: (way_id, ordered nd refs, tags)
WAY_CASES: list[tuple[int, list[int], list[tuple[str, str]]]] = [
    (5001, [1000, 1001, 1002], [("highway", "service"), ("tiger:county", "Bastrop, TX")]),
    (5002, [1002, 1003], [("addr:street", "Cedar Trl")]),
    (5003, [1004, 1005, 1006, 1007], [("building", "yes"), ("odd key", "dropped")]),
]


def build_osm_xml(
    n_extra_nodes: int = 20,
    include_invalid: bool = False,
) -> str:
    """Render the fixture document. ``include_invalid`` adds a node missing
    its uid/user attributes (for quarantine/strict-validation tests)."""
    lines = [
        "<?xml version='1.0' encoding='UTF-8'?>",
        "<osm version='0.6' generator='fixture'>",
        "  <bounds minlat='30.2517' minlon='-97.6293' maxlat='30.5158' maxlon='-97.0903'/>",
    ]

    def attr(v) -> str:
        return quoteattr(str(v))

    def node(i: int, tags: list[tuple[str, str]]) -> None:
        ts = f"2016-0{1 + i % 9}-1{i % 10}T0{i % 10}:2{i % 10}:3{i % 10}Z"
        lines.append(
            f"  <node id={attr(i)} lat={attr(30.3 + (i % 100) * 1e-3)} "
            f"lon={attr(-97.4 + (i % 100) * 1e-3)} user={attr('user_' + str(i % 7))} "
            f"uid={attr(100 + i % 7)} version={attr(1 + i % 3)} "
            f"changeset={attr(9_000_000 + i)} timestamp={attr(ts)}>"
        )
        for k, v in tags:
            lines.append(f"    <tag k={attr(k)} v={attr(v)}/>")
        lines.append("  </node>")

    for idx, (k, v) in enumerate(NODE_TAG_CASES):
        node(1000 + idx, [(k, v)])
    for j in range(n_extra_nodes):
        node(2000 + j, [])

    if include_invalid:
        lines.append(
            "  <node id='3000' lat='30.3' lon='-97.4' version='1' "
            "changeset='9999999' timestamp='2016-01-01T00:00:00Z'>"
        )  # missing user + uid
        lines.append("  </node>")

    for way_id, nds, tags in WAY_CASES:
        lines.append(
            f"  <way id={attr(way_id)} user={attr('mapper')} uid={attr(55)} "
            f"version={attr(2)} changeset={attr(9_100_000 + way_id)} "
            f"timestamp={attr('2016-05-05T12:00:00Z')}>"
        )
        for ref in nds:
            lines.append(f"    <nd ref={attr(ref)}/>")
        for k, v in tags:
            lines.append(f"    <tag k={attr(k)} v={attr(v)}/>")
        lines.append("  </way>")

    # relations must be ignored by the pipeline (S2:320)
    lines.append(
        "  <relation id='7001' user='mapper' uid='55' version='1' "
        "changeset='9200000' timestamp='2016-06-06T12:00:00Z'>"
    )
    lines.append("    <member type='way' ref='5001' role='outer'/>")
    lines.append("    <tag k='type' v='multipolygon'/>")
    lines.append("  </relation>")
    lines.append("</osm>")
    return "\n".join(lines)
