"""Golden tests: schema derivation must match the reference doctest outputs
(``/root/reference/src/Ringo.hs:147-221``) exactly — names, types,
nullability, column order, constraint contents."""

from ringo_spark.extractor import (
    extract_all_dimension_tables, extract_dependencies, extract_dimension_tables,
    extract_fact_table, topo_order,
)
from ringo_spark.model import Column, Nullable, PrimaryKey, UniqueKey
from ringo_spark.validator import make_env

from .fixtures import (
    facts, page_view_fact, session_fact, settings, tables, type_defaults,
)

NN = Nullable.NOT_NULL
env = make_env(tables, facts, settings, type_defaults)


def colspec(table):
    return [(c.name, c.type, c.nullable) for c in table.columns]


def test_extract_fact_table_session():
    # golden: src/Ringo.hs:147-155
    t = extract_fact_table(env, session_fact)
    assert t.name == "fact_session_by_minute"
    assert colspec(t) == [
        ("created_at_minute_id", "bigint", NN),
        ("publisher_id", "integer", NN),
        ("session_count", "integer", NN),
        ("geo_id", "integer", NN),
        ("user_agent_id", "integer", NN),
    ]
    assert t.constraints == (UniqueKey(
        ["created_at_minute_id", "publisher_id", "geo_id", "user_agent_id"]),)


def test_extract_fact_table_page_view():
    # golden: src/Ringo.hs:157-166
    t = extract_fact_table(env, page_view_fact)
    assert t.name == "fact_page_view_by_minute"
    assert colspec(t) == [
        ("created_at_minute_id", "bigint", NN),
        ("publisher_id", "integer", NN),
        ("view_count", "integer", NN),
        ("referrer_id", "integer", NN),
        ("page_type_id", "integer", NN),
        ("geo_id", "integer", NN),
        ("user_agent_id", "integer", NN),
    ]
    assert t.constraints == (UniqueKey(
        ["created_at_minute_id", "publisher_id", "referrer_id", "page_type_id",
         "geo_id", "user_agent_id"]),)


def test_extract_dimension_tables_session():
    # golden: src/Ringo.hs:172-190
    dims = extract_dimension_tables(env, session_fact)
    assert [d.name for d in dims] == ["dim_geo", "dim_user_agent"]
    geo, ua = dims
    assert colspec(geo) == [
        ("id", "serial", NN),
        ("country_name", "character varying(50)", NN),
        ("city_name", "character varying(50)", NN),
        ("continent_name", "character varying(15)", NN),
    ]
    assert geo.constraints == (
        PrimaryKey("id"), UniqueKey(["country_name", "city_name", "continent_name"]))
    assert colspec(ua) == [
        ("id", "serial", NN),
        ("browser_name", "character varying(50)", NN),
        ("os", "character varying(50)", NN),
        ("name", "character varying(100)", NN),
    ]
    assert ua.constraints == (
        PrimaryKey("id"), UniqueKey(["browser_name", "os", "name"]))


def test_extract_dimension_tables_page_view():
    # golden: src/Ringo.hs:191-197 — referrers (existing) + derived dim_page_type
    dims = extract_dimension_tables(env, page_view_fact)
    assert [d.name for d in dims] == ["referrers", "dim_page_type"]
    pt = dims[1]
    assert colspec(pt) == [
        ("id", "serial", NN),
        ("page_type", "character varying(20)", NN),
    ]
    assert pt.constraints == (PrimaryKey("id"), UniqueKey(["page_type"]))


def test_extract_all_dimension_tables_page_view():
    pairs = extract_all_dimension_tables(env, page_view_fact)
    assert [(f.name, t.name) for f, t in pairs] == [
        ("page_view", "referrers"),
        ("page_view", "dim_page_type"),
        ("session", "dim_geo"),
        ("session", "dim_user_agent"),
    ]


def test_extract_dependencies_session():
    # golden: src/Ringo.hs:201-208
    deps = extract_dependencies(env, session_fact)
    assert deps == {
        "dim_geo": ["session_events"],
        "dim_user_agent": ["session_events"],
        "fact_session_by_minute": ["session_events", "dim_user_agent", "dim_geo"],
    }


def test_extract_dependencies_page_view():
    # golden: src/Ringo.hs:209-221
    deps = extract_dependencies(env, page_view_fact)
    assert deps == {
        "dim_page_type": ["page_view_events"],
        "fact_page_view_by_minute": [
            "page_view_events", "session_events", "dim_page_type", "referrers",
            "dim_user_agent", "dim_geo",
        ],
    }


def test_topo_order():
    deps = extract_dependencies(env, page_view_fact)
    order = topo_order(deps)
    assert order.index("dim_page_type") < order.index("fact_page_view_by_minute")


def test_extract_all_dimension_tables_grandparent_chain():
    """Dims flow through TWO levels of parent recursion
    (Extractor/Internal.hs:96-103): grandchild -> page_view -> session."""
    from ringo_spark.model import DimTime, Fact, FactColumn, FactCount, ForeignKey, Table

    click_table = Table("click_events", [
        Column("id", "uuid", NN),
        Column("created_at", "timestamp without time zone", NN),
        Column("page_view_event_id", "uuid"),
        Column("publisher_id", "integer", NN),
    ], [PrimaryKey("id"),
        ForeignKey("page_view_events", [("page_view_event_id", "id")]),
        ForeignKey("session_events", [("publisher_id", "publisher_id")])])
    click_fact = Fact("click", "click_events", [
        FactColumn("created_at", DimTime()),
        FactColumn("click_count", FactCount()),
    ], parent_names=["page_view"])
    env3 = make_env(list(tables) + [click_table], list(facts) + [click_fact],
                    settings, type_defaults)
    pairs = extract_all_dimension_tables(env3, click_fact)
    # own dims: none; parent (page_view): referrers + page_type;
    # grandparent (session): geo + user_agent
    assert [(f.name, t.name) for f, t in pairs] == [
        ("page_view", "referrers"),
        ("page_view", "dim_page_type"),
        ("session", "dim_geo"),
        ("session", "dim_user_agent"),
    ]
    # the derived grandchild fact table carries all four FK id columns
    t = extract_fact_table(env3, click_fact)
    assert [c.name for c in t.columns] == [
        "created_at_minute_id", "click_count", "referrer_id",
        "page_type_id", "geo_id", "user_agent_id"]
